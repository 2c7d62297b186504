"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row-count + column-name + order-insensitive value comparison."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame: columns sorted by name, datetimes to
    ISO strings, numerics to float64/int64, rows sorted by all columns."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            s = s.map(_canon_cell)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        out[col] = s
    canon = pd.DataFrame(out)
    if len(canon):
        canon = canon.sort_values(by=list(canon.columns), kind="mergesort").reset_index(
            drop=True
        )
    return canon


def _canon_cell(v):
    """Stringify nested/temporal cells so lists, dates, Decimals compare
    across engines."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    return v


def _kind(s: pd.Series) -> str:
    """Numeric *kind* (int vs float vs bool vs other) — the driver's value
    hash distinguishes DuckDB DOUBLE from Spark BIGINT even when the
    numbers are equal, so the local gate must too."""
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    return "other"


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = ""):
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    for col in a.columns:
        ka, kb = _kind(a[col]), _kind(b[col])
        assert ka == kb, f"{name}: column {col!r} dtype-kind mismatch spark={ka} duck={kb}"
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if ka == "float":
            # Driver-strict: hash equality means bit equality, so compare
            # exactly and distinguish -0.0 from 0.0 (only NaN==NaN allowed).
            ok = ((av == bv) & (np.signbit(av) == np.signbit(bv))) | (
                np.isnan(av) & np.isnan(bv)
            )
        else:
            ok = np.array([x == y or (pd.isna(x) and pd.isna(y)) for x, y in zip(av, bv)])
        if not ok.all():
            bad = int(np.argmin(ok))
            raise AssertionError(
                f"{name}: column {col!r} differs at canon-row {bad}: "
                f"spark={av[bad]!r} duck={bv[bad]!r} "
                f"({int((~ok).sum())}/{len(ok)} rows differ)"
            )
