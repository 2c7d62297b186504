"""Portable (engine-agnostic) hashing for dedup/fingerprint operators.

``h60(s)`` = first 15 hex chars of md5(s) as a 60-bit non-negative
int — computable bit-identically in Spark (`conv(substring(md5(x),1,
15),16,10)`) and DuckDB (`('0x' || substr(md5(x),1,15))::UBIGINT`).
Using a portable hash (instead of Spark's xxhash64/murmur) keeps every
dedup operator hash-checkable against the DuckDB oracle; md5 is
JVM-side and vectorized, so the hot path stays in codegen.

Seeded variants `h60_seeded(i, s)` = h60(concat(i, '|', s)) act as the
"permutations" for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_seeded(seed: Column | int, col: Column) -> Column:
    s = F.lit(seed) if isinstance(seed, int) else seed
    return h60(F.concat(s.cast("string"), F.lit("|"), col))


# --- SQL-string generators (DuckDB oracle side) ---------------------------


def h60_sql(expr: str) -> str:
    return f"CAST(CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT) AS BIGINT)"


def h60_seeded_sql(seed_expr: str, expr: str) -> str:
    return h60_sql(f"CAST({seed_expr} AS VARCHAR) || '|' || {expr}")
