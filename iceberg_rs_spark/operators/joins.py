"""Join idioms Spark lacks as single primitives (SURVEY.md §2C joins).

As-of join (nearest prior event): implemented with the union+window
idiom rather than a range join — one shuffle on the key, no quadratic
blow-up, and the window sort is exactly the clustering a time-series
table already has. This is the declared *as-of idiom* (SURVEY.md §4.4:
"no Catalyst rule needed").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Spine/scratch columns the union+window idiom appends — an input
#: column with one of these names would be silently overwritten and
#: corrupt the match, so asof_join refuses it up front.
_RESERVED = ("_ts", "_side", "_payload", "_match")


def _orderable(dt) -> bool:
    """Whether Spark can ORDER BY a column of this type (maps cannot
    be sort keys; arrays/structs are orderable iff their elements
    are)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` and equal keys.

    Union + last-ignore-nulls window: tag rows by side, union on the
    shared (key, ts) spine, then a running ``last(right_payload,
    ignorenulls=True)`` ordered by (ts, side) — right rows at the same
    timestamp sort before left rows, so an exact-tie matches.

    Equi-join NULL semantics are preserved: right rows with a NULL
    timestamp or a NULL key are dropped from the spine before the
    window (a NULL ts has no defined "prior" position — it would sort
    nulls-first and pose as the match for every early left row — and a
    NULL key never equi-matches anything), so left rows with NULL keys
    come back unmatched instead of pairing up with NULL-keyed right
    rows that happen to share their window partition.

    Ties are deterministic: when several right rows share an exact
    (key, ts), the greatest payload tuple wins (the payload struct is
    the final sort key whenever its type is orderable — maps are not
    sort keys in Spark, so map-bearing payloads keep the engine's
    arbitrary tie pick). Without this, the winner depended on shuffle
    arrival order — run-to-run nondeterminism the rest of the engine's
    determinism contract forbids.

    Scale: one shuffle (window partition on the key); no join at all.
    """
    clash = sorted(
        {c for c in (*left.columns, *right.columns) if c in _RESERVED}
    )
    if clash:
        raise ValueError(
            f"asof_join reserves column names {list(_RESERVED)}; "
            f"rename input columns {clash}"
        )
    usable = F.col(right_ts).isNotNull()
    for k in on:
        usable = usable & F.col(k).isNotNull()
    right = right.where(usable)
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(*[F.col(c) for c in right_cols])

    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r_tag = (
        right.withColumn("_ts", F.col(right_ts))
        .withColumn("_side", F.lit(0))
        .withColumn("_payload", payload)
        .select(*on, "_ts", "_side", "_payload")
    )
    # align columns: left keeps its full row; right contributes only spine
    l_cols = left.columns
    l_aligned = l_tag.select(*l_cols, "_ts", "_side", "_payload")
    r_aligned = r_tag.select(
        *[
            F.col(c) if c in (on + ["_ts", "_side", "_payload"]) else F.lit(None).alias(c)
            for c in l_cols + ["_ts", "_side", "_payload"]
        ]
    )
    unioned = l_aligned.unionByName(r_aligned)

    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if _orderable(right.select(payload).schema[0].dataType):
        # exact-(key, ts) ties among right rows resolve to the greatest
        # payload tuple instead of shuffle arrival order; left rows tie
        # only with each other (NULL payloads, mutually invisible to
        # last-ignorenulls), so their relative order is immaterial
        order.append(F.col("_payload").asc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    return out.drop("_ts", "_side", "_payload", "_match")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval overlap: ``a.start < b.end AND b.start < a.end``
    (half-open). With equi-keys in ``on`` Catalyst plans a hash join
    with the range as a post-condition; without keys it is a BNLJ —
    callers at scale should bucket time into coarse chunks first."""
    cond = (F.col(f"l.{left_start}") < F.col(f"r.{right_end}")) & (
        F.col(f"r.{right_start}") < F.col(f"l.{left_end}")
    )
    if on:
        for k in on:
            cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return left.alias("l").join(right.alias("r"), cond)
