"""Distributed global window functions (VERDICT r4 §Next-round #3).

``Window.orderBy(...)`` with no partition key funnels every row of the
input through ONE task — correct at sf0.1, dead at 100 TB. This module
provides the global window functions the corpus actually uses —
row_number, rank, ntile, running sum — built on the two-pass
partition-offset prefix sum in :mod:`~iceberg_rs_spark.operators.
packing` (range partition → per-partition totals to the driver →
broadcast offsets + within-partition window), so the plan never
contains a single-partition Exchange over an unbounded relation:

- the range repartition spreads the total order across
  ``num_partitions`` tasks;
- the driver sees one row per partition (metadata, not data);
- each partition finishes its own slice with an ordinary
  partition-local window.

Semantics are identical to the SQL window functions — ntile uses the
exact SQL fill rule (first N mod n tiles get the extra row), rank
shares numbers across ties — and every function is property-tested
against the native single-partition ``Window.orderBy`` result in
tests/test_distwin.py, so the corpus queries routed through here kept
their DuckDB oracles unchanged.

Callers pass sort expressions (``F.col("x").desc()`` works; tiebreak
to a unique key for deterministic output, same as the SQL side).
Persisted barrier frames register with packing's cache registry;
``packing.release_caches()`` (bench calls it per query) frees them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.packing import with_global_offset

__all__ = [
    "row_number_global",
    "rank_global",
    "ntile_global",
    "running_sum_global",
    "running_max_global",
]


def _order_list(order_by) -> list:
    return list(order_by) if isinstance(order_by, (list, tuple)) else [order_by]


def row_number_global(
    df: DataFrame,
    order_by,
    out_col: str = "rn",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY ...)`` without the
    single-partition window: exclusive prefix sum of weight 1, plus
    one. ``order_by`` must reach a unique key for the numbering to be
    deterministic (same requirement the hash-checked oracles impose
    on the SQL side). Total row count rides along as
    ``_icelake_prefix_totals`` for ntile-style consumers."""
    tagged = df.withColumn("_w1", F.lit(1).cast("long"))
    out = with_global_offset(
        tagged, _order_list(order_by), "_w1", num_partitions, out_col="_off"
    )
    res = out.withColumn(out_col, (F.col("_off") + 1).cast("int")).drop(
        "_off", "_w1"
    )
    res._icelake_packing_cache = getattr(out, "_icelake_packing_cache", None)
    res._icelake_prefix_totals = getattr(out, "_icelake_prefix_totals", {})
    return res


def rank_global(
    df: DataFrame,
    order_by,
    tie_cols: "list[str | Column]",
    out_col: str = "rank",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """``RANK() OVER (ORDER BY ...)``: row_number with an arbitrary
    tiebreak, then the minimum row number within each tie group. Ties
    share the smallest number and the next distinct value jumps past
    them, exactly the SQL rule.

    Tie resolution is a grouped MIN + equi-join back on ``tie_cols``,
    NOT ``Window.partitionBy(tie_cols)`` — a window partitioned by a
    low-cardinality metric funnels every row of one value through one
    task (the single-task shape this module exists to kill), while the
    grouped min partial-aggregates map-side (reduce input is one row
    per distinct value) and AQE turns the join back into a BROADCAST
    join when the distinct set is small, leaving the fact side's
    partitioning untouched (ADVICE r5 #4).

    The join back is NULL-SAFE (``<=>``): SQL RANK() treats NULL order
    values as one tie group, and a plain equi-join would silently drop
    every NULL-keyed row. Column expressions in ``tie_cols`` are
    materialized as temp columns first so they are resolvable as
    group/join keys."""
    # Materialize Column-typed tie expressions so groupBy/join can
    # resolve them by name; plain strings pass through untouched.
    exprs = {
        f"_tie{i}": c
        for i, c in enumerate(tie_cols)
        if not isinstance(c, str)
    }
    work = df
    for name, c in exprs.items():
        work = work.withColumn(name, c)
    tie_names = [
        c if isinstance(c, str) else f"_tie{i}"
        for i, c in enumerate(tie_cols)
    ]
    rn = row_number_global(work, order_by, "_rn_tie", num_partitions)
    mins = rn.groupBy(*tie_names).agg(
        F.min("_rn_tie").cast("int").alias("_rank_min")
    )
    cond = None
    for t in tie_names:
        clause = F.col(f"_l.{t}").eqNullSafe(F.col(f"_r.{t}"))
        cond = clause if cond is None else cond & clause
    keep = [c for c in rn.columns if c != "_rn_tie" and c not in exprs]
    res = (
        rn.alias("_l")
        .join(mins.alias("_r"), cond)
        .select(
            *[F.col(f"_l.{c}") for c in keep],
            F.col("_r._rank_min").alias(out_col),
        )
    )
    res._icelake_packing_cache = getattr(rn, "_icelake_packing_cache", None)
    res._icelake_prefix_totals = getattr(rn, "_icelake_prefix_totals", {})
    return res


def ntile_global(
    df: DataFrame,
    n: int,
    order_by,
    out_col: str = "tile",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY ...)`` with the exact SQL fill rule:
    with N rows, the first ``N mod n`` tiles hold ``N div n + 1`` rows
    and the rest ``N div n``. N comes free from the prefix-sum pass
    (per-partition totals are already on the driver), so this is the
    same two shuffles as row_number — no extra count action."""
    rn = row_number_global(df, order_by, "_rn_ntile", num_partitions)
    total = getattr(rn, "_icelake_prefix_totals", {}).get((), 0)
    q, r = divmod(int(total), n)
    c = F.col("_rn_ntile")
    if q == 0:
        # Fewer rows than tiles: row i lands alone in tile i.
        tile = c
    elif r == 0:
        tile = F.floor((c - 1) / F.lit(q)) + 1
    else:
        big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
        tile = F.when(c <= big, F.floor((c - 1) / F.lit(q + 1)) + 1).otherwise(
            F.lit(r) + F.floor((c - big - 1) / F.lit(q)) + 1
        )
    res = rn.withColumn(out_col, tile.cast("int")).drop("_rn_ntile")
    res._icelake_packing_cache = getattr(rn, "_icelake_packing_cache", None)
    return res


def running_sum_global(
    df: DataFrame,
    order_by,
    weight_col,
    out_col="running_sum",
    num_partitions: "int | None" = None,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """``SUM(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` — the
    inclusive prefix sum: exclusive offset from the two-pass scheme
    plus the row's own weight. The sweep-line concurrency counter and
    any cumulative-total readout route through here instead of a
    global-order window.

    ``weight_col``/``out_col`` may be matching LISTS: all the running
    sums share one range partition, one totals pass, and one local
    window (the cumulative-tokens-AND-cumulative-vocab shape costs the
    same two passes as a single sum).

    ``group_cols`` makes it a GROUPED running sum (restarts per
    group) — unlike ``Window.partitionBy(group)``, whose parallelism
    is capped at the number of DISTINCT group values (a 3-value flag
    column funnels a 100 TB relation through 3 tasks), the grouped
    two-pass scheme range-partitions on (group, order) so one group
    spreads across many partitions."""
    multi = not isinstance(weight_col, str)
    weights = list(weight_col) if multi else [weight_col]
    outs = list(out_col) if multi else [out_col]
    offs = [f"_off{i}" for i in range(len(weights))]
    out = with_global_offset(
        df,
        _order_list(order_by),
        weights,
        num_partitions,
        out_col=offs,
        group_cols=group_cols,
    )
    res = out
    for w, oc, off in zip(weights, outs, offs):
        res = res.withColumn(oc, (F.col(off) + F.col(w)).cast("long"))
    res = res.drop(*offs)
    res._icelake_packing_cache = getattr(out, "_icelake_packing_cache", None)
    res._icelake_prefix_totals = getattr(out, "_icelake_prefix_totals", {})
    return res


def running_max_global(
    df: DataFrame,
    order_by,
    value_col: str,
    out_col: str = "running_max",
    num_partitions: "int | None" = None,
    inclusive: bool = True,
) -> DataFrame:
    """``MAX(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING [AND -1])``
    via the same two-pass scheme, specialized for the max combine:
    per-partition maxima go to the driver (one row per partition),
    each partition receives the max over all PRECEDING partitions, and
    a partition-local window finishes its slice —
    ``greatest(local_running_max, preceding_partitions_max)`` with
    Spark's null-skipping greatest handling the no-predecessor edges.
    ``inclusive=False`` gives the strictly-before frame (..., -1):
    NULL for the global first row, exactly like the native window —
    the skyline/dominance shape."""
    from pyspark.storagelevel import StorageLevel

    from iceberg_rs_spark.operators.packing import _PERSISTED, _resolve_partitions

    order_exprs = [
        F.col(c) if isinstance(c, str) else c for c in _order_list(order_by)
    ]
    num_partitions = _resolve_partitions(df, num_partitions)
    ranged = df.repartitionByRange(num_partitions, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(ranged)
    totals = (
        ranged.groupBy("_pid").agg(F.max(value_col).alias("_mx")).collect()
    )
    vtype = dict(df.dtypes)[value_col]
    rows, run = [], None
    for row in sorted(totals, key=lambda r: r["_pid"]):
        rows.append((int(row["_pid"]), run))
        m = row["_mx"]
        if m is not None and (run is None or m > run):
            run = m
    off_df = df.sparkSession.createDataFrame(
        rows, f"_pid int, _pmax {vtype}"
    )
    hi = Window.currentRow if inclusive else -1
    win = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    res = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            F.greatest(F.max(value_col).over(win), F.col("_pmax")),
        )
        .drop("_pid", "_pmax")
    )
    res._icelake_packing_cache = ranged
    return res
