"""Top-k idioms (SURVEY.md §2C sorts/limits).

Global top-k = orderBy().limit(k) — Spark plans TakeOrderedAndProject
(per-partition heaps, no full sort). Per-group top-k = row_number()<=k
over a window — one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(df: DataFrame, keys: list[str], order_by: list[Column], k: int) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """EXACT items with frequency > n/(k+1), found with a Misra-Gries
    candidate pass so the shuffle never carries the full distinct-item
    set.

    Two-pass frequent-items (the distributed Misra-Gries guarantee):

    1. Each partition summarizes its rows with a k-counter Misra-Gries
       sketch (``mapInPandas``, dict carried across Arrow batches, so
       per-partition state is O(k) regardless of partition size). Any
       item with GLOBAL count > n/(k+1) must exceed n_p/(k+1) on at
       least one partition (pigeonhole over the partition weights) and
       a k-counter MG summary always retains items above that local
       threshold — so the union of partition candidates is a SUPERSET
       of the true heavy hitters.
    2. An exact recount restricted to the candidates (broadcast
       semi-join — candidates number ≤ k·partitions, never the corpus
       vocabulary) filters to the true hitters.

    At 100 TB the win is pass 1's output size: O(k) rows per partition
    instead of a groupBy over every distinct item. The result is
    bit-exact (counts come from pass 2), so it hash-checks against a
    plain frequency-filter oracle.
    """
    import pandas as pd  # local: Arrow path only

    def mg_partition(batches):
        # WEIGHTED Misra-Gries, vectorized: fold each Arrow batch in via
        # value_counts (no per-row Python), then batch-decrement — if m>k
        # counters remain, subtract the (m-k)-th smallest value d from
        # all and drop the non-positive. Each unit of decrement removes
        # ≥ k+1 units of total weight (d is subtracted from m ≥ k+1
        # positive counters), so total decrement D ≤ n_p/(k+1) and any
        # item with local count > n_p/(k+1) ends positive — the same
        # guarantee as the per-item form.
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            excess = len(counters) - k
            if excess > 0:
                vals = sorted(counters.values())
                d = vals[excess - 1]
                counters = {i: c - d for i, c in counters.items() if c > d}
        yield pd.DataFrame({item_col: list(counters.keys())})

    candidates = (
        df.select(item_col)
        .mapInPandas(mg_partition, schema=f"{item_col} string")
        .distinct()
    )
    # total row count as a 1-row frame (broadcast scalar, not a window
    # over an unpartitioned frame — that would funnel to one task)
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        df.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") * (k + 1) > F.col("n_total"))
    )
