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
