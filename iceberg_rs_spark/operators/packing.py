"""Sequence packing: concat-and-chunk bin assignment for training-data
batching.

Pretraining dataloaders concatenate documents in a stable order and
slice the token stream into fixed context windows; the bin a document
starts in is ``floor(global_token_offset / ctx)``. The global offset is
an exclusive prefix sum of per-document token counts over the corpus
order — the classic two-pass distributed prefix sum:

1. range-repartition by the order column, so each partition owns a
   contiguous key range;
2. one tiny aggregate computes per-partition totals; the driver turns
   them into per-partition starting offsets (N rows for N partitions —
   bounded like IVF's centroid fetch, NOT data-sized);
3. a window cumsum WITHIN each partition plus the broadcast offset
   yields the exact global prefix sum.

No single-partition window ever exists in the plan — the naive
``Window.orderBy(order)`` with no partition spec would serialize the
entire corpus through one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_offset(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    num_partitions: int = 32,
    out_col: str = "start_offset",
) -> DataFrame:
    """Add the exclusive prefix sum of ``weight_col`` in ``order_col``
    order as ``out_col``, computed with the two-pass partition-offset
    scheme (no global-order window)."""
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Partition totals: N rows cross to the driver (partition METADATA,
    # not data). Offsets are assigned in partition key-range order.
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_tot"), F.min(order_col).alias("_lo"))
        .collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_lo"]):
        offsets[row["_pid"]] = acc
        acc += row["_tot"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "_pid int, _part_offset bigint",
    )
    win = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            (
                F.col("_part_offset")
                + F.sum(weight_col).over(win)
                - F.col(weight_col)
            ).cast("long"),
        )
        .drop("_pid", "_part_offset")
    )


def pack_bins(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    ctx: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Assign each row the context-window bin its stream offset starts
    in: ``bin = floor(start_offset / ctx)`` (documents may straddle
    bins, exactly like a concat-and-chunk dataloader)."""
    with_off = with_global_offset(df, order_col, weight_col, num_partitions)
    return with_off.withColumn(
        "bin", F.floor(F.col("start_offset") / F.lit(float(ctx))).cast("long")
    )
