"""Distributed global prefix sum (scan) — the scale-safe cumulative sum.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY funnels the entire table
through ONE task (Spark's WindowExec warns exactly this), which is the same
class of scale-killer as the exact-percentile buffering replaced by
functions/histpct.py. The standard distributed recast is the two-phase
scan:

1. range-partition by the order key, so partition p holds a contiguous key
   range and every key in partition p sorts before every key in p+1;
2. one tiny job computes per-partition totals (one row per partition),
   whose running sum gives each partition's OFFSET — driver-side math over
   ~thousands of rows, broadcast back;
3. a window *within* each partition (bounded memory, parallel across
   partitions) plus the broadcast offset yields the exact global scan.

Used by the sequence-packing query (token-budget batching of an LLM
training corpus). Reference analogue: running accumulation in the
reference's chunked processors (parallel_processing.py merges per-chunk
partials the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global cumulative sum of ``value_col`` in ``order_col`` order
    (inclusive), without ever sorting the whole table in one task.

    ``order_col`` must be globally unique (it defines the scan order)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    # phase 2: per-partition totals -> running offsets (tiny: one row/task)
    parts = (
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .orderBy("_pid")
        .collect()
    )
    offsets, run = {}, 0
    for r in parts:
        offsets[r._pid] = run
        run += r._psum or 0
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    # phase 3: bounded within-partition scan + broadcast offset
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = ranged.withColumn(
        out_col, F.sum(value_col).over(w) + off[F.col("_pid")]
    ).drop("_pid")
    return out
