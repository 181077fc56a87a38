"""Incremental / streaming execution over the tile table.

The reference is strictly batch (SURVEY §2.9); the engine adds the Spark-
native incremental path: Structured Streaming over the tile directory with
``Trigger.AvailableNow`` + checkpointing. Each restart processes only files
not yet seen (the file-source log is the checkpoint), appends per-(poly,
tile) zonal *partials*, and the final answer is a grouped read of the
partials — so ingesting new tiles never recomputes old ones.

This is the streaming complement of plans/lineage.py: lineage restarts at
work-partition granularity, the stream restarts at file granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen.tiles import TILE_SCHEMA
from ..operators import broadcast_join, decode


def incremental_zonal(
    spark: SparkSession,
    tiles_dir: str,
    polygons: DataFrame,
    work_dir: str,
    species: int | None = 0,
    res: int = 15,
) -> None:
    """Run one AvailableNow pass: new tile files -> zonal partials appended
    to ``work_dir/partials`` (checkpoint in ``work_dir/ckpt``)."""
    stream = (
        spark.readStream.schema(TILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(tiles_dir)
    )
    index = broadcast_join.PolygonIndex.build(polygons, res)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        meta = decode.with_tile_meta(batch_df)
        if species is not None:
            meta = meta.filter(F.col("s") == species)
        part = broadcast_join._zonal_partials(meta, index)
        # foreachBatch is at-least-once: a crash between write and checkpoint
        # commit replays the batch. Writing each batch to its own
        # batch=<id> partition with overwrite makes the replay IDEMPOTENT —
        # a re-run overwrites its own partials instead of double-counting.
        part.write.mode("overwrite").parquet(
            os.path.join(work_dir, "partials", f"batch={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def zonal_result(spark: SparkSession, work_dir: str) -> DataFrame:
    """Final zonal stats from accumulated partials (same shape as
    broadcast_join.zonal_stats_fast output, per (poly_id, s))."""
    part = spark.read.parquet(os.path.join(work_dir, "partials"))
    return (
        part.groupBy("poly_id", "s")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("sum_v").alias("sum_v"),
            F.max("max_v").alias("max_v"),
            F.sum("nonzero_px").alias("nonzero_px"),
        )
        .withColumn("mean_v", F.col("sum_v") / F.col("n_px"))
    )
