"""Stateful streaming: session-window aggregation over the events stream.

The engine extension for event streams (SURVEY §2.9 notes the reference is
batch-only): Structured Streaming with watermarks + built-in
``session_window`` (gap-based), run with ``Trigger.AvailableNow`` so the same
code serves batch backfills and incremental restarts. The batch equivalent
(queries_ext.user_sessions) is the oracle in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_user_sessions(
    spark: SparkSession,
    events_dir: str,
    work_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> None:
    """One AvailableNow pass: events files -> per-(user, session-window)
    aggregates appended to ``work_dir/sessions``.

    Watermark bounds state: sessions close once event time passes
    gap+watermark — the standard late-data contract.
    """
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(work_dir, "sessions"))
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessions_result(spark: SparkSession, work_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(work_dir, "sessions"))


def batch_user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch equivalent using the same built-in session_window — the oracle
    for stream/batch equivalence tests."""
    return (
        events.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
