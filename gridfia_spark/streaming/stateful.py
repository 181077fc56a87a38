"""Custom stateful streaming operator via ``applyInPandasWithState``.

The task brief calls for watermarked windowed aggs (streaming/sessions.py)
plus ``applyInPandasWithState`` for custom stateful operators. This module
implements a per-user **running activity monitor** no built-in window
expresses: cumulative event count + running value sum + the timestamp at
which the user first crossed an activity threshold — state carried across
micro-batches, one output row per user per batch.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .sessions import EVENT_SCHEMA

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, crossed_at timestamp"
)
STATE_SCHEMA = "n long, s double, crossed timestamp"


def _monitor(threshold: float):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, crossed = state.get
        else:
            n, s, crossed = 0, 0.0, None
        # gather the whole micro-batch for this key, then fold in global
        # (ts, event_id) order — Arrow chunk arrival order is shuffle-fetch
        # order, i.e. nondeterministic; sorting per chunk is not enough
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            keys = ["ts", "event_id"] if "event_id" in allpdf.columns else ["ts"]
            allpdf = allpdf.sort_values(keys)
            for ts, v in zip(allpdf["ts"], allpdf["value"]):
                n += 1
                s += float(v)
                if crossed is None and s >= threshold:
                    crossed = ts
        state.update((n, s, crossed))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "crossed_at": [crossed],
            }
        )

    return fn


def stream_activity_monitor(
    spark: SparkSession,
    events_dir: str,
    work_dir: str,
    threshold: float = 100.0,
) -> None:
    """AvailableNow pass of the stateful monitor; per-user state persists in
    the checkpoint across restarts (incremental ingestion keeps counting)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _monitor(threshold),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(work_dir, "updates"))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def monitor_result(spark: SparkSession, work_dir: str) -> DataFrame:
    """Latest state per user = the last update row emitted."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    upd = spark.read.parquet(os.path.join(work_dir, "updates"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        upd.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def batch_activity_monitor(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Batch oracle: same semantics via window functions."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = events.withColumn("cum", F.sum("value").over(w))
    crossed = (
        run.filter(F.col("cum") >= threshold)
        .groupBy("user_id")
        .agg(F.min("ts").alias("crossed_at"))
    )
    totals = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
    )
    return totals.join(crossed, "user_id", "left").select(
        "user_id", "n_events", "sum_value", "crossed_at"
    )
