"""Streaming raster ingest into a persisted store.

The 100 TB growth path for the cube itself: survey tiles arrive as file
drops (nightly exports, per-flight batches), and each AvailableNow pass
writes ONLY the new tiles' chunk files straight into the existing store —
no rewrite of prior chunks, no driver assembly, no recompute. The
reference's equivalent is a manual re-run of ``append_species_to_zarr``
over everything (zarr_utils.py:754-818, batch-only); the engine makes the
store itself an incrementally-maintained sink.

Exactly-once EFFECT from at-least-once foreachBatch: a chunk's path is a
pure function of its tile id (``s.ty.tx`` / ``c/s/ty/tx``) and its bytes
are deterministic (zlib at a fixed level; gzip written with mtime=0), so
a crash-replayed batch overwrites identical bytes — the same idempotency
argument as incremental.py's ``batch=<id>`` partitions, pushed down to
chunk-file granularity. The file-source checkpoint guarantees a restart
processes only unseen drops.

Flat chunk layouts only: a shard object packs MANY tiles, so a batch
holding part of a shard would clobber its siblings — sharded stores are
a compaction product (``write_sharded_store``), not a streaming sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen.tiles import TILE_SCHEMA
from ..operators import decode
from ..sources import zarrstore


def incremental_store_ingest(
    spark: SparkSession,
    tiles_dir: str,
    store_path: str,
    work_dir: str,
    array: str | None = None,
    level: int = 6,
) -> None:
    """Run one AvailableNow pass: unseen tile files under ``tiles_dir``
    -> chunk files written into the EXISTING store at ``store_path``
    (checkpoint in ``work_dir/ckpt``). Batches are validated against the
    store's grid (chunk dims, extent, layer range) before any file is
    written; violations fail the batch loudly."""
    version = zarrstore.detect_zarr_format(store_path)
    if array is None:
        array = zarrstore.find_array(store_path)
    m = zarrstore.zarr_meta(store_path, array)
    if m.shard is not None:
        raise ValueError(
            "incremental_store_ingest requires a flat chunk layout; "
            "sharded stores are a compaction product, not a streaming sink"
        )
    n_layers, gh, gw = (int(x) for x in m.shape)
    _, th, tw = (int(c) for c in m.chunks)
    adir = os.path.join(store_path, array)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        meta = decode.with_tile_meta(batch_df)
        info = meta.agg(
            F.min("w").alias("wmin"), F.max("w").alias("wmax"),
            F.min("h").alias("hmin"), F.max("h").alias("hmax"),
            F.max("tx").alias("txmax"), F.max("ty").alias("tymax"),
            F.min("s").alias("smin"), F.max("s").alias("smax"),
        ).first()
        if (info.wmin, info.wmax, info.hmin, info.hmax) != (tw, tw, th, th):
            raise ValueError(
                f"batch {batch_id}: tile dims ({info.wmin}-{info.wmax}, "
                f"{info.hmin}-{info.hmax}) != store chunks ({tw}, {th})"
            )
        if (int(info.txmax) + 1) * tw > gw or (int(info.tymax) + 1) * th > gh:
            raise ValueError(
                f"batch {batch_id}: tile extent exceeds the store grid"
            )
        if info.smin < 0 or info.smax >= n_layers:
            raise ValueError(
                f"batch {batch_id}: layer range [{info.smin}, {info.smax}] "
                f"outside store shape {n_layers}"
            )
        zarrstore._write_chunks(
            meta, adir, level, version, codec=m.compressor
        )

    q = (
        spark.readStream.schema(TILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(tiles_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
