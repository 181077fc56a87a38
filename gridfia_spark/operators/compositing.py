"""Latest-wins tile compositing — the row-level upsert / MERGE INTO
analogue for raster epochs.

``diff_stores``/``trend_stores`` analyze aligned epochs; this operator
BUILDS the current view from them: given tile tables in epoch order,
every ``image_id`` resolves to its newest version. The reference's only
equivalent is re-running the whole store build over the merged inputs;
on a lakehouse this is ``MERGE INTO`` — the engine form keeps the same
single-shuffle cost envelope:

  union(epoch-tagged tables)
    -> partial max_by(row, epoch) map-side   <- the load-bearing choice:
         a window (row_number over image_id) would shuffle EVERY epoch's
         bytes; max_by's partial aggregate collapses duplicates to one
         row per key per map partition BEFORE the exchange, so the
         shuffle carries ~one tile per image_id no matter how many
         epochs pile up
    -> final max_by -> unwrap back to TILE_SCHEMA

Epoch tags come from list position (oldest first), so cross-table ties
cannot happen; a DUPLICATE image_id within one epoch is the tile-table
invariant the ingest layer already enforces (`validate_tile_table`) —
compose_latest does not re-check it, and max_by picks an arbitrary one
if it is violated."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TILE_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def compose_latest(tables: list[DataFrame]) -> DataFrame:
    """Compose epoch-ordered tile tables (oldest first) into the
    latest-wins current view; output is a normal TILE_SCHEMA table."""
    if not tables:
        raise ValueError("compose_latest needs at least one table")
    tagged = None
    for epoch, t in enumerate(tables):
        e = t.select(*_TILE_COLS).withColumn("epoch", F.lit(epoch))
        tagged = e if tagged is None else tagged.unionByName(e)
    payload = F.struct(
        *[F.col(c) for c in _TILE_COLS if c != "image_id"]
    )
    out = tagged.groupBy("image_id").agg(
        F.max_by(payload, F.col("epoch")).alias("t")
    )
    return out.select(
        "image_id",
        *[F.col(f"t.{c}").alias(c) for c in _TILE_COLS if c != "image_id"],
    )
