"""Streaming store ingest (streaming/storeingest.py): batch validation
failure paths — the happy path (chunk counts, mtime stability, checkpoint
incrementality, full-store oracle) is asserted inside the
`streaming_store_ingest` gate query itself."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark import codecs
from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.datagen.tiles import TILE_SCHEMA
from gridfia_spark.sources import zarrstore
from gridfia_spark.streaming import storeingest

SF_DIR = "/root/testdata/sf0.001"


def _store(spark, tmp_path):
    tiles = tgen.ensure_tiles(spark, SF_DIR)
    store = str(tmp_path / "cube.zarr")
    zarrstore.write_zarr_store(tiles, store)
    return store


class TestStoreIngestValidation:
    def test_sharded_store_refused(self, spark, tmp_path):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        sh = str(tmp_path / "s.zarr")
        zarrstore.write_sharded_store(tiles, sh, shard_tiles=(2, 2))
        with pytest.raises(ValueError, match="flat chunk layout"):
            storeingest.incremental_store_ingest(
                spark, str(tmp_path / "drops"), sh, str(tmp_path / "w")
            )

    def test_dim_mismatch_batch_fails(self, spark, tmp_path):
        store = _store(spark, tmp_path)
        bad = np.zeros((8, 8), dtype=np.float32)
        row = [(
            "sp0131_tx000_ty000", codecs.encode(bad, "rawz"), 8, 8,
            "rawz", "species=0131;bad", 0,
        )]
        drops = str(tmp_path / "drops")
        spark.createDataFrame(row, TILE_SCHEMA).write.parquet(drops)
        with pytest.raises(Exception, match="tile dims"):
            storeingest.incremental_store_ingest(
                spark, drops, store, str(tmp_path / "w")
            )

    def test_extent_violation_fails(self, spark, tmp_path):
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        store = _store(spark, tmp_path)
        arr = np.zeros((spec.tile_h, spec.tile_w), dtype=np.float32)
        row = [(
            f"sp0131_tx{spec.tiles_x + 3:03d}_ty000",
            codecs.encode(arr, "rawz"), spec.tile_w, spec.tile_h,
            "rawz", "species=0131;off-grid", 0,
        )]
        drops = str(tmp_path / "drops")
        spark.createDataFrame(row, TILE_SCHEMA).write.parquet(drops)
        with pytest.raises(Exception, match="exceeds the store grid"):
            storeingest.incremental_store_ingest(
                spark, drops, store, str(tmp_path / "w")
            )

    def test_ingested_chunks_byte_identical_to_batch_write(
        self, spark, tmp_path
    ):
        """The streamed chunk file must be byte-identical to what the
        batch writer produces — the determinism the exactly-once
        argument rests on."""
        import os

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        full = str(tmp_path / "full.zarr")
        zarrstore.write_zarr_store(tiles, full)
        part = str(tmp_path / "part.zarr")
        keep = (F.col("tx") + F.col("ty")) % 2 == 0
        from gridfia_spark.operators import decode as dec

        meta = dec.with_tile_meta(tiles)
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        zarrstore.write_zarr_store(meta.filter(keep).select(*cols), part)
        drops = str(tmp_path / "drops")
        meta.filter(~keep).select(*cols).write.parquet(drops)
        storeingest.incremental_store_ingest(
            spark, drops, part, str(tmp_path / "w")
        )
        a, b = os.path.join(full, "biomass"), os.path.join(part, "biomass")
        names = sorted(
            f for f in os.listdir(a) if f.count(".") == 2
        )
        assert names == sorted(f for f in os.listdir(b) if f.count(".") == 2)
        for f in names:
            assert open(os.path.join(a, f), "rb").read() == open(
                os.path.join(b, f), "rb"
            ).read(), f
