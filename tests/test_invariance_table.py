"""Parallelism-invariance (SURVEY M8 / test_forest_metrics_pipeline.py:188
analogue), table-layer roundtrip, and knn ring-expansion tests."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.operators import knn
from gridfia_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"

_INVARIANCE_SNIPPET = """
import sys, json; sys.path.insert(0, "/root/repo")
from gridfia_spark.session import get_spark
from gridfia_spark import queries as Q
from gridfia_spark.queries_products import (
    zonal_percentiles, wav_audio_stats, zorder_layout, sequence_packing,
    spend_quartiles, zonal_skewed, webp_tile_stats)
spark = get_spark(cores={cores}, shuffle_partitions={sh})
pdf = Q.zonal_total_biomass(spark, "/root/testdata/sf0.001").toPandas()
pdf = pdf.sort_values("poly_id", ignore_index=True)
pct = zonal_percentiles(spark, "/root/testdata/sf0.001").toPandas()
pct = pct.sort_values("poly_id", ignore_index=True)
wav = wav_audio_stats(spark, "/root/testdata/sf0.001").toPandas()
wav = wav.sort_values("doc_id", ignore_index=True)
zo = zorder_layout(spark, "/root/testdata/sf0.001").toPandas()
zo = zo.sort_values("bucket", ignore_index=True)
# prefix-sum range-partition boundaries change with parallelism; the
# packing result must not
sp = sequence_packing(spark, "/root/testdata/sf0.001").toPandas()
sp = sp.sort_values("bin", ignore_index=True)
# round-4: distributed-rank NTILE (prefix buckets change with cores),
# salted zonal, and the VP8L transcode chain must all be invariant
sq = spend_quartiles(spark, "/root/testdata/sf0.001").toPandas()
sq = sq.sort_values("quartile", ignore_index=True)
zk = zonal_skewed(spark, "/root/testdata/sf0.001").toPandas()
zk = zk.sort_values("poly_id", ignore_index=True)
wb = webp_tile_stats(spark, "/root/testdata/sf0.001").toPandas()
wb = wb.sort_values("image_id", ignore_index=True)
# round-5: blosc store roundtrip (pure-python LZ4 chunks written by many
# tasks) and the COG strip scan (range-read partitioning changes with
# cores) must both be invariant
from gridfia_spark.queries_io import zarr_blosc_roundtrip, geotiff_strip_scan
zb = zarr_blosc_roundtrip(spark, "/root/testdata/sf0.001").toPandas()
zb = zb.sort_values("image_id", ignore_index=True)
gs = geotiff_strip_scan(spark, "/root/testdata/sf0.001").toPandas()
gs = gs.sort_values("strip", ignore_index=True)
# round-5 late: halo-exchange stencil (strip routing changes with task
# layout) and the overview mosaic (quadrant grouping) must be invariant
ee = Q.edge_energy(spark, "/root/testdata/sf0.001").toPandas()
ee = ee.sort_values(["s", "ty", "tx"], ignore_index=True)
ov = Q.overview_stats(spark, "/root/testdata/sf0.001").toPandas()
ov = ov.sort_values("image_id", ignore_index=True)
# round-5 session 4: the warp gather (one shuffle whose contribution
# grouping changes with cores) must assemble identical target tiles
wr = Q.warp_regrid(spark, "/root/testdata/sf0.001").toPandas()
wr = wr.sort_values("image_id", ignore_index=True)
# round-5 session 3: shard assembly (one shuffle whose grouping changes
# with cores) and the multiscale pyramid (levels re-read from persisted
# chunks written at different parallelism) must be invariant
from gridfia_spark.queries_io import zarr_sharded_roundtrip, zarr_multiscale
zs = zarr_sharded_roundtrip(spark, "/root/testdata/sf0.001").toPandas()
zs = zs.sort_values("image_id", ignore_index=True)
zm = zarr_multiscale(spark, "/root/testdata/sf0.001").toPandas()
zm = zm.sort_values(["lvl", "image_id"], ignore_index=True)
# round-6: the sorted batch-grouping metric pass holds a tile group across
# Arrow batch boundaries — partition layout and batch splits change with
# cores/shuffle settings, results must not
mx = Q.metrics_pixel(spark, "/root/testdata/sf0.001").toPandas()
mx = mx.sort_values(["gx", "gy"], ignore_index=True)
print("RESULT" + json.dumps({{"zonal": pdf.to_dict("records"),
                              "sharded": zs.to_dict("records"),
                              "multiscale": zm.to_dict("records"),
                              "pct": pct.to_dict("records"),
                              "wav": wav.to_dict("records"),
                              "zorder": zo.to_dict("records"),
                              "pack": sp.to_dict("records"),
                              "quartiles": sq.to_dict("records"),
                              "skewed": zk.to_dict("records"),
                              "webp": wb.to_dict("records"),
                              "blosc": zb.to_dict("records"),
                              "stripscan": gs.to_dict("records"),
                              "edge": ee.to_dict("records"),
                              "overview": ov.to_dict("records"),
                              "warp": wr.to_dict("records"),
                              "metrics": mx.to_dict("records")}}))
spark.stop()
"""


def _run_at(cores: int, shuffle: int) -> list[dict]:
    out = subprocess.run(
        [sys.executable, "-c", _INVARIANCE_SNIPPET.format(cores=cores, sh=shuffle)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[6:])
    raise AssertionError(f"no RESULT line; stderr tail: {out.stderr[-500:]}")


class TestParallelismInvariance:
    def test_local1_equals_local4(self):
        """Zonal sums AND histogram percentiles must be bit-identical across
        parallelism levels and shuffle-partition settings (deterministic
        per-tile partials; the histogram percentile walk is order-free)."""
        a = _run_at(1, 2)
        b = _run_at(4, 16)
        assert a == b


class TestTableLayer:
    def test_parquet_roundtrip(self, spark, tmp_path):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        target = str(tmp_path / "tiles_table")
        backend = table.write_tiles(tiles, target)
        assert backend == "parquet"  # no Iceberg jar in the sandbox
        back = table.read_tiles(spark, target)
        a = {r.image_id: (bytes(r.bytes), r.caption, r.phash) for r in tiles.collect()}
        b = {r.image_id: (bytes(r.bytes), r.caption, r.phash) for r in back.collect()}
        assert a == b

    def test_layout_columns(self, spark):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        e = table.enriched_tiles(tiles)
        row = e.filter(F.col("image_id") == "sp0131_tx001_ty000").first()
        assert row.species_code == "0131" and (row.tile_x, row.tile_y) == (1, 0)
        assert row.cell_id > 0


class TestKnnRingExpansion:
    def test_tiny_cells_force_expansion(self, spark):
        """At a very fine resolution the initial ring can't hold k neighbors;
        the radius-doubling loop must still return exact results."""
        pts = tgen.points_df(spark, SF_DIR)
        fine = knn.knn_join(pts, pts, k=3, res=20, init_radius=1, max_radius=4096)
        coarse = knn.knn_join(pts, pts, k=3, res=14)
        a = {(r.point_id, r.rank): (r.neighbor_id, r.dist_sq) for r in fine.collect()}
        b = {(r.point_id, r.rank): (r.neighbor_id, r.dist_sq) for r in coarse.collect()}
        assert a == b
