"""Integration tests: Spark operators vs the single-process numpy oracle.

The Spark analogue of the reference's pipeline suite
(tests/integration/test_forest_metrics_pipeline.py): engine output must match
a sequential numpy re-implementation exactly (rows/ids) or to float64
determinism (sums), including on concave polygons the SQL oracle can't check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridfia_spark import geom
from gridfia_spark.constants import PIX, SF_SPECS, X0, Y0
from gridfia_spark.datagen import pixels, tiles as tgen, vectors
from gridfia_spark.operators import decode, knn, metrics, spatial_join, zonal

SF_DIR = "/root/testdata/sf0.001"
SPEC = SF_SPECS["0.001"]


@pytest.fixture(scope="module")
def tiles(spark):
    return tgen.ensure_tiles(spark, SF_DIR)


@pytest.fixture(scope="module")
def polys(spark):
    return tgen.polygons_df(spark, SF_DIR)


def oracle_zonal(poly: vectors.Polygon, species: int = 0) -> tuple[int, float, float, int]:
    cube = pixels.full_cube(SPEC)
    layer = cube[species].astype(np.float64)
    gy, gx = np.meshgrid(np.arange(SPEC.gh), np.arange(SPEC.gw), indexing="ij")
    x = X0 + gx * PIX + PIX / 2
    y = Y0 - gy * PIX - PIX / 2
    inside = geom.points_in_polygon(x.ravel(), y.ravel(), poly.rings)
    v = layer.ravel()[inside]
    return int(v.size), float(v.sum()), float(v.max()) if v.size else 0.0, int((v > 0).sum())


class TestZonal:
    def test_all_polygons_vs_oracle(self, spark, tiles, polys):
        got = {
            r.poly_id: r
            for r in zonal.zonal_stats(tiles, polys, species=0).collect()
        }
        for p in vectors.all_polygons(SPEC):
            n, s, mx, nz = oracle_zonal(p)
            if n == 0:
                assert p.poly_id not in got  # empty-join polygon (X01)
                continue
            r = got[p.poly_id]
            assert (r.n_px, r.sum_v, r.max_v, r.nonzero_px) == (n, s, mx, nz), p.poly_id

    def test_counties_partition_extent(self, spark, tiles, polys):
        """Counties tile the extent: per-county pixel counts sum to the total."""
        rect = polys.filter(F.col("is_rect"))
        out = zonal.zonal_stats(tiles, rect, species=0)
        assert out.agg(F.sum("n_px")).first()[0] == SPEC.gw * SPEC.gh


class TestTileAssignment:
    def test_vs_oracle(self, spark, tiles, polys):
        meta = decode.with_tile_meta(tiles)
        got = {
            (r.poly_id, r.image_id)
            for r in spatial_join.assign_tiles(meta, polys).collect()
        }
        want = set()
        eps = 1e-3
        for p in vectors.all_polygons(SPEC):
            for r in meta.select("image_id", "xmin", "ymin", "xmax", "ymax").collect():
                rel = geom.rect_relation(
                    p.rings, r.xmin + eps, r.ymin + eps, r.xmax - eps, r.ymax - eps
                )
                if rel != "outside":
                    want.add((p.poly_id, r.image_id))
        assert got == want


class TestPointJoin:
    def test_vs_oracle_all_polygons(self, spark, polys):
        pts = tgen.points_df(spark, SF_DIR)
        got = {
            (r.point_id, r.poly_id)
            for r in spatial_join.join_points_polygons(pts, polys).collect()
        }
        ids, xs, ys = vectors.points_xy(SPEC, vectors.N_POINTS["0.001"])
        want = set()
        for p in vectors.all_polygons(SPEC):
            inside = geom.points_in_polygon(xs, ys, p.rings)
            want |= {(int(i), p.poly_id) for i in ids[inside]}
        assert got == want


class TestKnn:
    def test_vs_bruteforce(self, spark):
        pts = tgen.points_df(spark, SF_DIR)
        got = knn.knn_join(pts, pts, k=3).toPandas()
        ids, xs, ys = vectors.points_xy(SPEC, vectors.N_POINTS["0.001"])
        for qi in range(0, len(ids), 17):
            d = (xs - xs[qi]) ** 2 + (ys - ys[qi]) ** 2
            order = sorted(
                [(float(d[j]), int(ids[j])) for j in range(len(ids)) if j != qi]
            )[:3]
            mine = got[got.point_id == qi].sort_values("rank")
            assert [(r.dist_sq, r.neighbor_id) for r in mine.itertuples()] == order


class TestMetricsPipeline:
    def test_pixel_metrics_vs_cube(self, spark, tiles):
        specs = [
            metrics.MetricSpec("richness", "species_richness", {}, "long"),
            metrics.MetricSpec("total_v", "total_biomass", {}, "double"),
            metrics.MetricSpec("shannon", "shannon_diversity", {}, "double"),
            metrics.MetricSpec("dominant", "dominant_species", {}, "long"),
        ]
        out = (
            metrics.metric_layers(tiles, specs)
            .toPandas()
            .sort_values(["gy", "gx"], ignore_index=True)
        )
        cube = pixels.full_cube(SPEC)
        from gridfia_spark.functions import kernels

        np.testing.assert_array_equal(
            out["richness"].to_numpy().reshape(SPEC.gh, SPEC.gw),
            kernels.species_richness(cube).astype(np.int64),
        )
        np.testing.assert_array_equal(
            out["total_v"].to_numpy().reshape(SPEC.gh, SPEC.gw),
            kernels.total_biomass(cube),
        )
        np.testing.assert_array_equal(
            out["shannon"].to_numpy().reshape(SPEC.gh, SPEC.gw),
            kernels.shannon_diversity(cube),
        )
        np.testing.assert_array_equal(
            out["dominant"].to_numpy().reshape(SPEC.gh, SPEC.gw),
            kernels.dominant_species(cube).astype(np.int64),
        )

    def test_global_rare_common(self, spark, tiles):
        """Global-scope rare/common: engine two-phase agg == whole-cube numpy."""
        out = (
            metrics.rare_common_layers(tiles, rare_threshold=0.05, common_threshold=0.5)
            .toPandas()
            .sort_values(["gy", "gx"], ignore_index=True)
        )
        cube = pixels.full_cube(SPEC)
        from gridfia_spark.functions import kernels

        rare = kernels.rare_species(cube, occurrence_threshold=0.05)
        common = kernels.common_species(cube, occurrence_threshold=0.5)
        np.testing.assert_array_equal(
            out["rare_cnt"].to_numpy().reshape(SPEC.gh, SPEC.gw), rare.astype(np.int64)
        )
        np.testing.assert_array_equal(
            out["common_cnt"].to_numpy().reshape(SPEC.gh, SPEC.gw),
            common.astype(np.int64),
        )


class TestRowInvariants:
    def test_caption_and_phash_per_row(self, spark, tiles):
        """Per-row contract: caption equality + phash vs the pure generator."""
        from gridfia_spark import codecs
        from gridfia_spark.constants import SPECIES, caption as mk_caption

        rows = tiles.collect()
        assert len(rows) == SPEC.n_images
        code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
        for r in rows:
            code = r.image_id[2:6]
            tx = int(r.image_id[9:12])
            ty = int(r.image_id[15:18])
            s = code_to_s[code]
            want_px = pixels.tile_pixels(s, tx, ty, SPEC)
            got_px = codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt)
            np.testing.assert_array_equal(got_px, want_px)
            assert r.caption == mk_caption(code, SPECIES[s][1], tx, ty)
            assert r.phash == pixels.phash64(want_px)

    def test_lossy_rows_psnr_gate(self, spark):
        from gridfia_spark import codecs

        mixed = tgen.generate_tiles(spark, SPEC, fmt="mixed")
        lossy = mixed.filter(F.col("fmt") == "qnt8").collect()
        assert lossy  # the mixed policy produced lossy rows
        from gridfia_spark.constants import SPECIES

        code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
        for r in lossy:
            s = code_to_s[r.image_id[2:6]]
            tx, ty = int(r.image_id[9:12]), int(r.image_id[15:18])
            want = pixels.tile_pixels(s, tx, ty, SPEC)
            got = codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt)
            assert codecs.psnr(want, got) >= 40.0


class TestBroadcastJoinEquivalence:
    """The map-side broadcast path must produce identical results to the
    DataFrame cell-join path (both vs the numpy oracle elsewhere)."""

    def test_assign_equal(self, spark, tiles, polys):
        from gridfia_spark.operators import broadcast_join

        meta = decode.with_tile_meta(tiles)
        slow = {
            (r.poly_id, r.image_id)
            for r in spatial_join.assign_tiles(meta, polys, res=14).collect()
        }
        fast = {
            (r.poly_id, r.image_id)
            for r in broadcast_join.assign_tiles_fast(meta, polys, res=14).collect()
        }
        assert fast == slow

    def test_zonal_equal(self, spark, tiles, polys):
        from gridfia_spark.operators import broadcast_join

        slow = {
            r.poly_id: (r.n_px, r.sum_v, r.max_v, r.nonzero_px)
            for r in zonal.zonal_stats(tiles, polys, species=0, res=14).collect()
        }
        fast = {
            r.poly_id: (r.n_px, r.sum_v, r.max_v, r.nonzero_px)
            for r in broadcast_join.zonal_stats_fast(
                tiles, polys, species=0, res=14
            ).collect()
        }
        assert fast == slow


class TestManyPolygons:
    """The DataFrame cell-join path is the plan for large polygon dims —
    exercise it with a 10x10 grid of 100 small counties and check both paths
    agree (and against the exhaustive pixel oracle for a sample)."""

    def test_dense_polygon_grid(self, spark, tiles):
        from gridfia_spark import geom
        from gridfia_spark.operators import broadcast_join

        n = 10
        w_m, h_m = SPEC.gw * PIX, SPEC.gh * PIX
        wc, hc = w_m / n, h_m / n
        rows = []
        for j in range(n):
            for i in range(n):
                rings = geom.rect_polygon(
                    X0 + i * wc, Y0 - (j + 1) * hc, X0 + (i + 1) * wc, Y0 - j * hc
                )
                xmin, ymin, xmax, ymax = geom.polygon_bounds(rings)
                rows.append(
                    (f"G{j:02d}{i:02d}", f"g{j}{i}", bytearray(geom.polygon_to_wkb(rings)),
                     xmin, ymin, xmax, ymax, True)
                )
        polys = spark.createDataFrame(
            rows,
            "poly_id string, name string, geom_wkb binary, "
            "xmin double, ymin double, xmax double, ymax double, is_rect boolean",
        )
        slow = {
            r.poly_id: (r.n_px, r.sum_v)
            for r in zonal.zonal_stats(tiles, polys, species=0, res=16).collect()
        }
        fast = {
            r.poly_id: (r.n_px, r.sum_v)
            for r in broadcast_join.zonal_stats_fast(tiles, polys, species=0, res=16).collect()
        }
        assert fast == slow
        assert len(fast) == 100
        # the grid partitions the extent: counts sum to every pixel
        assert sum(v[0] for v in fast.values()) == SPEC.gw * SPEC.gh
        # exhaustive pixel-center oracle for one corner + one interior cell
        # (polygons are NOT pixel-aligned: 64 px / 10 cells)
        cube = pixels.full_cube(SPEC)
        gy, gx = np.meshgrid(np.arange(SPEC.gh), np.arange(SPEC.gw), indexing="ij")
        cx = X0 + gx * PIX + PIX / 2
        cy = Y0 - gy * PIX - PIX / 2
        for pid in ("G0000", "G0505"):
            j, i = int(pid[1:3]), int(pid[3:5])
            inside = (
                (cx > X0 + i * wc) & (cx < X0 + (i + 1) * wc)
                & (cy < Y0 - j * hc) & (cy > Y0 - (j + 1) * hc)
            )
            vals = cube[0][inside].astype(np.float64)
            assert fast[pid] == (int(vals.size), float(vals.sum()))

    def _poly_grid(self, spark, n=10):
        w_m, h_m = SPEC.gw * PIX, SPEC.gh * PIX
        wc, hc = w_m / n, h_m / n
        rows = []
        for j in range(n):
            for i in range(n):
                rings = geom.rect_polygon(
                    X0 + i * wc, Y0 - (j + 1) * hc, X0 + (i + 1) * wc, Y0 - j * hc
                )
                xmin, ymin, xmax, ymax = geom.polygon_bounds(rings)
                rows.append(
                    (f"G{j:02d}{i:02d}", f"g{j}{i}", bytearray(geom.polygon_to_wkb(rings)),
                     xmin, ymin, xmax, ymax, True)
                )
        return spark.createDataFrame(
            rows,
            "poly_id string, name string, geom_wkb binary, "
            "xmin double, ymin double, xmax double, ymax double, is_rect boolean",
        )

    def test_distributed_covering_equals_driver_covering(self, spark, tiles):
        """polygon_cells_dist (mapInPandas) must produce the identical
        covering set as the driver-side polygon_cells_df, and the zonal
        result through the distributed path must match the broadcast path —
        on the 100-county dense grid plus the concave fixtures."""
        from gridfia_spark.operators import broadcast_join

        dense = self._poly_grid(spark)
        concave = tgen.polygons_df(spark, "sf0.001").filter(~F.col("is_rect"))
        polys = dense.unionByName(concave)
        drv = {
            (r.poly_id, r.cell_id, r.fully_inside)
            for r in spatial_join.polygon_cells_df(spark, polys, res=16).collect()
        }
        dist = {
            (r.poly_id, r.cell_id, r.fully_inside)
            for r in spatial_join.polygon_cells_dist(polys, res=16).collect()
        }
        assert dist == drv and len(dist) > 0

        via_dist = {
            r.poly_id: (r.n_px, r.sum_v)
            for r in zonal.zonal_stats(
                tiles, polys, species=0, res=16, distributed=True
            ).collect()
        }
        via_bcast = {
            r.poly_id: (r.n_px, r.sum_v)
            for r in broadcast_join.zonal_stats_fast(tiles, polys, species=0, res=16).collect()
        }
        assert via_dist == via_bcast
        assert len(via_dist) >= 100  # every dense cell + overlapping concave
