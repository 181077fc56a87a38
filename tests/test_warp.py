"""Distributed nearest-neighbor regrid (operators/warp.py): whole-grid
numpy equivalence, identity mapping, hole refusal, output-pixels-only
shuffle plan, extent validation."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark import codecs
from gridfia_spark.constants import SPECIES, spec_for_sf_dir
from gridfia_spark.datagen import pixels, tiles as tgen
from gridfia_spark.operators import warp

SF_DIR = "/root/testdata/sf0.001"
MAP_X = (3, 2, 1)  # downscale 3/2 with half-pixel shift
MAP_Y = (2, 3, 1)  # upscale 3/2


def _assemble(rows, t_w, t_h) -> dict[int, np.ndarray]:
    """Stitch warped tile rows back into per-layer full planes."""
    planes = {s: np.full((t_h, t_w), np.nan, np.float32) for s in range(len(SPECIES))}
    code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
    for r in rows:
        m = re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", r["image_id"])
        s, tx, ty = code_to_s[m.group(1)], int(m.group(2)), int(m.group(3))
        a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        spec = spec_for_sf_dir(SF_DIR)
        planes[s][
            ty * spec.tile_h : ty * spec.tile_h + r["h"],
            tx * spec.tile_w : tx * spec.tile_w + r["w"],
        ] = a
    return planes


class TestWarp:
    def test_matches_whole_grid_numpy(self, spark):
        """Anisotropic warp == single-machine fancy-index of the full cube."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        t_w, t_h = warp.warp_extent(spec, MAP_X, MAP_Y)
        rows = warp.warp_tiles(tiles, spec, MAP_X, MAP_Y).collect()
        assert len(rows) == len(SPECIES) * -(-t_w // spec.tile_w) * -(
            -t_h // spec.tile_h
        )
        planes = _assemble(rows, t_w, t_h)
        cube = pixels.full_cube(spec)
        sgx = (np.arange(t_w) * MAP_X[0] + MAP_X[2]) // MAP_X[1]
        sgy = (np.arange(t_h) * MAP_Y[0] + MAP_Y[2]) // MAP_Y[1]
        for s in range(len(SPECIES)):
            want = cube[s][np.ix_(sgy, sgx)]
            np.testing.assert_array_equal(planes[s], want)

    def test_identity_mapping_reproduces_tiles(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        out = warp.warp_tiles(tiles, spec, (1, 1, 0), (1, 1, 0)).collect()
        src = {r["image_id"]: r for r in tiles.collect()}
        assert set(src) == {r["image_id"] for r in out}
        for r in out:
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            o = src[r["image_id"]]
            b = codecs.decode(o["bytes"], o["w"], o["h"], o["fmt"])
            np.testing.assert_array_equal(a, b)

    def test_missing_source_tile_raises(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR).filter(
            F.col("image_id") != "sp0000_tx001_ty001"
        )
        with pytest.raises(Exception, match="no source contribution"):
            warp.warp_tiles(tiles, spec, MAP_X, MAP_Y).collect()

    def test_plan_single_exchange_no_tile_bytes(self, spark):
        """One hash exchange keyed on (s, tty, ttx); the shuffled columns
        are the packed output pixels, never the raw tile `bytes`."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        plan = (
            warp.warp_tiles(tiles, spec, MAP_X, MAP_Y)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert m and "bytes" not in m.group(1)

    def test_extent_validation(self):
        spec = spec_for_sf_dir(SF_DIR)
        assert warp.warp_extent(spec, (1, 1, 0), (1, 1, 0)) == (
            spec.gw,
            spec.gh,
        )
        # downscale 3/2 with +1/2 shift over 64 px: ceil((64*2-1)/3) = 43
        assert warp.warp_extent(spec, MAP_X, MAP_Y) == (43, 96)
        with pytest.raises(ValueError, match="positive"):
            warp.warp_extent(spec, (0, 1, 0), (1, 1, 0))
        with pytest.raises(ValueError, match="past the"):
            warp.warp_extent(spec, (1, 1, spec.gw), (1, 1, 0))


class TestWarpBilinear:
    @staticmethod
    def _numpy_num(spec, map_x, map_y):
        """(layers, t_h, t_w) int64 bilinear NUMERATOR plane with edge
        clamp — the single-machine reference."""
        cube = pixels.full_cube(spec).astype(np.int64)
        nx, dx, ox = map_x
        ny, dy, oy = map_y
        t_w, t_h = warp.warp_extent(spec, map_x, map_y)
        px = np.arange(t_w) * nx + ox
        py = np.arange(t_h) * ny + oy
        x0, rx = px // dx, px % dx
        y0, ry = py // dy, py % dy
        x1 = np.minimum(x0 + 1, spec.gw - 1)
        y1 = np.minimum(y0 + 1, spec.gh - 1)
        wx0, wx1 = dx - rx, rx
        wy0, wy1 = dy - ry, ry
        out = np.zeros((cube.shape[0], t_h, t_w), dtype=np.int64)
        for s in range(cube.shape[0]):
            a = cube[s]
            out[s] = (
                wy0[:, None] * wx0[None, :] * a[np.ix_(y0, x0)]
                + wy0[:, None] * wx1[None, :] * a[np.ix_(y0, x1)]
                + wy1[:, None] * wx0[None, :] * a[np.ix_(y1, x0)]
                + wy1[:, None] * wx1[None, :] * a[np.ix_(y1, x1)]
            )
        return out

    def test_matches_whole_grid_numpy(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        rows = warp.warp_tiles_bilinear(tiles, spec, MAP_X, MAP_Y).collect()
        t_w, t_h = warp.warp_extent(spec, MAP_X, MAP_Y)
        want = self._numpy_num(spec, MAP_X, MAP_Y)
        planes = _assemble(rows, t_w, t_h)
        for s in range(len(SPECIES)):
            np.testing.assert_array_equal(
                planes[s].astype(np.int64), want[s]
            )

    def test_identity_map_is_source(self, spark):
        """(1,1,0) both axes: r=0 everywhere, D=1 — output == input."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        out = warp.warp_tiles_bilinear(
            tiles, spec, (1, 1, 0), (1, 1, 0)
        ).collect()
        src = {r["image_id"]: r for r in tiles.collect()}
        for r in out:
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            o = src[r["image_id"]]
            b = codecs.decode(o["bytes"], o["w"], o["h"], o["fmt"])
            np.testing.assert_array_equal(a, b)

    def test_missing_tile_fails_weight_mass(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR).filter(
            F.col("image_id") != "sp0000_tx000_ty000"
        )
        with pytest.raises(Exception, match="weight mass"):
            warp.warp_tiles_bilinear(tiles, spec, MAP_X, MAP_Y).collect()

    def test_plan_single_exchange_no_tile_bytes(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        plan = (
            warp.warp_tiles_bilinear(tiles, spec, MAP_X, MAP_Y)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert m and "bytes" not in m.group(1)


class TestWarpStore:
    def test_store_warp_writes_composed_georeferencing(self, spark, tmp_path):
        """warp_store's destination carries the SCALED affine, not a
        copy of the source's — and a chained warp composes again."""
        from gridfia_spark.constants import PIX, X0, Y0
        from gridfia_spark.sources import zarrstore

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        src = str(tmp_path / "src.zarr")
        zarrstore.write_zarr_store(tiles, src)
        dst = str(tmp_path / "dst.zarr")
        n = warp.warp_store(spark, src, dst, (2, 1, 0), (2, 1, 0))
        spec = spec_for_sf_dir(SF_DIR)
        assert n == len(SPECIES)  # 2x downscale of a 2x2 tile grid
        m = zarrstore.zarr_meta(dst)
        # zarr_meta merges array-level attrs (GDAL order) over root
        # (Affine order) — normalize before asserting
        t = zarrstore._affine_order(m.attrs["transform"])
        assert t[0] == PIX * 2 and t[4] == -PIX * 2  # doubled pixel
        assert t[2] == X0 and t[5] == Y0
        # pixels equal the direct tile-table warp
        back = zarrstore.read_zarr_store(spark, dst)
        direct = warp.warp_tiles(tiles, spec, (2, 1, 0), (2, 1, 0))
        want = {r["image_id"]: r for r in direct.collect()}
        for r in back.collect():
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            o = want[r["image_id"]]
            b = codecs.decode(o["bytes"], o["w"], o["h"], o["fmt"])
            np.testing.assert_array_equal(a, b)
        # chained: warp the warped store again -> 4x pixel size
        dst2 = str(tmp_path / "dst2.zarr")
        warp.warp_store(spark, dst, dst2, (2, 1, 1), (2, 1, 0))
        t2 = zarrstore._affine_order(zarrstore.zarr_meta(dst2).attrs["transform"])
        assert t2[0] == PIX * 4
        assert t2[2] == X0 + PIX * 2  # off=1 target px = 1 src px of dst

    def test_affine_composition_math(self):
        t = warp.warp_affine([30.0, 0, -2e6, 0, -30.0, -9e5], (3, 2, 1), (2, 3, 1))
        assert t[0] == 45.0 and t[4] == -20.0
        assert t[2] == -2e6 + 15.0 and t[5] == -9e5 - 10.0
        import pytest as _pt

        with _pt.raises(ValueError, match="axis-aligned"):
            warp.warp_affine([30, 1, 0, 0, -30, 0], (1, 1, 0), (1, 1, 0))
