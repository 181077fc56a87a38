"""Raster overview builder (operators/pyramid.py): exact block sums,
ragged-grid edges, hole refusal, single-quadrant-shuffle plan."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark import codecs
from gridfia_spark.constants import SPECIES, GridSpec, spec_for_sf_dir
from gridfia_spark.datagen import pixels, tiles as tgen
from gridfia_spark.operators import pyramid

SF_DIR = "/root/testdata/sf0.001"


def _numpy_overview(spec: GridSpec, f: int) -> dict[int, np.ndarray]:
    """Whole-grid reference: per-species coarse plane of f x f block sums."""
    cube = pixels.full_cube(spec).astype(np.int64)
    out = {}
    for s in range(cube.shape[0]):
        a = cube[s]
        gh, gw = a.shape
        ch, cw = gh // f, gw // f
        # ragged edge: pad is NOT allowed — trim handled per-tile below;
        # block-sum over the divisible region (specs here divide evenly
        # per tile, raggedness only happens at the tile-grid level)
        out[s] = a[: ch * f, : cw * f].reshape(ch, f, cw, f).sum(axis=(1, 3))
    return out


def _decode_rows(rows) -> dict[tuple[str], np.ndarray]:
    return {
        r["image_id"]: codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        for r in rows
    }


class TestOverview:
    def test_matches_whole_grid_block_sums(self, spark):
        spec = spec_for_sf_dir(SF_DIR)  # 2x2 tiles of 32x32
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        ovr = pyramid.build_overview(tiles, spec, factor=2)
        rows = ovr.collect()
        # 2x2 grid at factor 2 -> one output tile per species
        assert len(rows) == 6
        ref = _numpy_overview(spec, 2)
        got = _decode_rows(rows)
        for s, (code, _) in enumerate(SPECIES):
            arr = got[f"sp{code}_tx000_ty000"]
            assert arr.shape == (32, 32)
            assert np.array_equal(arr.astype(np.int64), ref[s])

    def test_ragged_grid_edges(self, spark):
        """A 3x3 tile grid at factor 2 -> 2x2 output tiles; the edge tiles
        are smaller (no zero-padding, no fabricated pixels)."""
        spec = GridSpec(3, 3, 32, 32)
        tiles = tgen.generate_tiles(spark, spec)
        ovr = pyramid.build_overview(tiles, spec, factor=2)
        rows = [r for r in ovr.collect() if r["image_id"].startswith("sp0000")]
        sizes = {
            r["image_id"].removeprefix("sp0000_"): (r["h"], r["w"]) for r in rows
        }
        assert sizes == {
            "tx000_ty000": (32, 32),
            "tx001_ty000": (32, 16),
            "tx000_ty001": (16, 32),
            "tx001_ty001": (16, 16),
        }
        ref = _numpy_overview(spec, 2)[0]  # coarse plane is 48x48
        got = _decode_rows(rows)
        assert np.array_equal(got["sp0000_tx000_ty000"].astype(np.int64), ref[:32, :32])
        assert np.array_equal(got["sp0000_tx001_ty001"].astype(np.int64), ref[32:, 32:])

    def test_interior_hole_refused(self, spark):
        """An input tile missing from the interior of an output tile's
        footprint must raise, not silently read as zeros."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR).filter(
            ~((F.col("image_id") == "sp0000_tx001_ty001"))
        )
        ovr = pyramid.build_overview(tiles, spec, factor=2)
        with pytest.raises(Exception, match="missing input"):
            ovr.collect()

    def test_plan_single_quadrant_shuffle(self, spark):
        """PLANS.md §28: exactly one hash exchange, carrying f**2-reduced
        quadrants — raw tile `bytes` never cross the network."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        plan = (
            pyramid.build_overview(tiles, spec, factor=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert m and "bytes" not in m.group(1)

    def test_indivisible_tile_dims_refused(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        with pytest.raises(ValueError, match="not divisible"):
            pyramid.build_overview(tiles, spec, factor=5)


class TestPyramid:
    def test_full_pyramid_apex_is_global_sum(self, spark):
        """Build every level down to the 1x1-pixel apex: level specs halve
        correctly through the single-tile regime, and the apex pixel equals
        the exact whole-grid sum per species (the telescoping proof that
        every level's block sums are exact)."""
        spec = spec_for_sf_dir(SF_DIR)  # 2x2 tiles of 32x32 -> 64x64 px
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        levels = pyramid.build_pyramid(tiles, spec, factor=2)
        shapes = [(sp.tiles_x, sp.tiles_y, sp.tile_w, sp.tile_h) for sp, _ in levels]
        assert shapes == [
            (1, 1, 32, 32),  # L1: one tile, 32x32 px (grid 64->32)
            (1, 1, 16, 16),
            (1, 1, 8, 8),
            (1, 1, 4, 4),
            (1, 1, 2, 2),
            (1, 1, 1, 1),  # apex
        ]
        apex_rows = levels[-1][1].collect()
        assert len(apex_rows) == len(SPECIES)
        cube = pixels.full_cube(spec).astype(np.int64)
        got = _decode_rows(apex_rows)
        for s, (code, _) in enumerate(SPECIES):
            apex = got[f"sp{code}_tx000_ty000"]
            assert apex.shape == (1, 1)
            assert int(apex[0, 0]) == int(cube[s].sum())

    def test_levels_overshoot_raises(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        with pytest.raises(ValueError, match="cannot build"):
            pyramid.build_pyramid(tiles, spec, factor=2, levels=7)

    def test_ragged_grid_auto_depth_stops_cleanly(self, spark):
        """levels=None on a grid with no uniform coarser level (3x3 at
        factor 2) returns the levels that exist instead of raising."""
        spec = GridSpec(3, 3, 32, 32)
        tiles = tgen.generate_tiles(spark, spec)
        levels = pyramid.build_pyramid(tiles, spec, factor=2)
        assert levels == []
        with pytest.raises(ValueError, match="ragged"):
            pyramid.build_pyramid(tiles, spec, factor=2, levels=1)
