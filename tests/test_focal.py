"""Focal halo-exchange operator (operators/focal.py).

The load-bearing property: the distributed two-phase computation (in-tile
interior reduced map-side, ring evaluated from perimeter strips) is
bit-identical to a single-machine whole-grid pass — tile seams are invisible
and the global boundary is excluded exactly once.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F

from gridfia_spark.constants import spec_for_sf_dir
from gridfia_spark.datagen import pixels, tiles as tgen
from gridfia_spark.operators import focal

SF_DIR = "/root/testdata/sf0.001"


def _numpy_edge_energy(spec) -> dict[tuple[int, int, int], tuple[int, int]]:
    """Whole-grid single-process reference: per-tile (energy, n_px) over
    globally interior pixels."""
    cube = pixels.full_cube(spec).astype(np.int64)
    out: dict[tuple[int, int, int], tuple[int, int]] = {}
    for s in range(cube.shape[0]):
        a = cube[s]
        lap = (
            4 * a[1:-1, 1:-1]
            - a[:-2, 1:-1]
            - a[2:, 1:-1]
            - a[1:-1, :-2]
            - a[1:-1, 2:]
        )
        e = lap * lap  # indexed by (gy-1, gx-1), gy/gx in 1..g-2
        for ty in range(spec.tiles_y):
            for tx in range(spec.tiles_x):
                y0, y1 = ty * spec.tile_h, (ty + 1) * spec.tile_h
                x0, x1 = tx * spec.tile_w, (tx + 1) * spec.tile_w
                blk = e[
                    max(y0, 1) - 1 : min(y1, spec.gh - 1) - 1,
                    max(x0, 1) - 1 : min(x1, spec.gw - 1) - 1,
                ]
                out[(s, ty, tx)] = (int(blk.sum()), int(blk.size))
    return out


class TestEdgeEnergy:
    def test_matches_whole_grid_numpy(self, spark):
        """Halo exchange == single-machine whole-grid pass, every tile,
        every layer (seams invisible, global boundary excluded)."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        got = {
            (r["s"], r["ty"], r["tx"]): (r["edge_energy"], r["n_px"])
            for r in focal.edge_energy(tiles, spec).collect()
        }
        want = _numpy_edge_energy(spec)
        assert got == want

    def test_single_layer_subset(self, spark):
        """A filtered layer subset still computes (strip rows addressed to
        absent tiles are dropped, not KeyError'd)."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR).filter(
            F.col("image_id").startswith("sp0068")  # s=2 layer only
        )
        rows = focal.edge_energy(tiles, spec).collect()
        assert len(rows) == spec.tiles_x * spec.tiles_y
        want = _numpy_edge_energy(spec)
        for r in rows:
            assert r["s"] == 2
            assert (r["edge_energy"], r["n_px"]) == want[(2, r["ty"], r["tx"])]

    def test_plan_single_perimeter_shuffle(self, spark):
        """PLANS.md contract: exactly ONE hash exchange, and it carries the
        O(perimeter) strip rows — the `bytes` column never reaches it."""
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        plan = (
            focal.edge_energy(tiles, spec)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        # post-phase-1 exchange partitions on (s, ty, tx) strip rows
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert m and "bytes" not in m.group(1)


class TestFocalStoreSum:
    @staticmethod
    def _store(spark, tmp_path):
        from gridfia_spark.sources import zarrstore

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "f.zarr")
        zarrstore.write_zarr_store(tiles, store)
        return store

    @staticmethod
    def _numpy_blur(spec) -> np.ndarray:
        """(layers, gh, gw) int64 3x3 box sums, zero-padded."""
        cube = pixels.full_cube(spec).astype(np.int64)
        P = np.zeros((cube.shape[0], spec.gh + 2, spec.gw + 2), np.int64)
        P[:, 1:-1, 1:-1] = cube
        out = np.zeros_like(cube)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out += P[:, dy : dy + spec.gh, dx : dx + spec.gw]
        return out

    def test_matches_whole_grid_numpy(self, spark, tmp_path):
        """Ghost-read stencil == single-machine padded box sum; tile
        seams and the global zero-padded boundary are both exact."""
        from gridfia_spark import codecs
        from gridfia_spark.constants import SPECIES

        spec = spec_for_sf_dir(SF_DIR)
        store = self._store(spark, tmp_path)
        rows = focal.focal_sum3x3_store(spark, store).collect()
        assert len(rows) == len(SPECIES) * spec.tiles_x * spec.tiles_y
        want = self._numpy_blur(spec)
        code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
        for r in rows:
            m = re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", r["image_id"])
            s, tx, ty = code_to_s[m.group(1)], int(m.group(2)), int(m.group(3))
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            blk = want[
                s,
                ty * spec.tile_h : (ty + 1) * spec.tile_h,
                tx * spec.tile_w : (tx + 1) * spec.tile_w,
            ]
            np.testing.assert_array_equal(a.astype(np.int64), blk)

    def test_absent_chunk_is_fill(self, spark, tmp_path):
        """Deleting a neighbor chunk zeroes its halo contribution (Zarr
        fill semantics) — the adjacent tile's border sums drop exactly."""
        import os

        from gridfia_spark import codecs

        spec = spec_for_sf_dir(SF_DIR)
        store = self._store(spark, tmp_path)
        os.remove(os.path.join(store, "biomass", "1.0.0"))
        rows = {
            r["image_id"]: r
            for r in focal.focal_sum3x3_store(spark, store, species=[1])
            .collect()
        }
        # neighbor tile (1,0): its left-edge windows lost tile (0,0)'s
        # right column
        want = self._numpy_blur(spec)[1].copy()
        cube = pixels.full_cube(spec).astype(np.int64)[1]
        tw, th = spec.tile_w, spec.tile_h
        # recompute with tile (0,0) zeroed
        cz = cube.copy()
        cz[0:th, 0:tw] = 0
        P = np.zeros((spec.gh + 2, spec.gw + 2), np.int64)
        P[1:-1, 1:-1] = cz
        wz = np.zeros_like(cz)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                wz += P[dy : dy + spec.gh, dx : dx + spec.gw]
        from gridfia_spark.constants import SPECIES

        code = SPECIES[1][0]
        a = rows[f"sp{code}_tx001_ty000"]
        got = codecs.decode(a["bytes"], a["w"], a["h"], a["fmt"]).astype(
            np.int64
        )
        np.testing.assert_array_equal(got, wz[0:th, tw : 2 * tw])
        assert not np.array_equal(got, want[0:th, tw : 2 * tw])

    def test_species_pruning_and_sharded_store(self, spark, tmp_path):
        from gridfia_spark.constants import SPECIES
        from gridfia_spark.datagen import tiles as tg
        from gridfia_spark.sources import zarrstore

        spec = spec_for_sf_dir(SF_DIR)
        store = self._store(spark, tmp_path)
        out = focal.focal_sum3x3_store(spark, store, species=[2]).collect()
        assert len(out) == spec.tiles_x * spec.tiles_y
        assert all(r["image_id"].startswith(f"sp{SPECIES[2][0]}") for r in out)
        # a SHARDED store blurs to identical pixels (neighborhood loads
        # go through the cached shard index; seams cross shard borders)
        sh = str(tmp_path / "s.zarr")
        zarrstore.write_sharded_store(
            tg.ensure_tiles(spark, SF_DIR), sh, shard_tiles=(2, 2)
        )
        from gridfia_spark import codecs as _codecs

        flat = {r["image_id"]: r for r in
                focal.focal_sum3x3_store(spark, store).collect()}
        for r in focal.focal_sum3x3_store(spark, sh).collect():
            a = _codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            f = flat[r["image_id"]]
            b = _codecs.decode(f["bytes"], f["w"], f["h"], f["fmt"])
            np.testing.assert_array_equal(a, b)

    def test_plan_is_map_only(self, spark, tmp_path):
        store = self._store(spark, tmp_path)
        plan = (
            focal.focal_sum3x3_store(spark, store)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan


class TestFocalMinMax:
    @staticmethod
    def _numpy_stat(spec, stat):
        """(layers, gh, gw) focal min/max over EXISTING 3x3 neighbors."""
        cube = pixels.full_cube(spec).astype(np.int64)
        n, gh, gw = cube.shape
        big = np.int64(1) << 40
        pad_v = -1 if stat == "max" else big
        P = np.full((n, gh + 2, gw + 2), pad_v, np.int64)
        P[:, 1:-1, 1:-1] = cube
        planes = [
            P[:, a : a + gh, b : b + gw]
            for a in (0, 1, 2)
            for b in (0, 1, 2)
        ]
        return (np.max if stat == "max" else np.min)(planes, axis=0)

    def test_min_and_max_match_numpy(self, spark, tmp_path):
        import re as _re

        from gridfia_spark import codecs
        from gridfia_spark.constants import SPECIES
        from gridfia_spark.sources import zarrstore

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "f.zarr")
        zarrstore.write_zarr_store(tiles, store)
        code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
        for stat in ("min", "max"):
            want = self._numpy_stat(spec, stat)
            for r in focal.focal_sum3x3_store(
                spark, store, stat=stat
            ).collect():
                m = _re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", r["image_id"])
                s = code_to_s[m.group(1)]
                tx, ty = int(m.group(2)), int(m.group(3))
                got = codecs.decode(
                    r["bytes"], r["w"], r["h"], r["fmt"]
                ).astype(np.int64)
                blk = want[
                    s,
                    ty * spec.tile_h : (ty + 1) * spec.tile_h,
                    tx * spec.tile_w : (tx + 1) * spec.tile_w,
                ]
                np.testing.assert_array_equal(got, blk, err_msg=stat)

    def test_bad_stat_refused(self, spark, tmp_path):
        import pytest as _pt

        from gridfia_spark.sources import zarrstore

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "g.zarr")
        zarrstore.write_zarr_store(tiles, store)
        with _pt.raises(ValueError, match="unsupported focal stat"):
            focal.focal_sum3x3_store(spark, store, stat="median")
