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
