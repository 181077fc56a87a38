"""Z-order layout: bit-interleave formula vs the vectorized grid.py Morton
helpers, locality vs row-major, and the driver query's 2x2-block invariant."""

from __future__ import annotations

import numpy as np

from gridfia_spark import grid


def _zkey_formula(tx: np.ndarray, ty: np.ndarray, bits: int = 8) -> np.ndarray:
    """The query/oracle formulation: sum of shifted bit picks."""
    z = np.zeros_like(tx, dtype=np.int64)
    for b in range(bits):
        z += (((tx >> b) & 1) << (2 * b)) + (((ty >> b) & 1) << (2 * b + 1))
    return z


def test_formula_matches_grid_morton():
    """The SQL-portable sum-of-bits formula equals grid.py's magic-constant
    interleave (x on even bits, y on odd bits) — one Morton order engine-wide."""
    rng = np.random.default_rng(3)
    tx = rng.integers(0, 256, size=500).astype(np.int64)
    ty = rng.integers(0, 256, size=500).astype(np.int64)
    ref = (grid._part1by1(tx) | (grid._part1by1(ty) << np.uint64(1))).astype(
        np.int64
    )
    np.testing.assert_array_equal(_zkey_formula(tx, ty), ref)


def test_z_blocks_are_squares_row_major_blocks_are_stripes():
    """The storage-layout claim: equal-size file groups cut by zkey have
    bounded max side (compact squares), row-major groups degrade to full-width
    stripes — so parquet (tx, ty) min/max stats prune bbox queries only under
    the z layout."""
    n = 32
    ty, tx = np.mgrid[0:n, 0:n]
    tx, ty = tx.ravel().astype(np.int64), ty.ravel().astype(np.int64)
    z = _zkey_formula(tx, ty)
    for key, max_side in ((z // 16, 4), ((ty * n + tx) // 16, 16)):
        sides = []
        for k in np.unique(key):
            m = key == k
            sides.append(
                max(tx[m].max() - tx[m].min() + 1, ty[m].max() - ty[m].min() + 1)
            )
        # 16-cell groups: 4x4 squares under z-order, 16x1 stripes row-major
        assert max(sides) == max_side


def test_zorder_layout_query_blocks_are_2x2(spark):
    """Driver-query invariant independent of grid shape: 4 consecutive z keys
    always live inside one 2x2-aligned square, so every bucket's bbox spans
    at most 2 tiles per axis."""
    from gridfia_spark import queries_products as qp

    rows = qp.zorder_layout(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_tiles for r in rows) > 0
    for r in rows:
        assert r.n_tiles <= 4
        assert r.max_tx - r.min_tx <= 1
        assert r.max_ty - r.min_ty <= 1
        assert r.bbox_area <= 4
