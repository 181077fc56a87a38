"""Unit tests for codecs, grid index, and geometry (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gridfia_spark import codecs, geom, grid
from gridfia_spark.constants import SF_SPECS
from gridfia_spark.datagen import pixels, vectors


class TestCodecs:
    @pytest.mark.parametrize("fmt", codecs.LOSSLESS_FMTS)
    def test_lossless_roundtrip(self, fmt):
        spec = SF_SPECS["0.001"]
        arr = pixels.tile_pixels(1, 0, 1, spec)
        dec = codecs.decode(codecs.encode(arr, fmt), spec.tile_w, spec.tile_h, fmt)
        np.testing.assert_array_equal(arr, dec)

    def test_lossy_psnr_gate(self):
        # BASELINE.json per-row invariant: PSNR >= 40 dB for lossy fmt
        spec = SF_SPECS["0.001"]
        for s in range(6):
            arr = pixels.tile_pixels(s, 1, 1, spec)
            dec = codecs.decode(codecs.encode(arr, "qnt8"), spec.tile_w, spec.tile_h, "qnt8")
            assert codecs.psnr(arr, dec) >= 40.0

    def test_dim_validation(self):
        arr = np.zeros((4, 4), dtype=np.float32)
        data = codecs.encode(arr, "raw32")
        with pytest.raises(ValueError, match="expected"):
            codecs.decode(data, 5, 5, "raw32")

    def test_unknown_fmt(self):
        with pytest.raises(ValueError):
            codecs.encode(np.zeros((2, 2)), "png")


class TestGrid:
    @given(
        st.integers(0, 2**20 - 1),
        st.integers(0, 2**20 - 1),
        st.integers(5, 20),
    )
    @settings(max_examples=200, deadline=None)
    def test_encode_decode_roundtrip(self, ix, iy, res):
        ix %= 1 << res
        iy %= 1 << res
        c = grid.encode_cell(np.array([ix]), np.array([iy]), res)
        dx, dy, dr = grid.decode_cell(c)
        assert (int(dx[0]), int(dy[0]), int(dr[0])) == (ix, iy, res)

    @given(
        st.floats(-19_000_000, 19_000_000),
        st.floats(-19_000_000, 19_000_000),
        st.integers(5, 22),
    )
    @settings(max_examples=200, deadline=None)
    def test_point_in_own_cell(self, x, y, res):
        c = grid.cell_of_xy(np.array([x]), np.array([y]), res)
        xmin, ymin, xmax, ymax = (float(v[0]) for v in grid.cell_bounds(c))
        # tolerance: adding WORLD_X0 (2e7) loses ~1e-9 m of precision for
        # coords near 0 — irrelevant at the engine's >=1 m coordinate lattice
        tol = max(abs(x), abs(y), 1.0) * 1e-12 + 1e-8
        assert xmin - tol <= x <= xmax + tol
        assert ymin - tol <= y <= ymax + tol

    def test_parent_child(self):
        c = grid.cell_of_xy(np.array([-1_999_000.0]), np.array([-901_000.0]), 18)
        p = grid.parent(c, 15)
        kids3 = [int(p[0])]
        for _ in range(3):
            kids3 = [int(k) for cc in kids3 for k in grid.children(cc)]
        assert int(c[0]) in kids3

    def test_k_ring_counts(self):
        c = grid.cell_of_xy(np.array([0.0]), np.array([0.0]), 15)
        assert grid.k_ring(c, 1).shape == (1, 9)
        assert grid.k_ring(c, 2).shape == (1, 25)
        # ring contains the center
        assert int(c[0]) in set(grid.k_ring(c, 1)[0].tolist())


class TestGeom:
    def test_wkb_roundtrip(self):
        rings = geom.rect_polygon(0, 0, 10, 10)
        back = geom.wkb_to_polygon(geom.polygon_to_wkb(rings))
        np.testing.assert_allclose(back[0], rings[0])

    def test_pip_rect(self):
        rings = geom.rect_polygon(0, 0, 10, 10)
        x = np.array([5.0, 15.0, -1.0, 9.999])
        y = np.array([5.0, 5.0, 5.0, 0.001])
        np.testing.assert_array_equal(
            geom.points_in_polygon(x, y, rings), [True, False, False, True]
        )

    def test_pip_concave(self):
        spec = SF_SPECS["0.001"]
        L = vectors.concave_polygons(spec)[0]
        xmin, ymin, xmax, ymax = L.bounds
        # the cut-out quadrant (top-right) is outside
        cx = xmax - (xmax - xmin) * 0.25
        cy = ymax - (ymax - ymin) * 0.25
        assert not geom.points_in_polygon(np.array([cx]), np.array([cy]), L.rings)[0]
        # the bottom-left quadrant is inside
        cx2 = xmin + (xmax - xmin) * 0.25
        cy2 = ymin + (ymax - ymin) * 0.25
        assert geom.points_in_polygon(np.array([cx2]), np.array([cy2]), L.rings)[0]

    def test_pip_with_hole(self):
        outer = geom.rect_polygon(0, 0, 10, 10)[0]
        hole = geom.rect_polygon(4, 4, 6, 6)[0]
        rings = [outer, hole]
        assert not geom.points_in_polygon(np.array([5.0]), np.array([5.0]), rings)[0]
        assert geom.points_in_polygon(np.array([2.0]), np.array([2.0]), rings)[0]

    def test_covering_soundness(self):
        """fully_inside cells truly inside; union of cells covers the polygon."""
        spec = SF_SPECS["0.001"]
        rng = np.random.default_rng(7)
        for poly in vectors.all_polygons(spec)[:11]:
            cells, full = geom.polygon_covering(poly.rings, 12, 18)
            if len(cells) == 0:
                continue
            xmin, ymin, xmax, ymax = (np.asarray(v) for v in grid.cell_bounds(cells))
            cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
            if full.any():
                assert geom.points_in_polygon(cx[full], cy[full], poly.rings).all()
            bx0, by0, bx1, by1 = poly.bounds
            px = rng.uniform(bx0, bx1, 500)
            py = rng.uniform(by0, by1, 500)
            inside = geom.points_in_polygon(px, py, poly.rings)
            covered = np.zeros(px.shape, bool)
            for x0, y0, x1, y1 in zip(xmin, ymin, xmax, ymax):
                covered |= (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            assert covered[inside].all()


class TestPixelGen:
    def test_total_is_sum(self):
        spec = SF_SPECS["0.001"]
        cube = pixels.full_cube(spec)
        np.testing.assert_array_equal(cube[0], cube[1:].sum(axis=0))

    def test_tile_matches_cube_slice(self):
        spec = SF_SPECS["0.001"]
        cube = pixels.full_cube(spec)
        t = pixels.tile_pixels(3, 1, 0, spec)
        np.testing.assert_array_equal(
            t, cube[3, 0 : spec.tile_h, spec.tile_w : 2 * spec.tile_w]
        )

    def test_patterns(self):
        spec = SF_SPECS["0.01"]
        cube = pixels.full_cube(spec)
        # species 3 rare: nonzero only in the central patch
        nz = np.nonzero(cube[3])
        assert nz[0].min() >= (2 * spec.gh) // 5 and nz[0].max() < (3 * spec.gh) // 5
        # species 4 edge: only top/bottom bands
        nz4 = np.nonzero(cube[4])
        band = spec.gh // 10
        assert ((nz4[0] < band) | (nz4[0] >= spec.gh - band)).all()
        # species 1 dominant: ~80% nonzero
        frac = (cube[1] > 0).mean()
        assert 0.7 < frac < 0.9

    def test_phash_deterministic(self):
        spec = SF_SPECS["0.001"]
        a = pixels.phash64(pixels.tile_pixels(1, 0, 0, spec))
        b = pixels.phash64(pixels.tile_pixels(1, 0, 0, spec))
        assert a == b
        c = pixels.phash64(pixels.tile_pixels(2, 0, 0, spec))
        assert a != c


class TestU8z:
    def test_lossless_for_engine_values(self):
        spec = SF_SPECS["0.001"]
        for s in range(6):
            arr = pixels.tile_pixels(s, 1, 0, spec)
            dec = codecs.decode(codecs.encode(arr, "u8z"), spec.tile_w, spec.tile_h, "u8z")
            np.testing.assert_array_equal(arr, dec)

    def test_rejects_unrepresentable(self):
        with pytest.raises(ValueError, match="u8z requires"):
            codecs.encode(np.array([[0.5]], dtype=np.float32), "u8z")
        with pytest.raises(ValueError, match="u8z requires"):
            codecs.encode(np.array([[300.0]], dtype=np.float32), "u8z")
