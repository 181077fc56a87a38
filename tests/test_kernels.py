"""Kernel golden-value tests, mirroring the reference's unit suites
(tests/unit/test_diversity_calculations.py, test_species_calculations.py,
test_biomass_calculations.py) — hand-computed cases + the reference's own
numpy semantics re-executed as the oracle."""

from __future__ import annotations

import numpy as np
import pytest

from gridfia_spark.constants import SF_SPECS
from gridfia_spark.datagen import pixels
from gridfia_spark.functions import kernels


def cube_from(vals: list[list[list[float]]]) -> np.ndarray:
    return np.asarray(vals, dtype=np.float32)


class TestShannon:
    def test_known_values(self):
        # 2 species, equal proportions -> H' = ln(2)
        cube = cube_from([[[20.0]], [[10.0]], [[10.0]]])  # layer0=total
        h = kernels.shannon_diversity(cube)
        assert h[0, 0] == pytest.approx(np.log(2), rel=1e-12)

    def test_single_species_zero(self):
        cube = cube_from([[[10.0]], [[10.0]], [[0.0]]])
        assert kernels.shannon_diversity(cube)[0, 0] == 0.0

    def test_all_zero_pixel(self):
        cube = cube_from([[[0.0]], [[0.0]], [[0.0]]])
        assert kernels.shannon_diversity(cube)[0, 0] == 0.0

    def test_base2(self):
        cube = cube_from([[[20.0]], [[10.0]], [[10.0]]])
        assert kernels.shannon_diversity(cube, base="2")[0, 0] == pytest.approx(1.0)

    def test_no_epsilon_bias(self):
        # the canonical no-epsilon behavior pinned by the reference's
        # test_diversity_calculations.py:146: one species -> exactly 0
        cube = cube_from([[[1e-6]], [[1e-6]], [[0.0]]])
        assert kernels.shannon_diversity(cube)[0, 0] == 0.0

    def test_uneven(self):
        # p = (0.75, 0.25)
        cube = cube_from([[[40.0]], [[30.0]], [[10.0]]])
        want = -(0.75 * np.log(0.75) + 0.25 * np.log(0.25))
        assert kernels.shannon_diversity(cube)[0, 0] == pytest.approx(want, rel=1e-12)


class TestSimpson:
    def test_inverse_equal(self):
        cube = cube_from([[[20.0]], [[10.0]], [[10.0]]])
        assert kernels.simpson_diversity(cube)[0, 0] == pytest.approx(2.0)

    def test_non_inverse(self):
        cube = cube_from([[[20.0]], [[10.0]], [[10.0]]])
        assert kernels.simpson_diversity(cube, inverse=False)[0, 0] == pytest.approx(0.5)

    def test_empty_pixel_is_one(self):
        # reference quirk: empty pixels -> 1.0 under inverse (ones_like init)
        cube = cube_from([[[0.0, 20.0]], [[0.0, 10.0]], [[0.0, 10.0]]])
        out = kernels.simpson_diversity(cube)
        assert out[0, 0] == 1.0 and out[0, 1] == pytest.approx(2.0)


class TestRichnessEvenness:
    def test_richness_threshold(self):
        cube = cube_from([[[15.0]], [[10.0]], [[5.0]]])
        assert kernels.species_richness(cube)[0, 0] == 2
        assert kernels.species_richness(cube, biomass_threshold=7.0)[0, 0] == 1

    def test_evenness_needs_two(self):
        cube = cube_from([[[10.0]], [[10.0]], [[0.0]]])
        assert kernels.evenness(cube)[0, 0] == 0.0
        cube2 = cube_from([[[20.0]], [[10.0]], [[10.0]]])
        assert kernels.evenness(cube2)[0, 0] == pytest.approx(1.0)


class TestDominant:
    def test_argmax_offset(self):
        cube = cube_from([[[30.0]], [[10.0]], [[20.0]]])
        assert kernels.dominant_species(cube)[0, 0] == 2  # species idx 2

    def test_tie_first_wins(self):
        # mirrors test_species_calculations.py:36-48 (np.argmax first-wins)
        cube = cube_from([[[20.0]], [[10.0]], [[10.0]]])
        assert kernels.dominant_species(cube)[0, 0] == 1

    def test_min_biomass_mask(self):
        cube = cube_from([[[3.0]], [[2.0]], [[1.0]]])
        assert kernels.dominant_species(cube, min_biomass=5.0)[0, 0] == 0


class TestBiomass:
    def test_total_excludes_layer0(self):
        cube = cube_from([[[99.0]], [[10.0]], [[20.0]]])
        assert kernels.total_biomass(cube)[0, 0] == 30.0

    def test_comparison(self):
        cube = cube_from([[[35.0]], [[10.0]], [[20.0]]])
        assert kernels.total_biomass_comparison(cube)[0, 0] == pytest.approx(5.0)

    def test_comparison_single_layer_nan(self):
        cube = cube_from([[[35.0]]])
        assert np.isnan(kernels.total_biomass_comparison(cube)[0, 0])

    def test_proportion(self):
        cube = cube_from([[[30.0]], [[10.0]], [[20.0]]])
        assert kernels.species_proportion(cube, 1)[0, 0] == pytest.approx(1 / 3)
        with pytest.raises(ValueError):
            kernels.species_proportion(cube, 0)

    def test_group_proportion(self):
        cube = cube_from([[[30.0]], [[10.0]], [[20.0]]])
        assert kernels.species_group_proportion(cube, [1, 2])[0, 0] == pytest.approx(1.0)

    def test_threshold(self):
        cube = cube_from([[[0.0, 0.0]], [[10.0, 1.0]], [[20.0, 1.0]]])
        above = kernels.biomass_threshold(cube, 5.0)
        assert above[0, 0] == 1 and above[0, 1] == 0
        below = kernels.biomass_threshold(cube, 5.0, above=False)
        assert below[0, 0] == 0 and below[0, 1] == 1


class TestRareCommon:
    def test_per_array_scope(self):
        # species A present everywhere (freq 1.0), B in 1 of 4 px (0.25)
        a = np.ones((2, 2), dtype=np.float32)
        b = np.zeros((2, 2), dtype=np.float32)
        b[0, 0] = 5.0
        cube = np.stack([a + b, a, b])
        rare = kernels.rare_species(cube, occurrence_threshold=0.5)
        assert rare[0, 0] == 1 and rare[1, 1] == 0
        common = kernels.common_species(cube, occurrence_threshold=0.5)
        assert common[0, 0] == 1 and common[1, 1] == 1

    def test_injected_global_freq(self):
        cube = np.stack([np.ones((1, 1)), np.ones((1, 1))]).astype(np.float32)
        out = kernels.rare_species(cube, freq=np.array([0.001]))
        assert out[0, 0] == 1


class TestParity32:
    def test_float32_matches_reference_arithmetic(self):
        """parity32 mode reproduces the reference's float32 pipeline bit-for-bit
        (verbatim re-execution of diversity.py:82-126 arithmetic)."""
        spec = SF_SPECS["0.001"]
        cube = pixels.full_cube(spec)
        ours = kernels.shannon_diversity(cube, parity32=True)
        # reference arithmetic, float32 (as in diversity.py)
        sp = cube[1:]
        total = np.sum(sp, axis=0)
        valid = total > 0
        p = np.zeros_like(sp, dtype=np.float32)
        p[:, valid] = sp[:, valid] / total[valid]
        mask = p > 0
        contrib = np.zeros_like(p)
        contrib[mask] = -p[mask] * np.log(p[mask])
        ref = np.sum(contrib, axis=0)
        assert ours.dtype == np.float32
        np.testing.assert_array_equal(ours, ref)
