"""Golden tests for sample-level stats (A18/A20/J6/W5) vs reference math."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark.functions import sample_stats as ss


class TestKernels:
    def test_shannon_simpson_evenness(self):
        c = np.array([10.0, 10.0, 0.0])
        assert ss.shannon(c) == pytest.approx(np.log(2))
        assert ss.simpson(c) == pytest.approx(0.5)  # 1 - 0.5 dominance
        assert ss.evenness(c) == pytest.approx(1.0)
        assert ss.shannon(np.zeros(3)) == 0.0 and ss.simpson(np.zeros(3)) == 0.0

    def test_chao1(self):
        # 3 observed, 2 singletons, 1 doubleton: chao1 = 3 + 4/2 = 5
        assert ss.chao1(np.array([1.0, 1.0, 2.0])) == pytest.approx(3 + 4 / 2)
        # no doubletons: 2 + 2*1/2 = 3
        assert ss.chao1(np.array([1.0, 1.0, 0.0])) == pytest.approx(3.0)
        # no singletons/doubletons
        assert ss.chao1(np.array([5.0, 7.0])) == 2.0

    def test_ace_no_rare(self):
        assert ss.ace(np.array([50.0, 20.0])) == 2.0

    def test_ace_with_rare(self):
        c = np.array([1.0, 2.0, 3.0, 50.0])
        # manual: n_rare=3, n_abund=1, f1=1, n_rare_total=6, C=1-1/6=5/6
        # f: [1,1,1,0...]; num = sum i(i-1)f = 0+2+6 = 8; den=30
        # gamma = max(0, (3/(5/6))*(8/30) - 1) = max(0, 0.96-1) = 0
        want = 1 + 3 / (5 / 6) + (1 / (5 / 6)) * 0
        assert ss.ace(c) == pytest.approx(want)


class TestDistributed:
    def test_sample_diversity(self, spark):
        rows = [("s1", i, c) for i, c in enumerate([10.0, 10.0, 0.0])] + [
            ("s2", i, c) for i, c in enumerate([1.0, 1.0, 2.0])
        ]
        df = spark.createDataFrame(rows, "sample_id string, species int, count double")
        out = {r.sample_id: r for r in ss.sample_diversity(df).collect()}
        assert out["s1"].shannon == pytest.approx(np.log(2))
        assert out["s1"].richness == 2.0
        assert out["s2"].chao1 == pytest.approx(5.0)

    def test_bh_fdr_matches_reference(self, spark):
        pv = [0.01, 0.04, 0.03, 0.005, 0.2]
        df = spark.createDataFrame(
            [(str(i), p) for i, p in enumerate(pv)], "test_id string, p double"
        )
        got = {r.test_id: r.p_adj for r in ss.bh_fdr(df).collect()}
        # reference implementation verbatim
        p = np.array(pv)
        n = len(p)
        idx = np.argsort(p)
        sp = p[idx]
        corr = np.minimum(1.0, sp * n / (np.arange(n) + 1))
        for i in range(n - 2, -1, -1):
            corr[i] = min(corr[i], corr[i + 1])
        want = np.zeros(n)
        want[idx] = corr
        for i in range(n):
            assert got[str(i)] == pytest.approx(want[i])

    def test_cliffs_delta(self, spark):
        rows = [("a", v) for v in [1.0, 2.0, 3.0]] + [("b", v) for v in [2.0, 4.0]]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ss.cliffs_delta(df, "g", "v").first()
        # pairs a>b: (3,2)=1; a<b: (1,2),(1,4),(2,4),(3,4)=4; ties (2,2)
        assert r.delta == pytest.approx((1 - 4) / 6)
        assert r.n_pairs == 6

    def test_cliffs_delta_rank_equals_cross_on_adversarial_ties(self, spark):
        rng = np.random.default_rng(3)
        # heavy ties: 7 distinct values over 120 rows, unbalanced groups
        rows = [("a", float(v)) for v in rng.integers(0, 7, 80)] + [
            ("b", float(v)) for v in rng.integers(0, 7, 40)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r_rank = ss.cliffs_delta(df, "g", "v", method="rank").first()
        r_cross = ss.cliffs_delta(df, "g", "v", method="cross").first()
        assert r_rank.n_pairs == r_cross.n_pairs == 80 * 40
        assert r_rank.delta == r_cross.delta  # bit-identical by construction

    def test_mann_whitney_vs_bruteforce(self, spark):
        rng = np.random.default_rng(5)
        va = rng.integers(0, 10, 30).astype(float)
        vb = (rng.integers(0, 10, 45) + 2).astype(float)
        rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ss.mann_whitney_u(df, "g", "v").first()
        # brute-force U with half-ties
        gt = sum((va[:, None] > vb[None, :]).sum() for _ in [0])
        eq = (va[:, None] == vb[None, :]).sum()
        u1 = gt + eq / 2.0
        assert r.u1 == pytest.approx(u1) and r.u2 == pytest.approx(30 * 45 - u1)
        # tie-corrected normal z (documented engine convention)
        n1, n2, n = 30, 45, 75
        allv = np.concatenate([va, vb])
        _, t = np.unique(allv, return_counts=True)
        var = n1 * n2 / 12.0 * ((n + 1) - float((t**3 - t).sum()) / (n * (n - 1)))
        cc = 0.5 if u1 > n1 * n2 / 2 else -0.5
        z = (u1 - n1 * n2 / 2.0 - cc) / np.sqrt(var)
        assert r.z == pytest.approx(z, abs=1e-12)
        # p from the A&S polynomial is within 3e-7 of the exact normal tail
        import math

        p_exact = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))
        assert r.p_norm == pytest.approx(p_exact, abs=3e-7)

    def test_cohens_d_vs_numpy(self, spark):
        rng = np.random.default_rng(9)
        va, vb = rng.normal(5, 2, 40), rng.normal(3, 1, 25)
        rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ss.cohens_d(df, "g", "v").first()
        sp2 = ((40 - 1) * va.var(ddof=1) + (25 - 1) * vb.var(ddof=1)) / (40 + 25 - 2)
        d = (va.mean() - vb.mean()) / np.sqrt(sp2)
        assert r.d == pytest.approx(d) and r.mean_diff == pytest.approx(va.mean() - vb.mean())

    def test_bootstrap_ci_population_guard(self, spark):
        import pytest as _pytest

        df = spark.range(70000).select(
            F.col("id").alias("rid"), (F.col("id") % 10).cast("double").alias("v")
        )
        with _pytest.raises(ValueError, match="small-sample"):
            ss.bootstrap_ci(df, "v", "rid", n_boot=2)

    def test_group_stats(self, spark):
        rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r.g: r for r in ss.group_stats(df, "g", "v").collect()}
        assert out["a"].mean_v == 2.0 and out["a"].n == 2
        assert out["b"].std_v is None or np.isnan(out["b"].std_v)


class TestExprVariant:
    def test_expr_equals_pudaf(self, spark):
        rows = [("s1", i, c) for i, c in enumerate([10.0, 10.0, 0.0])] + [
            ("s2", i, c) for i, c in enumerate([1.0, 1.0, 2.0, 7.0])
        ]
        df = spark.createDataFrame(rows, "sample_id string, species int, count double")
        a = {r.sample_id: r for r in ss.sample_diversity(df).collect()}
        b = {r.sample_id: r for r in ss.sample_diversity_expr(df).collect()}
        for k in a:
            for col in ("richness", "shannon", "simpson", "evenness", "chao1"):
                assert getattr(a[k], col) == pytest.approx(getattr(b[k], col)), (k, col)


class TestMoransI:
    def _numpy_moran(self, grid):
        """Hand implementation: queen weights, row-standardized, normality."""
        import math
        import numpy as np

        h, w = grid.shape
        coords = [(i, j) for i in range(h) for j in range(w)]
        idx = {c: k for k, c in enumerate(coords)}
        n = len(coords)
        x = np.array([grid[c] for c in coords], dtype=float)
        z = x - x.mean()
        W = np.zeros((n, n))
        for (i, j), k in idx.items():
            nbrs = [
                (i + di, j + dj)
                for di in (-1, 0, 1)
                for dj in (-1, 0, 1)
                if (di, dj) != (0, 0) and (i + di, j + dj) in idx
            ]
            for c in nbrs:
                W[k, idx[c]] = 1.0 / len(nbrs)
        s0 = W.sum()
        I = (n / s0) * (z @ W @ z) / (z @ z)
        ei = -1.0 / (n - 1)
        s1 = 0.5 * ((W + W.T) ** 2).sum()
        s2 = ((W.sum(axis=1) + W.sum(axis=0)) ** 2).sum()
        vi = (n * n * s1 - n * s2 + 3 * s0 * s0) / ((n * n - 1) * s0 * s0) - ei * ei
        zs = (I - ei) / math.sqrt(vi)
        return I, ei, vi, zs

    def test_vs_numpy(self, spark):
        import numpy as np

        from gridfia_spark.functions import spatial_stats

        rng = np.random.default_rng(11)
        grid = rng.uniform(0, 100, (4, 5))
        grid[:2, :2] += 200  # a hot cluster -> positive autocorrelation
        rows = [
            (int(tx), int(ty), float(grid[ty, tx]))
            for ty in range(4)
            for tx in range(5)
        ]
        df = spark.createDataFrame(rows, "tx int, ty int, value double")
        got = spatial_stats.morans_i(df)
        I, ei, vi, zs = self._numpy_moran(grid)
        assert got["morans_i"] == pytest.approx(I)
        assert got["expected_i"] == pytest.approx(ei)
        assert got["variance_i"] == pytest.approx(vi)
        assert got["z_score"] == pytest.approx(zs)
        assert got["morans_i"] > 0 and got["significant"]


class TestPermutationTest:
    def test_null_case_high_p(self, spark):
        """Identical distributions -> p should not be extreme."""
        import numpy as np

        rng = np.random.default_rng(2)
        rows = [(str(i), "a" if i % 2 == 0 else "b", float(rng.integers(1, 50)))
                for i in range(60)]
        df = spark.createDataFrame(rows, "rid string, g string, v double")
        r = ss.permutation_test(df, "g", "v", "rid", n_perm=200).first()
        assert 0.0 < r.p_value <= 1.0 and r.p_value > 0.05

    def test_strong_effect_low_p(self, spark):
        rows = [(str(i), "a", 100.0 + i % 3) for i in range(30)] + [
            (str(100 + i), "b", 1.0 + i % 3) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "rid string, g string, v double")
        r = ss.permutation_test(df, "g", "v", "rid", n_perm=200).first()
        assert r.p_value < 0.02 and r.obs_diff == pytest.approx(99.0)

    def test_deterministic(self, spark):
        rows = [(str(i), "a" if i < 20 else "b", float(i % 7)) for i in range(45)]
        df = spark.createDataFrame(rows, "rid string, g string, v double")
        a = ss.permutation_test(df, "g", "v", "rid", n_perm=100).first()
        b = ss.permutation_test(df, "g", "v", "rid", n_perm=100).first()
        assert (a.p_value, a.n_extreme) == (b.p_value, b.n_extreme)
