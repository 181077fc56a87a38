"""Golden tests for sample-level stats (A18/A20/J6/W5) vs reference math."""

from __future__ import annotations

import numpy as np
import pytest

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
