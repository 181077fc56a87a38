"""Sample-level statistics (SURVEY A18/A20/J6/W5): per-sample diversity
metrics incl. Chao1/ACE, Benjamini-Hochberg FDR, Cliff's delta, group stats.

Numpy kernels re-implement the reference math verbatim
(/root/reference/gridfia/core/analysis/statistical_analysis.py:86-192,
309-318, 549-557, 594-616); the distributed forms are grouped pandas
aggregations (per-sample) and window functions (BH FDR), with Cliff's delta
as the crossJoin counting form (J6) — the O(n^2) pair comparison the
reference runs in a ProcessPool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localdf import local_df
from pyspark.sql.window import Window

# ------------------------------------------------------------ numpy kernels


def richness(counts: np.ndarray) -> float:
    return float(np.sum(counts > 0))


def shannon(counts: np.ndarray) -> float:
    c = counts[counts > 0]
    if len(c) == 0:
        return 0.0
    p = c / c.sum()
    return float(-np.sum(p * np.log(p)))


def simpson(counts: np.ndarray) -> float:
    """1 - dominance (statistical_analysis.py:105-117 — note: differs from
    the raster kernel's inverse-Simpson; both semantics are preserved).

    Computed in the algebraically-identical rational form
    1 - sum(c^2)/(sum(c))^2: with integer counts both sums are exact, so the
    result is a single exact float64 division — deterministic across
    summation orders (numpy pairwise vs SQL sequential)."""
    total = float(counts.sum())
    if total == 0:
        return 0.0
    return float(1.0 - float((counts * counts).sum()) / (total * total))


def evenness(counts: np.ndarray) -> float:
    s = richness(counts)
    if s <= 1:
        return 0.0
    return shannon(counts) / float(np.log(s))


def chao1(counts: np.ndarray) -> float:
    """statistical_analysis.py:133-152: f1^2/(2 f2) estimator with the
    no-doubleton fallback."""
    f1 = float(np.sum(counts == 1))
    f2 = float(np.sum(counts == 2))
    obs = richness(counts)
    if f2 > 0:
        return obs + f1 * f1 / (2 * f2)
    if f1 > 0:
        return obs + f1 * (f1 - 1) / 2
    return obs


def ace(counts: np.ndarray, rare_threshold: int = 10) -> float:
    """statistical_analysis.py:154-192, verbatim branch structure."""
    rare = (counts > 0) & (counts <= rare_threshold)
    n_rare = float(np.sum(rare))
    n_abund = float(np.sum(counts > rare_threshold))
    if n_rare == 0:
        return n_abund
    f1 = float(np.sum(counts == 1))
    n_rare_total = float(np.sum(counts[rare]))
    c_ace = 1 - (f1 / n_rare_total) if n_rare_total > 0 else 1.0
    if c_ace > 0:
        i_vals = np.arange(1, rare_threshold + 1)
        f_vals = np.array([np.sum(counts == i) for i in i_vals])
        num = float(np.sum(i_vals * (i_vals - 1) * f_vals))
        den = n_rare_total * (n_rare_total - 1)
        gamma = max(0.0, (n_rare / c_ace) * (num / den) - 1) if den > 0 else 0.0
        return n_abund + n_rare / c_ace + (f1 / c_ace) * gamma
    return n_abund + n_rare


# -------------------------------------------------------- distributed forms


def sample_diversity(samples: DataFrame) -> DataFrame:
    """Per-sample diversity metrics from a long table
    (sample_id, species, count) — grouped pandas aggregation (pUDAF)."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["count"].to_numpy().astype(np.float64)
        return pd.DataFrame(
            {
                "sample_id": [pdf["sample_id"].iloc[0]],
                "richness": [richness(c)],
                "shannon": [shannon(c)],
                "simpson": [simpson(c)],
                "evenness": [evenness(c)],
                "chao1": [chao1(c)],
                "ace": [ace(c)],
            }
        )

    return samples.groupBy("sample_id").applyInPandas(
        agg,
        "sample_id string, richness double, shannon double, simpson double, "
        "evenness double, chao1 double, ace double",
    )


def sample_diversity_expr(samples: DataFrame, rare_threshold: int = 10) -> DataFrame:
    """Per-sample richness/shannon/simpson/evenness/chao1/ACE in pure
    built-in expressions (whole-stage codegen; no Python). Simpson uses the
    exact rational form (see ``simpson``); ACE mirrors ``ace``'s branch
    structure (statistical_analysis.py:154-192) with the same float64 op
    order, so a SQL oracle reproduces it bit-for-bit."""
    tot = samples.groupBy("sample_id").agg(F.sum("count").alias("tot"))
    c = F.col("count")
    t = F.col("tot")
    rt = F.lit(float(rare_threshold))
    per = (
        samples.join(tot, "sample_id")
        .groupBy("sample_id")
        .agg(
            F.sum((c > 0).cast("int")).cast("double").alias("obs"),
            F.sum((c == 1).cast("int")).cast("double").alias("f1"),
            F.sum((c == 2).cast("int")).cast("double").alias("f2"),
            F.sum(F.when(c > 0, -(c / t) * F.log(c / t)).otherwise(0.0)).alias("sh"),
            (F.sum(c * c) / (F.max(t) * F.max(t))).alias("dom"),
            F.sum(((c > 0) & (c <= rt)).cast("int")).cast("double").alias("n_rare"),
            F.sum((c > rt).cast("int")).cast("double").alias("n_abund"),
            F.sum(F.when((c > 0) & (c <= rt), c).otherwise(0.0)).alias("nrt"),
            # sum of i*(i-1)*F_i over integer abundances i in 1..threshold
            F.sum(
                F.when((c >= 1) & (c <= rt) & (c == F.floor(c)), c * (c - 1)).otherwise(0.0)
            ).alias("ace_num"),
        )
    )
    c_ace = F.when(F.col("nrt") > 0, F.lit(1.0) - (F.col("f1") / F.col("nrt"))).otherwise(
        F.lit(1.0)
    )
    den = F.col("nrt") * (F.col("nrt") - 1)
    gamma = F.when(
        den > 0,
        F.greatest(F.lit(0.0), (F.col("n_rare") / c_ace) * (F.col("ace_num") / den) - 1),
    ).otherwise(F.lit(0.0))
    ace_col = (
        F.when(F.col("n_rare") == 0, F.col("n_abund"))
        .when(
            c_ace > 0,
            F.col("n_abund") + F.col("n_rare") / c_ace + (F.col("f1") / c_ace) * gamma,
        )
        .otherwise(F.col("n_abund") + F.col("n_rare"))
    )
    return per.select(
        "sample_id",
        F.col("obs").alias("richness"),
        F.col("sh").alias("shannon"),
        (F.lit(1.0) - F.col("dom")).alias("simpson"),
        F.when(F.col("obs") > 1, F.col("sh") / F.log("obs")).otherwise(0.0).alias("evenness"),
        (
            F.col("obs")
            + F.when(F.col("f2") > 0, F.col("f1") * F.col("f1") / (2 * F.col("f2")))
            .when(F.col("f1") > 0, F.col("f1") * (F.col("f1") - 1) / 2)
            .otherwise(0.0)
        ).alias("chao1"),
        ace_col.alias("ace"),
    )


def bh_fdr(pvals: DataFrame, p_col: str = "p", id_col: str = "test_id") -> DataFrame:
    """Benjamini-Hochberg correction as window ops (SURVEY W5): sort by p,
    adj = min(1, p*n/rank), reverse running min, original order preserved via
    id. Matches statistical_analysis.py:594-616."""
    n = pvals.count()
    w_rank = Window.orderBy(F.col(p_col), F.col(id_col))
    w_rev = Window.orderBy(F.col(p_col), F.col(id_col)).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return (
        pvals.withColumn("rk", F.row_number().over(w_rank))
        .withColumn("adj0", F.least(F.lit(1.0), F.col(p_col) * n / F.col("rk")))
        .withColumn("p_adj", F.min("adj0").over(w_rev))
        .select(id_col, p_col, "p_adj")
    )


def _two_groups(df: DataFrame, group_col: str) -> list:
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"need exactly 2 groups, got {groups}")
    return groups


def _rank_hist(df: DataFrame, group_col: str, value_col: str, group_a) -> DataFrame:
    """Tie-averaged pooled ranks from a VALUE HISTOGRAM — the O(n log n)
    substrate shared by the rank forms of Cliff's delta and Mann-Whitney U.

    One groupBy collapses the population to distinct values (map-side
    combine); a window over that histogram assigns each tie group its
    average rank ``cum - (n_v - 1)/2``. The global sort is over DISTINCT
    values only — bounded by the value domain, not the row count."""
    is_a = (F.col(group_col) == group_a).cast("long")
    hist = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(is_a).alias("na_v"), F.count("*").alias("n_v")
    )
    w = Window.orderBy("v")
    return hist.withColumn("cum", F.sum("n_v").over(w)).withColumn(
        "avg_rank", F.col("cum") - (F.col("n_v") - 1) / 2.0
    )


def _rank_sums(df: DataFrame, group_col: str, value_col: str, groups) -> dict:
    """n1/n2/U1 (+ tie term) from the rank histogram, as exact float64
    integers/halves (< 2^53), so downstream arithmetic is engine-portable."""
    r = (
        _rank_hist(df, group_col, value_col, groups[0])
        .agg(
            F.sum("na_v").alias("n1"),
            F.sum("n_v").alias("n"),
            F.sum(F.col("na_v") * F.col("avg_rank")).alias("r1"),
            F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")).alias("ties"),
        )
        .first()
    )
    n1, n = int(r.n1), int(r.n)
    n2 = n - n1
    u1 = float(r.r1) - n1 * (n1 + 1) / 2.0
    return {"n1": n1, "n2": n2, "n": n, "u1": u1, "ties": float(r.ties)}


def cliffs_delta(
    df: DataFrame, group_col: str, value_col: str, method: str = "rank"
) -> DataFrame:
    """Cliff's delta between the two groups of ``group_col``
    (statistical_analysis.py:549-557): delta = (#(a>b) - #(a<b)) / (n1*n2).

    ``method='rank'`` (default): the O(n log n) rank formulation (SURVEY J6)
    via 2*U1 = 2*#(a>b) + #ties, so delta = (2*U1 - n1*n2)/(n1*n2). The
    numerator is an exact float64 integer, making the single division
    bit-identical to the crossJoin form's (gt-lt)/n_pairs. Scales: one
    histogram shuffle instead of an n1*n2 pair blow-up.

    ``method='cross'``: the literal O(n1*n2) crossJoin counting form — kept
    as the small-n oracle cross-check of the rank path (tested equal on
    adversarial ties)."""
    groups = _two_groups(df, group_col)
    spark = df.sparkSession
    if method == "rank":
        st = _rank_sums(df, group_col, value_col, groups)
        n_pairs = st["n1"] * st["n2"]
        delta = (2.0 * st["u1"] - n_pairs) / n_pairs
        return local_df(
            spark,
            [(groups[0], groups[1], float(delta), int(n_pairs))],
            "group_a string, group_b string, delta double, n_pairs long",
        )
    if method != "cross":
        raise ValueError(f"unknown method {method!r}")
    a = df.filter(F.col(group_col) == groups[0]).select(F.col(value_col).alias("va"))
    b = df.filter(F.col(group_col) == groups[1]).select(F.col(value_col).alias("vb"))
    pairs = a.crossJoin(F.broadcast(b))
    agg = pairs.agg(
        F.sum((F.col("va") > F.col("vb")).cast("long")).alias("gt"),
        F.sum((F.col("va") < F.col("vb")).cast("long")).alias("lt"),
        F.count("*").alias("n_pairs"),
    ).first()
    delta = (agg.gt - agg.lt) / agg.n_pairs
    return local_df(
        spark,
        [(groups[0], groups[1], float(delta), int(agg.n_pairs))],
        "group_a string, group_b string, delta double, n_pairs long",
    )


def _phi_as(z):
    """Standard normal CDF via the Abramowitz-Stegun 7.1.26 erf polynomial
    (|err| <= 1.5e-7) — expressible identically in any SQL engine (exp only),
    used because DuckDB lacks erf/erfc. ``z`` is a Column; returns a Column."""
    x = F.abs(z) / F.lit(float(np.sqrt(2.0)))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    phi_abs = F.lit(0.5) * (F.lit(1.0) + erf)
    return F.when(z >= 0, phi_abs).otherwise(F.lit(1.0) - phi_abs)


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (statistical_analysis.py:340-361) as the
    distributed rank formulation: tie-averaged ranks from the value
    histogram, U1 = R1 - n1(n1+1)/2, tie-corrected normal approximation
    z = (U1 - mu - 0.5*sign(U1-mu)) / sigma with
    sigma^2 = n1*n2/12 * ((n+1) - T/(n(n-1))), T = sum(t^3 - t), two-sided
    p = 2*(1 - Phi(|z|)) via the A&S erf polynomial (DuckDB-portable).

    Returns one row (group_a, group_b, n1, n2, u1, u2, z, p_norm). Scales:
    one histogram shuffle; the only sort is over distinct values."""
    groups = _two_groups(df, group_col)
    st = _rank_sums(df, group_col, value_col, groups)
    n1, n2, n = st["n1"], st["n2"], st["n"]
    u1 = st["u1"]
    u2 = n1 * n2 - u1
    mu = n1 * n2 / 2.0
    var = n1 * n2 / 12.0 * ((n + 1) - st["ties"] / (n * (n - 1)))
    if var <= 0:  # all values identical
        z = 0.0
    else:
        cc = 0.5 if u1 > mu else (-0.5 if u1 < mu else 0.0)
        z = (u1 - mu - cc) / float(np.sqrt(var))
    spark = df.sparkSession
    out = local_df(
        spark,
        [(groups[0], groups[1], n1, n2, float(u1), float(u2), float(z))],
        "group_a string, group_b string, n1 long, n2 long, u1 double, "
        "u2 double, z double",
    )
    return out.withColumn(
        "p_norm",
        F.least(F.lit(1.0), F.lit(2.0) * (F.lit(1.0) - _phi_as(F.abs(F.col("z"))))),
    )


def cohens_d(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Cohen's d with pooled standard deviation
    (statistical_analysis.py:507-540): d = (mean_a - mean_b) / s_pooled,
    s_pooled^2 = ((n1-1)s1^2 + (n2-1)s2^2) / (n1+n2-2). Pure two-level
    aggregation — partial aggregates per group, no data movement beyond one
    tiny groupBy."""
    groups = _two_groups(df, group_col)
    v = F.col(value_col).cast("double")
    per = (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.avg(v).alias("mean"),
            F.var_samp(v).alias("var"),
        )
        .collect()
    )
    ga = next(r for r in per if r[group_col] == groups[0])
    gb = next(r for r in per if r[group_col] == groups[1])
    sp2 = ((ga.n - 1) * ga.var + (gb.n - 1) * gb.var) / (ga.n + gb.n - 2)
    d = (ga.mean - gb.mean) / float(np.sqrt(sp2)) if sp2 > 0 else 0.0
    spark = df.sparkSession
    return local_df(
        spark,
        [
            (
                groups[0],
                groups[1],
                int(ga.n),
                int(gb.n),
                float(ga.mean - gb.mean),
                float(d),
            )
        ],
        "group_a string, group_b string, n1 long, n2 long, mean_diff double, d double",
    )


def permutation_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_perm: int = 500,
) -> DataFrame:
    """Permutation test for a two-group mean difference — the distributed
    recast of the reference's ProcessPool permutation machinery
    (parallel_processing.py:414, statistical_analysis.py group comparison).

    Label shuffles are deterministic and engine-portable: for permutation i,
    rows are ordered by md5(i || '_' || id) and the first n1 rows get group
    A's label — reproducible in any SQL engine. Returns one row:
    (obs_diff, n_perm, n_extreme, p_value) with
    p = (1 + #{|perm_diff| >= |obs_diff|}) / (n_perm + 1).
    """
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"permutation_test needs exactly 2 groups, got {groups}")
    a = F.col(group_col) == groups[0]
    base = df.select(
        F.col(id_col).cast("string").alias("rid"),
        a.cast("int").alias("is_a"),
        F.col(value_col).cast("double").alias("v"),
    )
    stats = base.agg(
        F.sum("is_a").alias("n1"),
        F.count("*").alias("n"),
        (F.sum(F.col("v") * F.col("is_a")) / F.sum("is_a")).alias("mean_a"),
        (
            F.sum(F.col("v") * (1 - F.col("is_a"))) / F.sum(1 - F.col("is_a"))
        ).alias("mean_b"),
    ).first()
    obs = stats.mean_a - stats.mean_b
    n1 = int(stats.n1)

    perms = df.sparkSession.range(n_perm).select(F.col("id").alias("perm"))
    exploded = base.crossJoin(perms)
    w = Window.partitionBy("perm").orderBy(
        F.md5(F.concat(F.col("perm").cast("string"), F.lit("_"), F.col("rid")))
    )
    labeled = exploded.withColumn("pa", (F.row_number().over(w) <= n1).cast("int"))
    per = labeled.groupBy("perm").agg(
        (
            F.sum(F.col("v") * F.col("pa")) / F.sum("pa")
            - F.sum(F.col("v") * (1 - F.col("pa"))) / F.sum(1 - F.col("pa"))
        ).alias("diff")
    )
    res = per.agg(
        F.sum((F.abs(F.col("diff")) >= abs(obs)).cast("long")).alias("n_extreme")
    ).first()
    spark = df.sparkSession
    p = (1 + res.n_extreme) / (n_perm + 1)
    return local_df(
        spark,
        [(float(obs), n_perm, int(res.n_extreme), float(p))],
        "obs_diff double, n_perm long, n_extreme long, p_value double",
    )


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Bootstrap percentile CI of the mean — the distributed recast of the
    reference's ProcessPool bootstrap (parallel_processing.py:352).

    Resampling with replacement is deterministic and engine-portable: for
    bootstrap b, slot j picks row index (b*104729 + j*7919 + 13) mod n over
    the rows ranked by id — reproducible in any SQL engine, no RNG state.
    Returns one row (obs_mean, ci_lo, ci_hi, n_boot).

    SMALL-SAMPLE OPERATOR: the global Window.orderBy rank funnels the base
    table through one task and the ranked base is broadcast, so the base
    must be a (filtered) sample, not a full table — enforced by the
    ``max_n`` guard. Bootstrap statistics are a sample-level tool
    (the reference pools ~thousands of plot records); for population-scale
    CIs use the closed-form normal interval from one aggregate instead."""
    base = df.select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(value_col).cast("double").alias("v"),
    )
    max_n = 65536
    n = base.count()
    if n > max_n:
        raise ValueError(
            f"bootstrap_ci is a small-sample operator (n={n} > {max_n}); "
            "filter/sample the base first, or use a closed-form CI"
        )
    spark = df.sparkSession
    w = Window.orderBy("rid")
    ranked = base.withColumn("ridx", F.row_number().over(w) - 1)
    slots = (
        spark.range(n_boot)
        .select(F.col("id").alias("b"))
        .crossJoin(spark.range(n).select(F.col("id").alias("j")))
        .select("b", ((F.col("b") * 104729 + F.col("j") * 7919 + 13) % n).alias("ridx"))
    )
    means = (
        slots.join(F.broadcast(ranked.select("ridx", "v")), "ridx")
        .groupBy("b")
        .agg(F.avg("v").alias("m"))
    )
    ci = means.agg(
        F.expr(f"percentile(m, array({lo!r}, {hi!r}))").alias("p")
    ).first()
    obs = base.agg(F.avg("v")).first()[0]
    return local_df(
        spark,
        [(float(obs), float(ci.p[0]), float(ci.p[1]), n_boot)],
        "obs_mean double, ci_lo double, ci_hi double, n_boot long",
    )


def group_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Descriptive stats per group (A20): mean/std/n."""
    return df.groupBy(group_col).agg(
        F.avg(value_col).alias("mean_v"),
        F.stddev(value_col).alias("std_v"),
        F.count("*").alias("n"),
    )
