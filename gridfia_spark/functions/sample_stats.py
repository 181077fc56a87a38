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


def cliffs_delta(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Cliff's delta between the two groups of ``group_col`` via the crossJoin
    counting form (statistical_analysis.py:549-557): delta =
    (#(a>b) - #(a<b)) / (n1*n2)."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"cliffs_delta needs exactly 2 groups, got {groups}")
    a = df.filter(F.col(group_col) == groups[0]).select(F.col(value_col).alias("va"))
    b = df.filter(F.col(group_col) == groups[1]).select(F.col(value_col).alias("vb"))
    pairs = a.crossJoin(F.broadcast(b))
    agg = pairs.agg(
        F.sum((F.col("va") > F.col("vb")).cast("long")).alias("gt"),
        F.sum((F.col("va") < F.col("vb")).cast("long")).alias("lt"),
        F.count("*").alias("n_pairs"),
    ).first()
    delta = (agg.gt - agg.lt) / agg.n_pairs
    spark = df.sparkSession
    return spark.createDataFrame(
        [(groups[0], groups[1], float(delta), int(agg.n_pairs))],
        "group_a string, group_b string, delta double, n_pairs long",
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
    return spark.createDataFrame(
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
    Returns one row (obs_mean, ci_lo, ci_hi, n_boot)."""
    base = df.select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(value_col).cast("double").alias("v"),
    )
    n = base.count()
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
    return spark.createDataFrame(
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
