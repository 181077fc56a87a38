"""Global spatial autocorrelation — Moran's I over the tile lattice.

The reference delegates to libpysal/esda (statistical_analysis.py:619-658:
Queen contiguity weights, row-standardized, normality inference). Neither
library ships here, so the same math is implemented as DataFrame ops:

- units = tiles (tx, ty) with a per-tile value (e.g. total biomass);
- Queen weights: the 8 lattice neighbors, row-standardized w_ij = 1/k_i;
- I = (n/S0) * sum_ij w_ij z_i z_j / sum_i z_i^2   (S0 = n when every unit
  has a neighbor), E[I] = -1/(n-1), Var under normality from S1/S2
  (Cliff & Ord 1981), z = (I-EI)/sqrt(V), one-tailed normal p on |z|
  (esda's p_norm convention).

Everything is a neighbor self-join on (tx, ty) offsets + aggregates — one
shuffle, scales to any lattice size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighbors(units: DataFrame) -> DataFrame:
    """Queen-adjacent pairs (i, j) with per-unit degree k_i attached."""
    from ..localdf import local_df

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    off_df = local_df(units.sparkSession, offs, "dx int, dy int")
    probes = units.select("tx", "ty").crossJoin(F.broadcast(off_df)).select(
        "tx", "ty",
        (F.col("tx") + F.col("dx")).alias("ntx"),
        (F.col("ty") + F.col("dy")).alias("nty"),
    )
    j = probes.join(
        units.select(F.col("tx").alias("ntx"), F.col("ty").alias("nty")),
        ["ntx", "nty"],
    )
    deg = j.groupBy("tx", "ty").agg(F.count("*").alias("k"))
    return j.join(deg, ["tx", "ty"])


def morans_i(units: DataFrame, value_col: str = "value") -> dict:
    """Moran's I over a lattice DataFrame (tx, ty, value) -> result dict
    matching the reference's output keys (statistical_analysis.py:651-658)."""
    base = units.select("tx", "ty", F.col(value_col).alias("x"))
    stats = base.agg(F.count("*").alias("n"), F.avg("x").alias("mean")).first()
    n, mean = stats.n, stats.mean
    z = base.withColumn("z", F.col("x") - F.lit(mean))

    nb = _neighbors(z)
    # attach z_i (join on i) and z_j (join on neighbor coords)
    zi = z.select("tx", "ty", F.col("z").alias("zi"))
    zj = z.select(F.col("tx").alias("ntx"), F.col("ty").alias("nty"), F.col("z").alias("zj"))
    pairs = nb.join(zi, ["tx", "ty"]).join(zj, ["ntx", "nty"])

    agg = pairs.agg(
        F.sum(F.col("zi") * F.col("zj") / F.col("k")).alias("num"),  # sum w_ij zi zj
        F.sum(F.lit(1.0) / F.col("k")).alias("s0"),
    ).first()
    denom = z.agg(F.sum(F.col("z") * F.col("z"))).first()[0]
    I = (n / agg.s0) * agg.num / denom

    # structural constants (Cliff & Ord), all distributed aggregates:
    # S1 = 1/2 sum over ordered adjacent pairs (w_ij + w_ji)^2
    # S2 = sum_i (row_sum_i + col_sum_i)^2, row sums are 1 (standardized),
    #      col_sum_i = sum_{j in N(i)} 1/k_j
    degrees = nb.select("tx", "ty", "k").distinct()
    with_kj = nb.join(
        degrees.select(
            F.col("tx").alias("ntx"), F.col("ty").alias("nty"), F.col("k").alias("kj")
        ),
        ["ntx", "nty"],
    )
    wsum = (1.0 / F.col("k")) + (1.0 / F.col("kj"))
    s1 = with_kj.agg((F.sum(wsum * wsum) * 0.5).alias("s1")).first().s1
    col_sums = with_kj.groupBy("tx", "ty").agg(
        F.sum(1.0 / F.col("kj")).alias("colsum")
    )
    s2 = (
        col_sums.select(
            F.sum((1.0 + F.col("colsum")) * (1.0 + F.col("colsum"))).alias("s2")
        )
        .first()
        .s2
    )

    s0 = agg.s0
    ei = -1.0 / (n - 1)
    vi = (n * n * s1 - n * s2 + 3 * s0 * s0) / ((n * n - 1) * s0 * s0) - ei * ei
    zscore = (I - ei) / math.sqrt(vi)
    p = 0.5 * math.erfc(abs(zscore) / math.sqrt(2.0))
    return {
        "morans_i": float(I),
        "expected_i": float(ei),
        "variance_i": float(vi),
        "z_score": float(zscore),
        "p_value": float(p),
        "significant": p < 0.05,
        "n": int(n),
    }
