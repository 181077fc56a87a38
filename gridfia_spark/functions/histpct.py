"""Exact percentiles from value histograms (scale-safe percentile plan).

``percentile(v, p)`` with per-group value buffering is the classic skewed-zone
OOM at raster scale: one CONUS-sized county funnels billions of doubles into a
single reducer. For discrete-valued data (the u8z/biomass contract: small
non-negative integers stored exactly in float32), the exact alternative is a
**value histogram**: per-group ``(v, cnt)`` rows — at most ``|domain|`` rows
per group regardless of pixel count — followed by a cumulative-sum walk.

The interpolation matches both Spark ``percentile`` and DuckDB
``quantile_cont`` (SQL-standard continuous quantile): for sorted values
``x_0..x_{n-1}``, ``pos = p*(n-1)``, result =
``x_floor(pos) + (pos - floor(pos)) * (x_ceil(pos) - x_floor(pos))``.
Because ``pos`` is the same float64 expression on both engines and the
values themselves are float64-exact integers, the result is bit-identical to
the oracle before any rounding — eliminating the 1-ulp flake risk of
engine-internal percentile accumulations.

Plan shape: the histogram groupBy is one shuffle whose map-side combine
collapses each task's pixels to <= |domain| rows per group; the percentile
walk runs over that tiny frame with two window passes. No aggregate ever
buffers a group's full value population.

Reference behavior: percentile stretch bounds in visualization/mapper.py
(2-98% stretch) and zonal distribution summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hist_percentiles(
    hist: DataFrame,
    group_cols: list[str],
    probs: dict[str, float],
    v_col: str = "v",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Exact interpolated percentiles from a ``(group..., v, cnt)`` histogram.

    ``probs`` maps output column name -> probability in [0, 1]. Returns one
    row per group with the requested percentile columns (double).

    The window partitions are per-group histograms (<= |value domain| rows),
    so the sort is bounded and tiny even when the underlying population is
    billions of rows.
    """
    gcols = [F.col(c) for c in group_cols]
    w_cum = Window.partitionBy(*gcols).orderBy(v_col)
    w_all = Window.partitionBy(*gcols)
    base = (
        hist.withColumn("_cum", F.sum(cnt_col).over(w_cum))
        .withColumn("_n", F.sum(cnt_col).over(w_all))
        .withColumn("_prev", F.col("_cum") - F.col(cnt_col))
    )
    # row covers 0-based sorted indices [_prev, _cum); percentile p needs the
    # values at indices floor(pos) and ceil(pos), pos = p*(n-1)
    aggs = []
    for name, p in probs.items():
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        k_lo, k_hi = F.floor(pos), F.ceil(pos)
        v = F.col(v_col).cast("double")
        aggs.append(
            F.max(
                F.when((F.col("_prev") <= k_lo) & (k_lo < F.col("_cum")), v)
            ).alias(f"_lo_{name}")
        )
        aggs.append(
            F.max(
                F.when((F.col("_prev") <= k_hi) & (k_hi < F.col("_cum")), v)
            ).alias(f"_hi_{name}")
        )
    out = base.groupBy(*gcols).agg(F.max("_n").alias("_n"), *aggs)
    for name, p in probs.items():
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        frac = pos - F.floor(pos).cast("double")
        lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        out = out.withColumn(name, lo + frac * (hi - lo))
    return out.select(*group_cols, *probs.keys())


def approx_percentiles(
    df: DataFrame,
    group_cols: list[str],
    probs: dict[str, float],
    v_col: str = "v",
    accuracy: int = 10_000,
) -> DataFrame:
    """The continuous-data companion to hist_percentiles: mergeable
    ``percentile_approx`` sketches (Greenwald-Khanna, map-side partials of
    bounded size ~O(accuracy)), for value domains too wide or too dense for
    an exact value histogram. Guaranteed rank error <= 1/accuracy, so at the
    default accuracy a p50 estimate sits within the [0.4999, 0.5001] rank
    band regardless of population size — the per-group state is a sketch,
    never the value population (the same no-buffering plan contract as
    hist_percentiles; see queries_products.approx_percentile_contract for
    the measured-error gate)."""
    gcols = [F.col(c) for c in group_cols]
    aggs = [
        F.percentile_approx(F.col(v_col).cast("double"), float(p), accuracy).alias(name)
        for name, p in probs.items()
    ]
    return df.groupBy(*gcols).agg(*aggs)
