"""Banded range join — interval containment as an equi-join.

Joining values to ranges (``lo <= v < hi``) with a plain theta-join is a
broadcast nested loop: O(rows x ranges) comparisons. The banded plan maps
both sides onto fixed-width buckets — values to their bucket, ranges
exploded to every bucket they overlap — so the join becomes a hash
equi-join on the bucket id plus an exact residual filter. Work is
O(rows + ranges x span/width); the same trick as the spatial cell-prefix
join, one dimension down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    val: str,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Inner join of ``left`` rows to ``ranges`` rows with
    ``lo <= left[val] < hi`` via bucket banding + exact residual filter."""
    w = float(bucket_width)
    lb = left.withColumn("_b", F.floor(F.col(val) / w).cast("long"))
    rb = ranges.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                F.floor(F.col(hi) / w).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_b")
        .filter((F.col(val) >= F.col(lo)) & (F.col(val) < F.col(hi)))
        .drop("_b")
    )
