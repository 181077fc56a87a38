"""As-of (most-recent-prior) join — a canonical time-series operator Spark
lacks natively, expressed as a composition of built-in operators.

For each left row, attach the latest right row with ``right.ts <= left.ts``
(inclusive backward direction) within the same key — the point-in-time
lookup of feature stores and event pipelines.

Plan shape (the scale path): tag both sides, union, ONE window pass of
``last(value, ignorenulls=True)`` ordered by (ts, side) per key, keep left
rows. No range explosion, no per-key crossJoin, no binary search per row —
a single shuffle on the key, linear work per partition, AQE-skew-splittable
like any window. Equivalent to pandas ``merge_asof(direction='backward')``
per key and to DuckDB ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_vals: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: left columns + ``<prefix><v>`` for each right value
    column (null when no right row at or before the left timestamp).

    Precondition for determinism: at most one right row per (key, ts) —
    pre-aggregate the right side otherwise."""
    l = left.withColumn("_src", F.lit(1))
    r = right.select(
        *on, ts, *[F.col(v).alias(f"{prefix}{v}") for v in right_vals]
    ).withColumn("_src", F.lit(0))
    for v in right_vals:
        l = l.withColumn(f"{prefix}{v}", F.lit(None).cast(r.schema[f"{prefix}{v}"].dataType))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    both = l.unionByName(r.select(*l.columns))
    # right rows (_src=0) sort before left rows at the same ts -> inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in right_vals:
        both = both.withColumn(
            f"{prefix}{v}", F.last(f"{prefix}{v}", ignorenulls=True).over(w)
        )
    return both.filter(F.col("_src") == 1).drop("_src")
