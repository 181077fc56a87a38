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

    The matched right row is carried as a STRUCT, so the non-null marker is
    the row itself: a legitimately-NULL right value column stays NULL in the
    output (matching pandas merge_asof and DuckDB ASOF) instead of an older
    row's value leaking forward via ignorenulls.

    Precondition for determinism: at most one right row per (key, ts) —
    pre-aggregate the right side otherwise."""
    collisions = sorted(
        {f"{prefix}{v}" for v in right_vals} & set(left.columns)
    )
    if collisions:
        raise ValueError(
            f"asof output columns {collisions} collide with left columns; "
            "pass a different prefix"
        )
    r = right.select(
        *on,
        ts,
        F.struct(
            *[F.col(v).alias(f"{prefix}{v}") for v in right_vals]
        ).alias("_rv"),
    ).withColumn("_src", F.lit(0))
    l = left.withColumn("_src", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(r.schema["_rv"].dataType)
    )
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
    out = both.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_src") == 1
    )
    for v in right_vals:
        out = out.withColumn(f"{prefix}{v}", F.col("_rv")[f"{prefix}{v}"])
    return out.drop("_src", "_rv")
