"""Explicit skew handling: salted repartition for hot cells (north rule).

Dense cells (urban clusters / many tiles in one covering cell) skew the
cell-prefix equi-join: one reducer gets the hot cell's whole payload. AQE's
skew-join splitting (on in session.py) handles the sort-merge case; this
module provides the *explicit* salting pattern for the hash-join path, plus
a hot-cell detector — correctness-preserving by construction and tested
salted == unsalted.

Pattern: probe side gets ``salt = hash(row) % k`` for hot cells (0 for
others); the build side replicates hot-cell rows k times (one per salt);
join on (cell_id, salt). Results are identical, the hot cell's work spreads
over k reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cells(cells: DataFrame, cell_col: str = "cell_id", threshold: int = 1000) -> DataFrame:
    """Cells whose row count exceeds ``threshold`` — the salting targets."""
    return (
        cells.groupBy(cell_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
        .select(cell_col)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str = "cell_id",
    k: int = 8,
    threshold: int = 1000,
) -> DataFrame:
    """Skew-safe inner equi-join on ``on``: identical rows to
    ``probe.join(build, on)``, with hot keys spread over ``k`` salts.

    probe: large side (e.g. exploded tile/point cells);
    build: smaller side (e.g. polygon covering cells) — hot keys replicated.
    """
    hot = hot_cells(probe, on, threshold).withColumn("is_hot", F.lit(True))
    p = (
        probe.join(F.broadcast(hot), on, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"), F.pmod(F.xxhash64(*probe.columns), F.lit(k))
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )
    salts = probe.sparkSession.range(k).select(F.col("id").cast("int").alias("salt"))
    b_hot = (
        build.join(F.broadcast(hot), on, "inner")
        .drop("is_hot")
        .crossJoin(F.broadcast(salts))
    )
    b_cold = build.join(F.broadcast(hot), on, "left_anti").withColumn(
        "salt", F.lit(0)
    )
    b = b_hot.unionByName(b_cold)
    return p.join(b, [on, "salt"]).drop("salt")
