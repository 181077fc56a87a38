"""kNN join via cell k-ring expansion (north rule; SURVEY §2.3 kNN row).

The H3 k-ring pattern on the quad grid: index both point sets at a resolution
``res``, explode each query point's Chebyshev-k ring of cells, equi-join on
cell id (a plain shuffle/broadcast hash join), then a distance-bounded
windowed top-k.

Completeness guarantee: a ring of radius R around a point's cell contains
every point within euclidean distance R*cell_size. The driver loop doubles R
until the observed kth-neighbor distance of every query satisfies
d_k < R*cell_size (usually one iteration) — so results are provably exact,
never approximate.

Scale notes: ring explosion is (2R+1)^2 rows per query — at R=1 a 9x
amplification of the (small) query side only; the build side shuffles once on
cell_id; AQE skew-join splits hot cells. Distances use exact arithmetic on
coordinates (dist_sq), ties broken by neighbor id for determinism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import grid


def _with_cell(df: DataFrame, res: int, col: str = "cell_id") -> DataFrame:
    @F.pandas_udf("long")
    def cell_of(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(grid.cell_of_xy(x.to_numpy(), y.to_numpy(), res))

    return df.withColumn(col, cell_of("x", "y"))


def _ring_explode(df: DataFrame, res: int, radius: int) -> DataFrame:
    @F.pandas_udf("array<long>")
    def ring(cell: pd.Series) -> pd.Series:
        rings = grid.k_ring(cell.to_numpy(), radius)
        return pd.Series([r.tolist() for r in rings])

    return df.withColumn("probe_cell", F.explode(ring("cell_id")))


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    res: int = grid.JOIN_RES,
    init_radius: int = 1,
    max_radius: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact k-nearest-neighbors of each query point among targets.

    Inputs need columns (point_id, x, y). Output:
    (point_id, rank, neighbor_id, dist_sq), rank 1..k ordered by
    (dist_sq, neighbor_id).
    """
    q = _with_cell(queries.select("point_id", "x", "y"), res)
    t = _with_cell(targets.select("point_id", "x", "y"), res).select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        F.col("cell_id").alias("probe_cell"),
    )

    cs = grid.cell_size(res)
    n_queries = q.count()
    radius = init_radius
    while radius <= max_radius:
        cand = _ring_explode(q, res, radius).join(t, "probe_cell")
        if exclude_self:
            cand = cand.filter(F.col("point_id") != F.col("neighbor_id"))
        dx = F.col("x") - F.col("nx")
        dy = F.col("y") - F.col("ny")
        # plain multiplication (not pow) keeps integer-valued doubles exact
        d = cand.withColumn("dist_sq", dx * dx + dy * dy)
        win = Window.partitionBy("point_id").orderBy("dist_sq", "neighbor_id")
        topk = (
            d.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("point_id", "rank", "neighbor_id", "dist_sq")
        ).persist()
        # completeness: every query found k neighbors, all within R*cell_size
        # — one aggregation job over the per-query stats
        chk = (
            topk.groupBy("point_id")
            .agg(F.count("*").alias("n"), F.max("dist_sq").alias("dk"))
            .agg(
                F.count("*").alias("n_q"),
                F.sum(
                    ((F.col("n") < k) | (F.col("dk") >= (radius * cs) ** 2)).cast("int")
                ).alias("bad"),
            )
            .first()
        )
        if chk.n_q == n_queries and chk.bad == 0:
            return topk
        topk.unpersist()
        radius *= 2
    raise RuntimeError(f"knn_join did not converge within radius {max_radius}")
