"""Spatial joins: broadcast cell-prefix hash join + ray-casting refinement.

The engine's centerpiece (north rule; SURVEY §2.3 J1-J3). Both sides are
indexed into the same single-resolution cell grid (the H3-polyfill analogue):

- polygons -> covering cells ``(poly_id, cell_id, fully_inside)`` — tiny
  dimension, broadcast;
- probes (points or tiles) -> their cell id(s) at the same resolution.

The join is then a plain equi-join on ``cell_id`` (hash join, broadcastable),
followed by exact refinement **only for cells not fully inside** — refinement
is vectorized ray-casting PIP in a pandas UDF, never per-row Python.

Why this scales: the equi-join shuffles nothing when the polygon side is
broadcast; the refinement UDF sees only the boundary sliver of candidates;
Iceberg/Parquet min-max pruning on ``cell_id`` (tiles are written sorted by
cell) prunes non-overlapping files before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import geom, grid
from . import decode


def polygon_cells_df(
    spark: SparkSession, polygons: DataFrame, res: int = grid.JOIN_RES
) -> DataFrame:
    """Single-resolution covering cells per polygon.

    The polygon dimension is small (boundaries: states/counties), so coverings
    are computed on the driver and broadcast — the same place the reference
    holds its GeoDataFrame in memory (boundaries.py:30-49). For a large
    polygon side the identical covering kernel runs distributed via
    ``mapInPandas`` over the polygon table instead.
    """
    rows = []
    for r in polygons.select("poly_id", "geom_wkb").collect():
        rings = geom.wkb_to_polygon(bytes(r.geom_wkb))
        cells, full = geom.polygon_covering(rings, min(res, 10), res)
        # normalize coarse fully-inside cells down to `res` children
        for c, f in zip(cells.tolist(), full.tolist()):
            _, _, cres = grid.decode_cell(np.asarray([c]))
            if int(cres[0]) == res:
                rows.append((r.poly_id, int(c), bool(f)))
            else:
                stack = [int(c)]
                while stack:
                    cur = stack.pop()
                    _, _, cr = grid.decode_cell(np.asarray([cur]))
                    if int(cr[0]) == res:
                        rows.append((r.poly_id, cur, True))
                    else:
                        stack.extend(int(ch) for ch in grid.children(cur))
    return spark.createDataFrame(rows, "poly_id string, cell_id long, fully_inside boolean")


def with_point_cells(points: DataFrame, res: int = grid.JOIN_RES) -> DataFrame:
    @F.pandas_udf("long")
    def cell_of(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(grid.cell_of_xy(x.to_numpy(), y.to_numpy(), res))

    return points.withColumn("cell_id", cell_of("x", "y"))


def _pip_refine(cand: DataFrame, polygons: DataFrame) -> DataFrame:
    """Filter candidate rows (must have x, y, poly_id) to those whose point is
    inside the polygon — vectorized ray casting, batched per polygon."""
    withwkb = cand.join(
        F.broadcast(polygons.select("poly_id", "geom_wkb")), "poly_id"
    )
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cand.schema)
    out_cols = [f.name for f in cand.schema]  # plain list: no DataFrame in closure

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep_parts = []
            for _, g in pdf.groupby("poly_id", sort=False):
                rings = geom.wkb_to_polygon(bytes(g["geom_wkb"].iloc[0]))
                mask = geom.points_in_polygon(
                    g["x"].to_numpy(), g["y"].to_numpy(), rings
                )
                keep_parts.append(g.loc[mask])
            if keep_parts:
                yield pd.concat(keep_parts)[out_cols]

    return withwkb.mapInPandas(refine, schema)


def join_points_polygons(
    points: DataFrame,
    polygons: DataFrame,
    res: int = grid.JOIN_RES,
) -> DataFrame:
    """Inner spatial join point-in-polygon -> (point columns..., poly_id).

    Semantics match gpd.sjoin(..., predicate='intersects') for points
    (parallel_processing.py:90-91).
    """
    spark = points.sparkSession
    cells = polygon_cells_df(spark, polygons, res)
    pts = with_point_cells(points, res)
    cand = pts.join(F.broadcast(cells), "cell_id")
    sure = cand.filter(F.col("fully_inside")).drop("fully_inside", "cell_id")
    maybe = cand.filter(~F.col("fully_inside")).drop("fully_inside", "cell_id")
    refined = _pip_refine(maybe, polygons)
    return sure.unionByName(refined)


def join_tiles_polygons(
    tiles_meta: DataFrame,
    polygons: DataFrame,
    res: int = grid.JOIN_RES,
) -> DataFrame:
    """Candidate tile×polygon pairs via the cell-prefix join.

    Returns one row per (image_id, poly_id) with ``tile_inside`` = the whole
    tile is provably inside the polygon (every covering cell of the tile is a
    fully-inside polygon cell) — pairs with ``tile_inside`` skip per-pixel PIP
    in zonal aggregation. Candidate pairs where only boundary cells touch are
    a superset; exact per-pixel refinement happens downstream.
    """
    spark = tiles_meta.sparkSession
    pcells = polygon_cells_df(spark, polygons, res)
    # n_tile_cells rides along as a column (no extra shuffle for the count)
    tcells = decode.with_tile_cells(tiles_meta, res).select(
        "image_id", "cell_id", "n_tile_cells", "xmin", "ymin", "xmax", "ymax"
    )
    j = tcells.join(F.broadcast(pcells), "cell_id")
    agg = j.groupBy("image_id", "poly_id").agg(
        F.count("*").alias("n_hit"),
        F.min(F.col("fully_inside").cast("int")).alias("all_full"),
        F.first("n_tile_cells").alias("n_tile_cells"),
        F.first("xmin").alias("xmin"),
        F.first("ymin").alias("ymin"),
        F.first("xmax").alias("xmax"),
        F.first("ymax").alias("ymax"),
    )
    out = agg.withColumn(
        "tile_inside",
        (F.col("n_hit") == F.col("n_tile_cells")) & (F.col("all_full") == 1),
    )
    return out.select(
        "image_id", "poly_id", "tile_inside", "xmin", "ymin", "xmax", "ymax"
    )


def assign_tiles(
    tiles_meta: DataFrame, polygons: DataFrame, res: int = grid.JOIN_RES
) -> DataFrame:
    """Vector→raster **tile assignment** (north rule): exact set of
    (poly_id, image_id) pairs whose tile rectangle intersects the polygon.

    Candidates from the cell join are refined with an exact rectangle-polygon
    relation test (corners-in + edge-clip), so the output rows are exact — the
    contract checked against the reference's sjoin indices."""
    cand = join_tiles_polygons(tiles_meta, polygons, res)
    sure = cand.filter(F.col("tile_inside")).select("poly_id", "image_id")
    maybe = cand.filter(~F.col("tile_inside")).join(
        F.broadcast(polygons.select("poly_id", "geom_wkb")), "poly_id"
    )

    # Assignment contract is positive-area overlap (edge-touching tiles are
    # NOT assigned) — shrink the rect by eps before the exact relation test;
    # all fixture coordinates are integers, so eps cannot flip a true overlap.
    eps = 1e-3

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = []
            for row in pdf.itertuples(index=False):
                rings = geom.wkb_to_polygon(bytes(row.geom_wkb))
                rel = geom.rect_relation(
                    rings, row.xmin + eps, row.ymin + eps, row.xmax - eps, row.ymax - eps
                )
                if rel != "outside":
                    keep.append((row.poly_id, row.image_id))
            if keep:
                yield pd.DataFrame(keep, columns=["poly_id", "image_id"])

    refined = maybe.mapInPandas(refine, "poly_id string, image_id string")
    return sure.unionByName(refined)
