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


def covering_at_res(rings: list[np.ndarray], res: int) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells of one polygon, normalized to a single resolution:
    run the multi-level covering (geom.polygon_covering), then expand each
    coarse fully-inside cell into its 2^k x 2^k block of ``res`` children —
    all vectorized per level. Returns (cells int64, fully_inside bool)."""
    cells, full = geom.polygon_covering(rings, min(res, 10), res)
    if cells.size == 0:
        # polygon entirely outside the grid extent: zero covering rows (the
        # pre-refactor inline loops emitted nothing; np.concatenate would
        # raise and kill the whole mapInPandas task in polygon_cells_dist)
        return np.empty(0, np.int64), np.empty(0, bool)
    ix, iy, rr = grid.decode_cell(cells)
    out_cells, out_full = [], []
    for level in np.unique(rr):
        sel = rr == level
        shift = int(res - level)
        if shift == 0:
            out_cells.append(cells[sel])
            out_full.append(full[sel])
        else:
            k = 1 << shift
            offs = np.arange(k, dtype=np.int64)
            ox, oy = np.meshgrid(offs, offs)
            bx = (ix[sel][:, None] << shift) + ox.ravel()[None, :]
            by = (iy[sel][:, None] << shift) + oy.ravel()[None, :]
            out_cells.append(grid.encode_cell(bx.ravel(), by.ravel(), res))
            out_full.append(np.repeat(full[sel], k * k))
    return np.concatenate(out_cells), np.concatenate(out_full)


def polygon_cells_df(
    spark: SparkSession, polygons: DataFrame, res: int = grid.JOIN_RES
) -> DataFrame:
    """Single-resolution covering cells per polygon, built on the driver.

    Right plan when the polygon dimension is small (boundaries:
    states/counties) — the same place the reference holds its GeoDataFrame
    in memory (boundaries.py:30-49). For a LARGE polygon side use
    ``polygon_cells_dist``: the identical kernel inside ``mapInPandas``.
    """
    from ..localdf import local_df

    rows = []
    for r in polygons.select("poly_id", "geom_wkb").collect():
        rings = geom.wkb_to_polygon(bytes(r.geom_wkb))
        cells, full = covering_at_res(rings, res)
        rows.extend(
            (r.poly_id, int(c), bool(f)) for c, f in zip(cells.tolist(), full.tolist())
        )
    return local_df(
        spark, rows, "poly_id string, cell_id long, fully_inside boolean"
    )


def polygon_cells_dist(polygons: DataFrame, res: int = grid.JOIN_RES) -> DataFrame:
    """Distributed covering: the identical covering kernel runs inside
    ``mapInPandas`` over the polygon table — the scale path when the polygon
    side is itself large (millions of polygons), where a driver-side
    covering + collect would bottleneck. One row per (poly_id, cell_id);
    tested equal to the driver-side covering."""
    cols = polygons.select("poly_id", "geom_wkb")

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cells, fulls = [], [], []
            for r in pdf.itertuples(index=False):
                rings = geom.wkb_to_polygon(bytes(r.geom_wkb))
                c, f = covering_at_res(rings, res)
                ids.append(np.full(c.size, r.poly_id, dtype=object))
                cells.append(c)
                fulls.append(f)
            if ids:
                yield pd.DataFrame(
                    {
                        "poly_id": np.concatenate(ids),
                        "cell_id": np.concatenate(cells),
                        "fully_inside": np.concatenate(fulls),
                    }
                )

    return cols.mapInPandas(
        cover, "poly_id string, cell_id long, fully_inside boolean"
    )


def with_point_cells(points: DataFrame, res: int = grid.JOIN_RES) -> DataFrame:
    """Cell id as a JVM column expression (grid.cell_of_xy_col): bit-identical
    to the numpy encode, no ArrowEvalPython round-trip, no UDF duplication
    from null-filter pushdown (guide §4.4)."""
    return points.withColumn(
        "cell_id", grid.cell_of_xy_col(F.col("x"), F.col("y"), res)
    )


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
    distributed: bool = False,
) -> DataFrame:
    """Inner spatial join point-in-polygon -> (point columns..., poly_id).

    Semantics match gpd.sjoin(..., predicate='intersects') for points
    (parallel_processing.py:90-91). ``distributed=True`` computes the
    polygon covering inside the cluster (polygon_cells_dist) and lets AQE
    pick the join strategy — the plan for a large polygon side."""
    spark = points.sparkSession
    if distributed:
        cells = polygon_cells_dist(polygons, res)
        pts = with_point_cells(points, res)
        # large-polygon-side plan: never broadcast the covering (guide §3.1)
        cand = pts.join(cells.hint("shuffle_hash"), "cell_id")
        sure = cand.filter(F.col("fully_inside")).drop("fully_inside", "cell_id")
        maybe = cand.filter(~F.col("fully_inside")).drop("fully_inside", "cell_id")
        return sure.unionByName(_pip_refine(maybe, polygons))
    # Small polygon side: ONE map-only pass over a broadcast covering index
    # (same kernel as broadcast_join.assign_tiles_fast). The previous
    # cells-join + sure/maybe-union plan evaluated the point scan and its
    # cell UDF once per union branch (and the optimizer duplicated the UDF
    # around the pushed null-filter — guide §4.4: 4 ArrowEvalPython nodes),
    # plus three broadcast builds and a refine MapInPandas. This form is a
    # single ArrowEvalPython-free mapInPandas: cell probe, fully-inside
    # fast path and ray-cast refinement all happen on numpy inside one
    # batch pass; rows and schema are identical (tested equal).
    from pyspark.sql.types import StringType, StructField, StructType

    from .broadcast_join import PolygonIndex

    index = PolygonIndex.build(polygons, res)
    bc = spark.sparkContext.broadcast(index)
    in_cols = [f.name for f in points.schema.fields]
    out_schema = StructType(
        points.schema.fields + [StructField("poly_id", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        c2p = idx.cell_to_poly
        ids = np.asarray(idx.poly_ids, dtype=object)
        for pdf in batches:
            if pdf.empty:
                continue
            x = pdf["x"].to_numpy()
            y = pdf["y"].to_numpy()
            probe = pd.DataFrame(
                {
                    "row": np.arange(len(pdf), dtype=np.int64),
                    "cell_id": grid.cell_of_xy(x, y, idx.res),
                }
            )
            hits = probe.merge(c2p, on="cell_id", how="inner")
            if hits.empty:
                continue
            keep = [hits.loc[hits["fully_inside"], ["row", "pidx"]]]
            maybe = hits[~hits["fully_inside"]]
            for pidx, g in maybe.groupby("pidx", sort=False):
                rows = g["row"].to_numpy()
                mask = geom.points_in_polygon(x[rows], y[rows], idx.rings[int(pidx)])
                keep.append(pd.DataFrame({"row": rows[mask], "pidx": int(pidx)}))
            out = pd.concat(keep, ignore_index=True)
            if out.empty:
                continue
            res_pdf = pdf.iloc[out["row"].to_numpy()][in_cols].reset_index(drop=True)
            res_pdf["poly_id"] = ids[out["pidx"].to_numpy(dtype=np.int64)]
            yield res_pdf

    return points.mapInPandas(run, out_schema)


def join_tiles_polygons(
    tiles_meta: DataFrame,
    polygons: DataFrame,
    res: int = grid.JOIN_RES,
    distributed: bool = False,
    salted: bool = False,
    salt_k: int = 8,
    salt_threshold: int = 64,
) -> DataFrame:
    """Candidate tile×polygon pairs via the cell-prefix join.

    Returns one row per (image_id, poly_id) with ``tile_inside`` = the whole
    tile is provably inside the polygon (every covering cell of the tile is a
    fully-inside polygon cell) — pairs with ``tile_inside`` skip per-pixel PIP
    in zonal aggregation. Candidate pairs where only boundary cells touch are
    a superset; exact per-pixel refinement happens downstream.
    ``distributed=True`` builds the covering in-cluster (large polygon side).
    ``salted=True`` routes the cell equi-join through skew.salted_join: cells
    holding more than ``salt_threshold`` tile rows (dense urban clusters /
    a polygon covering most of the raster) are spread over ``salt_k``
    reducers — identical rows, no hot-key straggler.
    """
    spark = tiles_meta.sparkSession
    if distributed:
        pcells = polygon_cells_dist(polygons, res)
    else:
        pcells = polygon_cells_df(spark, polygons, res)
    # n_tile_cells rides along as a column (no extra shuffle for the count)
    tcells = decode.with_tile_cells(tiles_meta, res).select(
        "image_id", "cell_id", "n_tile_cells", "xmin", "ymin", "xmax", "ymax"
    )
    if salted:
        from . import skew

        j = skew.salted_join(
            tcells, pcells, on="cell_id", k=salt_k, threshold=salt_threshold
        )
    else:
        # distributed path: the covering frame is O(polygons x cells) — pin
        # shuffle_hash so a small local fixture's size estimate can never
        # flip the scale plan to a broadcast (guide §3.1)
        j = tcells.join(
            pcells.hint("shuffle_hash") if distributed else F.broadcast(pcells),
            "cell_id",
        )
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
