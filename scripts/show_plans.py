#!/usr/bin/env python
"""Print the physical plans documented in PLANS.md (for re-verification)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.operators import broadcast_join, decode, knn
from gridfia_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(cores=8)
    tiles = tgen.ensure_tiles(spark, SF)
    polys = tgen.polygons_df(spark, SF)
    meta = decode.with_tile_meta(tiles)
    pts = tgen.points_df(spark, SF)

    print("===== assign_tiles_fast (map-only, bytes pruned) =====")
    broadcast_join.assign_tiles_fast(meta, polys, res=15).explain("formatted")
    print("===== zonal_stats_fast (map + one partial/final agg) =====")
    broadcast_join.zonal_stats_fast(tiles, polys, species=0, res=15).explain("formatted")
    print("===== knn ring join =====")
    # one ring iteration's plan (the loop reuses it)
    q = knn._with_cell(pts.select("point_id", "x", "y"), 15)
    t = knn._with_cell(pts.select("point_id", "x", "y"), 15).selectExpr(
        "point_id as neighbor_id", "x as nx", "y as ny", "cell_id as probe_cell"
    )
    knn._ring_explode(q, 15, 1).join(t, "probe_cell").explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
