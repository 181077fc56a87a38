"""Z-order layout: bit-interleave formula vs the vectorized grid.py Morton
helpers, locality vs row-major, and the driver query's 2x2-block invariant."""

from __future__ import annotations

import numpy as np

from gridfia_spark import grid


def _zkey_formula(tx: np.ndarray, ty: np.ndarray, bits: int = 8) -> np.ndarray:
    """The query/oracle formulation: sum of shifted bit picks."""
    z = np.zeros_like(tx, dtype=np.int64)
    for b in range(bits):
        z += (((tx >> b) & 1) << (2 * b)) + (((ty >> b) & 1) << (2 * b + 1))
    return z


def test_formula_matches_grid_morton():
    """The SQL-portable sum-of-bits formula equals grid.py's magic-constant
    interleave (x on even bits, y on odd bits) — one Morton order engine-wide."""
    rng = np.random.default_rng(3)
    tx = rng.integers(0, 256, size=500).astype(np.int64)
    ty = rng.integers(0, 256, size=500).astype(np.int64)
    ref = (grid._part1by1(tx) | (grid._part1by1(ty) << np.uint64(1))).astype(
        np.int64
    )
    np.testing.assert_array_equal(_zkey_formula(tx, ty), ref)


def test_z_blocks_are_squares_row_major_blocks_are_stripes():
    """The storage-layout claim: equal-size file groups cut by zkey have
    bounded max side (compact squares), row-major groups degrade to full-width
    stripes — so parquet (tx, ty) min/max stats prune bbox queries only under
    the z layout."""
    n = 32
    ty, tx = np.mgrid[0:n, 0:n]
    tx, ty = tx.ravel().astype(np.int64), ty.ravel().astype(np.int64)
    z = _zkey_formula(tx, ty)
    for key, max_side in ((z // 16, 4), ((ty * n + tx) // 16, 16)):
        sides = []
        for k in np.unique(key):
            m = key == k
            sides.append(
                max(tx[m].max() - tx[m].min() + 1, ty[m].max() - ty[m].min() + 1)
            )
        # 16-cell groups: 4x4 squares under z-order, 16x1 stripes row-major
        assert max(sides) == max_side


def test_zorder_layout_query_blocks_are_2x2(spark):
    """Driver-query invariant independent of grid shape: 4 consecutive z keys
    always live inside one 2x2-aligned square, so every bucket's bbox spans
    at most 2 tiles per axis."""
    from gridfia_spark import queries_products as qp

    rows = qp.zorder_layout(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_tiles for r in rows) > 0
    for r in rows:
        assert r.n_tiles <= 4
        assert r.max_tx - r.min_tx <= 1
        assert r.max_ty - r.min_ty <= 1
        assert r.bbox_area <= 4


def test_clustered_write_prunes_bbox_scans(spark, tmp_path):
    """The deployment claim behind zorder_layout, executed: a z-clustered
    write gives each parquet file a compact (tile_x, tile_y) footprint, so a
    bbox query's candidate set (files whose min/max stats intersect the
    window) is a small fraction of the table; the unclustered layout keeps
    every file a candidate."""
    import pyspark.sql.functions as F

    from gridfia_spark.datagen import tiles as tgen
    from gridfia_spark.queries import _join_res
    from gridfia_spark.sources import table

    sf_dir = "/root/testdata/sf0.01"
    tiles = tgen.ensure_tiles(spark, sf_dir)
    res = _join_res(sf_dir)

    def file_footprints(path):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"), "tile_x", "tile_y"
        )
        return {
            r.f: (r.min_x, r.max_x, r.min_y, r.max_y)
            for r in df.groupBy("f")
            .agg(
                F.min("tile_x").alias("min_x"), F.max("tile_x").alias("max_x"),
                F.min("tile_y").alias("min_y"), F.max("tile_y").alias("max_y"),
            )
            .collect()
        }

    def candidates(fps, bbox):
        x0, x1, y0, y1 = bbox
        return sum(
            1
            for mnx, mxx, mny, mxy in fps.values()
            if mnx <= x1 and mxx >= x0 and mny <= y1 and mxy >= y0
        )

    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "rowmajor")
    assert table.write_tiles(tiles, zpath, res, cluster=True, n_files=8) == "parquet"
    # anti-layout: range-cluster by row-major order -> full-width stripes
    anti = table.enriched_tiles(tiles, res).repartitionByRange(
        8, "tile_y", "tile_x"
    )
    anti.write.mode("overwrite").parquet(rpath)

    zfp, rfp = file_footprints(zpath), file_footprints(rpath)
    quarter = (0, 1, 0, 1)  # top-left 2x2 tile window of the 4x4 grid
    z_frac = candidates(zfp, quarter) / len(zfp)
    r_frac = candidates(rfp, quarter) / len(rfp)
    assert z_frac <= 0.5, f"z layout should prune: {z_frac=} {zfp=}"
    assert z_frac <= r_frac
    # row coverage identical either way
    n = spark.read.parquet(zpath).count()
    assert n == spark.read.parquet(rpath).count() == tiles.count()


def test_compaction_preserves_content_and_layout(spark, tmp_path):
    """compact_tiles shrinks the file count, keeps every row bit-identical,
    and keeps the z-clustered bbox-pruning property."""
    import os

    import pyspark.sql.functions as F

    from gridfia_spark.datagen import tiles as tgen
    from gridfia_spark.queries import _join_res
    from gridfia_spark.sources import table

    sf_dir = "/root/testdata/sf0.01"
    tiles = tgen.ensure_tiles(spark, sf_dir)
    path = str(tmp_path / "store")
    # fragment the store: one file per input partition x species write
    table.enriched_tiles(tiles, _join_res(sf_dir)).repartition(24).write.mode(
        "overwrite"
    ).parquet(path)
    before_files = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    before = {
        (r.image_id, r.cell_id)
        for r in spark.read.parquet(path).select("image_id", "cell_id").collect()
    }
    n_after = table.compact_tiles(spark, path, target_files=4)
    assert n_after <= 4 < before_files
    after_rows = spark.read.parquet(path).select("image_id", "cell_id").collect()
    assert {(r.image_id, r.cell_id) for r in after_rows} == before
    # layout check: each compacted file covers a contiguous cell_id range
    fp = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), "cell_id")
        .groupBy("f")
        .agg(F.min("cell_id").alias("lo"), F.max("cell_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in fp)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # non-overlapping ranges -> range pruning works
