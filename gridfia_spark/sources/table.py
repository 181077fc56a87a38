"""Iceberg-first table layer with a Parquet fallback.

The north rule targets Iceberg tables of image+caption rows. This sandbox
ships no Iceberg runtime jar, so the module selects the best available
backend at runtime:

- **Iceberg** (cluster): catalog configured via the standard confs below;
  writes use ``writeTo(...).createOrReplace()`` / ``append()``; snapshots
  give the resumability anchor (plans/lineage.py maps partition commits to
  ``snapshot_id``); min/max pruning on the ``cell_id``-sorted layout gives
  the pushdown-through-decode behavior (SURVEY §4 item 1).
- **Parquet** (sandbox): identical schema/layout on a path; the partition
  transform below is emulated by a bucket column.

Cluster session confs (spark-submit --conf ...):
    spark.sql.catalog.grid=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.grid.type=hadoop
    spark.sql.catalog.grid.warehouse=<path>
    spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

Table DDL (executed once on the cluster):
    CREATE TABLE grid.db.tiles (
        image_id string, bytes binary, w int, h int, fmt string,
        caption string, phash bigint,
        species_code string, tile_x int, tile_y int, cell_id bigint)
    USING iceberg
    PARTITIONED BY (species_code, bucket(64, image_id))
    TBLPROPERTIES ('write.distribution-mode'='hash',
                   'sort-order'='cell_id ASC')
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return spark.conf.get("spark.sql.catalog.grid", None) is not None
    except Exception:  # noqa: BLE001 — jar not on classpath
        return False


def enriched_tiles(tiles: DataFrame, join_res: int = 15) -> DataFrame:
    """Tile rows + layout columns (species_code, tile_x/y, cell_id) — the
    physical sort/partition keys that make file pruning fire."""
    from ..operators import decode

    meta = decode.with_tile_meta(tiles)
    from .. import grid

    # centroid cell id as a JVM column expression (bit-identical Morton
    # encode, no ArrowEvalPython round-trip — guide §4.1)
    cx = (F.col("xmin") + F.col("xmax")) / F.lit(2.0)
    cy = (F.col("ymin") + F.col("ymax")) / F.lit(2.0)
    return meta.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        F.col("code").alias("species_code"),
        F.col("tx").alias("tile_x"),
        F.col("ty").alias("tile_y"),
        grid.cell_of_xy_col(cx, cy, join_res).alias("cell_id"),
    )


def write_tiles(
    tiles: DataFrame,
    target: str,
    join_res: int = 15,
    cluster: bool = False,
    n_files: int | None = None,
) -> str:
    """Write the tile table to Iceberg (if available) or layout-equivalent
    Parquet. Returns the backend used.

    ``cluster=True`` range-partitions the write by the Morton ``cell_id``
    (``repartitionByRange`` + sort) so every output file covers one compact
    z-range — a spatially square-ish (tile_x, tile_y) footprint — and bbox
    scans prune to the few files whose min/max stats intersect the query
    window (Iceberg's 'sort-order' does this natively; this is the Parquet
    emulation, verified in tests/test_zorder.py). Without it, files are laid
    out by whatever partitioning the input arrived with, and every file is
    a candidate for every bbox."""
    spark = tiles.sparkSession
    df = enriched_tiles(tiles, join_res)
    if cluster:
        n = n_files or spark.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, "cell_id")
    df = df.sortWithinPartitions("cell_id")
    if iceberg_available(spark):
        df.writeTo(target).createOrReplace()
        return "iceberg"
    df.withColumn("bucket", F.abs(F.xxhash64("image_id")) % 64).write.mode(
        "overwrite"
    ).partitionBy("species_code").parquet(target)
    return "parquet"


def read_tiles(spark: SparkSession, target: str) -> DataFrame:
    """Read back the canonical 7 columns from either backend."""
    if iceberg_available(spark):
        df = spark.read.table(target)
    else:
        df = spark.read.parquet(target)
    return df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def compact_tiles(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction for the Parquet tile store — the
    rewrite-data-files maintenance job of the Iceberg deployment (Iceberg's
    ``rewriteDataFiles`` action does this natively; this is the Parquet
    emulation). Reads the store, range-repartitions by the Morton
    ``cell_id`` into ``target_files`` output files (so compaction PRESERVES
    the z-clustered layout and its file-level bbox pruning), and atomically
    swaps the rewritten store in via rename. Returns the new file count.

    Streaming appends (streaming/incremental.py) and per-batch writes leave
    many small files; at 100 TB unmanaged small files dominate scan
    planning time, which is why compaction is scheduled maintenance, not
    an option."""
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    (
        df.repartitionByRange(target_files, "cell_id")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = f"{path.rstrip('/')}._old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
