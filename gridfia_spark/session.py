"""SparkSession factory tuned for the tile engine.

Local defaults mirror what the cluster deployment would set via
``spark-submit --conf``: Arrow-batched Python UDF transport, AQE with skew
join handling, modest shuffle parallelism sized to the test scale. On a real
cluster the same builder adds an Iceberg catalog (see sources/table.py) —
the sandbox has no Iceberg runtime jar, so table I/O degrades to partitioned
Parquet with the same layout.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "gridfia-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() if cores == "*" else int(cores)
    n_shuffle = shuffle_partitions or max(n_cores, 8)
    # scan-split size scales inversely with parallelism: ~4 task waves at
    # any core count (few fat tasks starve many cores; many thin tasks
    # drown few cores in per-task overhead)
    mpb_mb = max(48 // n_cores, 2)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Arrow everywhere: all kernels are pandas/Arrow UDFs (input_hint).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # AQE: runtime coalescing + skew-join splitting (north rule).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.files.maxPartitionBytes", f"{mpb_mb}m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
