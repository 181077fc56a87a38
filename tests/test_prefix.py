"""Distributed prefix sum: exactness vs the single-task window form, and
the plan guarantee that no global-order window (SinglePartition exchange)
appears."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from gridfia_spark.functions import prefix


@pytest.mark.parametrize("n,parts", [(1, 2), (97, 3), (5000, 8)])
def test_prefix_sum_matches_global_window(spark, n, parts):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 1000 - 300).alias("v"),
    )
    got = {
        r.k: r.cum
        for r in prefix.prefix_sum(df, "k", "v", num_partitions=parts).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want and len(got) == n


def test_prefix_sum_plan_has_no_single_partition_window(spark):
    df = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = prefix.prefix_sum(df, "k", "v", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(_b" in plan


def test_prefix_sum_persist_mode_equals_default(spark):
    """persist=True caches the input for the three passes; results are
    bit-identical to the recompute-safe default, and the cache is
    releasable by the caller."""
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 700 - 100).alias("v"),
    )
    plain = {r.k: r.cum for r in prefix.prefix_sum(df, "k", "v").collect()}
    cached = prefix.prefix_sum(df, "k", "v", persist=True)
    got = {r.k: r.cum for r in cached.collect()}
    assert got == plain
    spark.catalog.clearCache()
