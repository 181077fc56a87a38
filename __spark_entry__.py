"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (per-county zonal total biomass) at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — matching self-contained DuckDB SQL; the synthetic tile
                universe is pure int64 math, so oracles regenerate pixel
                values via generate_series (see gridfia_spark/datagen).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gridfia_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.zonal_total_biomass(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.registry()


def oracle_sql() -> dict[str, str]:
    return Q.oracles()
