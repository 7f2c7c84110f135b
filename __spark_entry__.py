"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (instantiated on the driver fixtures per
FIXTURES.md §2) for the DuckDB differential harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flat_file_social_media_database_engine_spark import workloads
from flat_file_social_media_database_engine_spark.workloads import ORACLE, QUERIES

workloads.load_all()

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary (single-pass grouped multi-aggregate —
    the reference's A1 conditional-count pattern at scale)."""
    return QUERIES["q_pricing_summary"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
