"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H-style pricing summary) on sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 + the LLM
                  pipeline extensions, one callable per query.
oracle_sql()   -> DuckDB-equivalent SQL per query (omitted only for operators
                  whose hashing is engine-specific — approximate LSH paths and
                  the Pandas-UDF decode stub — which get rows-only checks).

Implementation lives in ophidia_server_spark/ (registry.py collects the map).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ophidia_server_spark.registry import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
