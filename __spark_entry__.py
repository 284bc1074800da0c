"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query registry
(etl_btc_spark/plans/queries.py): every SURVEY.md §2 operator has a
named DataFrame program there, and — where ANSI-SQL-expressible — a
DuckDB oracle with column-for-column identical aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_btc_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 v1 slice): events → per-series close
    price → Bollinger(20,2) bands + strict-crossover buy/sell signals,
    time-sorted. Pure Window/DataFrame API, zero UDFs."""
    return REGISTRY["q17_bollinger_signals"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
