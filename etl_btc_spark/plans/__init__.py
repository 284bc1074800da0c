"""Query registry consumed by __spark_entry__.py, tests and bench.py."""

from etl_btc_spark.plans.queries import REGISTRY, Query  # noqa: F401
