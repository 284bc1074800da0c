"""Table loading + canonical derived views over the driver testdata.

TESTDATA.md tables: region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table at
``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB these would be partitioned parquet/Delta datasets (date- or
hash-partitioned); ``spark.read.parquet`` on a directory keeps the
exact same call shape, and every query in plans/queries.py expresses
filters/projections declaratively so partition pruning + predicate
pushdown apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: number of synthetic price series derived from `events`
#: (FIXTURES.md §1: one series per ``user_id % N_SERIES``). On real
#: data the series key is the instrument symbol — cardinality scales
#: with the data, so per-series work stays partition-parallel.
N_SERIES = 8


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: r18 (optimization round, VERDICT r17 #6 — the per-query fixed
#: floor): every ``load_table`` call paid a fresh ``spark.read
#: .parquet`` — driver-side file listing + parquet footer schema
#: read + py4j round-trips — per TABLE per QUERY (q07 alone touches
#: six tables; profile_floor measured ~0.2-0.4 s of pure
#: plan-construction time on scan-only queries). The cache below
#: reuses the ANALYZED lazy DataFrame per (application, sf_dir,
#: table). This is plan-object reuse, NOT result caching: a
#: DataFrame is an immutable lazy plan, every action still reads the
#: parquet bytes from disk, and nothing is persisted across runs —
#: a new session (new applicationId) starts cold. The fixture tables
#: are immutable by the driver contract (queries that write tables
#: use their own artifact paths, never these).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # version/conf this surfaces two ways, and we normalize BOTH to
        # the same TIMESTAMP_NTZ-at-microsecond column (truncation —
        # matching DuckDB's ns→us parquet read, which is the oracle):
        #   * bigint — when spark.sql.legacy.parquet.nanosAsLong was set
        #     at session build (session.DEFAULT_CONF does): rebuild from
        #     the raw int64 nanos via timezone-free NTZ interval
        #     arithmetic (see the r8 note below).
        #   * timestamp_ntz — native nanos read (pyspark ≥ 4.1 reads
        #     TIMESTAMP(NANOS) directly, truncating to micros; the
        #     legacy conf is ignored when set after session start, so a
        #     foreign/plain session lands here): already the value we
        #     want, just pin the NTZ type.
        raw = spark.read.parquet(table_path(sf_dir, name))
        ts_kind = dict(raw.dtypes)["ts"]
        if ts_kind == "bigint":
            # review r8: the previous convert_timezone(UTC, UTC,
            # timestamp_micros(...)) did NOT pin UTC wall-clock — the
            # implicit LTZ→NTZ cast inside convert_timezone uses the
            # SESSION timezone, so a non-UTC foreign session shifted
            # every events timestamp by its UTC offset (verified
            # empirically). Pure interval arithmetic on an NTZ base is
            # timezone-free by construction: NTZ-epoch + micros as an
            # exact DECIMAL seconds interval.
            return raw.withColumn(
                "ts",
                F.expr(
                    "to_timestamp_ntz('1970-01-01 00:00:00') + make_interval("
                    "0, 0, 0, 0, 0, 0, "
                    "CAST(ts DIV 1000 AS DECIMAL(26,0)) / 1000000)"
                ),
            )
        return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def price_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical OHLC-ish fixture series (FIXTURES.md §1).

    Maps `events` onto the reference's hourly-candle shape
    (airflow/dags/btc_usdt_etl_dag.py:46): one price series per
    ``series_id = user_id % N_SERIES``, time axis ``ts``, price
    ``close = value``, and deterministic High/Low bracketing for the
    ADX-style H/L/C operators.

    Columns: series_id, ts, close, high, low.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        (F.col("user_id") % F.lit(N_SERIES)).cast("bigint").alias("series_id"),
        F.col("ts"),
        F.col("value").alias("close"),
        (F.col("value") * F.lit(1.01)).alias("high"),
        (F.col("value") * F.lit(0.99)).alias("low"),
    )


#: SQL fragment producing the identical series for the DuckDB oracle
#: (interpolates N_SERIES — review r8: a hardcoded % 8 here could
#: silently diverge from the python constant).
PRICE_SERIES_SQL = (
    f"SELECT user_id % {N_SERIES} AS series_id, ts, value AS close, "
    "value * 1.01 AS high, value * 0.99 AS low FROM events"
)
