"""Landing-zone sources beyond parquet (SURVEY.md §2.1 S3/S4).

Reference behavior being covered:

- S3: NewsAPI articles land as JSON and are scanned with server-side
  filters (airflow/dags/news_etl_dag.py:34-61) → ``spark.read.json``
  with an EXPLICIT schema. Never schema-infer in production: inference
  is an extra full pass over the data and a schema drift hazard; a
  declared schema also lets Catalyst prune columns at the scan.
- S4: Kaggle CSV scan + equality filter + head-N
  (migrationsservice/init_qdrant.py:276-281:
  ``read_csv("cryptonews.csv")`` → ``subject == 'bitcoin'`` →
  ``iloc[:500]``) → ``spark.read.csv(header=True, schema=...)`` +
  ``filter`` + deterministic ``orderBy().limit()``.

Both readers take a directory of part files — at 100 TB a landing
zone is thousands of files; Spark parallelizes the scan per file
split, and the filter is evaluated during the scan (JSON/CSV have no
footer statistics, so "pushdown" means scan-time evaluation + column
pruning, not row-group skipping — which is why landing data should be
compacted to parquet early; see q44's partitioned write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: schema of the document landing files (matches the `documents`
#: fixture minus the derived n_chars column)
DOC_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_json_docs(spark: SparkSession, path: str) -> DataFrame:
    """S3: line-delimited JSON scan with a declared schema."""
    return spark.read.schema(DOC_LANDING_SCHEMA).json(path)


def read_csv_docs(spark: SparkSession, path: str) -> DataFrame:
    """S4: CSV scan (header row, standard quoting) with a declared
    schema — no inference pass."""
    return (
        spark.read.schema(DOC_LANDING_SCHEMA)
        .option("header", "true")
        # enforceSchema=false (review r8): the default applies the
        # declared schema POSITIONALLY and skips the header without
        # validating it — a landing file with reordered columns would
        # silently misparse (text into doc_id as NULLs). Validating
        # the header against the schema fails loudly instead.
        .option("enforceSchema", "false")
        # multiLine (review r7): write_csv RFC-quotes embedded
        # newlines; the default line-splitting reader would cut such a
        # field into two records. Cost: multiLine CSV files are not
        # split mid-file — at scale, land MANY files (they already
        # are, per part-file) and compact to parquet early anyway.
        .option("multiLine", "true")
        .csv(path)
    )


def read_orc_docs(spark: SparkSession, path: str) -> DataFrame:
    """S3/S4 extension (r7): ORC landing scan with a declared schema.
    ORC is the other footer-indexed columnar format a lakehouse
    ingests (Hive-era warehouses hand exactly this over) — unlike
    JSON/CSV it carries stripe-level min/max statistics, so filters
    genuinely push down (PushedFilters in the plan) instead of being
    scan-time row tests."""
    return spark.read.schema(DOC_LANDING_SCHEMA).orc(path)
