"""etl_btc_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark implementation of the query and
data-processing capabilities of the reference pipeline
(Omegon226/ETL-BTC, surveyed in SURVEY.md): time-series feature
derivation (denoising filters + technical-analysis signals), document
(news) processing with deterministic ML-scoring plumbing, vector
similarity search, plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) the reference does not have.

Design principles (see SURVEY.md §4/§7):

- Declarative first: every operator is a composition of DataFrame /
  Spark SQL primitives so Catalyst gets predicate pushdown, column
  pruning, join selection and AQE for free.
- Python only where the JVM genuinely cannot express the semantics:
  sequential recurrences (EMA/Kalman/Wilder) run as Arrow-batched
  grouped-map pandas UDFs over time-sorted series partitions.
- Scale posture: inputs are columnar parquet; time-series tables are
  processed per series key (partition-parallel), small dimensions are
  broadcast, and skew/shuffle sizing is delegated to AQE.
"""

__version__ = "0.1.0"

from etl_btc_spark.session import get_spark  # noqa: F401
from etl_btc_spark.tables import load_tables  # noqa: F401
