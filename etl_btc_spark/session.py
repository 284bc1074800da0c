"""SparkSession factory with scale-oriented defaults.

The engine never *requires* its own session — every public operator
takes (or infers) the caller's ``SparkSession`` — but tests, bench.py
and ad-hoc use get a tuned local session from :func:`get_spark`.

Config rationale (targets: local[32] for tests, 1000-executor
clusters for real data):

- AQE on (+ partition coalescing + skew-join splitting): runtime
  re-planning replaces hand-tuned shuffle-partition counts and
  de-skews the groupBy/join-heavy query surface.
- Arrow on: every pandas UDF / toPandas crosses the JVM<->Python
  boundary in columnar Arrow batches, not pickled rows.
- session timeZone=UTC: the reference stores epoch-ms instants
  (SURVEY §1.3); UTC keeps parquet timestamps, DuckDB oracles and
  Python datetimes bit-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # parquet scans: push filters + prune columns + prune partitions
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet stores TIMESTAMP(NANOS); read the raw int64 nanos
    # (tables.load_table rebuilds the NTZ column). Set here so our own
    # sessions never need the runtime conf mutation fallback.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # small dims (region/nation/supplier/part at test SFs) broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # r15: small-SF tables land in ONE parquet file, so without a
    # split floor every scan-side stage (shingle explodes, hash
    # probes) ran as a single task on one of 32 cores — q99bb's
    # corpus side profiled 1/32 utilized. Parquet is splittable;
    # floor the scan partitioning at the core count (a real cluster
    # gets this for free from file counts; local small-file runs
    # must ask). Pure parallelism — values unchanged.
    "spark.sql.files.minPartitionNum": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # r17 (optimization round, guide §2.2/§2.5): AQE's partition
    # coalescing with parallelismFirst=true packs reduce partitions
    # to minPartitionSize (default 1 MB) — at bench scale every
    # window/re-rank shuffle is sub-MB, so whole stages collapsed to
    # ONE task on a 32-core box (q17's Bollinger window chain ran
    # 595 ms single-threaded of an 894 ms query; q23/q59/q86 same
    # shape — measured in .benchmarks/profile_stages.json). 256k keeps
    # those stages parallel at small scale and is INERT at 100 TB,
    # where real post-shuffle partitions are far above 1 MB anyway
    # (interleaved A/B: scripts/ab_aqe_minpartition.py — window
    # family −0.2..−0.4 s each, no regression at 256k). Env-overridable
    # for clusters that want the stock 1 MB back.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION", "256k"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "etl-btc-spark", **overrides: str) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``spark.driver.memory`` only takes effect if this call actually
    launches the JVM; on an existing session it is a no-op.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    )
    conf = dict(DEFAULT_CONF)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
