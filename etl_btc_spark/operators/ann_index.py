"""Persisted ANN index artifacts (SURVEY.md §2.2 K4).

The reference builds its ANN index ONCE at write time — Qdrant HNSW
with cosine metric, created by migrationsservice/init_qdrant.py:38-58
— and every query probes that artifact. Round 2's engine rebuilt
banding/centroids from scratch inside every query; this module makes
the index a written table, as the reference does:

- IVF: ``build_ivf_index`` runs a few distributed Lloyd (k-means)
  iterations — assignment is a broadcast crossJoin + per-vector
  arg-max, the centroid update is one posexplode + (centroid, dim)
  partial-aggregated avg, and only n_centroids × dim scalars ever
  reach the driver. The assignment table is written **partitioned by
  centroid_id**, so a probe of ``nprobe`` lists is a directory-pruned
  scan (PartitionFilters in the plan), not a full pass.
- LSH: ``build_lsh_index`` materializes the per-band signatures once
  (vectorized matmul UDF from :mod:`similarity`) and writes the band
  table **partitioned by band and sorted by sig within files**, so a
  probe prunes to the band directories and skips row groups via
  parquet min/max stats on ``sig``. Ids only — vectors are NOT
  duplicated ×n_bands; the exact re-rank joins candidates back to the
  base table by id.

Both probes are sub-linear scans of a precomputed artifact; the
build cost is paid once per corpus version, exactly like the
reference's HNSW build.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_btc_spark.operators.similarity import cosine, lsh_band_sig_udf


def _is_built(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_BUILT"))


def _mark_built(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write("ok\n")


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def _assign(vectors: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "centroid_sim", cosine(F.col(vec_col), F.col("centroid_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("centroid_sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def build_ivf_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    n_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """K4: write an IVF index = (centroids table, assignment table
    partitioned by centroid_id). Seeds are the lowest-id vectors
    (deterministic); ``iters`` Lloyd rounds refine them to actual
    cluster means before the final assignment is persisted."""
    centroids = (
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    for _ in range(iters):
        assigned = _assign(vectors, centroids, vec_col, id_col)
        # centroid update: elementwise mean via posexplode ->
        # (centroid, dim) partial-agg avg; only k x dim scalars reach
        # the driver to become plan literals for the next round
        means = (
            assigned.select("centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias(
                    "centroid_vec"
                ),
            )
        )
        rows = means.collect()
        centroids = spark.createDataFrame(
            [(r["centroid_id"], r["centroid_vec"]) for r in rows],
            "centroid_id int, centroid_vec array<float>",
        )
    final = _assign(vectors, centroids, vec_col, id_col)
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    final.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "assigned")
    )
    _mark_built(path)
    return path


def ensure_ivf_index(spark: SparkSession, vectors: DataFrame, path: str, **kw) -> str:
    """Build-if-absent: queries probe the artifact; only the first
    caller per corpus version pays the build."""
    if not _is_built(path):
        build_ivf_index(spark, vectors, path, **kw)
    return path


def knn_ivf_indexed(
    spark: SparkSession,
    path: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index: rank the (tiny) centroid table
    against the query, scan ONLY the ``nprobe`` best partitions of
    the assignment table (directory pruning via the centroid_id
    partition column), exact cosine re-rank."""
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    q = query.select(F.col(vec_col).alias("__qvec"))
    best = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn("sim", cosine(F.col("centroid_vec"), F.col("__qvec")))
        .orderBy(F.col("sim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
        .collect()
    )
    probe_ids = [r["centroid_id"] for r in best]
    assigned = spark.read.parquet(os.path.join(path, "assigned"))
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))  # partition pruning
        .crossJoin(F.broadcast(q))
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------


def build_lsh_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    dim: int = 64,
    n_bands: int = 8,
    bits_per_band: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """K4: write the hyperplane-LSH band table (id, band, sig),
    partitioned by band and sorted by sig within files — probes prune
    band directories and skip row groups on the sig stats. Ids only:
    the ×n_bands row expansion never duplicates vectors."""
    sig_udf = lsh_band_sig_udf(dim, n_bands, bits_per_band)
    banded = vectors.select(
        F.col(id_col), F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig")
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("sig")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(os.path.join(path, "bands"))
    )
    _mark_built(path)
    return path


def ensure_lsh_index(spark: SparkSession, vectors: DataFrame, path: str, **kw) -> str:
    if not _is_built(path):
        build_lsh_index(spark, vectors, path, **kw)
    return path


def knn_lsh_indexed(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bands: int = 8,
    bits_per_band: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted LSH band table with STATIC predicates: the
    query's band signatures are computed locally (one vector, one
    numpy matmul — no job), so the index scan carries
    ``band IN (...) AND sig IN (...)`` literals. ``band`` is the
    partition column → directory-level PartitionFilters; files are
    sorted by ``sig`` → parquet min/max row-group skipping. The probe
    reads only the matching buckets of the artifact — the HNSW-like
    "index scan" shape the reference gets from Qdrant
    (init_qdrant.py:38-58) — then exact-re-ranks candidates joined
    back from the base table by id."""
    from etl_btc_spark.operators.similarity import band_signatures_np

    qvec = query.select(F.col(vec_col).alias("__qvec")).first()["__qvec"]
    sigs = band_signatures_np(qvec, dim, n_bands, bits_per_band)
    # sig IN (...) is a pure data-column predicate -> pushed to the
    # parquet scan, skipping row groups via min/max stats (files are
    # sorted by sig); the exact per-band (band, sig) OR then prunes
    # the few surviving rows
    bucket_pred = F.col("sig").isin([int(s) for s in sigs])
    exact_pred = None
    for band, sig in enumerate(sigs):
        p = (F.col("band") == band) & (F.col("sig") == sig)
        exact_pred = p if exact_pred is None else (exact_pred | p)
    bands = spark.read.parquet(os.path.join(path, "bands"))
    cand_ids = bands.filter(bucket_pred & exact_pred).select(id_col).distinct()
    qcol = F.array(*[F.lit(float(v)) for v in qvec])
    sim = cosine(F.col(vec_col), qcol)
    return (
        vectors.join(cand_ids, id_col)
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
