"""IVFPQ (IVFADC composite, r13) — recall, determinism, lifecycle ≡
rebuild, probe pruning, and misuse guards for operators/ivfpq.py (the
claims cited by the q99am/q99an gate docstrings in plans/queries.py).

Floors are calibrated on the synthetic fixture (near-random vectors:
top-10 neighbors at cosine 0.28-0.37): nprobe=16 + shortlist=200
measures 0.9-1.0 over three probe points (PQ-residual error only);
nprobe=4 measures 0.5-0.7 (Voronoi truncation on clusterless data).
"""

import os

import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import ivfpq as IVQ
from etl_btc_spark.operators import similarity as SIM
from etl_btc_spark.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )


#: 16 non-centroid warm codebook rows, disjoint from every mutation
#: the lifecycle tests apply (updates 20-24, deletes 33/37/41/42)
CB_IDS = [16, 17, 18, 19, 25, 26, 27, 28, 29, 30, 31, 32, 43, 44, 45, 46]
WARM = {
    "n_centroids": 16,
    "m": 8,
    "n_codes": 16,
    "centroid_ids": list(range(16)),
    "codebook_ids": CB_IDS,
}


def test_ivfpq_trained_build_recall_and_determinism(spark, emb, tmp_path):
    """The fully-TRAINED arm (warm-start carries the q99am oracle):
    sample-Lloyd coarse centroids + per-subspace k-means residual
    codebooks are deterministic (same input → identical artifact rows
    twice), and the probe recovers the exact top-10 within the
    calibrated floors — near-exact once every list is probed and the
    shortlist absorbs the residual-quantization error."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    IVQ.build_ivfpq_index(spark, emb, a, n_centroids=16, m=8, n_codes=16)
    IVQ.build_ivfpq_index(spark, emb, b, n_centroids=16, m=8, n_codes=16)
    for sub in ("centroids", "codebooks", "codes"):
        cols = spark.read.parquet(f"{a}/{sub}").columns[:2]
        da = spark.read.parquet(f"{a}/{sub}").orderBy(*cols).collect()
        db = spark.read.parquet(f"{b}/{sub}").orderBy(*cols).collect()
        assert da == db, sub

    for qid in (0, 100, 250):
        q = emb.filter(F.col("vec_id") == qid)
        exact = {r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect()}
        wide = {
            r.vec_id
            for r in IVQ.knn_ivfpq_indexed(
                spark, a, emb, q, k=10, nprobe=16, shortlist=200
            ).collect()
        }
        assert len(wide & exact) / 10 >= 0.8, (qid, wide)
        narrow = {
            r.vec_id
            for r in IVQ.knn_ivfpq_indexed(
                spark, a, emb, q, k=10, nprobe=4, shortlist=100
            ).collect()
        }
        assert len(narrow & exact) / 10 >= 0.4, (qid, narrow)


def test_ivfpq_build_misuse_guards(spark, emb, tmp_path):
    """Build refusals fail loudly BEFORE any artifact write: dim not
    divisible by m; n_codes outside the uint8 range; duplicate /
    missing codebook_ids; and codebook_ids that ARE centroids (their
    residuals would be ~zero — 16 useless codewords, silently
    degrading every probe)."""
    bad = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="divisible"):
        IVQ.build_ivfpq_index(spark, emb, bad, m=7)
    with pytest.raises(ValueError, match="n_codes"):
        IVQ.build_ivfpq_index(spark, emb, bad, m=8, n_codes=300)
    with pytest.raises(ValueError, match="duplicate codebook_ids"):
        IVQ.build_ivfpq_index(
            spark, emb, bad,
            centroid_ids=list(range(16)), codebook_ids=[16] * 16,
        )
    with pytest.raises(ValueError, match="codebook_ids not in corpus"):
        IVQ.build_ivfpq_index(
            spark, emb, bad,
            centroid_ids=list(range(16)),
            codebook_ids=list(range(10_000_000, 10_000_016)),
        )
    with pytest.raises(ValueError, match="zero"):
        # the codebook rows ARE the centroids -> all-zero residuals
        IVQ.build_ivfpq_index(
            spark, emb, bad,
            centroid_ids=list(range(16)), codebook_ids=list(range(16)),
        )
    with pytest.raises(ValueError, match=r"\[0\]"):
        # the per-ROW variant: ONE centroid row hiding among 15 good
        # codebook rows must refuse too (a global-max check would
        # pass and silently ship a useless all-zero codeword)
        IVQ.build_ivfpq_index(
            spark, emb, bad,
            centroid_ids=list(range(16)), codebook_ids=[0] + CB_IDS[:15],
        )
    # the shared warm-centroid guards hold for this family too
    with pytest.raises(ValueError, match="duplicate centroid_ids"):
        IVQ.build_ivfpq_index(spark, emb, bad, centroid_ids=[1] * 16)


def test_ivfpq_lifecycle_equals_rebuild(spark, emb, tmp_path):
    """Maintenance ≡ rebuild at the same (warm, frozen) geometry:
    append + upsert + delete through the tombstone sidecar must probe
    exactly like a from-scratch build over the final corpus, before
    AND after compaction; pre-existing code files stay byte-identical
    across the upsert (O(batch), no rewrite); a deleted id re-enters
    via append (the delete contract) while a live id still refuses."""
    import hashlib

    import etl_btc_spark.operators.tombstones as TS

    idx = str(tmp_path / "ivfpq")
    IVQ.build_ivfpq_index(
        spark, emb.filter(F.col("vec_id") < 300), idx, **WARM
    )
    IVQ.append_ivfpq_index(spark, emb.filter(F.col("vec_id") >= 300), idx)
    with pytest.raises(ValueError, match="insert-only"):
        IVQ.append_ivfpq_index(spark, emb.limit(5), idx)

    def file_hashes(d):
        out = {}
        for root, _, names in os.walk(d):
            for nm in names:
                if nm.endswith(".parquet"):
                    p = os.path.join(root, nm)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    pre_files = file_hashes(os.path.join(idx, "codes"))
    upd = emb.filter(F.col("vec_id").between(20, 24)).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    IVQ.upsert_ivfpq_index(spark, upd, idx)
    post_files = file_hashes(os.path.join(idx, "codes"))
    for p, h in pre_files.items():
        assert post_files.get(p) == h, "pre-existing code file rewritten"
    IVQ.delete_ivfpq_ids(
        spark, emb.filter(F.col("vec_id").isin(41, 42)).select("vec_id"), idx
    )
    # a deleted id legitimately RE-ENTERS via append...
    IVQ.append_ivfpq_index(spark, emb.filter(F.col("vec_id") == 41), idx)
    # ...then delete it again so the rebuild twin below matches
    IVQ.delete_ivfpq_ids(
        spark, emb.filter(F.col("vec_id") == 41).select("vec_id"), idx
    )

    snapshot = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id").between(20, 24),
            F.transform("embedding", lambda x: -x),
        ).otherwise(F.col("embedding")),
    ).filter(~F.col("vec_id").isin(41, 42))
    rebuilt = str(tmp_path / "rebuilt")
    IVQ.build_ivfpq_index(spark, snapshot, rebuilt, **WARM)

    q = emb.filter(F.col("vec_id") == 5)
    want = [
        tuple(r)
        for r in IVQ.ivfpq_adc_topk(spark, rebuilt, q, k=15, nprobe=6).collect()
    ]
    got = [
        tuple(r)
        for r in IVQ.ivfpq_adc_topk(spark, idx, q, k=15, nprobe=6).collect()
    ]
    assert got == want
    IVQ.compact_ivfpq_index(spark, idx)
    assert not TS.has_tombstones(idx)
    got2 = [
        tuple(r)
        for r in IVQ.ivfpq_adc_topk(spark, idx, q, k=15, nprobe=6).collect()
    ]
    assert got2 == want

    # compacting a fully-tombstoned index refuses cleanly
    idx2 = str(tmp_path / "empty")
    small = emb.filter(F.col("vec_id") < 60)
    IVQ.build_ivfpq_index(spark, small, idx2, **WARM)
    IVQ.delete_ivfpq_ids(spark, small.select("vec_id"), idx2)
    with pytest.raises(ValueError, match="empty"):
        IVQ.compact_ivfpq_index(spark, idx2)


def test_ivfpq_probe_prunes_lists_and_rerank(spark, emb, tmp_path):
    """The family's two pruning axes, pinned: (a) the ADC scan carries
    directory-level PartitionFilters on centroid_id — only the nprobe
    probed lists' partitions are read; (b) the exact re-rank fetch
    prunes to the candidates' vpart dirs (the _pruned_rerank_base
    inputFiles pin, same as the other four families) and returns the
    identical answer the unpruned probe does; geometry misuse fails
    loudly before query-side work."""
    import contextlib
    import io
    import re

    from etl_btc_spark.operators import ann_index as ANN
    from etl_btc_spark.operators import dedup as DD

    idx = str(tmp_path / "ivfpq")
    vecs = emb
    IVQ.build_ivfpq_index(spark, vecs, idx, **WARM)
    q = vecs.filter(F.col("vec_id") == 0)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        IVQ.ivfpq_adc_topk(spark, idx, q, k=10, nprobe=4).explain("formatted")
    assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(", buf.getvalue())

    n_parts = 256
    table = str(tmp_path / "vectors_v")
    part = F.pmod(F.xxhash64("vec_id"), F.lit(n_parts)).cast("int")
    vecs.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)
    vecs_v = spark.read.parquet(table)

    stats: dict = {}
    pruned = [
        tuple(r)
        for r in IVQ.knn_ivfpq_indexed(
            spark, idx, vecs_v, q, k=10, nprobe=8, shortlist=50,
            vpart_col="vpart", n_table_parts=n_parts, stats_out=stats,
        ).collect()
    ]
    flat = [
        tuple(r)
        for r in IVQ.knn_ivfpq_indexed(
            spark, idx, vecs, q, k=10, nprobe=8, shortlist=50
        ).collect()
    ]
    assert pruned == flat and pruned
    assert stats["rerank_scanned_files"]
    assert 0 < len(stats["pruned_vparts"]) < n_parts
    allowed = {"vpart=%d" % v for v in stats["pruned_vparts"]}
    forbidden = {"vpart=%d" % v for v in range(n_parts)} - allowed
    for f in stats["rerank_scanned_files"]:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f
    DD.release_scoped_caches()
    ANN.release_scoped_broadcasts()

    with pytest.raises(ValueError, match="n_table_parts"):
        IVQ.knn_ivfpq_indexed(spark, idx, vecs_v, q, k=10, vpart_col="vpart")
    with pytest.raises(ValueError, match="columns"):
        IVQ.knn_ivfpq_indexed(
            spark, idx, vecs, q, k=10, vpart_col="vpart",
            n_table_parts=n_parts,
        )

    # empty / NULL-vector query takes the typed-empty path
    empty = IVQ.knn_ivfpq_indexed(
        spark, idx, vecs, vecs.filter(F.lit(False)), k=5
    )
    assert empty.count() == 0 and "cosine_sim" in empty.columns
    empty2 = IVQ.ivfpq_adc_topk(
        spark, idx, vecs.filter(F.lit(False)), k=5
    )
    assert empty2.count() == 0 and "adc_dot" in empty2.columns


def test_ivfpq_batched_join_equals_single_probes(spark, emb, tmp_path):
    """knn_ivfpq_join (the family's batched retrieval shape) must
    return, per query, exactly the single-query knn_ivfpq_indexed
    answer — same coarse ranking, same per-list addends, same ADC
    shortlist rule, same exact re-rank tie-breaks; empty query
    batches take the typed-empty path and the broadcast guard bites."""
    idx = str(tmp_path / "ivfpq")
    IVQ.build_ivfpq_index(spark, emb, idx, **WARM)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = {}
    for r in IVQ.knn_ivfpq_join(
        spark, idx, emb, queries, k=10, nprobe=6, shortlist=50
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine_sim"], 9))
        )
    for q in queries.collect():
        single = [
            (r["vec_id"], round(r["cosine_sim"], 9))
            for r in IVQ.knn_ivfpq_indexed(
                spark,
                idx,
                emb,
                emb.filter(F.col("vec_id") == q["vec_id"]),
                k=10,
                nprobe=6,
                shortlist=50,
            ).collect()
        ]
        assert got[q["vec_id"]] == single, q["vec_id"]

    empty = IVQ.knn_ivfpq_join(spark, idx, emb, emb.filter(F.lit(False)), k=5)
    assert empty.count() == 0 and "cosine_sim" in empty.columns
    with pytest.raises(ValueError, match="broadcast_max_queries"):
        IVQ.knn_ivfpq_join(
            spark, idx, emb, queries, k=5, broadcast_max_queries=2
        )


def test_ivfpq_double_corpus_centroids_not_truncated(spark, emb, tmp_path):
    """r14 ADVICE regression: an array<double> corpus must persist its
    warm-start centroids as float64 — the blanket fp32 downcast broke
    the bit-exact residual contract on double corpora. Also pins the
    float corpus path: persisted centroids equal the corpus rows."""
    import numpy as np

    path = str(tmp_path / "ivfpq_dbl")
    dbl = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    IVQ.build_ivfpq_index(spark, dbl, path, **WARM)
    cent = {
        r["centroid_id"]: np.asarray(r["centroid_vec"], dtype=np.float64)
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    }
    # resolve the warm rows via the builder's own warm matrix to stay
    # convention-proof about rank-vs-id:
    cmat = IVQ._warm_centroid_matrix(
        dbl, WARM["centroid_ids"], "embedding", "vec_id",
        "test",
    )
    for i in range(len(cmat)):
        got = cent[i + 1]
        # float64 persisted exactly — no fp32 rounding anywhere
        assert (got == cmat[i]).all()
