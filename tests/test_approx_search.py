"""Recall / invariant tests for the approximate search & dedup layer
(the claims cited by q37/q38/q40/q41 docstrings in plans/queries.py).

Ground truth is the exact operator at the same SF: knn_exact for the
ANN paths, all-pairs Jaccard for MinHash, q39's high-Jaccard pairs
for SimHash separation.

Thresholds are calibrated against the synthetic fixture: embedding
top-10 neighbors sit at cosine 0.28-0.37 (near-random vectors, per-bit
hyperplane agreement ~0.6), so hyperplane LSH cannot reach both high
recall and small candidate sets on THIS corpus — 0.6 is the honest
floor for the (8 bands, 4 bits) config (measured 0.7 at both sf0.001
and sf0.01). IVF and MinHash measure 0.9-1.0.
"""

import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import dedup as DD
from etl_btc_spark.operators import similarity as SIM
from etl_btc_spark.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def exact_top10(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    return set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())


def test_lsh_recall_at_10(spark, emb, exact_top10):
    q = emb.filter(F.col("vec_id") == 0)
    got = set(
        r.vec_id
        for r in SIM.knn_lsh(emb, q, k=10, dim=64, n_bands=8, bits_per_band=4).collect()
    )
    assert len(got & exact_top10) / 10 >= 0.6


def test_lsh_candidates_sublinear(spark, emb):
    """The band probe must touch a strict subset of the corpus —
    otherwise it is a worse brute force."""
    n = emb.count()
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    udf = SIM.lsh_band_sig_udf(64, 8, 4)
    v = SIM._banded(emb, udf, "embedding", ["vec_id"])
    qb = SIM._banded(q, udf, "__qvec", [])
    n_cands = v.join(qb, ["band", "sig"]).select("vec_id").distinct().count()
    assert 0 < n_cands < 0.8 * n


def test_ivf_recall_at_10(spark, emb, exact_top10):
    q = emb.filter(F.col("vec_id") == 0)
    got = set(
        r.vec_id
        for r in SIM.knn_ivf(emb, q, k=10, n_centroids=16, nprobe=4).collect()
    )
    assert len(got & exact_top10) / 10 >= 0.8


def test_ivf_indexed_recall_and_pruned_probe(spark, emb, exact_top10, tmp_path):
    """The persisted IVF index (K4) must (a) keep recall parity with
    the in-memory path and (b) probe via directory pruning — the
    assignment scan's plan must carry a centroid_id PartitionFilter,
    proving the index is scanned, not rebuilt."""
    from etl_btc_spark.operators import ann_index as ANN

    q = emb.filter(F.col("vec_id") == 0)
    idx = str(tmp_path / "ivf")
    ANN.build_ivf_index(spark, emb, idx, n_centroids=16)
    out = ANN.knn_ivf_indexed(spark, idx, emb, q, k=10, nprobe=4)
    got = set(r.vec_id for r in out.collect())
    assert len(got & exact_top10) / 10 >= 0.8
    plan = out._jdf.queryExecution().executedPlan().toString()
    # SOME scan (the posting-list scan; the fp32 re-rank join adds an
    # unpartitioned base scan) must carry the centroid_id directory
    # filter
    assert any(
        "centroid_id" in seg[:300] for seg in plan.split("PartitionFilters")[1:]
    ), plan


def test_lsh_indexed_recall_matches_inmemory(spark, emb, exact_top10, tmp_path):
    """Persisted band table probe returns the same top-k as the
    in-memory LSH path (same plane family, same candidates)."""
    from etl_btc_spark.operators import ann_index as ANN

    q = emb.filter(F.col("vec_id") == 0)
    idx = str(tmp_path / "lsh")
    ANN.build_lsh_index(spark, emb, idx, dim=64, n_bands=8, bits_per_band=4)
    got = set(
        r.vec_id
        for r in ANN.knn_lsh_indexed(spark, idx, emb, q, k=10, dim=64).collect()
    )
    mem = set(
        r.vec_id
        for r in SIM.knn_lsh(emb, q, k=10, dim=64, n_bands=8, bits_per_band=4).collect()
    )
    assert got == mem
    assert len(got & exact_top10) / 10 >= 0.6


def test_minhash_pairs_subset_and_recall(spark, docs):
    """LSH candidates are re-ranked by EXACT Jaccard, so q40's output
    must be a subset of the all-pairs q39 truth; banding (32 hashes,
    8 bands) should recover >= 80% of true >=0.8-Jaccard pairs
    (expected hit rate per pair: 1-(1-J^4)^8 ~ 0.985 at J=0.8)."""
    truth = set((r.id_a, r.id_b) for r in DD.jaccard_pairs(docs, 0.8, ngram=3).collect())
    got = set((r.id_a, r.id_b) for r in DD.minhash_near_dupes(docs, 0.8).collect())
    assert truth, "fixture must contain near-dup pairs"
    assert got <= truth
    assert len(got & truth) / len(truth) >= 0.8


def test_simhash_hamming_separation(spark, docs):
    """Near-dup pairs (>=0.8 trigram Jaccard) must have materially
    smaller SimHash Hamming distance than random pairs."""
    sims = docs.select("doc_id", DD.simhash64(F.col("text")).alias("sh"))
    truth = DD.jaccard_pairs(docs, 0.8, ngram=3).select("id_a", "id_b")
    a = sims.alias("a")
    b = sims.alias("b")
    near = (
        truth.join(a, truth.id_a == F.col("a.doc_id"))
        .join(b, truth.id_b == F.col("b.doc_id"))
        .select(DD.hamming64(F.col("a.sh"), F.col("b.sh")).alias("d"))
    )
    rand = (
        a.join(b, (F.col("a.doc_id") + 7) == F.col("b.doc_id"))
        .select(DD.hamming64(F.col("a.sh"), F.col("b.sh")).alias("d"))
    )
    near_mean = near.agg(F.avg("d")).first()[0]
    rand_mean = rand.agg(F.avg("d")).first()[0]
    assert near_mean is not None and rand_mean is not None
    assert near_mean < rand_mean / 2
    assert near_mean <= 8


def test_simhash_identical_text_identical_hash(spark, docs):
    """SimHash is deterministic and whitespace/case-normalized."""
    one = docs.limit(5).select("doc_id", F.col("text"))
    h1 = one.select(DD.simhash64(F.col("text")).alias("h")).collect()
    h2 = one.select(
        DD.simhash64(F.upper(F.concat(F.lit("  "), F.col("text")))).alias("h")
    ).collect()
    assert [r.h for r in h1] == [r.h for r in h2]


def test_embedding_lsh_pairs_subset_and_recall(spark, emb):
    """LSH-bucketed near-dup pairs re-rank by EXACT cosine, so the
    output must be a subset of the O(n^2) verifier; recall on this
    near-random corpus (pairs at cosine ~0.3, per-bit collision ~0.6)
    is theory-bound to ~0.67 for (8 bands, 4 bits) -- 0.6 is the
    honest floor (measured 0.71 at sf0.001)."""
    exact = set((r.id_a, r.id_b) for r in DD.embedding_near_dupes(emb, 0.3).collect())
    lsh = set(
        (r.id_a, r.id_b) for r in DD.embedding_near_dupes_lsh(emb, 0.3).collect()
    )
    assert exact, "fixture must contain pairs above threshold"
    assert lsh <= exact
    assert len(lsh & exact) / len(exact) >= 0.6


def test_embedding_bucket_cap_bounds_clone_floods(spark):
    """r17 (VERDICT r16 #1): max_bucket drops embedding-LSH band
    buckets wider than the cap BEFORE the self-join — the stop-bucket
    bound ported from the MinHash family. A 40-member perturbed-vector
    clone family (the flood the r16 scalecheck measured at 93× shuffle
    on 10× data, which exact dedup CANNOT collapse — the vectors are
    byte-distinct) vanishes under cap=10, while an isolated width-2
    near-identical pair survives; capped ⊆ uncapped always."""
    base = [float(((j * 37) % 13) - 6) or 1.0 for j in range(64)]
    iso = [float(((j * 53) % 17) - 8) or 2.0 for j in range(64)]
    rows = [(i, [x + i * 1e-6 for x in base]) for i in range(40)]
    rows += [(100, iso), (101, [x + 1e-6 for x in iso])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = DD.embedding_near_dupes_lsh(df, threshold=0.3)
    capped = DD.embedding_near_dupes_lsh(df, threshold=0.3, max_bucket=10)
    unc = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cap = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in unc and (100, 101) in cap  # small bucket survives
    flood_unc = {p for p in unc if p[0] < 40 and p[1] < 40}
    flood_cap = {p for p in cap if p[0] < 40 and p[1] < 40}
    assert len(flood_unc) > 100  # quadratic without the cap
    assert len(flood_cap) == 0   # hard-bounded with it
    assert cap <= unc            # the cap only ever drops pairs


def test_simhash_near_dupes_exact_for_radius_3(spark, docs):
    """Chunk banding is pigeonhole-complete for Hamming <= 3 (4 chunks,
    64 bits): the banded result must EQUAL the brute-force all-pairs
    Hamming join, not just approximate it."""
    sig = docs.select("doc_id", DD.simhash64(F.col("text")).alias("sh"))
    a, b = sig.alias("a"), sig.alias("b")
    brute = set(
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            DD.hamming64(F.col("a.sh"), F.col("b.sh")).alias("d"),
        )
        .filter(F.col("d") <= 3)
        .collect()
    )
    banded = set(
        (r.id_a, r.id_b) for r in DD.simhash_near_dupes(docs, max_hamming=3).collect()
    )
    assert banded == brute
    assert brute, "fixture must contain simhash near-dups"


def test_simhash_near_dupes_radius_0(spark):
    """ADVICE r8: max_hamming=0 is a single full-width chunk — the
    old (1 << 64) - 1 mask overflowed LongType at plan time. Radius 0
    must plan AND return exactly the identical-signature pairs."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            # 1/2 normalize to the same text → identical simhash;
            # 3/4 are far from everything
            "text": ["alpha  beta", "ALPHA BETA", "zq xv jj kw", "m n o p q r"],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in DD.simhash_near_dupes(docs, max_hamming=0).collect()
    }
    assert got == {(1, 2, 0)}


def test_ivf_warm_start_duplicate_guards(spark, emb, tmp_path):
    """ADVICE r8: warm-start build must refuse duplicate centroid_ids
    (they shift every later 1-based centroid rank, desyncing the
    q99g-style oracle) and duplicate corpus ids among the centroid
    rows (the id→vector dict silently kept an arbitrary copy)."""
    import pytest as _pytest

    from etl_btc_spark.operators import ann_index as ANN

    with _pytest.raises(ValueError, match="duplicate centroid_ids"):
        ANN.build_ivf_index(
            spark, emb, str(tmp_path / "dup_cids"), centroid_ids=[0, 1, 1]
        )

    dup_corpus = emb.limit(20).union(emb.filter(F.col("vec_id") == 0))
    with _pytest.raises(ValueError, match="duplicate vec_id"):
        ANN.build_ivf_index(
            spark, dup_corpus, str(tmp_path / "dup_corpus"), centroid_ids=[0, 1]
        )


def test_index_probe_plans_prune(spark, emb, tmp_path):
    """K4 probes must be pruned scans of the artifact, not rebuilds:
    IVF shows directory-level PartitionFilters on centroid_id; LSH
    shows the query's signatures as pushed parquet filters."""
    import contextlib
    import io
    import re

    from etl_btc_spark.operators import ann_index as ANN

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    q = emb.filter(F.col("vec_id") == 0)

    ivf = str(tmp_path / "ivf")
    ANN.build_ivf_index(spark, emb, ivf, n_centroids=16)
    p = plan_of(ANN.knn_ivf_indexed(spark, ivf, emb, q, k=10, nprobe=4))
    assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(", p)

    lsh = str(tmp_path / "lsh")
    ANN.build_lsh_index(spark, emb, lsh, dim=64, n_bands=8, bits_per_band=4)
    p = plan_of(ANN.knn_lsh_indexed(spark, lsh, emb, q, k=10, dim=64))
    assert re.search(r"PushedFilters: \[In\(sig", p)


def test_lsh_index_layout_floor(spark, emb, tmp_path):
    """VERDICT r6 #1: the index write must not collapse to one writer —
    Spark 4.1's AQE coalesces a count-less repartition(cols) to a
    single task on a small corpus (one file per band directory, probe
    loses all scan parallelism). The explicit size-derived width
    floors at 2 files per band so a probe of n_bands directories has
    2×n_bands splits to parallelize over, and each file stays
    internally sig-sorted for row-group skipping."""
    import os

    from etl_btc_spark.operators import ann_index as ANN

    lsh = str(tmp_path / "lsh_layout")
    ANN.build_lsh_index(spark, emb, lsh, dim=64, n_bands=8, bits_per_band=4)
    per_band = {}
    for d in os.listdir(os.path.join(lsh, "bands")):
        if not d.startswith("band="):
            continue
        per_band[d] = len(
            [f for f in os.listdir(os.path.join(lsh, "bands", d)) if f.endswith(".parquet")]
        )
    assert len(per_band) == 8
    assert all(n >= 2 for n in per_band.values()), per_band
    # ...and the floor stays bounded: a tiny corpus must not pay the
    # full 32-task fanout the pre-r6 write always scheduled
    assert sum(per_band.values()) <= 32, per_band


def test_incremental_near_dupes_subset_recall_and_broadcast(spark, docs, tmp_path):
    """q74 shape: batch-vs-corpus near-dups must be a subset of the
    exact cross-Jaccard pairs (re-rank is exact), recover most of them
    (banding recall), and probe the index via a BROADCAST of the small
    batch side — never a shuffle of corpus data."""
    import contextlib
    import io

    hi = docs.agg(F.max("doc_id")).first()[0]
    corpus = docs.filter(F.col("doc_id") <= hi - 50)
    batch = docs.filter(F.col("doc_id") > hi - 50)
    idx = str(tmp_path / "mh")
    DD.build_minhash_index(spark, corpus, idx)
    out = DD.incremental_near_dupes(spark, idx, corpus, batch, threshold=0.8)
    got = {(r.batch_id, r.corpus_id) for r in out.collect()}

    sh = lambda df, n: df.select("doc_id", DD.word_shingles(F.col("text"), 3).alias("s"))
    b, c = sh(batch, 3).alias("b"), sh(corpus, 3).alias("c")
    exact = {
        (r.bid, r.cid)
        for r in b.join(c, F.lit(True))
        .select(
            F.col("b.doc_id").alias("bid"),
            F.col("c.doc_id").alias("cid"),
            DD.jaccard(F.col("b.s"), F.col("c.s")).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    assert got <= exact
    assert exact, "fixture must contain cross near-dups"
    assert len(got & exact) / len(exact) >= 0.8

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_incremental_near_dupes_prunes_band_scan_to_batch_bparts(
    spark, docs, tmp_path
):
    """r11 (VERDICT r10 "What's missing" #4): the band table is
    partitioned on bpart = pmod(xxhash64(bkey), m), so a small batch's
    probe must read ONLY the bpart directories its own band keys hash
    into — never the whole corpus-sized artifact — and still find its
    planted near-duplicate."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    corpus = docs.filter(F.col("doc_id") <= hi - 50)
    idx = str(tmp_path / "mh")
    DD.build_minhash_index(spark, corpus, idx)

    # single-doc batch: a verbatim copy of corpus doc 3 → ≤ n_bands
    # band keys → a strict subset of the 32 bpart dirs
    batch = corpus.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    stats: dict = {}
    out = DD.incremental_near_dupes(
        spark, idx, corpus, batch, threshold=0.8, stats_out=stats
    )
    got = {(r.batch_id, r.corpus_id) for r in out.collect()}
    assert (1_000_003, 3) in got

    assert stats["bands_scanned_files"]
    assert 0 < len(stats["pruned_bparts"]) <= 8, stats["pruned_bparts"]
    allowed = {"bpart=%d" % b for b in stats["pruned_bparts"]}
    forbidden = {"bpart=%d" % b for b in range(32)} - allowed
    for f in stats["bands_scanned_files"]:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f

    # a flat (pre-r11) or different-modulus artifact refuses the probe
    with pytest.raises(ValueError, match="rebuild"):
        DD.incremental_near_dupes(
            spark, idx, corpus, batch, threshold=0.8, n_band_parts=64
        )


def test_incremental_near_dupes_prunes_text_fetch_to_candidate_vparts(
    spark, docs, tmp_path
):
    """r11 (VERDICT r10 "What's wrong" #2): when the corpus is the
    vpart-partitioned table the streaming sinks write, the probe's
    exact-Jaccard re-rank must fetch candidate text from ONLY the
    candidates' vpart directories (inputFiles pin) — and return the
    identical pair set the unpruned probe does."""
    import os

    n_parts = 8
    hi = docs.agg(F.max("doc_id")).first()[0]
    corpus = docs.filter(F.col("doc_id") <= hi - 50)
    batch = docs.filter(F.col("doc_id") > hi - 50)
    idx = str(tmp_path / "mh")
    DD.build_minhash_index(spark, corpus, idx)

    table = str(tmp_path / "corpus_v")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    corpus.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)
    corpus_v = spark.read.parquet(table)

    stats: dict = {}
    pruned = {
        (r.batch_id, r.corpus_id, r.jaccard)
        for r in DD.incremental_near_dupes(
            spark, idx, corpus_v, batch, threshold=0.8,
            vpart_col="vpart", n_table_parts=n_parts, stats_out=stats,
        ).collect()
    }
    flat = {
        (r.batch_id, r.corpus_id, r.jaccard)
        for r in DD.incremental_near_dupes(
            spark, idx, corpus, batch, threshold=0.8
        ).collect()
    }
    assert pruned == flat and pruned, "pruning changed the probe answer"

    # the text fetch touched only the candidates' partitions — and
    # genuinely skipped the others (the fixture's candidate set must
    # not span every vpart for the pin to mean anything)
    assert stats["scanned_files"]
    assert len(stats["pruned_vparts"]) < n_parts, stats["pruned_vparts"]
    allowed = {"vpart=%d" % v for v in stats["pruned_vparts"]}
    forbidden = {"vpart=%d" % v for v in range(n_parts)} - allowed
    for f in stats["scanned_files"]:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f

    # geometry misuse fails loudly
    with pytest.raises(ValueError, match="n_table_parts"):
        DD.incremental_near_dupes(
            spark, idx, corpus_v, batch, threshold=0.8, vpart_col="vpart"
        )
    with pytest.raises(ValueError, match="columns"):
        DD.incremental_near_dupes(
            spark, idx, corpus, batch, threshold=0.8,
            vpart_col="vpart", n_table_parts=n_parts,
        )


def test_knn_probes_prune_rerank_fetch_to_candidate_vparts(
    spark, emb, tmp_path
):
    """r12 (VERDICT r11 #1): every indexed kNN probe ends with an
    exact fp32 re-rank that joins its bounded candidate set back to
    the base table — when that table is the vpart-partitioned layout
    the streaming sinks write, the fetch must read ONLY the
    candidates' vpart directories (inputFiles pin, the
    incremental_near_dupes posture) and return the identical answer
    the unpruned probe does. All four families: LSH, IVF, PQ, HNSW.
    n_parts exceeds every family's candidate count on this fixture
    (LSH: 210), so touched < n_parts deterministically — the pin
    proves files were genuinely skipped."""
    from etl_btc_spark.operators import ann_index as ANN
    from etl_btc_spark.operators import hnsw as HN
    from etl_btc_spark.operators import pq as PQ

    n_parts = 256
    vecs = emb.select("vec_id", "embedding")
    table = str(tmp_path / "vectors_v")
    part = F.pmod(F.xxhash64("vec_id"), F.lit(n_parts)).cast("int")
    vecs.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)
    vecs_v = spark.read.parquet(table)
    q = vecs.filter(F.col("vec_id") == 0)

    lshkw = {"dim": 64, "n_bands": 8, "bits_per_band": 4}
    lsh = str(tmp_path / "lsh")
    ANN.build_lsh_index(spark, vecs, lsh, **lshkw)
    ivf = str(tmp_path / "ivf")
    ANN.build_ivf_index(spark, vecs, ivf, n_centroids=16)
    pqx = str(tmp_path / "pq")
    PQ.build_pq_index(
        spark, vecs, pqx, m=8, n_codes=16, codebook_ids=list(range(16))
    )
    hns = str(tmp_path / "hnsw")
    HN.build_hnsw_index(spark, vecs, hns, n_shards=4)

    def check(name, fn):
        stats: dict = {}
        pruned = [
            tuple(r)
            for r in fn(
                vecs_v,
                dict(vpart_col="vpart", n_table_parts=n_parts, stats_out=stats),
            ).collect()
        ]
        flat = [tuple(r) for r in fn(vecs, {}).collect()]
        assert pruned == flat and pruned, name
        assert stats["rerank_scanned_files"], name
        assert 0 < len(stats["pruned_vparts"]) < n_parts, (
            name,
            len(stats["pruned_vparts"]),
        )
        allowed = {"vpart=%d" % v for v in stats["pruned_vparts"]}
        forbidden = {"vpart=%d" % v for v in range(n_parts)} - allowed
        for f in stats["rerank_scanned_files"]:
            assert any(("/%s/" % a) in f for a in allowed), (name, f)
            assert not any(("/%s/" % b) in f for b in forbidden), (name, f)
        DD.release_scoped_caches()
        ANN.release_scoped_broadcasts()

    check(
        "lsh",
        lambda v, kw: ANN.knn_lsh_indexed(spark, lsh, v, q, k=10, **lshkw, **kw),
    )
    check(
        "ivf",
        lambda v, kw: ANN.knn_ivf_indexed(
            spark, ivf, v, q, k=10, nprobe=4, shortlist=1, **kw
        ),
    )
    check(
        "pq",
        lambda v, kw: PQ.knn_pq_indexed(
            spark, pqx, v, q, k=10, shortlist=30, **kw
        ),
    )
    check(
        "hnsw",
        lambda v, kw: HN.knn_hnsw_join(
            spark, hns, v, q, k=10, ef_search=10, **kw
        ),
    )

    # geometry misuse fails loudly — before any query-side work
    with pytest.raises(ValueError, match="n_table_parts"):
        ANN.knn_lsh_indexed(
            spark, lsh, vecs_v, q, k=10, vpart_col="vpart", **lshkw
        )
    with pytest.raises(ValueError, match="columns"):
        ANN.knn_ivf_indexed(
            spark, ivf, vecs, q, k=10, vpart_col="vpart",
            n_table_parts=n_parts,
        )
    with pytest.raises(ValueError, match="columns"):
        PQ.knn_pq_join(
            spark, pqx, vecs, q, k=10, vpart_col="vpart",
            n_table_parts=n_parts,
        )
    with pytest.raises(ValueError, match="n_table_parts"):
        HN.knn_hnsw_join(spark, hns, vecs_v, q, k=10, vpart_col="vpart")


def test_pq_kmeans_build_recall_and_determinism(spark, emb, tmp_path):
    """r11 PQ, the TRAINED arm (the warm-start arm carries the q99ad
    value oracle): the per-subspace k-means build is deterministic
    (same input → byte-identical codebooks + codes twice), and the
    ADC shortlist + exact re-rank recovers the exact top-10 at a
    reasonable oversample on this corpus."""
    from etl_btc_spark.operators import pq as PQ

    a, b = str(tmp_path / "pq_a"), str(tmp_path / "pq_b")
    PQ.build_pq_index(spark, emb, a, m=8, n_codes=16)
    PQ.build_pq_index(spark, emb, b, m=8, n_codes=16)
    for sub in ("codebooks", "codes"):
        da = spark.read.parquet(f"{a}/{sub}").orderBy(
            *spark.read.parquet(f"{a}/{sub}").columns[:2]
        ).collect()
        db = spark.read.parquet(f"{b}/{sub}").orderBy(
            *spark.read.parquet(f"{b}/{sub}").columns[:2]
        ).collect()
        assert da == db, sub

    q = emb.filter(F.col("vec_id") == 0)
    exact = {
        r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect()
    }
    got = {
        r.vec_id
        for r in PQ.knn_pq_indexed(spark, a, emb, q, k=10, shortlist=100).collect()
    }
    assert len(got & exact) / 10 >= 0.6, got

    # misuse fails loudly
    with pytest.raises(ValueError, match="divisible"):
        PQ.build_pq_index(spark, emb, str(tmp_path / "bad"), m=7)
    with pytest.raises(ValueError, match="insert-only"):
        PQ.append_pq_index(spark, emb.limit(5), a)


def test_pq_batched_join_equals_single_probes(spark, emb, tmp_path):
    """knn_pq_join (the family's batched retrieval shape) must return,
    per query, exactly the single-query knn_pq_indexed answer — same
    ADC shortlist rule, same exact re-rank, same tie-breaks; empty
    and NULL-vector query batches take the typed-empty path."""
    from etl_btc_spark.operators import pq as PQ

    idx = str(tmp_path / "pq")
    PQ.build_pq_index(
        spark, emb, idx, m=8, n_codes=16, codebook_ids=list(range(16))
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    # the batched join re-ranks with the einsum pandas UDF while the
    # single probe uses the codegen expression fold — identical BLAS
    # math up to the last ulp, so compare at 9 dp (the same tolerance
    # separating the other families' batch/single twins)
    got = {}
    for r in PQ.knn_pq_join(
        spark, idx, emb, queries, k=10, shortlist=50
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine_sim"], 9))
        )
    for q in queries.collect():
        single = [
            (r["vec_id"], round(r["cosine_sim"], 9))
            for r in PQ.knn_pq_indexed(
                spark,
                idx,
                emb,
                emb.filter(F.col("vec_id") == q["vec_id"]),
                k=10,
                shortlist=50,
            ).collect()
        ]
        assert got[q["vec_id"]] == single, q["vec_id"]

    empty = PQ.knn_pq_join(spark, idx, emb, emb.filter(F.lit(False)), k=5)
    assert empty.count() == 0 and "cosine_sim" in empty.columns


def test_pq_upsert_delete_equal_rebuild(spark, emb, tmp_path):
    """PQ maintenance ≡ rebuild at the same (warm, frozen) codebooks:
    upsert + delete through the tombstone sidecar must probe exactly
    like a from-scratch build over the updated corpus, before AND
    after compaction; pre-existing code files stay byte-identical
    across the upsert (O(batch), no rewrite)."""
    import hashlib
    import os

    from etl_btc_spark.operators import pq as PQ

    ids = list(range(16))
    idx = str(tmp_path / "pq")
    PQ.build_pq_index(spark, emb, idx, m=8, n_codes=16, codebook_ids=ids)

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
    PQ.upsert_pq_index(spark, upd, idx)
    post_files = file_hashes(os.path.join(idx, "codes"))
    for p, h in pre_files.items():
        assert post_files.get(p) == h, "pre-existing code file rewritten"
    PQ.delete_pq_ids(
        spark, emb.filter(F.col("vec_id").isin(30, 31)).select("vec_id"), idx
    )

    snapshot = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id").between(20, 24),
            F.transform("embedding", lambda x: -x),
        ).otherwise(F.col("embedding")),
    ).filter(~F.col("vec_id").isin(30, 31))
    rebuilt = str(tmp_path / "pq_rebuilt")
    PQ.build_pq_index(spark, snapshot, rebuilt, m=8, n_codes=16, codebook_ids=ids)

    q = emb.filter(F.col("vec_id") == 5)
    want = [tuple(r) for r in PQ.pq_adc_topk(spark, rebuilt, q, k=15).collect()]
    got = [tuple(r) for r in PQ.pq_adc_topk(spark, idx, q, k=15).collect()]
    assert got == want
    PQ.compact_pq_index(spark, idx)
    import etl_btc_spark.operators.tombstones as TS

    assert not TS.has_tombstones(idx)
    got2 = [tuple(r) for r in PQ.pq_adc_topk(spark, idx, q, k=15).collect()]
    assert got2 == want


def test_pq_advice_guards(spark, emb, tmp_path):
    """ADVICE r11 lows: (1) n_codes > 256 refused at build — codes
    persist as uint8, so a larger codebook would silently WRAP the
    argmin and corrupt every ADC score; (2) a tombstone-deleted id
    may RE-ENTER via append (the verify_new duplicate check
    live-filters — re-entry is the delete contract), while a LIVE id
    still refuses; (3) compacting a fully-tombstoned index refuses
    with a clear message instead of writing an unreadable
    zero-partition codes dir."""
    import etl_btc_spark.operators.tombstones as TS

    from etl_btc_spark.operators import pq as PQ

    with pytest.raises(ValueError, match="n_codes"):
        PQ.build_pq_index(
            spark, emb, str(tmp_path / "bad"), m=8, n_codes=300
        )

    small = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    idx = str(tmp_path / "pq")
    PQ.build_pq_index(
        spark, small, idx, m=8, n_codes=16, codebook_ids=list(range(16))
    )
    PQ.delete_pq_ids(
        spark, small.filter(F.col("vec_id") == 20).select("vec_id"), idx
    )
    PQ.append_pq_index(spark, small.filter(F.col("vec_id") == 20), idx)
    live = TS.live_rows(
        spark, spark.read.parquet(idx + "/codes"), idx, "vec_id"
    )
    assert live.filter(F.col("vec_id") == 20).count() == 1
    with pytest.raises(ValueError, match="insert-only"):
        PQ.append_pq_index(spark, small.filter(F.col("vec_id") == 21), idx)

    idx2 = str(tmp_path / "pq2")
    PQ.build_pq_index(
        spark, small, idx2, m=8, n_codes=16, codebook_ids=list(range(16))
    )
    PQ.delete_pq_ids(spark, small.select("vec_id"), idx2)
    with pytest.raises(ValueError, match="empty"):
        PQ.compact_pq_index(spark, idx2)


def test_duplicate_span_dedup_plan_has_no_span_window(spark, docs):
    """VERDICT r11 #2 (r12): corpus-wide duplicate detection must NOT
    rank over a window partitioned by the span text — the op's exact
    target is hyper-common boilerplate spans, and a window would land
    every occurrence of such a span on ONE reducer (the one shuffle
    shape AQE cannot skew-split). The rewrite elects canonicals via a
    partial-aggregable groupBy(s).agg(min(struct(id, pos)), count)
    and marks non-canonical occurrences with an equi-join on s,
    which AQE CAN skew-split. Pin: zero Window operators anywhere in
    the plan, and the canonical election partial-aggregates map-side
    before its shuffle."""
    out = DD.duplicate_span_dedup(docs.select("doc_id", "text"), n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min(struct(" in plan, plan
    DD.release_scoped_caches()


def test_duplicate_span_dedup_semantics(spark):
    """r11 exact duplicated-span removal: the canonical (min doc, min
    pos) occurrence survives, every token covered by a non-canonical
    occurrence drops, intra-doc repeats collapse, sub-n docs and
    unique docs pass through untouched, empty docs emit ('' , 0, 0)."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "intro words alpha beta gamma delta epsilon tail",
                "unique text with no duplicated spans here",
                "one two three",
                "x y z w v x y z w v",
                "",
            ],
        }
    )
    out = {
        r["doc_id"]: (r["n_kept"], r["n_removed"], r["clean_text"])
        for r in DD.duplicate_span_dedup(spark.createDataFrame(rows)).collect()
    }
    assert out[1] == (6, 0, "alpha beta gamma delta epsilon zeta")
    assert out[2] == (3, 5, "intro words tail")
    assert out[3] == (7, 0, "unique text with no duplicated spans here")
    assert out[4] == (3, 0, "one two three")
    assert out[5] == (5, 5, "x y z w v")
    assert out[6] == (0, 0, "")
    DD.release_scoped_caches()


def test_connected_components_clusters(spark, docs):
    """CC sanity on the fixture: every pair's endpoints share a
    cluster, cluster_id is the component min (canonical policy), and
    keep-one-per-cluster keeps exactly n_clusters docs."""
    pairs = DD.jaccard_pairs(docs, 0.8, ngram=3).select("id_a", "id_b")
    cc = DD.connected_components(pairs)
    label = {r.node: r.cluster_id for r in cc.collect()}
    for r in pairs.collect():
        assert label[r.id_a] == label[r.id_b]
    # canonical = min member id
    import collections

    members = collections.defaultdict(list)
    for n, l in label.items():
        members[l].append(n)
    for l, ns in members.items():
        assert l == min(ns)
    kept = {n for n, l in label.items() if n == l}
    assert len(kept) == len(members)


def test_ivf_build_no_plan_literals_and_high_k(spark, emb, tmp_path):
    """VERDICT r3 item 3: the IVF build must not round-trip centroids
    through the driver as plan literals — the assignment plan is a
    mapInPandas over the vector scan (centroid matrix travels as a
    torrent broadcast), so no LocalTableScan/literal relation appears
    anywhere in it; and a build requesting far more centroids than the
    old 16x64 shape completes (k capped at sample size)."""
    import contextlib
    import io

    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "ivf_hi")
    ANN.build_ivf_index(spark, emb, idx, n_centroids=256)
    cents = spark.read.parquet(idx + "/centroids")
    assert cents.count() == 256

    bc = ANN._broadcast_centroids(spark, cents)
    plan_df = ANN._assign_quantized(emb, bc, "embedding", "vec_id", n_assign=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "LocalTableScan" not in plan
    assert "Scan ExistingRDD" not in plan
    # multi-assignment: every vector indexed under exactly 2 lists
    assigned = spark.read.parquet(idx + "/assigned")
    per_vec = assigned.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [2]
    bc.unpersist()


def test_ivf_index_is_int8_quantized_and_smaller(spark, emb, tmp_path):
    """VERDICT r3 item 5 (reference init_qdrant.py:51-57): the IVF
    posting lists store INT8 codes + a per-vector scale, not fp32 —
    recall floor unchanged (asserted by the recall test above running
    on the quantized index) and the index payload is ~4x smaller."""
    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "ivf_q8")
    ANN.build_ivf_index(spark, emb, idx, n_centroids=16, n_assign=1)
    assigned = spark.read.parquet(idx + "/assigned")
    kinds = dict(assigned.dtypes)
    assert kinds["q8"] == "binary"  # packed: a true 1 byte/dim on disk
    assert kinds["q8_scale"] == "float"
    assert "embedding" not in kinds  # no fp32 vectors in the artifact
    # dequantized codes reconstruct the fp32 vector to <1% of max|x|
    row = assigned.limit(1).collect()[0]
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}[row["vec_id"]]
    import numpy as np

    deq = np.frombuffer(row["q8"], dtype=np.int8).astype(np.float64) * row["q8_scale"]
    err = np.abs(deq - np.array(orig, dtype=np.float64)).max()
    assert err <= np.abs(np.array(orig)).max() * 0.01

    # size: compare the VECTOR COLUMN payload (compressed column-chunk
    # bytes from the parquet metadata) — footer/partition overhead at
    # 500-row test scale would swamp a whole-file comparison
    import os

    import pyarrow.parquet as pq

    fp32_dir = str(tmp_path / "fp32_assigned")
    spark.read.parquet(idx + "/assigned").join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("vec_id", "embedding", "centroid_id").write.partitionBy(
        "centroid_id"
    ).parquet(fp32_dir)

    def column_bytes(d, prefixes):
        total = 0
        for r, _, fs in os.walk(d):
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(r, f)).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema.split(".")[0] in prefixes:
                            total += col.total_compressed_size
        return total

    q8_b = column_bytes(idx + "/assigned", {"q8", "q8_scale"})
    fp_b = column_bytes(fp32_dir, {"embedding"})
    assert q8_b * 3 < fp_b, (q8_b, fp_b)


def test_edit_distance_prefilter_is_lossless(spark):
    """q79's PassJoin segment prefilter must be COMPLETE for
    dist <= d: on strings mutated at known distances 0-6 the result
    equals brute-force all-pairs levenshtein (<= 4), including pairs
    at exactly d — and excludes everything beyond d."""
    import pandas as pd

    from etl_btc_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy"  # 39 chars
    rows = [(0, base)]
    muts = [
        (1, base[:-1] + "X"),                      # 1 substitution
        (2, "AB" + base[2:]),                      # 2 substitutions
        (3, base[3:] + "xyz"),                     # 3+3 shift-ish
        (4, "Q" + base[:20] + "ZZZ" + base[23:]),  # insert + subs
        (5, base[::-1]),                           # far away
        (6, "completely different text here okay"),
        (7, base),                                 # exact dup
    ]
    rows += muts
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, max_dist=4, head_len=40).collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = dict(rows)
    want = {}
    for x, y in itertools.combinations(sorted(texts), 2):
        dd = lev(texts[x][:40], texts[y][:40])
        if dd <= 4:
            want[(x, y)] = dd
    assert want, "fixture must produce pairs within distance 4"
    assert any(v == 4 for v in want.values()), "must exercise dist == d exactly"
    assert got == want


def test_knn_lsh_join_recall_and_broadcast(spark, emb, tmp_path):
    """q84 batched ANN join: every query's top-10 must hit the same
    recall floor as the single-query LSH probe vs exact brute force,
    and the plan must BROADCAST the (small) query band side — the
    corpus index is streamed, never shuffled."""
    import contextlib
    import io

    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "lsh_join")
    ANN.build_lsh_index(spark, emb, idx, dim=64, n_bands=8, bits_per_band=4)
    queries = emb.filter(F.col("vec_id") % 100 == 0)  # 5 queries at sf0.001
    out = ANN.knn_lsh_join(spark, idx, emb, queries, k=10, dim=64)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(got) == queries.count()
    for qid, ids in got.items():
        q = emb.filter(F.col("vec_id") == qid)
        exact = set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())
        assert len(ids & exact) / 10 >= 0.6, (qid, ids, exact)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan


def test_knn_ivf_join_recall(spark, emb, tmp_path):
    """q85 batched IVF join: per-query recall vs exact brute force at
    the same floor as the single-query IVF probe."""
    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "ivf_join")
    ANN.build_ivf_index(spark, emb, idx, n_centroids=16)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ANN.knn_ivf_join(spark, idx, emb, queries, k=10, nprobe=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(got) == queries.count()
    recalls = []
    for qid, ids in got.items():
        q = emb.filter(F.col("vec_id") == qid)
        exact = set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())
        recalls.append(len(ids & exact) / 10)
    # average across queries — individual queries vary with Voronoi
    # geometry; the batch path must hold the same aggregate floor as
    # the single-query probe
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.5, recalls


def test_edit_distance_prefilter_fuzz(spark):
    """Randomized completeness check for the PassJoin prefilter:
    40 random base strings + seeded random edit scripts (insert/
    delete/substitute, 0-8 ops each, varying lengths incl. short
    heads) — edit_distance_pairs(d=4) must equal brute force exactly."""
    import itertools
    import random

    import pandas as pd

    from etl_btc_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(20260813)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    rows = []
    did = 0
    for _ in range(14):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 45)))
        rows.append((did, base)); did += 1
        for _ in range(2):
            s = list(base)
            for _ in range(rng.randint(0, 8)):
                op = rng.random()
                if op < 0.34 and s:
                    s[rng.randrange(len(s))] = rng.choice(alpha)
                elif op < 0.67 and s:
                    del s[rng.randrange(len(s))]
                else:
                    s.insert(rng.randrange(len(s) + 1), rng.choice(alpha))
            rows.append((did, "".join(s))); did += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, max_dist=4, head_len=40).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = dict(rows)
    want = {
        (x, y): lev(texts[x][:40], texts[y][:40])
        for x, y in itertools.combinations(sorted(texts), 2)
        if lev(texts[x][:40], texts[y][:40]) <= 4
    }
    assert want and got == want


def test_edit_distance_handles_empty_heads(spark):
    """hl=0 regression pin: pairs involving an EMPTY head (e.g. a
    whitespace-only doc after scrubbing) must survive the prefilter —
    the admissible-length key must include 0."""
    import pandas as pd

    from etl_btc_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 5, 7], "text": ["abc", "", ""]})
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, max_dist=4).collect()
    )
    assert got == [(3, 5, 3), (3, 7, 3), (5, 7, 0)]


def test_edit_distance_skew_bounded_candidates(spark):
    """Skew stress (VERDICT r4 item 1): one hot 8-char segment planted
    in EVERY doc, at one of 5 segment slots. With a bare `seg` join
    key that single key materializes ~k² raw rows before the position
    filter; with the position bucket folded into the key, only
    same/adjacent-bucket rows ever join. Asserts (a) the raw candidate
    join output stays well under k²/4, (b) the final result still
    equals brute force exactly (losslessness under skew)."""
    import itertools
    import random

    import pandas as pd

    from etl_btc_spark.operators.dedup import (
        _passjoin_candidates,
        edit_distance_pairs,
    )

    rng = random.Random(20260814)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    hot = "qqzzqqzz"  # the hyper-frequent segment
    k = 200
    rows = []
    for i in range(k):
        slot = i % 5  # heads are 40 chars -> 5 segments of 8
        chunks = [
            "".join(rng.choice(alpha) for _ in range(8)) for _ in range(5)
        ]
        chunks[slot] = hot
        rows.append((i, "".join(chunks)))
    # a handful of true near-dup pairs (1-2 substitutions)
    for j in range(10):
        base = rows[j][1]
        s = list(base)
        for _ in range(rng.randint(1, 2)):
            s[rng.randrange(len(s))] = rng.choice(alpha)
        rows.append((k + j, "".join(s)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    raw = _passjoin_candidates(df, max_dist=4, head_len=40).count()
    n = len(rows)
    # bare-seg join: >= k*k rows from the hot key alone (both
    # directions). Bucketed: one slot's worth + adjacent-bucket noise.
    assert 0 < raw < (n * n) / 4, raw

    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, max_dist=4, head_len=40).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = dict(rows)
    want = {
        (x, y): lev(texts[x][:40], texts[y][:40])
        for x, y in itertools.combinations(sorted(texts), 2)
        if lev(texts[x][:40], texts[y][:40]) <= 4
    }
    assert len(want) >= 10 and got == want


def test_ivf_build_empty_input_and_typed_empty_probe(spark, emb, tmp_path):
    """Round-5 hardening: (a) building over a 0-row corpus raises a
    clear error instead of crashing inside numpy; (b) the empty-query
    early returns preserve the BASE table's id type — an int-id index
    must not come back bigint-typed on the empty path."""
    from pyspark.sql import types as T

    from etl_btc_spark.operators import ann_index as ANN

    with pytest.raises(ValueError, match="no rows"):
        ANN.build_ivf_index(spark, emb.limit(0), str(tmp_path / "ivf_empty"))

    small = emb.limit(50).select(
        F.col("vec_id").cast("int").alias("vec_id"), "embedding"
    )
    ivf = str(tmp_path / "ivf_int")
    ANN.build_ivf_index(spark, small, ivf, n_centroids=4)
    no_q = small.limit(0)
    out_ivf = ANN.knn_ivf_indexed(spark, ivf, small, no_q, k=5)
    assert out_ivf.count() == 0
    assert out_ivf.schema["vec_id"].dataType == T.IntegerType()

    lsh = str(tmp_path / "lsh_int")
    ANN.build_lsh_index(spark, small, lsh)
    out_lsh = ANN.knn_lsh_indexed(spark, lsh, small, no_q, k=5)
    assert out_lsh.count() == 0
    assert out_lsh.schema["vec_id"].dataType == T.IntegerType()


def test_ivf_subsample_regime_recall(spark, emb, tmp_path):
    """Review r5: every other recall test's sample cap exceeds the
    500-row fixture, so Lloyd-on-sample degenerates to Lloyd-on-full
    there. This one forces a TRUE subsample (128 of 500) and pins an
    honest floor for that regime — near-random fixture vectors make
    per-query recall noisy, so the floor is lower than the full-fit
    tests' 0.8 (measured 0.72 avg / 0.4 min at this geometry)."""
    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "ivf_sub")
    ANN.build_ivf_index(spark, emb, idx, n_centroids=16, sample_factor=8)
    assert 16 * 8 < emb.count()  # the regime under test: sample < corpus
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ANN.knn_ivf_join(spark, idx, emb, queries, k=10, nprobe=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qid, ids in got.items():
        q = emb.filter(F.col("vec_id") == qid)
        exact = set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())
        recalls.append(len(ids & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    assert min(recalls) >= 0.3, recalls


def test_knn_join_broadcast_guard(spark, emb, tmp_path):
    """Round-5: past broadcast_max_queries the batched joins drop
    their query-side broadcast hints (AQE chooses) — results must be
    identical and the logical plan free of the explicit hint."""
    from etl_btc_spark.operators import ann_index as ANN

    lsh = str(tmp_path / "lshg")
    ANN.build_lsh_index(spark, emb, lsh)
    ivf = str(tmp_path / "ivfg")
    ANN.build_ivf_index(spark, emb, ivf, n_centroids=16)
    queries = emb.filter(F.col("vec_id") % 200 == 0)

    for fn, idx in ((ANN.knn_lsh_join, lsh), (ANN.knn_ivf_join, ivf)):
        hinted = fn(spark, idx, emb, queries, k=5)
        guarded = fn(spark, idx, emb, queries, k=5, broadcast_max_queries=0)
        key = lambda r: (r["query_id"], r["vec_id"])
        assert sorted(map(key, guarded.collect())) == sorted(
            map(key, hinted.collect())
        )
        logical = guarded._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in logical
        hlog = hinted._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" in hlog


def test_hnsw_join_recall_multishard(spark, emb, tmp_path):
    """Sharded HNSW (r5, K4 extension): per-query recall vs exact
    brute force at the IVF floor, with the corpus FORCED across 4
    shards so the per-shard-search + global-merge path is the one
    under test (data-derived sharding would give 1 shard here)."""
    from etl_btc_spark.operators import hnsw as HN

    idx = str(tmp_path / "hnsw4")
    HN.build_hnsw_index(spark, emb, idx, n_shards=4)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = HN.knn_hnsw_join(spark, idx, emb, queries, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(got) == queries.count()
    recalls = []
    for qid, ids in got.items():
        assert len(ids) == 10
        q = emb.filter(F.col("vec_id") == qid)
        exact = set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())
        recalls.append(len(ids & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.5, recalls


def test_hnsw_build_deterministic(spark, emb, tmp_path):
    """Levels come from a stable id hash and insertion order is
    id-sorted, so two builds of the same corpus must produce the
    IDENTICAL artifact (row-for-row, including neighbor lists)."""
    from etl_btc_spark.operators import hnsw as HN

    a = str(tmp_path / "hnsw_a")
    b = str(tmp_path / "hnsw_b")
    HN.build_hnsw_index(spark, emb, a, n_shards=2)
    HN.build_hnsw_index(spark, emb, b, n_shards=2)
    da = spark.read.parquet(a + "/nodes").orderBy("vec_id").collect()
    db = spark.read.parquet(b + "/nodes").orderBy("vec_id").collect()
    assert da == db


def test_hnsw_empty_query_typed_and_batch_bound(spark, emb, tmp_path):
    """Empty query batch -> typed empty result (id dtype preserved,
    ADVICE r4 lesson); an over-bound batch raises instead of
    collecting it onto the driver."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from etl_btc_spark.operators import hnsw as HN

    small = emb.limit(50).select(
        F.col("vec_id").cast("int").alias("vec_id"), "embedding"
    )
    idx = str(tmp_path / "hnsw_int")
    HN.build_hnsw_index(spark, small, idx, n_shards=1)
    no_q = small.filter(F.col("vec_id") < 0)
    out = HN.knn_hnsw_join(spark, idx, small, no_q, k=5)
    assert out.count() == 0
    assert out.schema["vec_id"].dataType == T.IntegerType()
    assert out.schema["query_id"].dataType == T.IntegerType()

    with _pytest.raises(ValueError, match="chunk the batch"):
        HN.knn_hnsw_join(spark, idx, small, small, k=5, broadcast_max_queries=10)


def test_hnsw_build_empty_and_derived_shards(spark, emb, tmp_path):
    """0-row corpus fails loudly (same contract as build_ivf_index);
    data-derived shard count scales with the corpus."""
    import pytest as _pytest

    from etl_btc_spark.operators import hnsw as HN

    with _pytest.raises(ValueError, match="no rows"):
        HN.build_hnsw_index(
            spark, emb.filter(F.col("vec_id") < 0), str(tmp_path / "hnsw_e")
        )

    idx = str(tmp_path / "hnsw_d")
    HN.build_hnsw_index(spark, emb, idx, shard_target_rows=200)
    n_shards = (
        spark.read.parquet(idx + "/nodes").select("shard").distinct().count()
    )
    assert n_shards == -(-emb.count() // 200)


def test_hnsw_refresh_equals_full_rebuild(spark, emb, tmp_path):
    """Incremental shard refresh (r5): after a mixed change set
    (update + insert + delete), refresh(snapshot) must equal a full
    rebuild of the new snapshot row-for-row — the bit-deterministic
    build makes drift impossible to hide — and the files of every
    UNTOUCHED shard must stay byte-identical on disk (the K3
    partition-pruned-MERGE posture)."""
    import os

    from etl_btc_spark.operators import hnsw as HN

    idx = str(tmp_path / "hnsw_ref")
    HN.build_hnsw_index(spark, emb, idx, n_shards=4)

    # new snapshot: drop id 3 (delete), negate id 7's vector
    # (update), add id 100002 (insert). The insert id is chosen to
    # hash into id 3's shard, keeping the change set at 2 of 4 shards
    # — BELOW the r7 majority break-even, so this pins the
    # INCREMENTAL path (the rebuild-fallback arm has its own test)
    upd = F.transform(F.col("embedding"), lambda x: -x)
    new_emb = (
        emb.filter(~F.col("vec_id").isin(3))
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") == 7, upd).otherwise(F.col("embedding")),
        )
        .unionByName(
            emb.filter(F.col("vec_id") == 0).select(
                (F.col("vec_id") + 100002).alias("vec_id"), "embedding", "label"
            )
        )
    )
    changed = spark.createDataFrame([(3,), (7,), (100002,)], "vec_id: bigint")
    touched = {
        r["s"]
        for r in changed.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(4)).cast("int").alias("s")
        )
        .distinct()
        .collect()
    }
    untouched = sorted(set(range(4)) - touched)
    assert untouched, "fixture must leave at least one shard untouched"

    def shard_bytes(shard):
        d = os.path.join(idx, "nodes", "shard=%d" % shard)
        return {
            f: open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    before = {s: shard_bytes(s) for s in untouched}
    stats: dict = {}
    HN.refresh_hnsw_index(spark, new_emb, idx, changed, stats_out=stats)
    assert stats["mode"] == "incremental", stats
    for s in untouched:
        assert shard_bytes(s) == before[s], "untouched shard %d rewritten" % s

    full = str(tmp_path / "hnsw_full")
    HN.build_hnsw_index(spark, new_emb, full, n_shards=4)
    da = spark.read.parquet(idx + "/nodes").orderBy("vec_id").collect()
    db = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert da == db


def test_hnsw_refresh_prunes_snapshot_scan_to_affected_vparts(
    spark, emb, tmp_path
):
    """r11 (VERDICT r10 "What's wrong" #1): when the snapshot is a
    vpart-partitioned table (vpart = pmod(xxhash64(id), n_table_parts))
    and n_table_parts divides n_shards, the incremental refresh must
    read ONLY the affected shards' vpart directories (inputFiles pin)
    — and the refreshed index must still equal a from-scratch rebuild
    byte-for-byte."""
    import os

    from etl_btc_spark.operators import hnsw as HN

    n_parts, n_shards = 4, 8
    idx = str(tmp_path / "hnsw_pruned")
    HN.build_hnsw_index(spark, emb, idx, n_shards=n_shards)

    # post-change snapshot: id 7's vector negated, persisted as the
    # vpart-partitioned table layout every streaming sink writes
    upd = F.transform(F.col("embedding"), lambda x: -x)
    new_emb = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7, upd).otherwise(F.col("embedding")),
    )
    table = str(tmp_path / "vectors")
    part = F.pmod(F.xxhash64("vec_id"), F.lit(n_parts)).cast("int")
    new_emb.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)

    changed = spark.createDataFrame([(7,)], "vec_id: bigint")
    snapshot = spark.read.parquet(table)
    stats: dict = {}
    HN.refresh_hnsw_index(
        spark,
        snapshot,
        idx,
        changed,
        stats_out=stats,
        vpart_col="vpart",
        n_table_parts=n_parts,
    )
    assert stats["mode"] == "incremental", stats
    # one changed id -> one affected shard -> exactly one vpart dir
    assert stats["pruned_vparts"] == [
        r[0]
        for r in changed.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(n_parts)).cast("int")
        ).collect()
    ]
    assert len(stats["pruned_vparts"]) == 1
    assert stats["scanned_files"], "pruned scan read no files"
    allowed = {"vpart=%d" % v for v in stats["pruned_vparts"]}
    forbidden = {
        "vpart=%d" % v for v in range(n_parts)
    } - allowed
    for f in stats["scanned_files"]:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f

    # the pruned refresh converges to the rebuild bytes regardless
    full = str(tmp_path / "hnsw_pruned_full")
    HN.build_hnsw_index(spark, new_emb, full, n_shards=n_shards)
    da = spark.read.parquet(idx + "/nodes").orderBy("vec_id").collect()
    db = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert da == db


def test_hnsw_refresh_vpart_geometry_validated(spark, emb, tmp_path):
    """The shard→vpart mapping is only exact when n_table_parts
    divides n_shards — a mismatched pruning request must raise, not
    silently rebuild shards from a partial snapshot; same for a
    missing modulus or a missing partition column."""
    import pytest as _pytest

    from etl_btc_spark.operators import hnsw as HN

    idx = str(tmp_path / "hnsw_geo")
    HN.build_hnsw_index(spark, emb.limit(50), idx, n_shards=4)
    snap = emb.limit(50).withColumn(
        "vpart", F.pmod(F.xxhash64("vec_id"), F.lit(3)).cast("int")
    )
    changed = emb.limit(1).select("vec_id")
    with _pytest.raises(ValueError, match="divide"):
        HN.refresh_hnsw_index(
            spark, snap, idx, changed, vpart_col="vpart", n_table_parts=3
        )
    with _pytest.raises(ValueError, match="n_table_parts"):
        HN.refresh_hnsw_index(spark, snap, idx, changed, vpart_col="vpart")
    with _pytest.raises(ValueError, match="columns"):
        HN.refresh_hnsw_index(
            spark,
            snap.drop("vpart"),
            idx,
            changed,
            vpart_col="vpart",
            n_table_parts=4,
        )


def test_hnsw_refresh_majority_falls_back_to_rebuild(spark, emb, tmp_path):
    """VERDICT r6 #5: a change set touching a MAJORITY of shards makes
    the incremental path cost more than a rebuild (it scans most of
    the corpus AND pays dynamic-overwrite + emptied-shard bookkeeping
    on top), so refresh must fall back to build_hnsw_index at the
    artifact's own geometry — and the answer must still equal the
    from-scratch build row-for-row."""
    from etl_btc_spark.operators import hnsw as HN

    small = emb.limit(300)
    idx = str(tmp_path / "hnsw_maj")
    HN.build_hnsw_index(spark, small, idx, n_shards=2)

    # bench shape: 50 new ids over a 2-shard index -> both affected
    batch = small.limit(50).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
    )
    snapshot = small.unionByName(batch)
    stats: dict = {}
    HN.refresh_hnsw_index(
        spark, snapshot, idx, batch.select("vec_id"), stats_out=stats
    )
    assert stats == {"affected": 2, "n_shards": 2, "mode": "rebuild"}

    full = str(tmp_path / "hnsw_maj_full")
    HN.build_hnsw_index(spark, snapshot, full, n_shards=2)
    da = spark.read.parquet(idx + "/nodes").orderBy("vec_id").collect()
    db = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert da == db


def test_hnsw_refresh_clears_emptied_shard(spark, emb, tmp_path):
    """A shard whose every member is deleted must disappear from the
    artifact (dynamic overwrite alone would leave it stale)."""
    import os

    from etl_btc_spark.operators import hnsw as HN

    small = emb.limit(20)
    idx = str(tmp_path / "hnsw_del")
    HN.build_hnsw_index(spark, small, idx, n_shards=4)
    # delete every member of shard 0
    sh = F.pmod(F.xxhash64("vec_id"), F.lit(4)).cast("int")
    doomed = small.filter(sh == 0).select("vec_id")
    assert doomed.count() > 0
    survivors = small.join(doomed, "vec_id", "left_anti")
    HN.refresh_hnsw_index(spark, survivors, idx, doomed)
    assert not os.path.exists(os.path.join(idx, "nodes", "shard=0"))
    left = spark.read.parquet(idx + "/nodes")
    assert left.count() == survivors.count()


def test_hnsw_null_vectors_and_explicit_shard_empty_build(spark, emb, tmp_path):
    """Review r5: NULL-vector rows are skipped on both sides (not a
    numpy crash), and an empty corpus fails loudly even when
    n_shards is explicit (the count-guard only covers the derived
    arm)."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from etl_btc_spark.operators import hnsw as HN

    nullv = F.when(F.col("vec_id") == 1, F.lit(None)).otherwise(F.col("embedding"))
    dirty = emb.limit(50).withColumn("embedding", nullv)
    idx = str(tmp_path / "hnsw_null")
    HN.build_hnsw_index(spark, dirty, idx, n_shards=2)
    nodes = spark.read.parquet(idx + "/nodes")
    assert nodes.filter(F.col("vec_id") == 1).count() == 0  # not indexed
    assert nodes.count() == 49

    out = HN.knn_hnsw_join(
        spark, idx, dirty, dirty.filter(F.col("vec_id").isin(0, 1)), k=5
    )
    got = {r["query_id"] for r in out.collect()}
    assert got == {0}  # NULL-vector query skipped, not crashed

    with _pytest.raises(ValueError, match="no indexable rows"):
        HN.build_hnsw_index(
            spark, emb.filter(F.col("vec_id") < 0), str(tmp_path / "e2"), n_shards=4
        )


def test_knn_join_n_queries_hint_equivalence(spark, emb, tmp_path):
    """The n_queries size hint must only skip the guard's count job,
    never change results."""
    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "lsh_hint")
    ANN.build_lsh_index(spark, emb, idx)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    nq = queries.count()
    a = ANN.knn_lsh_join(spark, idx, emb, queries, k=10, dim=64)
    b = ANN.knn_lsh_join(spark, idx, emb, queries, k=10, dim=64, n_queries=nq)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    ivf = str(tmp_path / "ivf_hint")
    ANN.build_ivf_index(spark, emb, ivf, n_centroids=16)
    c = ANN.knn_ivf_join(spark, ivf, emb, queries, k=10, nprobe=4)
    d = ANN.knn_ivf_join(spark, ivf, emb, queries, k=10, nprobe=4, n_queries=nq)
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))


def test_ivf_append_insert_only(spark, emb, tmp_path):
    """Insert-only IVF append (r5): appended ids are retrievable at
    the same recall floor as a probe over the original region, the
    original posting files are never rewritten, and appending an
    already-indexed id fails loudly."""
    import os

    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "ivf_app")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    ANN.build_ivf_index(spark, old, idx, n_centroids=16)

    def part_files():
        return {
            os.path.join(os.path.relpath(d, idx), f)
            for d, _, fs in os.walk(os.path.join(idx, "assigned"))
            for f in fs
            if f.endswith(".parquet")
        }

    before = part_files()
    ANN.append_ivf_index(spark, new, idx)
    assert before <= part_files()  # originals untouched, new files added

    # every appended id is now indexed
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(idx + "/assigned").select("vec_id").collect()
    }
    assert set(r.vec_id for r in new.collect()) <= ids

    # probing with an appended-region query hits the recall floor
    queries = emb.filter(F.col("vec_id").isin(400, 450, 499))
    out = ANN.knn_ivf_join(spark, idx, emb, queries, k=10, nprobe=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qid, found in got.items():
        q = emb.filter(F.col("vec_id") == qid)
        exact = set(r.vec_id for r in SIM.knn_exact(emb, q, k=10).collect())
        recalls.append(len(found & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    with pytest.raises(ValueError, match="insert-only"):
        ANN.append_ivf_index(spark, emb.filter(F.col("vec_id") == 0), idx)


def test_lsh_append_equals_rebuild_probe(spark, emb, tmp_path):
    """Insert-only LSH append (r5): fixed hyperplanes mean an
    append-built index must probe IDENTICALLY to a from-scratch build
    over the same corpus; dup-id append raises."""
    from etl_btc_spark.operators import ann_index as ANN

    inc = str(tmp_path / "lsh_inc")
    ANN.build_lsh_index(spark, emb.filter(F.col("vec_id") < 400), inc)
    ANN.append_lsh_index(spark, emb.filter(F.col("vec_id") >= 400), inc)

    full = str(tmp_path / "lsh_full")
    ANN.build_lsh_index(spark, emb, full)

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    a = ANN.knn_lsh_join(spark, inc, emb, queries, k=10, dim=64)
    b = ANN.knn_lsh_join(spark, full, emb, queries, k=10, dim=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    with pytest.raises(ValueError, match="insert-only"):
        ANN.append_lsh_index(spark, emb.filter(F.col("vec_id") == 0), inc)


def test_lsh_geom_persisted_and_probe_guard(spark, emb, tmp_path):
    """LSH geometry (r5 review): builds persist _GEOM, probes with a
    mismatched geometry raise instead of silently signing queries
    against different hyperplanes, and append reads the artifact's
    geometry (no caller args to get wrong)."""
    import pytest as _pytest

    from etl_btc_spark.operators import ann_index as ANN

    idx = str(tmp_path / "lsh_g")
    ANN.build_lsh_index(spark, emb, idx, dim=64, n_bands=8, bits_per_band=4)
    assert ANN._read_lsh_geom(idx) == {"dim": 64, "n_bands": 8, "bits_per_band": 4}

    q = emb.filter(F.col("vec_id") == 0)
    with _pytest.raises(ValueError, match="geometry mismatch"):
        ANN.knn_lsh_indexed(spark, idx, emb, q, k=5, n_bands=16)
    with _pytest.raises(ValueError, match="geometry mismatch"):
        ANN.knn_lsh_join(spark, idx, emb, q, k=5, bits_per_band=8)


def test_hnsw_refresh_uses_build_geometry(spark, emb, tmp_path):
    """r5 review follow-up: refresh reads M/ef_construction back from
    the artifact — a caller passing nothing (or wrong values) still
    rebuilds touched shards with the BUILD's geometry, keeping
    refresh ≡ rebuild."""
    from etl_btc_spark.operators import hnsw as HN

    idx = str(tmp_path / "hnsw_m16")
    HN.build_hnsw_index(spark, emb, idx, n_shards=2, M=16, ef_construction=32)
    changed = emb.limit(5).select("vec_id")
    # defaults (M=8, efc=64) would diverge if they were honored
    HN.refresh_hnsw_index(spark, emb, idx, changed)
    full = str(tmp_path / "hnsw_m16_full")
    HN.build_hnsw_index(spark, emb, full, n_shards=2, M=16, ef_construction=32)
    a = spark.read.parquet(idx + "/nodes").orderBy("vec_id").collect()
    b = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert a == b


def test_hnsw_diversity_heuristic_on_clustered_geometry(spark, tmp_path):
    """Select-neighbors diversity heuristic (r6; Malkov & Yashunin
    Alg. 4, the rule the reference's Qdrant index builds with,
    init_qdrant.py:43-48): on blobby embeddings plain top-M links
    only within each tight cluster, the layer graphs decompose into
    near-disconnected cliques, and the beam search cannot leave the
    entry point's blob. The heuristic keeps inter-cluster bridges.

    Pins both halves: (a) graph-level — on an 8-blob Gaussian fixture
    plain top-M recall collapses while the heuristic stays near
    perfect (WHY the heuristic exists); (b) end-to-end — the sharded
    build + join path holds the standard >= 0.8 floor on the same
    hostile geometry."""
    import numpy as np
    import pandas as pd

    from etl_btc_spark.operators import hnsw as HN

    rng = np.random.default_rng(11)
    # sigma 0.3: blobs stay far tighter than the inter-center spread
    # (so plain top-M still fails) while intra-blob angular gaps stay
    # above the int8 code resolution (~1/127) the distributed probe
    # beam-searches with
    n, d, k_blobs, sigma, M, efc, efs = 600, 16, 8, 0.3, 4, 32, 32
    centers = rng.standard_normal((k_blobs, d)) * 10
    vecs = centers[np.arange(n) % k_blobs] + rng.standard_normal((n, d)) * sigma

    def graph_recall(diversify: bool) -> float:
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        levels = HN._stable_levels(list(range(n)), M)
        adj, entry = HN._build_shard_graph(vn, levels, M, efc, diversify)
        maxlev = len(adj) - 1
        tot = 0.0
        nq = 40
        for qi in range(nq):
            q = vn[qi * (n // nq)]
            true = set(np.argsort(-(vn @ q), kind="stable")[:10])
            ep = entry
            for lvl in range(maxlev, 0, -1):
                ep = HN._greedy_descend(q, ep, adj[lvl], vn)
            got = set(i for _, i in HN._search_layer(q, [ep], efs, adj[0], vn)[:10])
            tot += len(true & got) / 10
        return tot / nq

    plain, heur = graph_recall(False), graph_recall(True)
    assert plain < 0.7, plain  # top-M demonstrably loses here
    assert heur >= 0.95, heur  # the heuristic rescues it

    # end-to-end through the sharded Spark build/join
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in vecs]})
    )
    idx = str(tmp_path / "hnsw_blobs")
    HN.build_hnsw_index(spark, df, idx, M=M, ef_construction=efc, n_shards=2)
    queries = df.filter(F.col("vec_id") % 40 == 0)
    out = HN.knn_hnsw_join(spark, idx, df, queries, k=10, ef_search=efs)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qid, ids in got.items():
        exact = set(
            r.vec_id
            for r in SIM.knn_exact(df, df.filter(F.col("vec_id") == qid), k=10).collect()
        )
        recalls.append(len(ids & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_probe_guards_and_null_query_batches(spark, emb, tmp_path):
    """Review r7 hardening: (1) probing a path with no complete build
    raises instead of silently scanning partial files; (2) the batched
    kNN joins tolerate NULL query vectors (dropped, like the
    single-query probes) instead of crashing the sig/probe UDFs;
    (3) an HNSW build over duplicate ids fails loudly (id-keyed edges
    would silently mis-wire); (4) refreshing an HNSW index to an empty
    snapshot refuses without destroying the artifact."""
    import os

    import pandas as pd

    from etl_btc_spark.operators import ann_index as ANN
    from etl_btc_spark.operators import hnsw as HN

    # (1) unbuilt-path probes raise
    q = emb.filter(F.col("vec_id") == 0)
    for fn in (
        lambda p: ANN.knn_lsh_indexed(spark, p, emb, q, k=5),
        lambda p: ANN.knn_ivf_indexed(spark, p, emb, q, k=5),
        lambda p: ANN.knn_lsh_join(spark, p, emb, q, k=5),
        lambda p: ANN.knn_ivf_join(spark, p, emb, q, k=5),
        lambda p: HN.knn_hnsw_join(spark, p, emb, q, k=5),
    ):
        with pytest.raises(ValueError, match="_BUILT"):
            fn(str(tmp_path / "nowhere"))

    # (2) NULL query vectors in the batched joins: dropped, not a crash
    lsh = str(tmp_path / "lsh_nullq")
    ANN.build_lsh_index(spark, emb, lsh)
    ivf = str(tmp_path / "ivf_nullq")
    ANN.build_ivf_index(spark, emb, ivf, n_centroids=8)
    null_row = spark.createDataFrame(
        pd.DataFrame({"vec_id": [999_999], "embedding": [None], "label": [0]})
    ).select("vec_id", F.col("embedding").cast("array<float>"), "label")
    qbatch = emb.filter(F.col("vec_id") < 3).unionByName(null_row)
    for fn, idx in ((ANN.knn_lsh_join, lsh), (ANN.knn_ivf_join, ivf)):
        out = fn(spark, idx, emb, qbatch, k=5)
        got = {r["query_id"] for r in out.select("query_id").distinct().collect()}
        assert got == {0, 1, 2}  # NULL query contributes nothing

    # (3) duplicate ids fail the HNSW build
    dup = emb.limit(20).unionByName(emb.limit(5))
    with pytest.raises(Exception, match="duplicate"):
        HN.build_hnsw_index(spark, dup, str(tmp_path / "hnsw_dup"), n_shards=1)

    # (4) refresh-to-empty refuses and leaves the artifact intact
    hidx = str(tmp_path / "hnsw_empty_refresh")
    small = emb.limit(40)
    HN.build_hnsw_index(spark, small, hidx, n_shards=2)
    empty_snapshot = small.filter(F.lit(False))
    with pytest.raises(ValueError, match="no indexable rows"):
        HN.refresh_hnsw_index(
            spark, empty_snapshot, hidx, small.select("vec_id")
        )
    assert os.path.exists(os.path.join(hidx, "_BUILT"))
    assert HN.knn_hnsw_join(spark, hidx, small, q, k=5).count() == 5


def test_pair_cosine_and_ivf_null_tolerance(spark):
    """Review r8: (1) pair_cosine_udf degrades NULL rows to 0.0 like
    the cosine() expression instead of killing the stage on the mixed
    None/list batch; (2) the in-memory IVF drops NULL embeddings —
    unfiltered, a NULL among the lowest ids became a degenerate
    centroid and NULL rows surfaced as sim-0.0 'neighbors'."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "a": [[1.0, 0.0], None, [0.0, 1.0], [1.0, 1.0]],
            "b": [[1.0, 0.0], [1.0, 0.0], None, [1.0, 1.0]],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id long, a array<double>, b array<double>")
    got = {
        r["vec_id"]: r["c"]
        for r in df.select("vec_id", SIM.pair_cosine_udf()(F.col("a"), F.col("b")).alias("c")).collect()
    }
    assert got[0] == 1.0 and got[3] == pytest.approx(1.0)
    assert got[1] == 0.0 and got[2] == 0.0  # NULL → 0.0, no crash

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2, 3, 4],
                "embedding": [None, [1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]],
            }
        ),
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 1)
    out = [r["vec_id"] for r in SIM.knn_ivf(emb, q, k=5, n_centroids=2, nprobe=2).collect()]
    assert 0 not in out  # the NULL row is never a neighbor
    assert out[0] == 1


def test_semantic_dedup_cluster_scoping_laws(spark):
    """r10 SemDeDup shape: (1) identical vectors land in one cluster
    and only the min id survives; (2) near-dup vectors whose nearest
    centroids DIFFER are both kept — pairs are compared within a
    cluster only, the whole point of the O(Σ cluster²) contract;
    (3) NULL embeddings are excluded; (4) every cluster's min id is
    always kept (keep-min-id is chain-proof at the cluster floor)."""
    import pandas as pd

    # two well-separated centroids on orthogonal axes
    c0 = [1.0] + [0.0] * 7
    c1 = [0.0, 1.0] + [0.0] * 6

    def near(base, eps, flip):
        v = list(base)
        v[flip] += eps
        return v

    rows = {
        10: c0,                    # cluster 0 exemplar
        11: list(c0),              # identical -> dropped (10 kept)
        12: near(c0, 0.05, 2),     # cos ~0.999 to 10 -> dropped
        20: c1,                    # cluster 1 exemplar
        21: list(c1),              # identical -> dropped (20 kept)
        # 30/31: cosine(30,31) >= 0.9 but nearest centroids differ
        # (each sits closer to its own axis) -> BOTH kept
        30: [0.8, 0.6] + [0.0] * 6,
        31: [0.6, 0.8] + [0.0] * 6,
        40: None,                  # NULL embedding -> excluded
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": list(rows), "embedding": [rows[k] for k in rows]}
        )
    )
    cents = spark.createDataFrame(
        pd.DataFrame({"centroid_id": [1, 2], "embedding": [c0, c1]})
    )
    out = DD.semantic_dedup(df, cents, threshold=0.9)
    got = {r["vec_id"]: (r["centroid_id"], r["keep"]) for r in out.collect()}
    DD.release_scoped_caches()
    assert 40 not in got  # NULL excluded
    assert got[10] == (1, True) and got[11] == (1, False) and got[12] == (1, False)
    assert got[20] == (2, True) and got[21] == (2, False)
    # cross-cluster near-dups both survive (cosine(30,31)=0.96 >= 0.9)
    assert got[30] == (1, True) and got[31] == (2, True)
    # min id of every cluster is kept
    for cid in (1, 2):
        ids = [i for i, (c, _) in got.items() if c == cid]
        assert got[min(ids)][1] is True


def test_rrf_fuse_batched_equals_per_query_fusion(spark, emb):
    """r12 hybrid retrieval: the batched fuser (windows partitioned
    by query) must produce EXACTLY the per-query rrf_fuse result for
    every query in the batch — same ranks, same rounded scores, same
    tie-breaks."""
    queries = [0, 50, 100]
    per_query = {}
    batched_inputs_a, batched_inputs_b = [], []
    for qid in queries:
        q = emb.filter(F.col("vec_id") == qid)
        top = SIM.knn_exact(emb, q, k=15).select(
            F.col("vec_id").alias("doc_id"),
            F.round(F.col("cosine_sim") + F.lit(1e-9), 6).alias("cos"),
        )
        # second retriever: a deliberately different ordering (id
        # ascending as a fake score) so fusion has real work to do
        alt = (
            emb.filter(F.col("vec_id") % 7 == qid % 7)
            .select(
                F.col("vec_id").alias("doc_id"),
                (-F.col("vec_id")).cast("double").alias("alt"),
            )
            .orderBy("doc_id")
            .limit(15)
        )
        per_query[qid] = [
            tuple(r)
            for r in SIM.rrf_fuse(
                [(top, "cos"), (alt, "alt")], id_col="doc_id", k=10
            ).collect()
        ]
        batched_inputs_a.append(top.withColumn("query_id", F.lit(qid)))
        batched_inputs_b.append(alt.withColumn("query_id", F.lit(qid)))
    a = batched_inputs_a[0]
    for x in batched_inputs_a[1:]:
        a = a.unionByName(x)
    b = batched_inputs_b[0]
    for x in batched_inputs_b[1:]:
        b = b.unionByName(x)
    fused = SIM.rrf_fuse_batched(
        [(a, "cos"), (b, "alt")], query_col="query_id", id_col="doc_id", k=10
    )
    for qid in queries:
        got = [
            (r["doc_id"], r["rrf_score"])
            for r in fused.filter(F.col("query_id") == qid)
            .orderBy(F.col("rrf_score").desc(), "doc_id")
            .collect()
        ]
        assert got == per_query[qid], qid


def test_rrf_absent_from_one_list_contributes_nothing(spark):
    """A doc present in only one list gets only that list's 1/(k+r);
    a doc ranked 1st in both lists dominates; ties break by id."""
    import pandas as pd

    a = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "s": [3.0, 2.0, 1.0]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 4], "s": [9.0, 8.0]})
    )
    out = {
        r["doc_id"]: r["rrf_score"]
        for r in SIM.rrf_fuse([(a, "s"), (b, "s")], k=10).collect()
    }
    assert abs(out[1] - round(2 / 61 + 1e-9, 9)) < 1e-12
    assert abs(out[2] - round(1 / 62 + 1e-9, 9)) < 1e-12
    assert abs(out[4] - round(1 / 62 + 1e-9, 9)) < 1e-12
    assert out[1] > out[2] == out[4] > out[3]


def test_rrf_contract_enforced(spark):
    """r13 (VERDICT r12 #5 + ADVICE): the fusers ENFORCE their
    bounded-unique-list contract instead of trusting it — empty
    frames list raises immediately; a duplicated id inside one list
    (which would silently sum two reciprocal-rank terms) and a list
    above max_candidates both fail loudly inside the plan."""
    import pandas as pd

    a = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "s": [3.0, 2.0, 1.0]})
    )
    with pytest.raises(ValueError, match="at least one ranked list"):
        SIM.rrf_fuse([])
    with pytest.raises(ValueError, match="at least one ranked list"):
        SIM.rrf_fuse_batched([], query_col="query_id")
    # duplicate id within one list -> in-plan refusal
    dup = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1, 2], "s": [9.0, 8.0, 7.0]})
    )
    with pytest.raises(Exception, match="rrf_fuse"):
        SIM.rrf_fuse([(a, "s"), (dup, "s")]).collect()
    # oversized list -> in-plan refusal (tiny bound to keep it cheap)
    with pytest.raises(Exception, match="rrf_fuse"):
        SIM.rrf_fuse([(a, "s")], max_candidates=2).collect()
    # batched: duplicate (query, id) pair refused; the SAME id under
    # two DIFFERENT queries is legal (per-query lists are independent)
    qdup = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [0, 0, 1], "doc_id": [5, 5, 5], "s": [3.0, 2.0, 1.0]}
        )
    )
    with pytest.raises(Exception, match="rrf_fuse"):
        SIM.rrf_fuse_batched([(qdup, "s")], query_col="query_id").collect()
    ok = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [0, 1], "doc_id": [5, 5], "s": [3.0, 1.0]}
        )
    )
    got = SIM.rrf_fuse_batched([(ok, "s")], query_col="query_id").collect()
    assert {(r["query_id"], r["doc_id"]) for r in got} == {(0, 5), (1, 5)}


def test_minhash_bucket_cap_bounds_clone_floods(spark):
    """r16: max_bucket drops band buckets wider than the cap BEFORE
    the self-join — the stop-bucket bound for clone floods (the r16
    scalecheck measured 100x pair volume on 10x data when every doc
    sits in a 10-clone family). A 40-clone flood vanishes under
    cap=10 while an isolated near-dup pair (bucket width 2) survives;
    with the cap off, flood pairs dominate quadratically."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(i, base + f"clone{i}") for i in range(40)]
    rows += [
        (100, "completely different standalone text about spark shuffles and joins one"),
        (101, "completely different standalone text about spark shuffles and joins two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = DD.minhash_lsh_candidates(df, ngram=3)
    capped = DD.minhash_lsh_candidates(df, ngram=3, max_bucket=10)
    unc = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cap = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in unc and (100, 101) in cap  # small bucket survives
    flood_unc = {p for p in unc if p[0] < 40 and p[1] < 40}
    flood_cap = {p for p in cap if p[0] < 40 and p[1] < 40}
    assert len(flood_unc) > 100  # quadratic without the cap
    assert len(flood_cap) == 0   # hard-bounded with it
    assert cap <= unc            # the cap only ever drops pairs


def test_minhash_oracle_cap_generator_duckdb():
    """The max_bucket arm of minhash_oracle_ctes parses and runs in
    DuckDB, and its capped candidate set is a subset of the uncapped
    one over a corpus with a clone flood (cross-engine parity of the
    cap itself is value-gated by q99bx; this pins the generator)."""
    import duckdb

    rows = ", ".join(
        f"({i}, 'the quick brown fox jumps over the lazy dog once more clone{i}')"
        for i in range(30)
    ) + ", (100, 'totally different words about spark one'), (101, 'totally different words about spark two')"
    w = (
        "w AS (SELECT doc_id, regexp_split_to_array(trim(lower("
        "regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t "
        f"FROM (VALUES {rows}) docs(doc_id, text))"
    )
    con = duckdb.connect()
    unc = set(
        con.execute(
            f"WITH {w}, {DD.minhash_oracle_ctes()} SELECT * FROM mh_cand"
        ).fetchall()
    )
    cap = set(
        con.execute(
            f"WITH {w}, {DD.minhash_oracle_ctes(max_bucket=8)} "
            "SELECT * FROM mh_cand"
        ).fetchall()
    )
    assert cap <= unc
    assert len(unc) > len(cap)  # the 30-clone flood exceeds cap=8
    assert (100, 101) in cap    # width-2 bucket survives
