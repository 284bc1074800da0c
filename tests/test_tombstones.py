"""Superseded-ids sidecar (r9, VERDICT r8 "Next round" #1): O(batch)
UPDATE maintenance for the insert-only index families. For each
family: (1) upsert ≡ rebuild probe-equivalence over the updated
corpus, (2) pre-existing index files stay byte-identical (the update
touches O(batch), never the corpus), (3) compaction folds the sidecar
in and restores the pristine artifact shape, (4) a crash-point sweep
over the upsert proves complete-or-refused at every filesystem/table
write.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_btc_spark.operators import dedup as DD
from etl_btc_spark.operators import tombstones as TS

from tests.test_index_crash import _inject_and_run  # reuse the harness


def _file_hashes(d):
    out = {}
    for root, _, names in os.walk(d):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]})
    )


_BASE = [
    (i, "shared common prefix words alpha beta gamma delta doc %d body %d" % (i, i))
    for i in range(30)
]
_NEW5 = "completely rewritten unique narrative nothing like before at all"


@pytest.fixture()
def mh_state(spark, tmp_path):
    """A built index over _BASE, plus the updated corpus (doc 5
    rewritten, docs 100-101 added) and its from-scratch twin."""
    corpus = _mk_docs(spark, _BASE)
    path = str(tmp_path / "mh")
    DD.build_minhash_index(spark, corpus, path)
    batch = _mk_docs(spark, [(5, _NEW5), (100, "fresh doc one"), (101, "fresh doc two")])
    updated = _mk_docs(
        spark,
        [(i, t) for i, t in _BASE if i != 5]
        + [(5, _NEW5), (100, "fresh doc one"), (101, "fresh doc two")],
    )
    rebuilt = str(tmp_path / "mh_rebuilt")
    DD.build_minhash_index(spark, updated, rebuilt)
    return path, batch, updated, rebuilt


def _mh_probe(spark, path, updated, probe_docs):
    out = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 6))
        for r in DD.incremental_near_dupes(
            spark, path, updated, probe_docs, 0.5
        ).collect()
    )
    DD.release_scoped_caches()
    return out


def test_minhash_upsert_equals_rebuild_and_compacts(spark, tmp_path, mh_state):
    path, batch, updated, rebuilt = mh_state
    pre_files = _file_hashes(os.path.join(path, "bands"))

    DD.upsert_minhash_index(spark, batch, path, stale_ids=batch.select("doc_id"))

    # O(batch): every pre-existing band file untouched, new ones added
    post_files = _file_hashes(os.path.join(path, "bands"))
    assert all(post_files[p] == h for p, h in pre_files.items())
    assert len(post_files) > len(pre_files)
    assert TS.has_tombstones(path) and TS.read_gen(path) == 1

    # probe equivalence: near-dups of a probe batch against the
    # upserted index == against a from-scratch rebuild. The probe
    # docs near-dup doc 5's NEW text and doc 7's (unchanged) text;
    # one probes the OLD text of 5, which must match NOTHING.
    probe_docs = _mk_docs(
        spark,
        [
            (900, _NEW5 + " tail"),
            (901, dict(_BASE)[7]),
            (902, dict(_BASE)[5]),  # the superseded text
        ],
    )
    got = _mh_probe(spark, path, updated, probe_docs)
    want = _mh_probe(spark, rebuilt, updated, probe_docs)
    assert got == want
    assert any(b == 900 and c == 5 for b, c, _ in got)  # new text IS indexed
    assert not any(b == 902 and c == 5 for b, c, _ in got)  # old text is DEAD

    # compaction folds: sidecar gone, probe results identical
    DD.compact_minhash_index(spark, path)
    assert not TS.has_tombstones(path) and TS.read_gen(path) == 0
    assert _mh_probe(spark, path, updated, probe_docs) == want
    # idempotent no-op on a clean artifact
    before = _file_hashes(os.path.join(path, "bands"))
    DD.compact_minhash_index(spark, path)
    assert _file_hashes(os.path.join(path, "bands")) == before

    # stale_ids=None computes the overlap itself (id-only scan)
    batch2 = _mk_docs(spark, [(7, "another full rewrite of doc seven entirely")])
    DD.upsert_minhash_index(spark, batch2, path)
    assert TS.read_gen(path) == 1  # counter restarted by the fold
    got2 = _mh_probe(spark, path, updated, _mk_docs(spark, [(903, dict(_BASE)[7])]))
    assert not any(c == 7 for _, c, _ in got2)  # 7's old text superseded
    # the exact-Jaccard re-rank reads text from the corpus frame, so
    # the frame must reflect the upsert too (as the streaming sink's
    # merged table does)
    updated2 = updated.filter(F.col("doc_id") != 7).unionByName(batch2)
    got3 = _mh_probe(
        spark,
        path,
        updated2,
        _mk_docs(spark, [(904, "another full rewrite of doc seven entirely")]),
    )
    assert any(c == 7 for _, c, _ in got3)  # …and its NEW text is live


def test_minhash_upsert_crash_sweep(spark, tmp_path, monkeypatch, mh_state):
    """Kill the upsert at every fs/table write: the artifact is
    complete-or-refused, and the documented recovery (rebuild from
    the corpus table) converges to the no-crash probe answer."""
    _, batch, updated, rebuilt = mh_state
    probe_docs = _mk_docs(spark, [(900, _NEW5 + " tail"), (902, dict(_BASE)[5])])
    want_final = _mh_probe(spark, rebuilt, updated, probe_docs)

    corpus = _mk_docs(spark, _BASE)
    # r18 (VERDICT r17 #2): one pristine build + copytree per crash
    # point — the build is deterministic, so the pre-upsert state is
    # byte-identical to a fresh build (same clone pattern bench.py's
    # maintenance timings use); want_old is path-independent
    import shutil as _sh

    pristine = str(tmp_path / "sweep_pristine")
    DD.build_minhash_index(spark, corpus, pristine)
    want_old = _mh_probe(spark, pristine, updated, probe_docs)
    crash_at = 0
    while True:
        path = str(tmp_path / ("sweep_%d" % crash_at))
        _sh.copytree(pristine, path)
        crashed, _ = _inject_and_run(
            monkeypatch,
            path,
            crash_at,
            lambda: DD.upsert_minhash_index(
                spark, batch, path, stale_ids=batch.select("doc_id")
            ),
        )
        if DD.minhash_index_is_current(path):
            got = _mh_probe(spark, path, updated, probe_docs)
            assert got in (want_old, want_final), (crash_at, got)
        else:
            with pytest.raises(ValueError, match="no current"):
                _mh_probe(spark, path, updated, probe_docs)
        # recovery: rebuild from the (already-updated) corpus table
        DD.build_minhash_index(spark, updated, path)
        assert _mh_probe(spark, path, updated, probe_docs) == want_final, crash_at
        if not crashed:
            break
        crash_at += 1
    assert crash_at >= 3, "sweep found too few crash points"


_TXT_BASE = [
    (i, "join hash scan merge %s doc %d" % ("sort " * (i % 3), i)) for i in range(25)
]
_TXT_NEW3 = "probe filter project aggregate window rank"


def _tx_probe(spark, path, terms=("join", "hash", "merge", "probe", "filter")):
    from etl_btc_spark.operators import text_index as TI

    return [
        tuple(r) for r in TI.bm25_probe(spark, path, list(terms), n=50).collect()
    ]


@pytest.fixture()
def tx_state(spark, tmp_path):
    from etl_btc_spark.operators import text_index as TI

    corpus = _mk_docs(spark, _TXT_BASE)
    path = str(tmp_path / "tx")
    TI.build_text_index(spark, corpus, path)
    batch = _mk_docs(
        spark, [(3, _TXT_NEW3), (100, "filter probe alpha"), (101, "rank window beta")]
    )
    updated = _mk_docs(
        spark,
        [(i, t) for i, t in _TXT_BASE if i != 3]
        + [(3, _TXT_NEW3), (100, "filter probe alpha"), (101, "rank window beta")],
    )
    rebuilt = str(tmp_path / "tx_rebuilt")
    TI.build_text_index(spark, updated, rebuilt)
    return path, batch, updated, rebuilt


def test_text_upsert_equals_rebuild_and_compacts(spark, tmp_path, tx_state):
    from etl_btc_spark.operators import text_index as TI

    path, batch, updated, rebuilt = tx_state
    pre_files = _file_hashes(os.path.join(path, "postings"))

    TI.upsert_text_index(spark, batch, path)

    # O(batch): pre-existing posting files byte-identical
    post_files = _file_hashes(os.path.join(path, "postings"))
    assert all(post_files[p] == h for p, h in pre_files.items())
    assert len(post_files) > len(pre_files)
    assert TS.has_tombstones(path) and TS.read_gen(path) == 1

    # BM25 scores identical to a rebuild over the updated corpus —
    # tf, df, dl, n_docs, avgdl must ALL reflect the supersede
    want = _tx_probe(spark, rebuilt)
    assert _tx_probe(spark, path) == want
    sa = spark.read.parquet(path + "/stats").collect()[0]
    sb = spark.read.parquet(rebuilt + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    # term_lookup: doc 3's OLD tokens are dead, new ones live
    tl = {
        (r["token"], r["doc_id"])
        for r in TI.term_lookup(spark, path, ["scan", "probe"]).collect()
    }
    assert ("scan", 3) not in tl and ("probe", 3) in tl

    # batched join matches the rebuilt index too
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [1], "terms": [["probe", "filter"]]})
    )
    ja = [tuple(r) for r in TI.bm25_join(spark, path, q, n=10).collect()]
    jb = [tuple(r) for r in TI.bm25_join(spark, rebuilt, q, n=10).collect()]
    assert ja == jb

    # compaction folds: sidecar gone, scores unchanged, doclen holds
    # ONE latest row per id
    TI.compact_text_index(spark, path)
    assert not TS.has_tombstones(path) and TS.read_gen(path) == 0
    assert _tx_probe(spark, path) == want
    dl = spark.read.parquet(path + "/doclen")
    assert dl.count() == dl.select("doc_id").distinct().count()
    sa2 = spark.read.parquet(path + "/stats").collect()[0]
    assert (sa2["n_docs"], sa2["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    # a second upsert after the fold still works (gen restarted)
    TI.upsert_text_index(spark, _mk_docs(spark, [(7, "argh blarg")]), path)
    assert TS.read_gen(path) == 1
    tl2 = {
        (r["token"], r["doc_id"])
        for r in TI.term_lookup(spark, path, ["argh", "join"]).collect()
    }
    assert ("argh", 7) in tl2 and ("join", 7) not in tl2


def test_text_upsert_crash_sweep(spark, tmp_path, monkeypatch, tx_state):
    from etl_btc_spark.operators import ann_index as ANN
    from etl_btc_spark.operators import text_index as TI

    _, batch, updated, rebuilt = tx_state
    want_final = _tx_probe(spark, rebuilt)
    corpus = _mk_docs(spark, _TXT_BASE)

    # r18 (VERDICT r17 #2): pristine build + copytree per crash point
    # (deterministic build; see test_minhash_upsert_crash_sweep)
    import shutil as _sh

    pristine = str(tmp_path / "tsweep_pristine")
    TI.build_text_index(spark, corpus, pristine)
    want_old = _tx_probe(spark, pristine)
    crash_at = 0
    while True:
        path = str(tmp_path / ("tsweep_%d" % crash_at))
        _sh.copytree(pristine, path)
        crashed, _ = _inject_and_run(
            monkeypatch,
            path,
            crash_at,
            lambda: TI.upsert_text_index(spark, batch, path),
        )
        if ANN._is_built(path, "text"):
            got = _tx_probe(spark, path)
            assert got in (want_old, want_final), (crash_at, got)
        else:
            with pytest.raises(ValueError, match="no complete"):
                _tx_probe(spark, path)
        TI.build_text_index(spark, updated, path)
        assert _tx_probe(spark, path) == want_final, crash_at
        if not crashed:
            break
        crash_at += 1
    assert crash_at >= 3, "sweep found too few crash points"


def _mk_vecs(spark, ids, seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": list(ids),
                "embedding": [
                    [float(x) for x in rng.randn(16).astype("float32")]
                    for _ in ids
                ],
            }
        )
    )


_LSH_KW = dict(dim=16, n_bands=4, bits_per_band=4)


def test_lsh_upsert_equals_rebuild(spark, tmp_path):
    """Upserted LSH index answers EXACTLY like a rebuild over the
    updated corpus (hyperplanes are deterministic in _GEOM), with
    every pre-existing band file byte-identical; compaction folds."""
    from etl_btc_spark.operators import ann_index as ANN

    base = _mk_vecs(spark, range(100), seed=7)
    # vectors 0-4 get entirely NEW embeddings; 200-204 are fresh
    moved = _mk_vecs(spark, list(range(5)) + list(range(200, 205)), seed=99)
    updated = base.filter(F.col("vec_id") >= 5).unionByName(moved)

    path = str(tmp_path / "lsh")
    ANN.build_lsh_index(spark, base, path, **_LSH_KW)
    pre_files = _file_hashes(os.path.join(path, "bands"))
    ANN.upsert_lsh_index(spark, moved, path)
    post_files = _file_hashes(os.path.join(path, "bands"))
    assert all(post_files[p] == h for p, h in pre_files.items())
    assert len(post_files) > len(pre_files)
    assert TS.has_tombstones(path) and TS.read_gen(path) == 1

    rebuilt = str(tmp_path / "lsh_rebuilt")
    ANN.build_lsh_index(spark, updated, rebuilt, **_LSH_KW)

    def probe(p, q):
        out = [
            tuple(r)
            for r in ANN.knn_lsh_indexed(
                spark, p, updated, q, k=10, **_LSH_KW
            ).collect()
        ]
        ANN.release_scoped_broadcasts()
        return out

    queries = [_mk_vecs(spark, [9000 + i], seed=40 + i) for i in range(4)]
    for q in queries:
        assert probe(path, q) == probe(rebuilt, q)
    # the batched join agrees too
    qb = _mk_vecs(spark, [9100, 9101, 9102], seed=55)
    ja = sorted(
        tuple(r) for r in ANN.knn_lsh_join(spark, path, updated, qb, k=5, **_LSH_KW).collect()
    )
    jb = sorted(
        tuple(r) for r in ANN.knn_lsh_join(spark, rebuilt, updated, qb, k=5, **_LSH_KW).collect()
    )
    assert ja == jb

    ANN.compact_lsh_index(spark, path)
    assert not TS.has_tombstones(path) and TS.read_gen(path) == 0
    for q in queries:
        assert probe(path, q) == probe(rebuilt, q)
    # live band rows after the fold: exactly one signature set per id
    bands = spark.read.parquet(os.path.join(path, "bands"))
    per_id = bands.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_id] == [_LSH_KW["n_bands"]]


def test_ivf_upsert_equals_frozen_centroid_rebuild(spark, tmp_path):
    """Upserted IVF index ≡ a frozen-centroid re-assignment over the
    updated corpus (the centroids never move on the upsert path, so
    the comparison target is build_ivf_index warm-started from the
    SAME centroids)."""
    from etl_btc_spark.operators import ann_index as ANN

    base = _mk_vecs(spark, range(120), seed=3)
    moved = _mk_vecs(spark, list(range(3)) + list(range(300, 305)), seed=77)
    updated = base.filter(F.col("vec_id") >= 3).unionByName(moved)

    path = str(tmp_path / "ivf")
    ANN.build_ivf_index(spark, base, path, n_centroids=4)
    pre_files = _file_hashes(os.path.join(path, "assigned"))
    ANN.upsert_ivf_index(spark, moved, path)
    post_files = _file_hashes(os.path.join(path, "assigned"))
    assert all(post_files[p] == h for p, h in pre_files.items())
    assert TS.has_tombstones(path) and TS.read_gen(path) == 1

    # frozen-centroid twin: rebuild the assignment table over the
    # updated corpus with EXACTLY this index's centroid matrix
    import numpy as np

    cents = sorted(
        spark.read.parquet(os.path.join(path, "centroids")).collect(),
        key=lambda r: r["centroid_id"],
    )
    cmat = np.array([r["centroid_vec"] for r in cents], dtype=np.float64)
    twin = str(tmp_path / "ivf_twin")
    ANN._write_ivf_artifact(
        spark, updated, twin, cmat, len(cents), "embedding", "vec_id", n_assign=2
    )

    def probe(p, q):
        out = [
            tuple(r)
            for r in ANN.knn_ivf_indexed(
                spark, p, updated, q, k=8, nprobe=2
            ).collect()
        ]
        ANN.release_scoped_broadcasts()
        return out

    for i in range(4):
        q = _mk_vecs(spark, [9500 + i], seed=60 + i)
        assert probe(path, q) == probe(twin, q), i

    ANN.compact_ivf_index(spark, path)
    assert not TS.has_tombstones(path) and TS.read_gen(path) == 0
    q = _mk_vecs(spark, [9600], seed=91)
    assert probe(path, q) == probe(twin, q)


def test_minhash_append_after_upsert_survives(spark, tmp_path, mh_state):
    """Rows appended AFTER an upsert stamp the current generation, so
    an earlier tombstone can never kill them."""
    path, batch, updated, _ = mh_state
    DD.upsert_minhash_index(spark, batch, path, stale_ids=batch.select("doc_id"))
    # now append doc 5's OLD id is illegal by contract, but a FRESH id
    # appended after the upsert must stay visible
    DD.append_minhash_index(spark, _mk_docs(spark, [(200, "post upsert doc")]), path)
    got = _mh_probe(
        spark,
        path,
        updated.unionByName(_mk_docs(spark, [(200, "post upsert doc")])),
        _mk_docs(spark, [(904, "post upsert doc")]),
    )
    assert any(c == 200 for _, c, _ in got)


def test_text_delete_matches_rebuild_without_ids(spark, tmp_path):
    """DELETE (r9): tombstone-only removal — probes and the exact-
    integer stats match a from-scratch rebuild WITHOUT the deleted
    docs; double-delete is a no-op (no double-subtract); a deleted id
    re-enters via upsert and stats stay exact; compaction drops the
    dead registry rows so the fold can't resurrect refusals."""
    from etl_btc_spark.operators import text_index as TI

    corpus = _mk_docs(spark, _TXT_BASE)
    path = str(tmp_path / "txd")
    TI.build_text_index(spark, corpus, path)

    victims = _mk_docs(spark, [(i, "x") for i in (2, 5, 9)]).select("doc_id")
    TI.delete_text_ids(spark, victims, path)
    remaining = _mk_docs(spark, [(i, t) for i, t in _TXT_BASE if i not in (2, 5, 9)])
    rebuilt = str(tmp_path / "txd_reb")
    TI.build_text_index(spark, remaining, rebuilt)
    assert _tx_probe(spark, path) == _tx_probe(spark, rebuilt)
    sa = spark.read.parquet(path + "/stats").collect()[0]
    sb = spark.read.parquet(rebuilt + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    # double-delete + deleting an absent id: both no-ops
    TI.delete_text_ids(spark, victims, path)
    TI.delete_text_ids(spark, _mk_docs(spark, [(999, "x")]).select("doc_id"), path)
    sa2 = spark.read.parquet(path + "/stats").collect()[0]
    assert (sa2["n_docs"], sa2["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    # re-add one deleted id with NEW text via upsert: counted as new
    back = _mk_docs(spark, [(5, "probe filter join restored")])
    TI.upsert_text_index(spark, back, path)
    rebuilt2 = str(tmp_path / "txd_reb2")
    TI.build_text_index(spark, remaining.unionByName(back), rebuilt2)
    assert _tx_probe(spark, path) == _tx_probe(spark, rebuilt2)
    sc = spark.read.parquet(path + "/stats").collect()[0]
    sd = spark.read.parquet(rebuilt2 + "/stats").collect()[0]
    assert (sc["n_docs"], sc["total_dl"]) == (sd["n_docs"], sd["total_dl"])

    # compaction folds deletes physically: no dead postings, registry
    # holds exactly the live ids, probes unchanged
    TI.compact_text_index(spark, path)
    assert not TS.has_tombstones(path)
    assert _tx_probe(spark, path) == _tx_probe(spark, rebuilt2)
    reg_ids = {
        r["doc_id"] for r in spark.read.parquet(path + "/doclen").collect()
    }
    assert 2 not in reg_ids and 9 not in reg_ids and 5 in reg_ids


def test_minhash_lsh_ivf_deletes(spark, tmp_path, mh_state):
    """DELETE across the stats-free families: dead rows stop
    producing candidates immediately; re-add works (append stamps the
    current generation, at/after the delete's dead_below)."""
    from etl_btc_spark.operators import ann_index as ANN

    # minhash: delete doc 7, then a probe with 7's text finds nothing
    path, _, updated, _ = mh_state
    DD.delete_minhash_ids(spark, _mk_docs(spark, [(7, "x")]).select("doc_id"), path)
    got = _mh_probe(spark, path, updated, _mk_docs(spark, [(903, dict(_BASE)[7])]))
    assert not any(c == 7 for _, c, _ in got)
    # re-add via append: visible again
    DD.append_minhash_index(spark, _mk_docs(spark, [(7, dict(_BASE)[7])]), path)
    got2 = _mh_probe(spark, path, updated, _mk_docs(spark, [(903, dict(_BASE)[7])]))
    assert any(c == 7 for _, c, _ in got2)

    # LSH + IVF: deleted vector never returned by any probe
    base = _mk_vecs(spark, range(60), seed=31)
    target = base.filter(F.col("vec_id") == 17)
    qvec = target.select(
        F.col("vec_id") + 9000, F.col("embedding")
    ).toDF("vec_id", "embedding")

    lp = str(tmp_path / "lshd")
    ANN.build_lsh_index(spark, base, lp, **_LSH_KW)
    pre = [
        r["vec_id"]
        for r in ANN.knn_lsh_indexed(spark, lp, base, qvec, k=5, **_LSH_KW).collect()
    ]
    ANN.release_scoped_broadcasts()
    assert 17 in pre
    ANN.delete_lsh_ids(spark, target.select("vec_id"), lp)
    post = [
        r["vec_id"]
        for r in ANN.knn_lsh_indexed(spark, lp, base, qvec, k=5, **_LSH_KW).collect()
    ]
    ANN.release_scoped_broadcasts()
    assert 17 not in post

    ip = str(tmp_path / "ivfd")
    ANN.build_ivf_index(spark, base, ip, n_centroids=4)
    pre = [
        r["vec_id"]
        for r in ANN.knn_ivf_indexed(spark, ip, base, qvec, k=5, nprobe=4).collect()
    ]
    ANN.release_scoped_broadcasts()
    assert 17 in pre
    ANN.delete_ivf_ids(spark, target.select("vec_id"), ip)
    post = [
        r["vec_id"]
        for r in ANN.knn_ivf_indexed(spark, ip, base, qvec, k=5, nprobe=4).collect()
    ]
    ANN.release_scoped_broadcasts()
    assert 17 not in post


def test_upserts_refuse_duplicate_id_batches(spark, tmp_path):
    """ADVICE r9: a batch repeating an id would land two live row
    sets at the SAME generation (double-counted text stats,
    nondeterministic latest-per-id dl) — every family upsert must
    refuse it loudly instead of assuming the caller deduped."""
    from etl_btc_spark.operators import ann_index as ANN
    from etl_btc_spark.operators import text_index as TI

    corpus = _mk_docs(spark, _BASE)
    dup_docs = _mk_docs(spark, [(5, "variant a"), (5, "variant b")])

    mh = str(tmp_path / "mh")
    DD.build_minhash_index(spark, corpus, mh)
    with pytest.raises(ValueError, match="repeats doc_id"):
        DD.upsert_minhash_index(spark, dup_docs, mh)

    tx = str(tmp_path / "tx")
    TI.build_text_index(spark, corpus, tx)
    with pytest.raises(ValueError, match="repeats doc_id"):
        TI.upsert_text_index(spark, dup_docs, tx)

    tg = str(tmp_path / "tg")
    TI.build_trigram_index(spark, corpus, tg)
    with pytest.raises(ValueError, match="repeats doc_id"):
        TI.upsert_trigram_index(spark, dup_docs, tg)

    vecs = _mk_vecs(spark, range(40), seed=11)
    dup_vecs = _mk_vecs(spark, [3, 3], seed=12)
    lsh = str(tmp_path / "lsh")
    ANN.build_lsh_index(spark, vecs, lsh, **_LSH_KW)
    with pytest.raises(ValueError, match="repeats vec_id"):
        ANN.upsert_lsh_index(spark, dup_vecs, lsh)

    ivf = str(tmp_path / "ivf")
    ANN.build_ivf_index(spark, vecs, ivf, n_centroids=4)
    with pytest.raises(ValueError, match="repeats vec_id"):
        ANN.upsert_ivf_index(spark, dup_vecs, ivf)
