"""Crash-point sweeps for the ANN index artifact writes (VERDICT r7
"Next round" #5): kill build / append / refresh at EVERY python-side
filesystem op and every Spark table write in turn, and prove the
artifact is never half-readable — after any injected crash the probe
either answers from a complete index (the old one, or the finished
new one) or REFUSES via _require_built, and the documented recovery
(re-run the op, or rebuild via the ensure path) converges to the
no-crash result.

Mirrors the style of the upsert/compaction publish sweeps in
test_sinks_sources.py (r7), extended with a DataFrameWriter.parquet
crash point so "the cluster died mid-table-write" is swept too, not
just the driver-side marker/metadata ops.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_btc_spark.operators import ann_index as ANN
from etl_btc_spark.operators import hnsw as HN

DIM = 16


class InjectedCrash(RuntimeError):
    """Distinct from the operators' own ValueError guards so the sweep
    can't mistake a refused op for a simulated crash."""


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "embedding": [
                [float(x) for x in rng.randn(DIM).astype(np.float32)]
                for _ in range(120)
            ],
        }
    )
    return spark.createDataFrame(pdf).coalesce(2).persist()


@pytest.fixture(scope="module")
def batch(spark):
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(1000, 1010, dtype=np.int64),
            "embedding": [
                [float(x) for x in rng.randn(DIM).astype(np.float32)]
                for _ in range(10)
            ],
        }
    )
    return spark.createDataFrame(pdf).coalesce(1).persist()


@pytest.fixture(scope="module")
def query(spark):
    rng = np.random.RandomState(23)
    pdf = pd.DataFrame(
        {
            "query_id": [0],
            "vec_id": [0],
            "embedding": [[float(x) for x in rng.randn(DIM).astype(np.float32)]],
        }
    )
    return spark.createDataFrame(pdf).coalesce(1).persist()


def _rows(df) -> list:
    return sorted(tuple(sorted(r.asDict().items())) for r in df.collect())


def _inject_and_run(monkeypatch, path: str, crash_at: int, op) -> tuple[bool, int]:
    """Run ``op`` with the (crash_at+1)-th filesystem/table write under
    ``path`` raising InjectedCrash. Returns (crashed, ops_seen)."""
    import builtins

    from pyspark.sql.readwriter import DataFrameWriter

    calls = {"n": 0}

    def tick(target) -> None:
        if str(target).startswith(path):
            calls["n"] += 1
            if calls["n"] == crash_at + 1:
                raise InjectedCrash("crash at fs-op #%d" % calls["n"])

    real_remove, real_rename, real_replace = os.remove, os.rename, os.replace
    real_rmtree, real_open = shutil.rmtree, builtins.open
    real_parquet = DataFrameWriter.parquet

    def m_remove(p, *a, **kw):
        tick(p)
        return real_remove(p, *a, **kw)

    def m_rename(s, d, *a, **kw):
        tick(s)
        return real_rename(s, d, *a, **kw)

    def m_replace(s, d, *a, **kw):
        tick(s)
        return real_replace(s, d, *a, **kw)

    def m_rmtree(p, *a, **kw):
        tick(p)
        return real_rmtree(p, *a, **kw)

    def m_open(p, mode="r", *a, **kw):
        if "w" in str(mode):
            tick(p)
        return real_open(p, mode, *a, **kw)

    def m_parquet(self, p, *a, **kw):
        tick(p)
        return real_parquet(self, p, *a, **kw)

    monkeypatch.setattr(os, "remove", m_remove)
    monkeypatch.setattr(os, "rename", m_rename)
    monkeypatch.setattr(os, "replace", m_replace)
    monkeypatch.setattr(shutil, "rmtree", m_rmtree)
    monkeypatch.setattr(builtins, "open", m_open)
    monkeypatch.setattr(DataFrameWriter, "parquet", m_parquet)
    try:
        op()
        return False, calls["n"]
    except InjectedCrash:
        return True, calls["n"]
    finally:
        monkeypatch.setattr(os, "remove", real_remove)
        monkeypatch.setattr(os, "rename", real_rename)
        monkeypatch.setattr(os, "replace", real_replace)
        monkeypatch.setattr(shutil, "rmtree", real_rmtree)
        monkeypatch.setattr(builtins, "open", real_open)
        monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)


def _sweep(monkeypatch, tmp_path, tag, family, build, mutate, probe, recover):
    """The sweep proper: for each crash point — fresh artifact, crash
    the mutation there, assert complete-or-refused, recover, assert
    convergence to the no-crash result.

    r18 (VERDICT r17 #2 — the driver's pytest gate must complete in
    its budget): the fresh artifact per crash point comes from ONE
    pristine build + ``shutil.copytree`` instead of a full rebuild
    per point — builds here are deterministic (seeded), so the
    pre-mutation state is byte-identical either way (the same
    clone-the-built-artifact pattern bench.py's maintenance timings
    use), and ``want_old`` is path-independent so it is probed once.
    The sweep's coverage is unchanged: every crash point still runs
    the real mutation against a real complete artifact."""
    ref = str(tmp_path / ("%s_ref" % tag))
    build(ref)
    mutate(ref, lambda f: f())
    want_final = probe(ref)
    assert want_final, "reference probe must return rows"

    pristine = str(tmp_path / ("%s_pristine" % tag))
    build(pristine)
    want_old = probe(pristine)

    crash_at = 0
    while True:
        path = str(tmp_path / ("%s_%d" % (tag, crash_at)))
        shutil.copytree(pristine, path)
        crashed, _ = _inject_and_run(
            monkeypatch, path, crash_at, lambda: mutate(path, lambda f: f())
        )
        # invariant: complete-or-refused, NEVER half-readable
        if ANN._is_built(path, family):
            got = probe(path)
            assert got in (want_old, want_final), (crash_at, got)
        else:
            with pytest.raises(ValueError, match="no complete"):
                probe(path)
        recover(path)
        assert probe(path) == want_final, crash_at
        if not crashed:
            break
        crash_at += 1
    assert crash_at >= 2, "sweep found too few crash points to mean anything"


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------

LSH_KW = dict(dim=DIM, n_bands=4, bits_per_band=4)


def _lsh_probe(spark, corpus_all, query):
    def probe(path):
        out = _rows(
            ANN.knn_lsh_indexed(spark, path, corpus_all, query, k=5, **LSH_KW)
        )
        ANN.release_scoped_broadcasts()
        return out

    return probe


def test_lsh_rebuild_crash_sweep(spark, corpus, query, tmp_path, monkeypatch):
    build = lambda p: ANN.build_lsh_index(spark, corpus, p, **LSH_KW)  # noqa: E731
    _sweep(
        monkeypatch,
        tmp_path,
        "lshr",
        "lsh",
        build,
        lambda p, run: run(lambda: build(p)),  # rebuild over the live artifact
        _lsh_probe(spark, corpus, query),
        build,
    )


def test_lsh_append_crash_sweep(spark, corpus, batch, query, tmp_path, monkeypatch):
    full = corpus.union(batch)
    _sweep(
        monkeypatch,
        tmp_path,
        "lsha",
        "lsh",
        lambda p: ANN.build_lsh_index(spark, corpus, p, **LSH_KW),
        lambda p, run: run(lambda: ANN.append_lsh_index(spark, batch, p)),
        _lsh_probe(spark, full, query),
        # documented recovery: the ensure path rebuilds on the current
        # corpus snapshot (which includes the batch) — append ≡ rebuild
        # exactly for LSH, so this converges to the no-crash result
        lambda p: (
            shutil.rmtree(p, ignore_errors=True),
            ANN.build_lsh_index(spark, full, p, **LSH_KW),
        ),
    )


# ---------------------------------------------------------------------------
# IVF (warm-start centroids: rebuild-on-recovery is bit-identical to
# the frozen-centroid append, so probe results must converge exactly)
# ---------------------------------------------------------------------------

IVF_CIDS = [3, 31, 59, 87]


def _ivf_probe(spark, corpus_all, query):
    def probe(path):
        out = _rows(
            ANN.knn_ivf_indexed(spark, path, corpus_all, query, k=5, nprobe=2)
        )
        ANN.release_scoped_broadcasts()
        return out

    return probe


def test_ivf_rebuild_crash_sweep(spark, corpus, query, tmp_path, monkeypatch):
    build = lambda p: ANN.build_ivf_index(  # noqa: E731
        spark, corpus, p, centroid_ids=IVF_CIDS
    )
    _sweep(
        monkeypatch,
        tmp_path,
        "ivfr",
        "ivf",
        build,
        lambda p, run: run(lambda: build(p)),
        _ivf_probe(spark, corpus, query),
        build,
    )


def test_ivf_append_crash_sweep(spark, corpus, batch, query, tmp_path, monkeypatch):
    full = corpus.union(batch)
    _sweep(
        monkeypatch,
        tmp_path,
        "ivfa",
        "ivf",
        lambda p: ANN.build_ivf_index(spark, corpus, p, centroid_ids=IVF_CIDS),
        lambda p, run: run(lambda: ANN.append_ivf_index(spark, batch, p)),
        _ivf_probe(spark, full, query),
        lambda p: (
            shutil.rmtree(p, ignore_errors=True),
            ANN.build_ivf_index(spark, full, p, centroid_ids=IVF_CIDS),
        ),
    )


# ---------------------------------------------------------------------------
# HNSW: build, incremental refresh, and the break-even rebuild
# fallback (ADVICE r8 medium — was an in-place rebuild under a live
# marker)
# ---------------------------------------------------------------------------


def _hnsw_probe(spark, corpus_all, query):
    def probe(path):
        return _rows(
            HN.knn_hnsw_join(spark, path, corpus_all, query, k=5, ef_search=32)
        )

    return probe


def _ids_in_shard(spark, ids, n_shards: int, shard: int) -> list[int]:
    pdf = pd.DataFrame({"vec_id": list(ids)})
    rows = (
        spark.createDataFrame(pdf)
        .withColumn("s", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_shards)))
        .filter(F.col("s") == shard)
        .collect()
    )
    return [r["vec_id"] for r in rows]


def test_hnsw_rebuild_crash_sweep(spark, corpus, query, tmp_path, monkeypatch):
    build = lambda p: HN.build_hnsw_index(  # noqa: E731
        spark, corpus, p, M=4, ef_construction=16, n_shards=2
    )
    _sweep(
        monkeypatch,
        tmp_path,
        "hnr",
        "hnsw",
        build,
        lambda p, run: run(lambda: build(p)),
        _hnsw_probe(spark, corpus, query),
        build,
    )


def _hnsw_refresh_sweep(spark, corpus, query, tmp_path, monkeypatch, n_shards, new_ids, tag):
    rng = np.random.RandomState(31)
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.array(new_ids, dtype=np.int64),
                "embedding": [
                    [float(x) for x in rng.randn(DIM).astype(np.float32)]
                    for _ in new_ids
                ],
            }
        )
    ).coalesce(1)
    snapshot = corpus.union(extra).persist()
    changed = extra.select("vec_id")
    _sweep(
        monkeypatch,
        tmp_path,
        tag,
        "hnsw",
        lambda p: HN.build_hnsw_index(
            spark, corpus, p, M=4, ef_construction=16, n_shards=n_shards
        ),
        lambda p, run: run(
            lambda: HN.refresh_hnsw_index(spark, snapshot, p, changed)
        ),
        _hnsw_probe(spark, snapshot, query),
        # refresh is idempotent on (snapshot, changed): replaying it is
        # the documented recovery and must converge bit-for-bit
        lambda p: HN.refresh_hnsw_index(spark, snapshot, p, changed),
    )
    snapshot.unpersist()


def test_hnsw_refresh_incremental_crash_sweep(spark, corpus, query, tmp_path, monkeypatch):
    # minority of shards touched → the dynamic-partition-overwrite arm
    new_ids = _ids_in_shard(spark, range(2000, 2200), 4, 0)[:5]
    assert len(new_ids) >= 3
    _hnsw_refresh_sweep(
        spark, corpus, query, tmp_path, monkeypatch, 4, new_ids, "hni"
    )


def test_hnsw_refresh_fallback_crash_sweep(spark, corpus, query, tmp_path, monkeypatch):
    # both shards touched → the break-even shadow-rebuild arm
    a = _ids_in_shard(spark, range(2000, 2200), 2, 0)[:3]
    b = _ids_in_shard(spark, range(2000, 2200), 2, 1)[:3]
    assert a and b
    _hnsw_refresh_sweep(
        spark, corpus, query, tmp_path, monkeypatch, 2, a + b, "hnf"
    )


# ---------------------------------------------------------------------------
# Text index (r8): same marker-first protocol, swept the same way
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def textcorpus(spark):
    rng = np.random.RandomState(17)
    vocab = ["join", "hash", "scan", "merge", "sort", "spill", "batch", "row"]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.randint(3, 12)))
                for _ in range(80)
            ],
        }
    )
    return spark.createDataFrame(pdf).coalesce(2).persist()


def test_text_index_rebuild_crash_sweep(spark, textcorpus, tmp_path, monkeypatch):
    from etl_btc_spark.operators import text_index as TI

    def probe(path):
        return _rows(TI.bm25_probe(spark, path, ["join", "hash"], n=10))

    build = lambda p: TI.build_text_index(spark, textcorpus, p)  # noqa: E731
    _sweep(
        monkeypatch,
        tmp_path,
        "txr",
        "text",
        build,
        lambda p, run: run(lambda: build(p)),
        probe,
        build,
    )


def test_text_index_append_crash_sweep(spark, textcorpus, tmp_path, monkeypatch):
    from etl_btc_spark.operators import text_index as TI

    rng = np.random.RandomState(29)
    vocab = ["join", "hash", "scan", "merge"]
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": np.arange(500, 510, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, size=rng.randint(2, 8)))
                    for _ in range(10)
                ],
            }
        )
    ).coalesce(1).persist()

    def probe(path):
        return _rows(TI.bm25_probe(spark, path, ["join", "hash"], n=10))

    full = textcorpus.union(batch)
    _sweep(
        monkeypatch,
        tmp_path,
        "txa",
        "text",
        lambda p: TI.build_text_index(spark, textcorpus, p),
        lambda p, run: run(lambda: TI.append_text_index(spark, batch, p)),
        probe,
        # recovery: ensure on the current snapshot (append ≡ rebuild)
        lambda p: (
            shutil.rmtree(p, ignore_errors=True),
            TI.build_text_index(spark, full, p),
        ),
    )
    batch.unpersist()
