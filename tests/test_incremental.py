"""Incremental-equivalence + streaming-policy tests (SURVEY §5 item
4, §2.10). q49/q50's oracle rows are the driver-facing proof; these
pin the exact (unrounded) guarantees and edge policies."""

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_btc_spark.operators import window_ops as WO
from etl_btc_spark.streaming import incremental as INC
from etl_btc_spark.tables import load_table, price_series

from conftest import SF_SMOKE


def _enrich(df):
    w = WO.series_window()
    return WO.bollinger(df.withColumn("close_sma", WO.sma("close", 30, w)))


def test_lookback_increment_bit_identical_to_full(spark, tmp_path):
    """The appended bar's features must equal a full-table recompute
    EXACTLY (not just to rounding): every feature is a causal window
    of width <= 30 over the same ordered inputs, so the lookback run
    sums the identical values in the identical order."""
    s = price_series(spark, SF_SMOKE)
    rank_w = Window.partitionBy("series_id").orderBy(F.col("ts").desc())
    ranked = s.withColumn("__rn", F.row_number().over(rank_w))
    hist = ranked.filter(F.col("__rn") > 1).drop("__rn")
    bar = ranked.filter(F.col("__rn") == 1).drop("__rn")

    path = str(tmp_path / "store")
    INC.bootstrap_feature_store(hist, _enrich, path)
    n = INC.lookback_increment(spark, path, bar, _enrich)
    assert n == bar.count()

    full = _enrich(s)
    latest_full = {
        r["series_id"]: r
        for r in full.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    }
    latest_inc = {
        r["series_id"]: r
        for r in spark.read.parquet(path)
        .withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    }
    assert set(latest_inc) == set(latest_full)
    for k, want in latest_full.items():
        got = latest_inc[k]
        for c in ("close_sma", "bb_mid", "bb_upper", "bb_lower"):
            assert got[c] == want[c], (k, c)  # bit-identical, no tolerance
        for c in ("bbands_buy_signal", "bbands_sell_signal"):
            assert got[c] == want[c], (k, c)


def test_lookback_increment_empty_batch_noop(spark, tmp_path):
    s = price_series(spark, SF_SMOKE)
    path = str(tmp_path / "store")
    INC.bootstrap_feature_store(s, _enrich, path)
    before = spark.read.parquet(path).count()
    empty = s.filter(F.lit(False))
    assert INC.lookback_increment(spark, path, empty, _enrich) == 0
    assert spark.read.parquet(path).count() == before


def test_stream_dedup_collapses_overlap_and_drops_late(spark, tmp_path):
    """Two landing batches with an overlapping window: the overlap
    must collapse by content key; a row arriving with an event time
    older than (max seen - delay) must be dropped (T6 policy)."""
    base = pd.Timestamp("2024-06-01")
    b1 = pd.DataFrame(
        {
            "content_id": ["a", "b", "c"],
            "published_at": [base, base + pd.Timedelta(hours=1), base + pd.Timedelta(hours=2)],
        }
    )
    # overlap re-read: b and c again; d is new and far ahead
    b2 = pd.DataFrame(
        {
            "content_id": ["b", "c", "d"],
            "published_at": [
                base + pd.Timedelta(hours=1),
                base + pd.Timedelta(hours=2),
                base + pd.Timedelta(hours=100),
            ],
        }
    )
    # e arrives AFTER the watermark advanced to 100h - 25h = 75h
    # (watermarks move between micro-batches, not within one)
    b3 = pd.DataFrame(
        {
            "content_id": ["e"],
            "published_at": [base + pd.Timedelta(hours=50)],
        }
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    sdf1 = spark.createDataFrame(b1)
    spark.createDataFrame(b1).write.parquet(f"{landing}/b1")
    INC.stream_ingest_dedup(
        spark, f"{landing}/*", sdf1.schema, table, ckpt, key_col="content_id",
        ts_col="published_at", delay="25 hours",
    )
    spark.createDataFrame(b2).write.parquet(f"{landing}/b2")
    INC.stream_ingest_dedup(
        spark, f"{landing}/*", sdf1.schema, table, ckpt, key_col="content_id",
        ts_col="published_at", delay="25 hours",
    )
    spark.createDataFrame(b3).write.parquet(f"{landing}/b3")
    INC.stream_ingest_dedup(
        spark, f"{landing}/*", sdf1.schema, table, ckpt, key_col="content_id",
        ts_col="published_at", delay="25 hours",
    )
    got = set(r.content_id for r in spark.read.parquet(table).collect())
    # a,b,c from batch1; d new; e dropped as late (50h < 100h - 25h)
    assert got == {"a", "b", "c", "d"}


def test_stateful_streaming_ses_bit_identical_to_batch(spark, tmp_path):
    """W11/T2 keyed-state form: SES folded across 3 in-order
    micro-batches by applyInPandasWithState must equal the batch numpy
    kernel EXACTLY — same float64 op sequence, state carries the level
    between batches (q62's oracle is the rounded driver-facing proof;
    this pins the unrounded guarantee and that >1 micro-batch ran)."""
    import numpy as np

    from etl_btc_spark.operators import recurrence as RC
    from etl_btc_spark.streaming import stateful as ST

    s = price_series(spark, SF_SMOKE).select("series_id", "ts", "close")
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ST.chunked_landing(s, landing, chunks=3)
    import glob

    assert len(glob.glob(landing + "/part-*.parquet")) == 3
    ST.stream_stateful_ses(spark, landing, s.schema, out, ckpt, alpha=0.2)

    got = (
        spark.read.parquet(out)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])["close_ses"]
    )
    batch = s.orderBy("series_id", "ts").toPandas()
    for sid, grp in batch.groupby("series_id"):
        expect = RC.ses(grp["close"].to_numpy("float64"), alpha=0.2)
        mine = got.loc[sid].loc[grp["ts"]].to_numpy("float64")
        assert np.array_equal(mine, expect), f"series {sid} diverged"


def test_stateful_streaming_signal_stack_matches_batch(spark, tmp_path):
    """VERDICT r3 item 2: the FULL MACD/PPO/RSI/ADX/SES stack folded
    across 3 in-order micro-batches with O(1) keyed state must match
    the batch kernels (with_series_features) — EMA family exactly,
    Wilder family to float tolerance (seed means accumulate
    sequentially in the stream vs numpy pairwise in batch), and every
    crossover boolean exactly."""
    import glob

    import numpy as np

    from etl_btc_spark.streaming import stateful as ST
    from etl_btc_spark.operators import recurrence as RC

    s = price_series(spark, SF_SMOKE).select("series_id", "ts", "close", "high", "low")
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ST.chunked_landing(s, landing, chunks=3)
    assert len(glob.glob(landing + "/part-*.parquet")) == 3
    ST.stream_stateful_signals(spark, landing, s.schema, out, ckpt, alpha=0.2)

    got = (
        spark.read.parquet(out)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])
    )
    batch = (
        RC.with_series_features(s)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])
    )
    assert len(got) == len(batch)
    # streamed name -> batch name
    colmap = {
        "close_ses": "close_exponential_smoothing",
        "macd_line": "macd_line",
        "macd_signal": "macd_signal_line",
        "ppo_line": "ppo_line",
        "ppo_signal": "ppo_signal_line",
        "rsi": "rsi",
        "plus_di": "plus_di",
        "minus_di": "minus_di",
        "adx": "adx",
    }
    for sc, bc in colmap.items():
        a = got[sc].to_numpy("float64")
        b = batch.loc[got.index, bc].to_numpy("float64")
        exact = sc in ("close_ses", "macd_line", "macd_signal", "ppo_line", "ppo_signal")
        tol = 0.0 if exact else 1e-9
        ok = np.isclose(a, b, rtol=0, atol=tol) | (np.isnan(a) & np.isnan(b))
        assert ok.all(), f"{sc}: {np.argwhere(~ok)[:5]}"
    for c in [n for n, _ in ST.SIGNAL_FIELDS if n.endswith(("_buy_signal", "_sell_signal"))]:
        assert (got[c].to_numpy() == batch.loc[got.index, c].to_numpy()).all(), c


def test_stateful_signals_survive_stream_restart(spark, tmp_path):
    """T5 x T2 for the signal stack: drain part of the landing dir,
    STOP the stream, land more data, start a NEW stream on the same
    checkpoint — the keyed state must recover from the state store and
    the concatenated output must still match the batch kernels. This
    is the restart story an hourly 100 TB job actually depends on."""
    import glob

    import numpy as np

    from etl_btc_spark.streaming import stateful as ST
    from etl_btc_spark.operators import recurrence as RC

    s = price_series(spark, SF_SMOKE).select("series_id", "ts", "close", "high", "low")
    landing = str(tmp_path / "landing")
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os
    import shutil

    ST.chunked_landing(s, stage, chunks=3)
    # time order = mtime order (part- names are random UUIDs)
    files = sorted(glob.glob(stage + "/part-*.parquet"), key=os.path.getmtime)
    assert len(files) == 3

    os.makedirs(landing)
    # first run: only the two oldest chunks exist
    for f in files[:2]:
        shutil.copy2(f, landing)  # keep mtimes: the source orders files by them
    ST.stream_stateful_signals(spark, landing, s.schema, out, ckpt, alpha=0.2)
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < s.count()
    # restart: the third chunk lands, a NEW stream resumes the checkpoint
    shutil.copy2(files[2], landing)
    ST.stream_stateful_signals(spark, landing, s.schema, out, ckpt, alpha=0.2)

    got = (
        spark.read.parquet(out)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])
    )
    batch = (
        RC.with_series_features(s)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])
    )
    assert len(got) == len(batch)
    for sc, bc in (("close_ses", "close_exponential_smoothing"), ("macd_line", "macd_line"),
                   ("rsi", "rsi"), ("adx", "adx")):
        a = got[sc].to_numpy("float64")
        b = batch.loc[got.index, bc].to_numpy("float64")
        ok = np.isclose(a, b, rtol=0, atol=1e-9) | (np.isnan(a) & np.isnan(b))
        assert ok.all(), sc


def test_stateful_ses_tws_variant(spark, tmp_path):
    """Spark 4 transformWithStateInPandas variant of the SES fold:
    bit-identical to the batch kernel when the protobuf dependency is
    available; skipped (not silently passed) when the runtime lacks
    it — the applyInPandasWithState form above is the executable
    contract either way."""
    import numpy as np
    import pytest as _pytest

    from etl_btc_spark.streaming import stateful as ST
    from etl_btc_spark.operators import recurrence as RC

    if not ST.tws_available():
        _pytest.skip("protobuf not installed: transformWithStateInPandas unavailable")
    s = price_series(spark, SF_SMOKE).select("series_id", "ts", "close")
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ST.chunked_landing(s, landing, chunks=3)
    ST.stream_stateful_ses_tws(spark, landing, s.schema, out, ckpt, alpha=0.2)
    got = (
        spark.read.parquet(out)
        .orderBy("series_id", "ts")
        .toPandas()
        .set_index(["series_id", "ts"])["close_ses"]
    )
    batch = s.orderBy("series_id", "ts").toPandas()
    for sid, grp in batch.groupby("series_id"):
        expect = RC.ses(grp["close"].to_numpy("float64"), alpha=0.2)
        mine = got.loc[sid].loc[grp["ts"]].to_numpy("float64")
        assert np.array_equal(mine, expect), f"series {sid} diverged"


def test_stream_hnsw_refresh_converges_to_rebuild(spark, tmp_path):
    """Continuous index maintenance (r5): streaming embedding upserts
    through stream_hnsw_refresh must leave the vector table AND the
    HNSW artifact identical to a from-scratch build over the final
    snapshot — across (1) initial build, (2) an incremental batch
    that updates + inserts ids, and (3) a full replay from a fresh
    checkpoint (at-least-once redelivery)."""
    from etl_btc_spark.operators import hnsw as HN

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("ver", F.lit(0).cast("int"))
    )
    schema = emb.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    kw = {"n_shards": 4}

    # batch 1: first 100 ids -> full build. n_table_parts=4 divides
    # n_shards=4 — the r11 geometry constraint the partition-pruned
    # refresh requires (64, the old default here, does not divide 4)
    emb.filter(F.col("vec_id") < 100).write.mode("append").parquet(landing)
    INC.stream_hnsw_refresh(
        spark, landing, schema, table, index, ckpt, ver_col="ver",
        n_table_parts=4, index_kw=kw,
    )
    assert spark.read.parquet(table).count() == 100

    # batch 2 (ver=1): update ids 0-9 (negated vectors) + insert 100-149
    upd = (
        emb.filter(F.col("vec_id") < 10)
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
        .unionByName(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150)))
        .withColumn("ver", F.lit(1).cast("int"))
    )
    upd.write.mode("append").parquet(landing)
    INC.stream_hnsw_refresh(
        spark, landing, schema, table, index, ckpt, ver_col="ver",
        n_table_parts=4, index_kw=kw,
    )

    snapshot = spark.read.parquet(table).drop("vpart")
    assert snapshot.count() == 150
    # updated rows really took the new values
    row0 = snapshot.filter(F.col("vec_id") == 0).first()
    ref0 = emb.filter(F.col("vec_id") == 0).first()
    assert row0["embedding"][0] == -ref0["embedding"][0]

    full = str(tmp_path / "full")
    HN.build_hnsw_index(spark, snapshot, full, n_shards=4)
    got = spark.read.parquet(index + "/nodes").orderBy("vec_id").collect()
    want = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert got == want

    # full replay from a fresh checkpoint: both landing files
    # reprocess, one per micro-batch — table and index converge to
    # the same bytes (idempotent MERGE + deterministic refresh)
    table2 = str(tmp_path / "vectors2")
    index2 = str(tmp_path / "index2")
    INC.stream_hnsw_refresh(
        spark, landing, schema, table2, index2, str(tmp_path / "ckpt2"),
        ver_col="ver", n_table_parts=4, index_kw=kw,
    )
    got2 = spark.read.parquet(index2 + "/nodes").orderBy("vec_id").collect()
    assert got2 == want


def test_stream_hnsw_refresh_geometry_constraint(spark, tmp_path):
    """r11 (VERDICT r10 #1): the sink's partition-pruned refresh needs
    n_table_parts | n_shards. (1) an explicit incompatible index_kw is
    refused at stream DEFINITION; (2) an existing incompatible
    artifact is refused at stream definition; (3) a first-trigger
    auto-derived shard count is rounded UP to the next multiple of
    n_table_parts."""
    import json
    import os

    from etl_btc_spark.operators import hnsw as HN

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    schema = emb.schema
    landing = str(tmp_path / "landing")
    emb.limit(40).write.mode("append").parquet(landing)

    with pytest.raises(ValueError, match="multiple"):
        INC.stream_hnsw_refresh(
            spark, landing, schema, str(tmp_path / "t1"),
            str(tmp_path / "i1"), str(tmp_path / "c1"),
            n_table_parts=4, index_kw={"n_shards": 6},
        )

    # existing artifact with incompatible geometry refuses the stream
    bad = str(tmp_path / "i2")
    HN.build_hnsw_index(spark, emb.limit(40), bad, n_shards=6)
    with pytest.raises(ValueError, match="multiple"):
        INC.stream_hnsw_refresh(
            spark, landing, schema, str(tmp_path / "t2"), bad,
            str(tmp_path / "c2"), n_table_parts=4,
        )

    # auto-derived count rounds up to a multiple of n_table_parts:
    # 40 rows -> auto = min(32, ceil(40/1000)) ... = 1 -> rounds to 4
    idx = str(tmp_path / "i3")
    INC.stream_hnsw_refresh(
        spark, landing, schema, str(tmp_path / "t3"), idx,
        str(tmp_path / "c3"), n_table_parts=4,
    )
    with open(os.path.join(idx, "_SHARDS")) as f:
        assert json.load(f)["n_shards"] % 4 == 0


def test_stream_text_index_append_converges_and_self_heals(spark, tmp_path):
    """Continuous text-index maintenance (r8): streaming document
    arrivals through stream_text_index_append must leave the document
    table AND the postings artifact equivalent to a from-scratch
    build over the final corpus — across (1) initial build, (2) an
    incremental insert batch, (3) a full replay from a fresh
    checkpoint (at-least-once redelivery: the anti-join makes the
    replayed rows vanish), and (4) a crashed append (marker down) on
    the NEXT trigger, which must self-heal by rebuilding from the
    merged table."""
    import os

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = docs.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    ckpt = str(tmp_path / "ckpt")
    terms = ["join", "hash", "scan"]

    def probe(idx):
        return [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=30).collect()]

    # batch 1 -> full build
    docs.filter(F.col("doc_id") < 60).write.mode("append").parquet(landing)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    assert spark.read.parquet(table).count() == 60

    # batch 2: inserts 60-99, PLUS a redelivered overlap of 50-59
    # (at-least-once): overlap rows must vanish in the anti-join
    docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100)).write.mode(
        "append"
    ).parquet(landing)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    assert spark.read.parquet(table).count() == 100

    full = str(tmp_path / "full")
    TI.build_text_index(spark, spark.read.parquet(table), full)
    assert probe(index) == probe(full)
    sa = spark.read.parquet(index + "/stats").collect()[0]
    sb = spark.read.parquet(full + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    # full replay from a fresh checkpoint: both landing files
    # reprocess; idempotent MERGE + anti-joined append converge
    table2, index2 = str(tmp_path / "docs2"), str(tmp_path / "tindex2")
    INC.stream_text_index_append(
        spark, landing, schema, table2, index2, str(tmp_path / "ckpt2")
    )
    assert spark.read.parquet(table2).count() == 100
    assert probe(index2) == probe(full)

    # crashed-append simulation: marker down, partial postings debris —
    # the next trigger rebuilds from the table and heals
    os.remove(os.path.join(index, "_BUILT"))
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120)).write.mode(
        "append"
    ).parquet(landing)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    full2 = str(tmp_path / "full2")
    TI.build_text_index(spark, spark.read.parquet(table), full2)
    assert spark.read.parquet(table).count() == 120
    assert probe(index) == probe(full2)

    # update-carrying redelivery (review r8): a known id arrives with
    # DIFFERENT text — the ids-only anti-join would have silently
    # kept the STALE postings; the sink must detect the conflict and
    # rebuild, keeping table and index consistent
    docs.filter(F.col("doc_id") < 5).withColumn(
        "text", F.concat(F.lit("join join join hash "), F.col("text"))
    ).write.mode("append").parquet(landing)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    snap = spark.read.parquet(table)
    assert snap.count() == 120  # updates, not inserts
    assert (
        snap.filter(F.col("doc_id") == 0).first()["text"].startswith("join join")
    )
    full3 = str(tmp_path / "full3")
    TI.build_text_index(spark, snap, full3)
    assert probe(index) == probe(full3)


def test_stream_neardup_ingest_equals_sequential_batches(spark, tmp_path):
    """Streaming near-dup ingestion (r8): the streamed (corpus table,
    band index) must equal applying the SAME keep policy batch by
    batch with the batch-mode operators — across (1) an initial batch
    with an in-batch near-dup cluster, (2) a second batch carrying
    near-dups of already-kept docs plus fresh docs, (3) a full replay
    from a fresh checkpoint, and (4) a crashed index append (marker
    down), which must self-heal by rebuilding from the table."""
    import os

    from etl_btc_spark.operators import dedup as DD

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = {r["doc_id"]: r["text"] for r in docs.limit(40).collect()}

    def mk(rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
            )
        )

    # batch 1: docs 0-19, plus 100/101 duplicating 0's text (in-batch cluster)
    b1 = [(i, base[i]) for i in range(20)] + [(100, base[0]), (101, base[0])]
    # batch 2: 20-29 fresh, plus 200/201 duplicating kept docs 5 and 100's text
    b2 = [(i, base[i]) for i in range(20, 30)] + [(200, base[5]), (201, base[0])]

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "mindex")
    ckpt = str(tmp_path / "ckpt")

    mk(b1).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    # the inline in-batch policy ≡ dup_clusters(exact=False) keep-min
    # (review r8: two encodings of one policy must be pinned together)
    cl = DD.dup_clusters(mk(b1), 0.8, exact=False)
    losers = {
        r["doc_id"]
        for r in cl.filter(F.col("doc_id") != F.col("cluster_id")).collect()
    }
    DD.release_scoped_caches()
    t1_ids = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert t1_ids == {i for i, _ in b1} - losers
    mk(b2).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)

    # sequential reference with the batch-mode operators, same policy
    def in_batch_keep(df):
        pairs = DD.minhash_near_dupes(df, 0.8).select("id_a", "id_b")
        if pairs.limit(1).count() == 0:
            return df
        losers = (
            DD.connected_components(pairs)
            .filter(F.col("node") != F.col("cluster_id"))
            .select(F.col("node").alias("doc_id"))
        )
        return df.join(losers, "doc_id", "left_anti")

    ref_table = str(tmp_path / "ref_corpus")
    ref_index = str(tmp_path / "ref_index")
    kept1 = in_batch_keep(mk(b1))
    kept1.write.mode("overwrite").parquet(ref_table)
    DD.build_minhash_index(spark, kept1, ref_index)
    corpus = spark.read.parquet(ref_table)
    dups = (
        DD.incremental_near_dupes(spark, ref_index, corpus, mk(b2), 0.8)
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
    )
    kept2 = in_batch_keep(mk(b2).join(dups, "doc_id", "left_anti"))
    kept2.write.mode("append").parquet(ref_table)
    DD.release_scoped_caches()

    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(table).collect()}
    want = {r["doc_id"]: r["text"] for r in spark.read.parquet(ref_table).collect()}
    assert got == want
    # the in-batch cluster kept only doc 0; batch-2 near-dups dropped
    assert 0 in got and 100 not in got and 101 not in got
    assert 200 not in got and 201 not in got and 25 in got
    # index covers exactly the kept ids
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/bands").select("doc_id").distinct().collect()
    }
    assert idx_ids == set(got)

    # full replay from a fresh checkpoint converges to the same state
    table2, index2 = str(tmp_path / "c2"), str(tmp_path / "i2")
    INC.stream_neardup_ingest(
        spark, landing, mk(b1).schema, table2, index2, str(tmp_path / "ck2")
    )
    got2 = {r["doc_id"]: r["text"] for r in spark.read.parquet(table2).collect()}
    assert got2 == want

    # crashed-append self-heal: marker down + batch 3 → rebuild covers all
    os.remove(os.path.join(index, "_BUILT"))
    b3 = [(i, base[i]) for i in range(30, 35)] + [(300, base[22])]
    mk(b3).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    got3 = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert got3 == set(want) | {30, 31, 32, 33, 34}  # 300 is a near-dup of 22
    idx_ids3 = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/bands").select("doc_id").distinct().collect()
    }
    assert idx_ids3 == got3

    # review r8 scenarios: (a) same id twice in one batch with two
    # texts → the MIN text wins deterministically; (b) a kept id
    # republished with substantially NEW text is an UPDATE — merged,
    # and the index SUPERSEDES the stale bands through the tombstone
    # sidecar (r9): O(batch), pinned below by byte-identity of every
    # pre-existing band file (r8 rebuilt the whole index here)…
    import hashlib

    def _file_hashes(d):
        out = {}
        for root, _, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    pre_files = _file_hashes(os.path.join(index, "bands"))
    assert not os.path.isdir(os.path.join(index, "tombstones"))
    new22 = "entirely reworked narrative with novel uncommon vocabulary here"
    b4 = [(500, "zz version-b text"), (500, "aa version-a text"), (22, new22)]
    mk(b4).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    rows4 = {r["doc_id"]: r["text"] for r in spark.read.parquet(table).collect()}
    assert rows4[500] == "aa version-a text"
    assert rows4[22] == new22
    # the update touched O(batch): every pre-existing band file is
    # byte-identical, the new bands landed as NEW files, and the
    # supersede went to the sidecar
    post_files = _file_hashes(os.path.join(index, "bands"))
    assert set(pre_files) <= set(post_files)
    assert all(post_files[p] == h for p, h in pre_files.items())
    assert len(post_files) > len(pre_files)
    assert os.path.isdir(os.path.join(index, "tombstones"))
    # …(c) proven end-to-end: a later doc duplicating 22's NEW text
    # is caught (stale bands would have let it through)
    b5 = [(600, new22), (601, base[35])]
    mk(b5).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    final_ids = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert 600 not in final_ids and 601 in final_ids


def test_stream_text_sink_ver_col_stale_late_row(spark, tmp_path):
    """r17 (VERDICT r16 #6): with ver_col the text sink is
    highest-version-wins — a LATE STALE row (lower version, different
    text) neither regresses the table nor supersedes newer postings;
    a genuinely newer version still updates both; and a
    fresh-checkpoint full replay (every trigger's files collapse into
    ONE batch, trigger order gone) converges to the same state
    because order comes from the data."""
    import os

    from etl_btc_spark.operators import text_index as TI

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string, ver long")

    vocab = [
        "join", "hash", "scan", "merge", "probe", "spill", "sort",
        "codegen", "exchange", "broadcast",
    ]
    b1 = [
        (i, " ".join(vocab[(i + j) % len(vocab)] for j in range(8)), 2)
        for i in range(10)
    ]
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    ckpt = str(tmp_path / "ckpt")
    schema = mk(b1).schema
    terms = ["join", "hash", "stale", "fresher"]

    def probe(idx):
        return [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=30).collect()]

    mk(b1).write.mode("append").parquet(landing)
    INC.stream_text_index_append(
        spark, landing, schema, table, index, ckpt, ver_col="ver"
    )
    # trigger 2: stale late update of 3 (ver 1 < 2), real update of 5
    # (ver 3), fresh doc 100
    b2 = [
        (3, "stale stale stale text that must never land", 1),
        (5, "fresher replacement body with novel words", 3),
        (100, "brand new document about vectorized readers", 1),
    ]
    mk(b2).write.mode("append").parquet(landing)
    INC.stream_text_index_append(
        spark, landing, schema, table, index, ckpt, ver_col="ver"
    )
    rows = {
        r["doc_id"]: (r["text"], r["ver"])
        for r in spark.read.parquet(table).collect()
    }
    assert rows[3] == (b1[3][1], 2)  # stale row did NOT regress the table
    assert rows[5] == (b2[1][1], 3)  # newer version landed
    assert 100 in rows
    # postings equal a from-scratch build over the final table — the
    # stale text is in neither
    full = str(tmp_path / "full")
    TI.build_text_index(spark, spark.read.parquet(table).drop("vpart"), full)
    assert probe(index) == probe(full)
    # fresh-checkpoint FULL replay: both triggers drain into ONE batch
    # (trigger order collapsed) — highest version must still win
    table2, index2 = str(tmp_path / "docs2"), str(tmp_path / "tindex2")
    INC.stream_text_index_append(
        spark, landing, schema, table2, index2, str(tmp_path / "ckpt2"),
        ver_col="ver",
    )
    rows2 = {
        r["doc_id"]: (r["text"], r["ver"])
        for r in spark.read.parquet(table2).collect()
    }
    assert rows2 == rows
    assert probe(index2) == probe(full)


def test_stream_neardup_sink_ver_col_stale_late_row(spark, tmp_path):
    """r17 (VERDICT r16 #6): ver_col on the near-dup sink — a late
    stale row is a merge LOSER and is dropped BEFORE the probe, so it
    neither regresses the table, nor supersedes newer band rows, nor
    appends duplicate live bands; a newer version updates table and
    index; fresh-checkpoint full replay converges."""
    from etl_btc_spark.operators import dedup as DD

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string, ver long")

    # genuinely distinct texts (suffixing every token): a shared-stem
    # corpus would itself be a near-dup family and trigger 1 would
    # keep only doc 0
    texts = [
        " ".join(
            f"{w}{i}"
            for w in (
                "alpha beta gamma delta epsilon zeta eta theta iota kappa"
            ).split()
        )
        for i in range(8)
    ]
    b1 = [(i, texts[i], 2) for i in range(8)]
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "mindex")
    ckpt = str(tmp_path / "ckpt")
    schema = mk(b1).schema
    mk(b1).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, schema, table, index, ckpt, ver_col="ver"
    )
    new5 = "entirely reworked narrative with novel uncommon vocabulary here"
    b2 = [
        (3, "stale body that must never land anywhere at all", 1),
        (5, new5, 3),
    ]
    mk(b2).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, schema, table, index, ckpt, ver_col="ver"
    )
    rows = {
        r["doc_id"]: (r["text"], r["ver"])
        for r in spark.read.parquet(table).collect()
    }
    assert rows[3] == (texts[3], 2)  # stale loser never landed
    assert rows[5] == (new5, 3)      # newer version merged
    # index semantics: a later duplicate of 5's NEW text is caught
    # (bands upserted), a duplicate of the STALE text for 3 is NOT
    # hidden by phantom stale bands — 3's live bands are its ver-2
    # text, so the stale-text duplicate is kept as a fresh doc
    b3 = [(600, new5, 1), (601, "stale body that must never land anywhere at all", 1)]
    mk(b3).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, schema, table, index, ckpt, ver_col="ver"
    )
    ids = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert 600 not in ids  # near-dup of the UPSERTED (ver-3) text
    assert 601 in ids      # the stale text never entered the index
    # no duplicate live band rows for any id
    bands = spark.read.parquet(index + "/bands")
    from etl_btc_spark.operators import tombstones as TS

    live = TS.live_rows(spark, bands, index, "doc_id")
    per_id = live.groupBy("doc_id").count().collect()
    n_bands = {r["doc_id"]: r["count"] for r in per_id}
    assert all(c == 8 for c in n_bands.values()), n_bands
    # fresh-checkpoint FULL replay: all three triggers in ONE batch
    table2, index2 = str(tmp_path / "c2"), str(tmp_path / "i2")
    INC.stream_neardup_ingest(
        spark, landing, schema, table2, index2, str(tmp_path / "ck2"),
        ver_col="ver",
    )
    rows2 = {
        r["doc_id"]: (r["text"], r["ver"])
        for r in spark.read.parquet(table2).collect()
    }
    got = {r["doc_id"]: (r["text"], r["ver"]) for r in spark.read.parquet(table).collect()}
    assert rows2 == got


def test_stream_neardup_ingest_flood_proof_with_max_bucket(spark, tmp_path):
    """r17 (VERDICT r16 #5): with ``max_bucket`` the probe and the
    in-batch resolution are both stop-bucket-capped — a 40-clone flood
    trigger completes with HARD-BOUNDED candidate pairs instead of the
    O(width²) quadratic, while sub-cap buckets keep exact near-dup
    semantics (a near-dup of a kept normal doc is still dropped). The
    documented recall trade is asserted too: fully-flooded buckets
    produce no edges, so flood members are KEPT under the cap — the
    reason the cap is off by default and sized from q99cg's width
    histogram."""
    from etl_btc_spark.operators import dedup as DD

    boiler = (
        "quarterly market commentary boilerplate paragraph with many "
        "shared tokens describing liquidity volatility spreads volumes "
        "funding rates basis curves leverage positioning momentum "
        "breadth dispersion correlation regimes and risk appetite "
    ) * 2
    normal_stem = (
        "an entirely distinct research note about consensus protocols "
        "quorum intersection leader election log replication snapshot "
        "transfer membership changes lease renewal fencing tokens "
        "linearizable reads witness replicas flexible paxos variant "
    )
    normal_a = normal_stem + "one"
    normal_b = normal_stem + "two"

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # --- operator level: capped probe against a flooded persisted index
    corpus_rows = [(i, boiler + f"clone{i}") for i in range(40)]
    corpus_rows += [(200, normal_a)]
    corpus = mk(corpus_rows)
    idx = str(tmp_path / "flood_idx")
    DD.build_minhash_index(spark, corpus, idx)
    probe = mk([(1000, boiler + "clone1000"), (1001, normal_b)])
    unc = {
        (r["batch_id"], r["corpus_id"])
        for r in DD.incremental_near_dupes(spark, idx, corpus, probe, 0.8).collect()
    }
    cap = {
        (r["batch_id"], r["corpus_id"])
        for r in DD.incremental_near_dupes(
            spark, idx, corpus, probe, 0.8, max_bucket=10
        ).collect()
    }
    DD.release_scoped_caches()
    assert cap <= unc  # the cap only ever drops candidates
    assert len([p for p in unc if p[0] == 1000]) == 40  # uncapped: full flood
    assert len([p for p in cap if p[0] == 1000]) == 0   # capped: bucket dropped
    assert (1001, 200) in unc and (1001, 200) in cap    # width-2 bucket survives

    # --- sink level: a flood trigger under the cap completes and keeps
    # exact semantics for sub-cap buckets
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus_t")
    index = str(tmp_path / "corpus_i")
    ckpt = str(tmp_path / "ckpt")
    b1 = mk(corpus_rows)
    b1.write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, b1.schema, table, index, ckpt, max_bucket=10
    )
    t1 = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    # fully-flooded buckets → no in-batch edges → all clones kept (the
    # documented trade); the normal doc is kept regardless
    assert t1 == {i for i in range(40)} | {200}
    # trigger 2: one more flood member (slips past the saturated
    # buckets → KEPT), one near-dup of the kept normal doc (sub-cap
    # bucket → DROPPED), one fresh doc (kept)
    mk(
        [(1000, boiler + "clone1000"), (1001, normal_b),
         (300, "completely fresh unrelated document about parquet readers")]
    ).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, b1.schema, table, index, ckpt, max_bucket=10
    )
    t2 = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert 1000 in t2      # flood member slips the saturated bucket
    assert 1001 not in t2  # sub-cap near-dup still dropped
    assert 300 in t2       # fresh doc kept
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/bands").select("doc_id").distinct().collect()
    }
    assert idx_ids == t2   # index covers exactly the kept ids


def test_stream_neardup_capped_equals_capped_sequential(spark, tmp_path):
    """r17: the docstring's equivalence claim under the cap, pinned —
    with ``max_bucket`` on, the streamed (table, index) equals
    applying the same keep policy batch by batch with the batch-mode
    operators RUN WITH THE SAME CAP (the cap changes which near-dups
    are caught, identically on both paths)."""
    from etl_btc_spark.operators import dedup as DD

    cap = 4
    boiler = (
        "shared boilerplate tokens about liquidity volatility spreads "
        "volumes funding rates basis curves leverage positioning "
    ) * 2

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # batch 1: a 6-clone flood (bucket width 6 > cap=4 → no edges
    # under the cap) + two distinct docs
    b1 = [(i, boiler + f"clone{i}") for i in range(6)]
    stem50 = (
        "wholly distinct document about window functions frame bounds "
        "rows between unbounded preceding ordering partitions rank "
        "dense rank lag lead first value last value ntile cume dist "
    )
    b1 += [(50, stem50 + "etc")]
    # batch 2: one more flood member + a near-dup of doc 50 (width-2
    # buckets → caught on both paths) + a fresh doc
    b2 = [
        (100, boiler + "clone100"),
        (51, stem50 + "too"),
        (60, "completely fresh unrelated text about arrow batches"),
    ]
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "mindex")
    ckpt = str(tmp_path / "ckpt")
    mk(b1).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, mk(b1).schema, table, index, ckpt, max_bucket=cap
    )
    mk(b2).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(
        spark, landing, mk(b1).schema, table, index, ckpt, max_bucket=cap
    )

    # batch-sequential reference with the SAME cap
    def in_batch_keep(df):
        pairs = DD.minhash_near_dupes(df, 0.8, max_bucket=cap).select(
            "id_a", "id_b"
        )
        if pairs.limit(1).count() == 0:
            return df
        losers = (
            DD.connected_components(pairs)
            .filter(F.col("node") != F.col("cluster_id"))
            .select(F.col("node").alias("doc_id"))
        )
        return df.join(losers, "doc_id", "left_anti")

    ref_table = str(tmp_path / "ref_corpus")
    ref_index = str(tmp_path / "ref_index")
    kept1 = in_batch_keep(mk(b1))
    kept1.write.mode("overwrite").parquet(ref_table)
    DD.build_minhash_index(spark, kept1, ref_index)
    corpus = spark.read.parquet(ref_table)
    dups = (
        DD.incremental_near_dupes(
            spark, ref_index, corpus, mk(b2), 0.8, max_bucket=cap
        )
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
    )
    kept2 = in_batch_keep(mk(b2).join(dups, "doc_id", "left_anti"))
    kept2.write.mode("append").parquet(ref_table)
    DD.release_scoped_caches()

    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(table).collect()}
    want = {r["doc_id"]: r["text"] for r in spark.read.parquet(ref_table).collect()}
    assert got == want
    # identical cap semantics on both paths; specifics: the family's
    # min-id representative survives (whatever subset of flood edges
    # the cap leaves through sub-cap split buckets, min-id wins CC),
    # the width-2 near-dup of doc 50 is dropped, fresh docs kept
    assert 0 in got and 50 in got
    assert 51 not in got and 60 in got


def test_stream_sinks_table_merge_is_partition_pruned(spark, tmp_path):
    """r10 (VERDICT r9 "What's wrong" #1/#2): the streaming sinks'
    corpus-table MERGE must be partition-pruned — after a first
    trigger lands a corpus across many vpart hash partitions, a
    second trigger whose batch ids fall in a FEW vparts leaves every
    other vpart directory byte-and-mtime identical (never rewritten —
    the same pin upsert_by_key's K3 partition path carries), for BOTH
    stream_neardup_ingest and stream_text_index_append."""
    import os

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")

    def vparts_of(df):
        return {
            r[0]
            for r in df.select(
                F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int")
            ).distinct().collect()
        }

    def snapshot(table, vp):
        d = os.path.join(table, f"vpart={vp}")
        return {
            f: (
                os.path.getmtime(os.path.join(d, f)),
                open(os.path.join(d, f), "rb").read(),
            )
            for f in sorted(os.listdir(d))
            if not f.startswith(("_", "."))
        }

    b1 = docs.filter(F.col("doc_id") < 40)
    # synthetic unique texts: batch 2 must survive the neardup sink's
    # probe (testdata docs carry planted near-dups by design)
    b2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1000001, 1000002],
                "text": [
                    "sentinel alpha bravo charlie delta echo foxtrot golf",
                    "unrelated hotel india juliet kilo lima mike november",
                ],
            }
        ),
        b1.schema,
    )
    touched2 = vparts_of(b2)
    untouched = sorted(vparts_of(b1) - touched2)
    assert untouched, "fixture must leave at least one vpart untouched"

    for sink_name, run in (
        (
            "neardup",
            lambda landing, table, index, ckpt: INC.stream_neardup_ingest(
                spark, landing, b1.schema, table, index, ckpt
            ),
        ),
        (
            "text",
            lambda landing, table, index, ckpt: INC.stream_text_index_append(
                spark, landing, b1.schema, table, index, ckpt
            ),
        ),
    ):
        landing = str(tmp_path / f"{sink_name}_landing")
        table = str(tmp_path / f"{sink_name}_table")
        index = str(tmp_path / f"{sink_name}_index")
        ckpt = str(tmp_path / f"{sink_name}_ckpt")
        b1.coalesce(1).write.mode("append").parquet(landing)
        run(landing, table, index, ckpt)
        before = {vp: snapshot(table, vp) for vp in untouched}
        b2.coalesce(1).write.mode("append").parquet(landing)
        run(landing, table, index, ckpt)
        for vp in untouched:
            assert snapshot(table, vp) == before[vp], (
                "%s sink rewrote untouched vpart=%d" % (sink_name, vp)
            )
        got = {
            r["doc_id"]
            for r in spark.read.parquet(table).select("doc_id").collect()
        }
        # batch-2 sentinels merged; corpus stays within the landed ids
        # (the neardup sink legitimately drops b1's planted near-dups)
        assert {1000001, 1000002} <= got
        assert got <= set(range(40)) | {1000001, 1000002}


def test_stream_text_sink_auto_compacts_sidecar(spark, tmp_path):
    """r10 (VERDICT r9 "What's missing" #2): a long-running stream of
    update-carrying triggers must keep the tombstone sidecar BOUNDED —
    the sink folds it in (compact_text_index) once it reaches
    ``compact_sidecar_after`` files — and probes must stay equivalent
    to a from-scratch rebuild across compactions, including through a
    simulated crash at the compaction point."""
    import os

    from etl_btc_spark.operators import text_index as TI
    from etl_btc_spark.operators import tombstones as TS

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = docs.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    ckpt = str(tmp_path / "ckpt")
    terms = ["join", "hash", "scan"]

    def probe(idx):
        return [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=30).collect()]

    def run():
        INC.stream_text_index_append(
            spark, landing, schema, table, index, ckpt,
            compact_sidecar_after=3,
        )

    docs.filter(F.col("doc_id") < 50).write.mode("append").parquet(landing)
    run()
    assert TS.sidecar_files(index) == 0

    # five update triggers: each mutates ids 0-4 (accumulating text
    # revisions, so the changed-text probe fires every time)
    observed = []
    for k in range(1, 6):
        docs.filter(F.col("doc_id") < 5).withColumn(
            "text", F.concat(F.col("text"), F.lit(" rev%d " % k * k))
        ).write.mode("append").parquet(landing)
        run()
        observed.append(TS.sidecar_files(index))
    # 1, 2 (below threshold), 3rd upsert hits the threshold -> fold-in
    # clears, then the cycle restarts: bounded forever
    assert observed == [1, 2, 0, 1, 2]

    full = str(tmp_path / "full")
    TI.build_text_index(spark, spark.read.parquet(table).drop("vpart"), full)
    assert probe(index) == probe(full)

    # crash at the compaction point: compact_text_index crashes leave
    # the marker down — the next trigger must self-heal (rebuild from
    # the table) and keep probing correctly
    os.remove(os.path.join(index, "_BUILT"))
    docs.filter(F.col("doc_id") < 5).withColumn(
        "text", F.concat(F.col("text"), F.lit(" post-crash rev"))
    ).write.mode("append").parquet(landing)
    run()
    assert TS.sidecar_files(index) == 0  # rebuild cleared the sidecar
    full2 = str(tmp_path / "full2")
    TI.build_text_index(spark, spark.read.parquet(table).drop("vpart"), full2)
    assert probe(index) == probe(full2)


def test_delete_by_key_pruned_and_idempotent(spark, tmp_path):
    """r11: the partition-pruned table DELETE — rows die by rewriting
    only their hash partitions; a fully-emptied partition's directory
    is retired; absent ids delete as no-ops (idempotent replay); the
    ids frame must carry an integral partition column."""
    import os

    from etl_btc_spark import sinks as SK

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
    table = str(tmp_path / "t")
    docs.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)
    n0 = spark.read.parquet(table).count()

    # untouched partitions stay byte-identical
    victims = docs.filter(F.col("doc_id").isin(3, 17)).select("doc_id")
    touched = {
        r[0]
        for r in victims.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        ).collect()
    }
    untouched_hash = {}
    for v in set(range(8)) - touched:
        d = os.path.join(table, "vpart=%d" % v)
        untouched_hash[v] = sorted(os.listdir(d))
    SK.delete_by_key(
        spark, victims.withColumn("vpart", part), table,
        key="doc_id", partition_by="vpart",
    )
    left = spark.read.parquet(table)
    assert left.count() == n0 - 2
    assert left.filter(F.col("doc_id").isin(3, 17)).count() == 0
    for v, names in untouched_hash.items():
        assert sorted(os.listdir(os.path.join(table, "vpart=%d" % v))) == names

    # idempotent: deleting the same (now absent) ids changes nothing
    SK.delete_by_key(
        spark, victims.withColumn("vpart", part), table,
        key="doc_id", partition_by="vpart",
    )
    assert spark.read.parquet(table).count() == n0 - 2

    # emptied partition: delete EVERY id of one vpart -> dir retired
    v0 = spark.read.parquet(table).filter(F.col("vpart") == 0)
    SK.delete_by_key(
        spark, v0.select("doc_id").withColumn("vpart", F.lit(0).cast("int")),
        table, key="doc_id", partition_by="vpart",
    )
    assert not os.path.isdir(os.path.join(table, "vpart=0"))
    assert spark.read.parquet(table).filter(F.col("vpart") == 0).count() == 0

    # misuse fails loudly
    with pytest.raises(ValueError, match="partition column"):
        SK.delete_by_key(spark, victims, table, key="doc_id", partition_by="vpart")
    with pytest.raises(ValueError, match="integral"):
        SK.delete_by_key(
            spark,
            victims.withColumn("vpart", F.lit("x")),
            table, key="doc_id", partition_by="vpart",
        )


def test_stream_neardup_delete_records_forget_and_replace(spark, tmp_path):
    """r11 delete-record path, MinHash family: a delete record removes
    the doc's table row AND tombstones its bands BEFORE the same
    trigger's ingest probe — so deleting doc X and ingesting X's
    duplicate in ONE batch keeps the newcomer ('a forgotten document
    stops hiding near-dups of itself'). Bad op values fail loudly;
    delete wins for an id carrying both ops."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_btc_spark.operators import dedup as DD

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("op", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "mh")
    ckpt = str(tmp_path / "ckpt")

    def run():
        INC.stream_neardup_ingest(
            spark, landing, schema, table, index, ckpt, op_col="op"
        )

    base = docs.filter(F.col("doc_id") < 40).withColumn("op", F.lit("upsert"))
    base.write.mode("append").parquet(landing)
    run()
    kept0 = {r[0] for r in spark.read.parquet(table).select("doc_id").collect()}
    assert 3 in kept0

    # batch 2: delete doc 3, ingest 1000003 = verbatim copy of doc 3
    # (kept iff the delete really killed 3's bands), plus a duplicate
    # of a LIVE doc 4 (must still be dropped by the probe)
    t3 = docs.filter(F.col("doc_id") == 3).first()["text"]
    t4 = docs.filter(F.col("doc_id") == 4).first()["text"]
    spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [3, 1000003, 1000004],
                "text": [None, t3, t4],
                "op": ["delete", "upsert", None],
            }
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run()
    kept = {r[0] for r in spark.read.parquet(table).select("doc_id").collect()}
    assert 3 not in kept, "deleted doc still in the table"
    assert 1000003 in kept, "dead bands still hid the newcomer"
    assert 1000004 not in kept, "live doc 4's duplicate slipped through"

    # streamed index ≡ rebuild over the final table (probe-for-probe)
    final = spark.read.parquet(table).drop("vpart")
    rebuilt = str(tmp_path / "mh_rebuilt")
    DD.build_minhash_index(spark, final, rebuilt)
    probe = docs.filter(F.col("doc_id").between(40, 60))
    a = {
        (r.batch_id, r.corpus_id)
        for r in DD.incremental_near_dupes(spark, index, final, probe, 0.8).collect()
    }
    b = {
        (r.batch_id, r.corpus_id)
        for r in DD.incremental_near_dupes(spark, rebuilt, final, probe, 0.8).collect()
    }
    assert a == b
    DD.release_scoped_caches()

    # unknown op value fails loudly
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["x"], "op": ["DELETE"]}), schema
    ).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="unknown"):
        run()


def test_stream_text_index_delete_records(spark, tmp_path):
    """r11 delete-record path, text family: deletes drop the table row
    and tombstone the postings (exact-integer stats adjust), a
    deleted id RE-INGESTS as a fresh document (the live-filtered
    anti-join), and the final index ≡ a rebuild over the final
    corpus. A pure-delete trigger works."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("op", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "ti")
    ckpt = str(tmp_path / "ckpt")
    terms = ["join", "hash", "scan"]

    def run():
        INC.stream_text_index_append(
            spark, landing, schema, table, index, ckpt, op_col="op"
        )

    docs.filter(F.col("doc_id") < 40).withColumn(
        "op", F.lit("upsert")
    ).write.mode("append").parquet(landing)
    run()

    # pure-delete trigger: docs 5 and 7 go
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [5, 7], "text": [None, None], "op": ["delete", "delete"]}
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run()
    ids = {r[0] for r in spark.read.parquet(table).select("doc_id").collect()}
    assert 5 not in ids and 7 not in ids

    # re-ingest deleted id 5 with NEW text: must index as fresh
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [5], "text": ["join hash scan reborn"], "op": [None]}
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run()
    final = spark.read.parquet(table).drop("vpart")
    assert final.filter(F.col("doc_id") == 5).first()["text"].endswith("reborn")

    rebuilt = str(tmp_path / "reb")
    TI.build_text_index(spark, final, rebuilt)
    a = [tuple(r) for r in TI.bm25_probe(spark, index, terms, n=50).collect()]
    b = [tuple(r) for r in TI.bm25_probe(spark, rebuilt, terms, n=50).collect()]
    assert a == b
    sa = spark.read.parquet(index + "/stats").collect()[0]
    sb = spark.read.parquet(rebuilt + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])


def test_stream_hnsw_delete_records(spark, tmp_path):
    """r11 delete-record path, HNSW family: a delete removes the
    vector-table row and its shard rebuilds WITHOUT it in the same
    trigger — final table and index equal a from-scratch build over
    the surviving rows at the same geometry."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_btc_spark.operators import hnsw as HN

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("op", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "hnsw")
    ckpt = str(tmp_path / "ckpt")
    kw = {"n_shards": 4}

    def run():
        INC.stream_hnsw_refresh(
            spark, landing, schema, table, index, ckpt,
            n_table_parts=4, index_kw=kw, op_col="op",
        )

    emb.filter(F.col("vec_id") < 100).withColumn(
        "op", F.lit("upsert")
    ).write.mode("append").parquet(landing)
    run()

    # batch 2: delete ids 3 and 7, insert 100-119
    dels = pd.DataFrame(
        {"vec_id": [3, 7], "embedding": [None, None], "op": ["delete", "delete"]}
    )
    spark.createDataFrame(dels, schema).unionByName(
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120)).withColumn(
            "op", F.lit(None).cast("string")
        )
    ).write.mode("append").parquet(landing)
    run()

    snapshot = spark.read.parquet(table).drop("vpart")
    assert snapshot.count() == 118
    assert snapshot.filter(F.col("vec_id").isin(3, 7)).count() == 0

    full = str(tmp_path / "full")
    HN.build_hnsw_index(spark, snapshot, full, n_shards=4)
    got = spark.read.parquet(index + "/nodes").orderBy("vec_id").collect()
    want = spark.read.parquet(full + "/nodes").orderBy("vec_id").collect()
    assert got == want


def test_stream_vector_index_maintain_lsh(spark, tmp_path):
    """r11: the generic vector-index streaming sink, LSH family —
    insert/update/redeliver/delete records across triggers must leave
    (table, index) with probes IDENTICAL to a from-scratch rebuild
    over the final table (LSH signatures come from the persisted
    _GEOM, so streamed maintenance ≡ rebuild exactly), and a full
    replay from a fresh checkpoint must converge to the same probes."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_btc_spark.operators import ann_index as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields)
        + [T.StructField("op", T.StringType()), T.StructField("ver", T.IntegerType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "lsh")
    kw = {"dim": 64, "n_bands": 8, "bits_per_band": 4}

    def run(tbl, idx, ck):
        INC.stream_vector_index_maintain(
            spark, landing, schema, tbl, idx, str(tmp_path / ck),
            family="lsh", op_col="op", ver_col="ver", index_kw=kw,
        )

    # trigger 1: build on ids < 100 (ver 0)
    emb.filter(F.col("vec_id") < 100).withColumn(
        "op", F.lit("upsert")
    ).withColumn("ver", F.lit(0).cast("int")).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 2 (ver 1): insert 100-149, UPDATE 0-9 (negated vectors),
    # redeliver 50-59 unchanged (must be a no-op)
    upd = (
        emb.filter(F.col("vec_id") < 10)
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
        .unionByName(
            emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
        )
        .unionByName(
            emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 60))
        )
        .withColumn("op", F.lit(None).cast("string"))
        .withColumn("ver", F.lit(1).cast("int"))
    )
    upd.write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 3: delete ids 3 and 7 (deletes are unversioned)
    spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [3, 7],
                "embedding": [None, None],
                "op": ["delete", "delete"],
                "ver": [None, None],
            }
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    final = spark.read.parquet(table).drop("vpart")
    assert final.count() == 148
    row0 = final.filter(F.col("vec_id") == 0).first()
    assert row0["embedding"][0] == -emb.filter(F.col("vec_id") == 0).first()["embedding"][0]

    rebuilt = str(tmp_path / "lsh_rebuilt")
    ANN.build_lsh_index(spark, final, rebuilt, **kw)

    def probes(idx):
        out = []
        for qid in (0, 50, 100):
            q = final.filter(F.col("vec_id") == qid)
            out.append(
                [tuple(r) for r in ANN.knn_lsh_indexed(
                    spark, idx, final, q, k=10, **kw
                ).collect()]
            )
        return out

    assert probes(index) == probes(rebuilt)

    # full replay from a fresh checkpoint (at-least-once: the whole
    # landing zone redelivers) converges to the same probes
    table2, index2 = str(tmp_path / "v2"), str(tmp_path / "lsh2")
    run(table2, index2, "ck2")
    final2 = spark.read.parquet(table2).drop("vpart")
    assert final2.count() == 148
    assert probes(index2) == probes(rebuilt)

    # bad family fails at stream definition
    with pytest.raises(ValueError, match="family"):
        INC.stream_vector_index_maintain(
            spark, landing, schema, table, index, str(tmp_path / "ckx"),
            family="hnsw",
        )


def test_stream_vector_index_maintain_ivf(spark, tmp_path):
    """r11, IVF family: frozen centroids make streamed maintenance ≡
    the batch-sequential ops (build → upsert → delete), probe for
    probe — the same drift-by-design contract the batch API pins."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_btc_spark.operators import ann_index as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("op", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "ivf")
    kw = {"n_centroids": 8}

    def run():
        INC.stream_vector_index_maintain(
            spark, landing, schema, table, index, str(tmp_path / "ck"),
            family="ivf", op_col="op", index_kw=kw,
        )

    b1 = emb.filter(F.col("vec_id") < 100)
    b1.withColumn("op", F.lit("upsert")).write.mode("append").parquet(landing)
    run()

    upd = emb.filter(F.col("vec_id") < 10).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    ins = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
    upd.unionByName(ins).withColumn(
        "op", F.lit(None).cast("string")
    ).write.mode("append").parquet(landing)
    run()
    spark.createDataFrame(
        pd.DataFrame({"vec_id": [5], "embedding": [None], "op": ["delete"]}),
        schema,
    ).write.mode("append").parquet(landing)
    run()

    # batch-sequential twin over a copy of the SAME first-build
    # artifact (Lloyd centroids are data-dependent but deterministic
    # for identical input — build twice from b1 gives identical
    # centroids; pinned by the determinism tests)
    twin = str(tmp_path / "ivf_twin")
    ANN.build_ivf_index(spark, b1, twin, **kw)
    ANN.upsert_ivf_index(spark, upd, twin, stale_ids=upd.select("vec_id"))
    ANN.append_ivf_index(spark, ins, twin)
    ANN.delete_ivf_ids(
        spark,
        spark.createDataFrame(pd.DataFrame({"vec_id": [5]})),
        twin,
    )

    final = spark.read.parquet(table).drop("vpart")
    assert final.count() == 129
    for qid in (0, 50, 100):
        q = final.filter(F.col("vec_id") == qid)
        a = [
            tuple(r)
            for r in ANN.knn_ivf_indexed(spark, index, final, q, k=10, nprobe=4).collect()
        ]
        b = [
            tuple(r)
            for r in ANN.knn_ivf_indexed(spark, twin, final, q, k=10, nprobe=4).collect()
        ]
        assert a == b, qid


def test_vector_sink_update_crash_between_merge_and_upsert_heals(
    spark, tmp_path, monkeypatch
):
    """r11, the r10 transaction-window posture for the vector sink: a
    crash AFTER the table MERGE but BEFORE upsert_lsh_index starts
    must leave the marker DOWN (the sink pre-marks before merging),
    and the next trigger must self-heal by rebuilding from the merged
    table — probes then equal a rebuild over the final corpus."""
    import os

    from pyspark.sql import types as T

    from etl_btc_spark.operators import ann_index as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = emb.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "lsh")
    ckpt = str(tmp_path / "ck")
    kw = {"dim": 64, "n_bands": 8, "bits_per_band": 4}

    def run():
        INC.stream_vector_index_maintain(
            spark, landing, schema, table, index, ckpt,
            family="lsh", index_kw=kw,
        )

    emb.filter(F.col("vec_id") < 80).write.mode("append").parquet(landing)
    run()
    assert os.path.exists(os.path.join(index, "_BUILT"))

    real_upsert = ANN.upsert_lsh_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(ANN, "upsert_lsh_index", boom)
    emb.filter(F.col("vec_id") < 5).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    ).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        run()
    # the table merged the new vectors, the marker is DOWN
    assert not os.path.exists(os.path.join(index, "_BUILT"))
    merged0 = spark.read.parquet(table).drop("vpart").filter(F.col("vec_id") == 0).first()
    assert merged0["embedding"][0] == -emb.filter(F.col("vec_id") == 0).first()["embedding"][0]

    # next trigger (replay of the same files from the uncommitted
    # checkpoint) self-heals: rebuild from the merged table
    monkeypatch.setattr(ANN, "upsert_lsh_index", real_upsert)
    run()
    assert os.path.exists(os.path.join(index, "_BUILT"))
    final = spark.read.parquet(table).drop("vpart")
    rebuilt = str(tmp_path / "reb")
    ANN.build_lsh_index(spark, final, rebuilt, **kw)
    q = final.filter(F.col("vec_id") == 0)
    a = [tuple(r) for r in ANN.knn_lsh_indexed(spark, index, final, q, k=10, **kw).collect()]
    b = [tuple(r) for r in ANN.knn_lsh_indexed(spark, rebuilt, final, q, k=10, **kw).collect()]
    assert a == b


def test_stream_sink_refuses_flat_pre_vpart_table(spark, tmp_path):
    """ADVICE r10: a FLAT table written by a pre-vpart version of the
    sinks must be refused at the first trigger with the migration
    recipe in the message — not by an opaque refusal deep inside
    upsert_by_key."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    # the pre-vpart layout: a plain flat parquet table
    docs.filter(F.col("doc_id") < 20).write.parquet(table)
    docs.filter(F.col("doc_id") < 30).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="flat"):
        INC.stream_neardup_ingest(
            spark, landing, docs.schema, table, str(tmp_path / "idx"),
            str(tmp_path / "ck"),
        )


def test_stream_sink_refuses_changed_vpart_modulus(spark, tmp_path):
    """Review r10: vpart hashing is only partition-stable for a FIXED
    modulus — a stream restarted with a different n_table_parts must
    refuse BEFORE merging (a mismatched merge silently duplicates
    updated keys), and the table must carry the _VPARTS pin."""
    import os

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    docs.filter(F.col("doc_id") < 30).write.mode("append").parquet(landing)
    INC.stream_text_index_append(
        spark, landing, docs.schema, table, index, str(tmp_path / "ck1")
    )
    assert os.path.exists(os.path.join(table, "_VPARTS"))
    with open(os.path.join(table, "_VPARTS")) as f:
        assert int(f.read().strip()) == 64

    docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 35)).write.mode(
        "append"
    ).parquet(landing)
    with pytest.raises(Exception, match="n_table_parts"):
        INC.stream_text_index_append(
            spark, landing, docs.schema, table, index, str(tmp_path / "ck1"),
            n_table_parts=8,
        )
    # the matching modulus still works after the refusal
    INC.stream_text_index_append(
        spark, landing, docs.schema, table, index, str(tmp_path / "ck1")
    )
    assert spark.read.parquet(table).count() == 35


def test_missing_vparts_marker_validated_not_waved_through(spark, tmp_path):
    """Review r10: a vpart-partitioned table WITHOUT the _VPARTS
    marker (pre-marker table, or a crash between the create write and
    the stamp) must be VALIDATED against the requested modulus — a
    silent pass followed by stamping the new n would legitimize the
    exact duplicate-key corruption the guard exists to prevent. A
    matching modulus re-validates and re-stamps; a different one
    raises."""
    import os

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    docs.filter(F.col("doc_id") < 30).write.mode("append").parquet(landing)
    INC.stream_text_index_append(
        spark, landing, docs.schema, table, index, str(tmp_path / "ck1")
    )
    # simulate the pre-marker table: drop the stamp
    os.remove(os.path.join(table, "_VPARTS"))

    docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 35)).write.mode(
        "append"
    ).parquet(landing)
    with pytest.raises(Exception, match="different modulus"):
        INC.stream_text_index_append(
            spark, landing, docs.schema, table, index, str(tmp_path / "ck1"),
            n_table_parts=8,
        )
    assert not os.path.exists(os.path.join(table, "_VPARTS"))

    # the ORIGINAL modulus validates clean, re-stamps, and proceeds
    INC.stream_text_index_append(
        spark, landing, docs.schema, table, index, str(tmp_path / "ck1")
    )
    with open(os.path.join(table, "_VPARTS")) as f:
        assert int(f.read().strip()) == 64
    assert spark.read.parquet(table).count() == 35


def test_vpart_sinks_refuse_colliding_schema_column(spark, tmp_path):
    """Review r10: the vpart sinks derive their partition column and
    would silently clobber a user column of the same name — fail at
    stream definition instead."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("vpart", T.IntegerType()),
        ]
    )
    for fn in (
        lambda: INC.stream_text_index_append(
            spark, str(tmp_path / "l"), schema, str(tmp_path / "t"),
            str(tmp_path / "i"), str(tmp_path / "c"),
        ),
        lambda: INC.stream_neardup_ingest(
            spark, str(tmp_path / "l"), schema, str(tmp_path / "t2"),
            str(tmp_path / "i2"), str(tmp_path / "c2"),
        ),
        lambda: INC.stream_ingest_dedup(
            spark, str(tmp_path / "l"), schema, str(tmp_path / "t3"),
            str(tmp_path / "c3"), key_col="doc_id", ts_col="text",
        ),
        lambda: INC.stream_hnsw_refresh(
            spark, str(tmp_path / "l"), schema, str(tmp_path / "t4"),
            str(tmp_path / "i4"), str(tmp_path / "c4"), id_col="doc_id",
            vec_col="text",
        ),
    ):
        with pytest.raises(ValueError, match="vpart"):
            fn()


def test_text_sink_update_crash_between_merge_and_upsert_heals(
    spark, tmp_path, monkeypatch
):
    """Review r10 (the finding this round's marker-down window fixes):
    a crash AFTER the table MERGE but BEFORE upsert_text_index starts
    used to leave stale postings under a VALID marker — the replayed
    trigger's pre-merge probe then saw new text == merged table text,
    detected no change, and the index stayed silently wrong forever.
    With the fix the sink takes the marker down BEFORE the merge, so
    the crash leaves a refused-probe index and the replay self-heals
    by rebuilding from the merged table."""
    import os

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = docs.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    ckpt = str(tmp_path / "ckpt")
    terms = ["join", "hash", "scan"]

    def probe(idx):
        return [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=30).collect()]

    docs.filter(F.col("doc_id") < 40).write.mode("append").parquet(landing)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    assert os.path.exists(os.path.join(index, "_BUILT"))

    # update-carrying trigger whose index step "crashes" before doing
    # anything — exactly the window between the merge and the upsert
    real_upsert = TI.upsert_text_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(TI, "upsert_text_index", boom)
    docs.filter(F.col("doc_id") < 5).withColumn(
        "text", F.concat(F.lit("join join hash "), F.col("text"))
    ).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    # the table merged the new text, and the marker is DOWN (pre-fix
    # it stayed up, stranding the stale postings as probe-valid)
    snap = spark.read.parquet(table)
    assert snap.filter(F.col("doc_id") == 0).first()["text"].startswith(
        "join join hash "
    )
    assert not os.path.exists(os.path.join(index, "_BUILT"))

    # replay converges: rebuild-from-table self-heal
    monkeypatch.setattr(TI, "upsert_text_index", real_upsert)
    INC.stream_text_index_append(spark, landing, schema, table, index, ckpt)
    full = str(tmp_path / "full")
    TI.build_text_index(spark, spark.read.parquet(table).drop("vpart"), full)
    assert probe(index) == probe(full)


def test_neardup_sink_update_crash_between_merge_and_upsert_heals(
    spark, tmp_path, monkeypatch
):
    """Same window as the text sink (review r10), MinHash family: a
    crash between the corpus MERGE and upsert_minhash_index used to
    leave stale bands probe-valid — the replayed doc was then dropped
    as a near-dup of its own retired text and the update never reached
    the index. The marker-down window makes the replay rebuild."""
    import os

    import pandas as pd

    from etl_btc_spark.operators import dedup as DD

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = {r["doc_id"]: r["text"] for r in docs.limit(10).collect()}

    def mk(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
            )
        )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "mindex")
    ckpt = str(tmp_path / "ckpt")

    b1 = [(i, base[i]) for i in range(10)]
    mk(b1).write.mode("append").parquet(landing)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    assert os.path.exists(os.path.join(index, "_BUILT"))

    real_upsert = DD.upsert_minhash_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(DD, "upsert_minhash_index", boom)
    # id 3 arrives with COMPLETELY different text (far from any kept
    # doc, so it survives the probe and becomes an update)
    b2 = [(3, "zebra quark flange " * 30)]
    mk(b2).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        INC.stream_neardup_ingest(
            spark, landing, mk(b1).schema, table, index, ckpt
        )
    snap = spark.read.parquet(table)
    assert snap.filter(F.col("doc_id") == 3).first()["text"].startswith("zebra")
    assert not os.path.exists(os.path.join(index, "_BUILT"))

    # replay: marker down -> rebuild from table BEFORE probing, then
    # the redelivered update near-dups its own (now rebuilt) copy and
    # converges; final index ≡ rebuild over the final corpus
    monkeypatch.setattr(DD, "upsert_minhash_index", real_upsert)
    INC.stream_neardup_ingest(spark, landing, mk(b1).schema, table, index, ckpt)
    full = str(tmp_path / "full")
    DD.build_minhash_index(
        spark, spark.read.parquet(table).drop("vpart"), full, "doc_id", "text"
    )
    for sub in ("bands",):
        a = spark.read.parquet(os.path.join(index, sub)).drop("gen")
        b = spark.read.parquet(os.path.join(full, sub)).drop("gen")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_text_sink_changed_id_missing_from_index_routes_as_fresh(
    spark, tmp_path
):
    """Review r10: an id present in the TABLE but absent from the
    index registry (its index append crashed after the merge on an
    earlier trigger), arriving again with NEWER text, lands in BOTH
    the changed set (table text differs) and the fresh set (not in
    doclen). The union used to repeat the id and trip
    require_unique_ids, failing the trigger; the fresh side must win
    (no live postings to supersede) and the trigger succeed."""
    import os

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = docs.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tindex")
    terms = ["join", "hash", "scan"]

    def probe(idx):
        return [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=30).collect()]

    # index over ids 1-39 only; table holds 0-39 (id 0's index append
    # "crashed" after its merge) — build the state directly
    TI.build_text_index(spark, docs.filter((F.col("doc_id") >= 1) & (F.col("doc_id") < 40)), index)
    part = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64)).cast("int")
    docs.filter(F.col("doc_id") < 40).withColumn("vpart", part).write.partitionBy(
        "vpart"
    ).parquet(table)

    # id 0 arrives with NEWER text: changed (table text differs) AND
    # fresh (absent from doclen)
    docs.filter(F.col("doc_id") == 0).withColumn(
        "text", F.concat(F.lit("join join hash scan "), F.col("text"))
    ).write.mode("append").parquet(landing)
    INC.stream_text_index_append(
        spark, landing, schema, table, index, str(tmp_path / "ckpt")
    )
    full = str(tmp_path / "full")
    TI.build_text_index(spark, spark.read.parquet(table).drop("vpart"), full)
    assert probe(index) == probe(full)
    sa = spark.read.parquet(index + "/stats").collect()[0]
    sb = spark.read.parquet(full + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])


def test_vector_sink_insert_crash_between_merge_and_append_heals(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (high): on an INSERT-ONLY trigger — the steady-state
    ingest shape — the marker must come down BEFORE the table merge,
    exactly like the update path. A crash after the merge commits but
    before the append opens its own marker window would otherwise
    leave table rows the index lacks under a VALID marker; the
    replay's pre-merge classification (batch vectors == merged table
    vectors) would then route them as pure redelivery and no-op —
    permanent silent false negatives on every probe."""
    import os

    from etl_btc_spark.operators import ann_index as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = emb.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "lsh")
    ckpt = str(tmp_path / "ck")
    kw = {"dim": 64, "n_bands": 8, "bits_per_band": 4}

    def run():
        INC.stream_vector_index_maintain(
            spark, landing, schema, table, index, ckpt,
            family="lsh", index_kw=kw,
        )

    emb.filter(F.col("vec_id") < 80).write.mode("append").parquet(landing)
    run()
    assert os.path.exists(os.path.join(index, "_BUILT"))

    real_append = ANN.append_lsh_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index append")

    monkeypatch.setattr(ANN, "append_lsh_index", boom)
    emb.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 90)).write.mode(
        "append"
    ).parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        run()
    # the fresh rows merged, and the marker is DOWN — the replayed
    # trigger must take the rebuild path, not the redelivery no-op
    assert not os.path.exists(os.path.join(index, "_BUILT"))
    assert (
        spark.read.parquet(table).filter(F.col("vec_id") >= 80).count() == 10
    )

    monkeypatch.setattr(ANN, "append_lsh_index", real_append)
    run()  # self-heal: rebuild from the merged table
    assert os.path.exists(os.path.join(index, "_BUILT"))
    final = spark.read.parquet(table).drop("vpart")
    rebuilt = str(tmp_path / "reb")
    ANN.build_lsh_index(spark, final, rebuilt, **kw)
    q = final.filter(F.col("vec_id") == 85)
    a = [
        tuple(r)
        for r in ANN.knn_lsh_indexed(spark, index, final, q, k=10, **kw).collect()
    ]
    b = [
        tuple(r)
        for r in ANN.knn_lsh_indexed(spark, rebuilt, final, q, k=10, **kw).collect()
    ]
    assert a == b


def test_hnsw_sink_checks_vparts_before_delete(spark, tmp_path):
    """ADVICE r11 (medium): a PURE-DELETE trigger against a table
    stamped with a different n_table_parts must refuse at the top of
    the sink. Before the fix no layout check ran on that path: the
    vpart-pruned delete silently no-opped against the wrong
    directories and the pruned refresh then mapped affected shards to
    wrong vpart dirs — the exact misconfiguration _check_vparts
    exists to refuse."""
    from pyspark.sql import types as T

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("op", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "hnsw")

    emb.filter(F.col("vec_id") < 60).withColumn(
        "op", F.lit("upsert")
    ).write.mode("append").parquet(landing)
    INC.stream_hnsw_refresh(
        spark, landing, schema, table, index, str(tmp_path / "ck1"),
        n_table_parts=4, index_kw={"n_shards": 4}, op_col="op",
    )
    dels = pd.DataFrame({"vec_id": [3], "embedding": [None], "op": ["delete"]})
    spark.createDataFrame(dels, schema).write.mode("append").parquet(landing)
    # same checkpoint -> the next trigger carries ONLY the delete;
    # n_shards=4 divides n_table_parts=2 so the definition-time
    # geometry check passes and the refusal must come from the
    # sink-level _check_vparts
    with pytest.raises(Exception, match="n_table_parts"):
        INC.stream_hnsw_refresh(
            spark, landing, schema, table, index, str(tmp_path / "ck1"),
            n_table_parts=2, index_kw={"n_shards": 4}, op_col="op",
        )
    # nothing was deleted under the mismatched modulus
    assert spark.read.parquet(table).filter(F.col("vec_id") == 3).count() == 1


def test_stream_vector_index_maintain_pq(spark, tmp_path):
    """r12, PQ family through the generic vector sink (VERDICT r11
    'What's missing' #3): warm-start codebooks are frozen across
    triggers (the IVF frozen-centroid posture), so streamed
    insert/update/redeliver/delete maintenance must probe IDENTICALLY
    to a from-scratch rebuild over the final table at the same
    codebooks — and a full replay from a fresh checkpoint (ver_col
    highest-version-wins) must converge to the same probes."""
    from pyspark.sql import types as T

    from etl_btc_spark.operators import pq as PQ

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields)
        + [T.StructField("op", T.StringType()), T.StructField("ver", T.IntegerType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "pq")
    kw = {"m": 8, "n_codes": 16, "codebook_ids": list(range(16))}

    def run(tbl, idx, ck):
        INC.stream_vector_index_maintain(
            spark, landing, schema, tbl, idx, str(tmp_path / ck),
            family="pq", op_col="op", ver_col="ver", index_kw=kw,
        )

    # trigger 1: build on ids < 100 (ver 0) — codebooks from rows 0-15
    emb.filter(F.col("vec_id") < 100).withColumn(
        "op", F.lit("upsert")
    ).withColumn("ver", F.lit(0).cast("int")).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 2 (ver 1): insert 100-129, UPDATE 20-24 (negated — the
    # codebook rows 0-15 stay pristine), redeliver 50-59 unchanged
    upd = (
        emb.filter(F.col("vec_id").between(20, 24))
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
        .unionByName(
            emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
        )
        .unionByName(
            emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 60))
        )
        .withColumn("op", F.lit(None).cast("string"))
        .withColumn("ver", F.lit(1).cast("int"))
    )
    upd.write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 3: delete ids 33 and 37 (unversioned; NOT codebook
    # rows 0-15 — the rebuild twin warm-starts from the final table)
    spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [33, 37],
                "embedding": [None, None],
                "op": ["delete", "delete"],
                "ver": [None, None],
            }
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    final = spark.read.parquet(table).drop("vpart")
    assert final.count() == 128
    row20 = final.filter(F.col("vec_id") == 20).first()
    assert row20["embedding"][0] == -emb.filter(F.col("vec_id") == 20).first()["embedding"][0]

    rebuilt = str(tmp_path / "pq_rebuilt")
    PQ.build_pq_index(spark, final, rebuilt, **kw)

    def probes(idx):
        out = []
        for qid in (0, 20, 100):
            q = final.filter(F.col("vec_id") == qid)
            out.append(
                [tuple(r) for r in PQ.pq_adc_topk(spark, idx, q, k=10).collect()]
            )
        return out

    assert probes(index) == probes(rebuilt)

    # fresh-checkpoint full replay converges to the same probes
    table2, index2 = str(tmp_path / "v2"), str(tmp_path / "pq2")
    run(table2, index2, "ck2")
    assert spark.read.parquet(table2).count() == 128
    assert probes(index2) == probes(rebuilt)


def test_pq_sink_update_crash_between_merge_and_upsert_heals(
    spark, tmp_path, monkeypatch
):
    """The vector sink's transaction-window crash posture, PQ family:
    a crash after the merge but before upsert_pq_index leaves the
    marker DOWN, and the replayed trigger self-heals by rebuilding
    from the merged table — probes then equal a rebuild at the same
    warm codebooks."""
    import os

    from etl_btc_spark.operators import pq as PQ

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = emb.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "pq")
    ckpt = str(tmp_path / "ck")
    kw = {"m": 8, "n_codes": 16, "codebook_ids": list(range(16))}

    def run():
        INC.stream_vector_index_maintain(
            spark, landing, schema, table, index, ckpt,
            family="pq", index_kw=kw,
        )

    emb.filter(F.col("vec_id") < 80).write.mode("append").parquet(landing)
    run()
    assert os.path.exists(os.path.join(index, "_BUILT"))

    real_upsert = PQ.upsert_pq_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(PQ, "upsert_pq_index", boom)
    emb.filter(F.col("vec_id").between(20, 24)).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    ).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        run()
    assert not os.path.exists(os.path.join(index, "_BUILT"))

    monkeypatch.setattr(PQ, "upsert_pq_index", real_upsert)
    run()  # self-heal: rebuild from the merged table
    assert os.path.exists(os.path.join(index, "_BUILT"))
    final = spark.read.parquet(table).drop("vpart")
    rebuilt = str(tmp_path / "reb")
    PQ.build_pq_index(spark, final, rebuilt, **kw)
    q = final.filter(F.col("vec_id") == 20)
    a = [tuple(r) for r in PQ.pq_adc_topk(spark, index, q, k=10).collect()]
    b = [tuple(r) for r in PQ.pq_adc_topk(spark, rebuilt, q, k=10).collect()]
    assert a == b


def test_delete_by_key_emptied_table_stays_readable(spark, tmp_path):
    """ADVICE r11 (the compact_pq_index sibling): deleting EVERY key
    must leave a READABLE empty table — a layout with zero partition
    dirs fails parquet schema inference, crashing the streaming
    sinks' heal paths and snapshot reads instead of showing an empty
    table — and a later merge must re-populate it normally."""
    from etl_btc_spark.sinks import delete_by_key, upsert_by_key

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")
    table = str(tmp_path / "docs")
    small = docs.filter(F.col("doc_id") < 20)
    small.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)

    delete_by_key(
        spark, small.select("doc_id").withColumn("vpart", part), table,
        key="doc_id", partition_by="vpart",
    )
    after = spark.read.parquet(table)
    assert after.count() == 0
    assert set(after.columns) == {"doc_id", "text", "vpart"}

    upsert_by_key(
        spark,
        docs.filter(F.col("doc_id") < 5).withColumn("vpart", part),
        table, key="doc_id", order_col="doc_id", partition_by="vpart",
    )
    assert spark.read.parquet(table).count() == 5


def test_stream_vector_index_maintain_ivfpq(spark, tmp_path):
    """r13, the IVFADC composite through the generic vector sink —
    the eighth family streams on arrival: warm-start centroids AND
    residual codebooks are frozen across triggers (the IVF + PQ
    postures composed), so streamed insert/update/redeliver/delete
    maintenance must probe IDENTICALLY to a from-scratch rebuild over
    the final table at the same geometry — and a full replay from a
    fresh checkpoint (ver_col highest-version-wins) must converge to
    the same probes."""
    from pyspark.sql import types as T

    from etl_btc_spark.operators import ivfpq as IVQ

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        list(emb.schema.fields)
        + [T.StructField("op", T.StringType()), T.StructField("ver", T.IntegerType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "vectors")
    index = str(tmp_path / "ivfpq")
    # warm rows (centroids 0-15, codebooks 16-19/25-32/43-46) all sit
    # in trigger 1 and are untouched by the updates (20-24) and
    # deletes (33, 37), so the rebuild twin warm-starts identically
    # from the final table
    kw = {
        "n_centroids": 16,
        "m": 8,
        "n_codes": 16,
        "centroid_ids": list(range(16)),
        "codebook_ids": [16, 17, 18, 19, 25, 26, 27, 28, 29, 30, 31, 32,
                         43, 44, 45, 46],
    }

    def run(tbl, idx, ck):
        INC.stream_vector_index_maintain(
            spark, landing, schema, tbl, idx, str(tmp_path / ck),
            family="ivfpq", op_col="op", ver_col="ver", index_kw=kw,
        )

    # trigger 1: build on ids < 100 (ver 0)
    emb.filter(F.col("vec_id") < 100).withColumn(
        "op", F.lit("upsert")
    ).withColumn("ver", F.lit(0).cast("int")).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 2 (ver 1): insert 100-129, UPDATE 20-24 (negated — the
    # warm geometry rows stay pristine), redeliver 50-59 unchanged
    upd = (
        emb.filter(F.col("vec_id").between(20, 24))
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
        .unionByName(
            emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
        )
        .unionByName(
            emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 60))
        )
        .withColumn("op", F.lit(None).cast("string"))
        .withColumn("ver", F.lit(1).cast("int"))
    )
    upd.write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 3: delete ids 33 and 37 (unversioned; not warm rows)
    spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [33, 37],
                "embedding": [None, None],
                "op": ["delete", "delete"],
                "ver": [None, None],
            }
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    final = spark.read.parquet(table).drop("vpart")
    assert final.count() == 128
    rebuilt = str(tmp_path / "ivfpq_rebuilt")
    IVQ.build_ivfpq_index(spark, final, rebuilt, **kw)

    def probes(idx):
        out = []
        for qid in (0, 20, 100):
            q = final.filter(F.col("vec_id") == qid)
            out.append(
                [
                    tuple(r)
                    for r in IVQ.ivfpq_adc_topk(
                        spark, idx, q, k=10, nprobe=6
                    ).collect()
                ]
            )
        return out

    assert probes(index) == probes(rebuilt)

    # fresh-checkpoint full replay converges to the same probes
    table2, index2 = str(tmp_path / "v2"), str(tmp_path / "ivfpq2")
    run(table2, index2, "ck2")
    assert spark.read.parquet(table2).count() == 128
    assert probes(index2) == probes(rebuilt)


def test_stream_trigram_index_maintain(spark, tmp_path):
    """r12, trigram family through the keyed-maintenance sink — the
    LAST family without a streaming path (VERDICT r11 noted six of
    seven): grams are a pure function of the text, so streamed
    insert/update/redeliver/delete maintenance must probe IDENTICALLY
    to a from-scratch rebuild over the final table — and a full
    replay from a fresh checkpoint (ver_col highest-version-wins)
    must converge to the same probes. Delete observability: the
    deleted ids carry PLANTED needle text and the probe corpus keeps
    it, so only dead gram rows can exclude them."""
    from pyspark.sql import types as T

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField("op", T.StringType()), T.StructField("ver", T.IntegerType())]
    )
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tri")

    def run(tbl, idx, ck):
        INC.stream_trigram_index_maintain(
            spark, landing, schema, tbl, idx, str(tmp_path / ck),
            op_col="op", ver_col="ver",
        )

    # trigger 1: build on ids < 100 (ver 0)
    docs.filter(F.col("doc_id") < 100).withColumn(
        "op", F.lit("upsert")
    ).withColumn("ver", F.lit(0).cast("int")).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 2 (ver 1): insert 100-129, UPDATE 20-24 (planted needle
    # text), redeliver 50-59 unchanged
    upd = (
        docs.filter(F.col("doc_id").between(20, 24))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz hash join zz")))
        .unionByName(
            docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130))
        )
        .unionByName(
            docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 60))
        )
        .withColumn("op", F.lit(None).cast("string"))
        .withColumn("ver", F.lit(1).cast("int"))
    )
    upd.write.mode("append").parquet(landing)
    run(table, index, "ck1")

    # trigger 3: DELETE the first two planted ids (they WOULD match
    # the probe needle — a dead delete is observable)
    spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [20, 21],
                "text": [None, None],
                "op": ["delete", "delete"],
                "ver": [None, None],
            }
        ),
        schema,
    ).write.mode("append").parquet(landing)
    run(table, index, "ck1")

    final = spark.read.parquet(table).select("doc_id", "text")
    assert final.count() == 128
    assert final.filter(F.col("doc_id") == 22).first()["text"].endswith(
        " zz hash join zz"
    )

    rebuilt = str(tmp_path / "tri_rebuilt")
    TI.build_trigram_index(spark, final, rebuilt)

    # observability corpus: ALL 130 ids including the deleted 20/21
    # with their planted text — their exclusion must come from the
    # index state alone (dead grams streamed; absent rows rebuilt)
    probe_docs = final.unionByName(
        docs.filter(F.col("doc_id").isin(20, 21)).withColumn(
            "text", F.concat(F.col("text"), F.lit(" zz hash join zz"))
        )
    )

    def probes(idx):
        return [
            r["doc_id"]
            for r in TI.substring_search(
                spark, idx, probe_docs, "hash join"
            ).collect()
        ]

    got = probes(index)
    assert got == probes(rebuilt)
    assert {22, 23, 24} <= set(got)
    assert not {20, 21} & set(got)

    # fresh-checkpoint full replay converges to the same probes
    table2, index2 = str(tmp_path / "d2"), str(tmp_path / "tri2")
    run(table2, index2, "ck2")
    assert spark.read.parquet(table2).count() == 128
    assert probes(index2) == got


def test_trigram_sink_update_crash_between_merge_and_upsert_heals(
    spark, tmp_path, monkeypatch
):
    """The keyed sink's transaction-window crash posture, trigram
    family: a crash after the merge but before upsert_trigram_index
    leaves the marker DOWN, and the replayed trigger self-heals by
    rebuilding from the merged table — probes then equal a rebuild."""
    import os

    from etl_btc_spark.operators import text_index as TI

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    schema = docs.schema
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    index = str(tmp_path / "tri")
    ckpt = str(tmp_path / "ck")

    def run():
        INC.stream_trigram_index_maintain(
            spark, landing, schema, table, index, ckpt
        )

    docs.filter(F.col("doc_id") < 80).write.mode("append").parquet(landing)
    run()
    assert os.path.exists(os.path.join(index, "_BUILT"))

    real_upsert = TI.upsert_trigram_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index upsert")

    monkeypatch.setattr(TI, "upsert_trigram_index", boom)
    docs.filter(F.col("doc_id").between(20, 24)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz hash join zz"))
    ).write.mode("append").parquet(landing)
    with pytest.raises(Exception, match="simulated crash"):
        run()
    assert not os.path.exists(os.path.join(index, "_BUILT"))

    monkeypatch.setattr(TI, "upsert_trigram_index", real_upsert)
    run()  # self-heal: rebuild from the merged table
    assert os.path.exists(os.path.join(index, "_BUILT"))
    final = spark.read.parquet(table).drop("vpart")
    rebuilt = str(tmp_path / "reb")
    TI.build_trigram_index(spark, final, rebuilt)
    a = [
        r["doc_id"]
        for r in TI.substring_search(spark, index, final, "hash join").collect()
    ]
    b = [
        r["doc_id"]
        for r in TI.substring_search(spark, rebuilt, final, "hash join").collect()
    ]
    assert a == b and {20, 21, 22, 23, 24} <= set(a)
