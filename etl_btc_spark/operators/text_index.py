"""Persisted inverted text index (r8) — K4's posture applied to text
retrieval: tokenize the corpus ONCE per version into a durable
artifact, then answer every BM25 / term-lookup query from pruned
scans of the postings instead of re-exploding 100 TB of text per
query (reference analogue: the vector store is likewise built at
write time and probed thereafter, init_qdrant.py:232-267).

Artifact layout at ``path``:

- ``postings/`` — one row per (token, doc_id) with the term
  frequency AND the document's token length ``dl`` denormalized in
  (one small int per row, r9 — so probes NEVER touch a corpus-sized
  side table; see below), hash-bucketed into a FIXED number of
  parquet files and sorted by token within each file. Probes push
  ``token IN (...)`` to the scan, so row-group min/max stats skip
  everything outside the query's tokens; bucketing bounds the file
  count independent of vocabulary size (vocab-sized partitionBy dirs
  would be a small-file catastrophe).
- ``doclen/`` — (doc_id, dl) whitespace token lengths. NOT read by
  any probe (r9: the probe-side ``tf.join(doclen)`` was a per-query
  scan of a corpus-sized table — the exact corpus pass the index
  exists to avoid; at sf0.01 AQE broadcast hid it, at 100 TB it
  degrades to a full doclen scan per query). Kept as the
  registered-ids set for the append's insert-only duplicate check
  and the streaming sink's already-indexed anti-join.
- ``stats/`` — ONE row: ``(n_docs, total_dl)``. EXACT integers, not
  a stored average: ``avgdl`` is derived at probe time as one double
  division, so the insert-only append can update the stats exactly
  (add the batch's counts) and ``append ≡ rebuild`` holds
  bit-for-bit — the same maintenance guarantee the LSH family pins.
- ``_BUILT`` marker, same marker-first crash protocol as the ANN
  families (ann_index._mark_built): the marker drops before any
  mutating write and re-lands last, so a crashed rebuild leaves a
  refused-probe state, never a half-readable index.

Scale shape: the build is the same two corpus passes q99's TF-IDF
pays (explode→TF shuffle + codegen doclen scan); every probe after
that is O(matching postings) — the 100 TB explode is paid once per
corpus version instead of once per query.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark.operators import tombstones as TS
from etl_btc_spark.operators.ann_index import _is_built, _mark_built, _require_built
from etl_btc_spark.operators.textops import (
    bm25_contrib,
    normalize_query_terms,
    normalize_text,
    ws_token_count,
    ws_tokens,
)

#: postings write width: files stay pruned-scannable (sorted runs of
#: token within each) while the write keeps every core busy
_POSTING_BUCKETS = 32


def _bucketed_postings_write(df, id_col: str):
    """Hot-token de-skew for the corpus-scale postings writes (r14,
    VERDICT r13 #4): repartitioning by ``hash(token)`` alone sends a
    stopword's postings — O(corpus docs) rows at 100 TB — through ONE
    shuffle partition, a guaranteed straggler/OOM task. RANGE
    partitioning on (token, id) fixes both sides of the trade:
    the range exchange's sampler splits a hot token's run across as
    many partitions as its share of the corpus (even tasks, measured
    ~1.0 max/median on the skewcheck stopword fixture where the
    single-key hash write measured 5.1x), while every term's rows
    stay CONTIGUOUS in 1-2 files — so the ``token IN (...)`` probes
    keep their row-group locality (an id-hash salt was tried first
    and doubled the hot probe's decode volume by smearing every term
    across the full write width). The within-partition sort is
    unchanged; probe VALUES never depend on the layout."""
    return df.repartitionByRange(
        _POSTING_BUCKETS, F.col("token"), F.col(id_col)
    ).sortWithinPartitions("token", id_col)

#: doclen registry partition-modulus metadata (r11, VERDICT r10
#: "What's missing" #3): the registry is partitioned on ``dpart =
#: pmod(xxhash64(id), m)``, a pure function of the id, so the
#: maintenance ops' id-keyed lookups (append's duplicate check,
#: upsert's overlap/old-dl scan, delete's victim scan, the streaming
#: sink's fresh-id anti-join) prune to the batch ids' directories
#: instead of scanning the corpus-sized id column per call. The
#: modulus is frozen per artifact (like the vpart tables' _VPARTS);
#: a missing file means a pre-r11 flat registry — every op then falls
#: back to the unpruned flat layout it was written with.
_DPARTS_FILE = "_DPARTS"


def _write_dparts(path: str, m: int) -> None:
    tmp = os.path.join(path, _DPARTS_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write("%d\n" % m)
    os.replace(tmp, os.path.join(path, _DPARTS_FILE))


def _read_dparts(path: str) -> int | None:
    meta = os.path.join(path, _DPARTS_FILE)
    if not os.path.exists(meta):
        return None  # legacy flat registry
    with open(meta) as f:
        return int(f.read().strip())


def _dpart_of(id_col: str, m: int):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)).cast("int")


def _with_dpart(df: DataFrame, id_col: str, m: int | None) -> DataFrame:
    return df if m is None else df.withColumn("dpart", _dpart_of(id_col, m))


def _write_doclen(df: DataFrame, dest: str, m: int | None, id_col: str, mode: str) -> None:
    """One doclen writer for build/append/upsert/compact: partitioned
    by dpart when the artifact carries a modulus, flat otherwise."""
    w = df.write.mode(mode)
    if m is not None:
        w = w.partitionBy("dpart")
    w.parquet(dest)


def _pruned_doclen(
    spark: SparkSession, path: str, batch_ids: DataFrame, id_col: str
) -> DataFrame:
    """The doclen registry read every id-keyed maintenance lookup
    uses: pruned to the batch ids' dpart directories (one bounded
    collect, ≤ modulus ints — the same hash the write used, so every
    registry row for a batch id lives in a touched dir). Falls back
    to the full flat read on a legacy artifact."""
    dl = spark.read.parquet(os.path.join(path, "doclen"))
    m = _read_dparts(path)
    if m is None:
        return dl
    touched = sorted(
        r[0]
        for r in batch_ids.select(_dpart_of(id_col, m).alias("p"))
        .distinct()
        .collect()
    )
    return dl.filter(
        F.col("dpart").isin(touched) if touched else F.lit(False)
    ).drop("dpart")


def _postings_of(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, id, tf, positions, dl) rows for a document frame — the
    ONE postings encoder build, append and upsert all use. ``dl`` is
    the per-document window sum of tf, which equals ``ws_token_count``
    exactly: both sides split the trimmed text on ``\\s+`` (the
    normalize lowercases but never changes the token count), a
    whitespace-only/empty doc produces ZERO postings rows (so its
    dl never appears anywhere), and a NULL text explodes to nothing.
    Denormalizing dl here (r9) is what lets every probe run from the
    pruned postings scan alone — one small int per posting row buys
    corpus-independent queries.

    ``positions`` (r9, VERDICT r8 #4) is the sorted 0-based token
    offsets of the term — the standard positional-index trade (one
    int per occurrence, the Lucene default): exact PHRASE queries
    become index-served (:func:`phrase_probe`). BM25/term probes
    never read the column (parquet column pruning), so they pay
    nothing for it."""
    from pyspark.sql import Window

    toks = ws_tokens(normalize_text(F.col(text_col)))
    words = df.select(
        F.col(id_col), F.posexplode(toks).alias("__pos", "token")
    ).filter(F.col("token") != "")
    tf = words.groupBy("token", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("__pos")).alias("positions"),
    )
    return tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy(id_col))
    )


def build_text_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_id_parts: int = 32,
) -> str:
    """Write the inverted index artifact. One explode→TF shuffle over
    the corpus (the only token-level pass), one codegen scan for doc
    lengths, one vocab-level aggregate for the stats row. The doclen
    registry lands partitioned on ``dpart = pmod(xxhash64(id),
    n_id_parts)`` (r11) so every later id-keyed maintenance lookup —
    append's duplicate check, upsert's overlap scan, the streaming
    sink's fresh-id anti-join — prunes to the batch's directories
    instead of reading the corpus-sized id column; probes never read
    the registry at all (dl is denormalized into the postings).
    Sizing: per-lookup I/O ≈ min(batch_ids, n) × registry/n — 32
    suits tests, a 100 TB corpus wants thousands."""
    _recover_stats_debris(path)
    tf = _postings_of(df, id_col, text_col)
    # marker-first invalidation (same posture as the ANN families): a
    # rebuild over a live artifact must refuse probes from the first
    # mutating write until the new marker lands
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    # a rebuild re-derives from the source-of-truth corpus: any
    # supersede history is obsolete, generations restart at 0, and
    # crashed-compaction debris is garbage
    TS.clear_tombstones(path)
    TS.clear_fold_debris(path)
    (
        TS.with_gen(tf, 0)
        .transform(lambda d: _bucketed_postings_write(d, id_col))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    # an EMPTY corpus can't land as a partitioned dir (zero partition
    # dirs = no readable schema) — it stays in the flat legacy layout
    # (no _DPARTS), which every reader handles; the first REAL build
    # over rows adopts the partitioned registry
    m = None if df.isEmpty() else n_id_parts
    doclen = _with_dpart(
        TS.with_gen(
            df.select(F.col(id_col), ws_token_count(F.col(text_col)).alias("dl")),
            0,
        ),
        id_col,
        m,
    )
    _write_doclen(doclen, os.path.join(path, "doclen"), m, id_col, "overwrite")
    if m is not None:
        _write_dparts(path, m)
    else:
        try:
            os.remove(os.path.join(path, _DPARTS_FILE))
        except FileNotFoundError:
            pass
    # r17 (optimization round, guide §1.2): the stats row aggregates
    # the just-WRITTEN doclen registry instead of re-scanning and
    # re-tokenizing the corpus — dl is already materialized one long
    # per doc, so this third full tokenization pass of the build was
    # pure recompute. Values identical (same ws_token_count column).
    stats = spark.read.parquet(os.path.join(path, "doclen")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesce: sum over an empty corpus is NULL, and a NULL
        # total_dl would poison the first append's exact-integer merge
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stats"))
    _mark_built(path, "text")
    return path


def ensure_text_index(spark: SparkSession, df: DataFrame, path: str, **kw) -> str:
    """Build-if-absent, same contract as ensure_{lsh,ivf,hnsw}_index."""
    if not _is_built(path, "text"):
        build_text_index(spark, df, path, **kw)
    return path


def _recover_stats_debris(path: str) -> None:
    """Heal an interrupted stats swap (review r8: a crash between the
    swap's renames stranded ``.stats_*`` dirs forever — no other path
    removed dot-prefixed debris). If the live ``stats`` dir is
    missing and a retired copy exists, restore it (the marker is down
    at that point, so probes refuse either way and the next
    build/append proceeds from a consistent layout); then discard all
    remaining ``.stats_*`` debris."""
    if not os.path.isdir(path):
        return
    retired = sorted(
        d for d in os.listdir(path) if d.startswith(".stats_old_")
    )
    if retired and not os.path.isdir(os.path.join(path, "stats")):
        os.rename(os.path.join(path, retired[0]), os.path.join(path, "stats"))
    for d in os.listdir(path):
        if d.startswith(".stats_"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _read_stats(spark: SparkSession, path: str) -> DataFrame:
    """(n_docs, avgdl) derived from the exact-integer stats row.
    dl values are integers, so a double accumulation of them is exact
    below 2^53 regardless of order — total_dl/n_docs here is
    bit-identical to the avg() both the build's old form and the
    DuckDB oracle compute."""
    return spark.read.parquet(os.path.join(path, "stats")).select(
        "n_docs",
        # greatest(...,1): an EMPTY index has n_docs=0 and ANSI mode
        # makes 0/0 a hard error, not NULL — the probe's result is
        # empty either way, the divisor guard just keeps the plan legal
        (F.col("total_dl") / F.greatest(F.col("n_docs"), F.lit(1))).alias("avgdl"),
    )


def append_text_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_new: bool = True,
) -> str:
    """Insert-only incremental maintenance, the LSH-append posture
    applied to text: tokenize ONLY the batch, append its postings and
    doc lengths, and add its exact counts to the stats row — so
    ``append ≡ rebuild`` holds bit-for-bit (BM25 reads tf/df/dl/
    avgdl, all of which are exact integers or derived from them;
    pinned by pytest). O(batch): no corpus pass.

    Updates/deletes are refused like the other appends (a re-ingested
    id's stale postings would double-count its terms); ``verify_new``
    anti-joins batch ids against the doclen table (ids only) and
    fails loudly on overlap. Marker-first around the writes: a crash
    mid-append leaves a refused-probe state and recovery is
    ensure_text_index on the current corpus snapshot. Postings from
    appends land as additional files (sorted within themselves);
    ``sinks.compact_table`` restores single-run token sortedness when
    append debt accumulates, exactly like the LSH band files.
    """
    _require_built(path, "text")
    _recover_stats_debris(path)
    doclen_path = os.path.join(path, "doclen")
    m = _read_dparts(path)
    if verify_new:
        # registry read pruned to the batch ids' dpart dirs (r11) —
        # an already-indexed batch id's rows can only live there
        existing = _pruned_doclen(
            spark, path, new_docs.select(id_col), id_col
        ).select(id_col)
        n_dup = new_docs.select(id_col).join(existing, id_col).limit(1).count()
        if n_dup:
            raise ValueError(
                "append_text_index: batch contains ids already indexed — "
                "text append is insert-only (stale postings would "
                "double-count terms); rebuild for update semantics"
            )
    tf = _postings_of(new_docs, id_col, text_col)
    old = spark.read.parquet(os.path.join(path, "stats")).collect()[0]
    add = new_docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(ws_token_count(F.col(text_col))), F.lit(0)).alias(
            "total_dl"
        ),
    ).collect()[0]
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    gen = TS.read_gen(path)  # inserts stamp the CURRENT generation
    (
        TS.with_gen(tf, gen)
        .repartition(1, F.col("token"))  # append batches are small
        .sortWithinPartitions("token", id_col)
        .write.mode("append")
        .parquet(os.path.join(path, "postings"))
    )
    _write_doclen(
        _with_dpart(
            TS.with_gen(
                new_docs.select(
                    F.col(id_col), ws_token_count(F.col(text_col)).alias("dl")
                ),
                gen,
            ),
            id_col,
            m,
        ),
        doclen_path,
        m,
        id_col,
        "append",
    )
    _swap_stats(
        spark, path, old["n_docs"] + add["n_docs"], old["total_dl"] + add["total_dl"]
    )
    _mark_built(path, "text")
    return path


def _swap_stats(spark: SparkSession, path: str, n_docs: int, total_dl: int) -> None:
    """Exact-integer stats rewrite via a dot-prefixed shadow + atomic
    rename (the 1-row table must never be half-written)."""
    import uuid

    merged = spark.createDataFrame(
        pd.DataFrame({"n_docs": [n_docs], "total_dl": [total_dl]}),
        "n_docs bigint, total_dl bigint",
    )
    shadow = os.path.join(path, ".stats_%s" % uuid.uuid4().hex[:8])
    merged.coalesce(1).write.mode("overwrite").parquet(shadow)
    stats_dir = os.path.join(path, "stats")
    retired = os.path.join(path, ".stats_old_%s" % uuid.uuid4().hex[:8])
    os.rename(stats_dir, retired)
    os.rename(shadow, stats_dir)
    shutil.rmtree(retired, ignore_errors=True)


def upsert_text_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    _premarked: bool = False,
) -> str:
    """O(batch) UPDATE maintenance (r9, VERDICT r8 #1) via the shared
    superseded-ids sidecar: ids in ``docs`` that are already indexed
    get their stale postings TOMBSTONED (probes live-filter them out
    — document frequencies, term frequencies and dl all come from
    live rows only), and the whole batch's postings append at a
    bumped generation. The stats row adjusts by exact integers:
    ``n_docs`` grows only by the genuinely-new ids, ``total_dl`` by
    (batch dl sum − superseded ids' old dl sum), so probe scores are
    IDENTICAL to a from-scratch rebuild over the updated corpus
    (pinned by pytest). Cost: tokenizes ONLY the batch; the single
    corpus-shaped touch is one columnar scan of the doclen registry
    to find the overlap and its old lengths — never a re-tokenize.

    Where r8's only documented update path was a full rebuild (the
    streaming sink paid one corpus pass per update-carrying trigger),
    this leaves every pre-existing posting file byte-identical.
    Marker-first: a crash anywhere leaves refused-probe; recovery is
    the standard rebuild from the corpus table.

    Batch contract (ADVICE r9): ONE row per id, enforced — a repeated
    id would double-count in the exact-integer stats while
    ``_postings_of`` merges it into one document, and its two doclen
    rows at the same generation would make later latest-per-id dl
    resolution nondeterministic.

    ``_premarked`` (sink-internal, review r10): the streaming sink
    takes the ``_BUILT`` marker down BEFORE its table MERGE so the
    whole merge+upsert update transaction sits under ONE marker-down
    window (a crash between the two would otherwise strand stale
    postings under a valid marker, undetectable to the replayed
    trigger whose pre-merge probe then sees no change). Passing True
    skips the built-marker precondition — the caller verified it
    before opening the window; everything else, including the
    restoring ``_mark_built`` at the end, is unchanged."""
    from pyspark.sql import Window

    if not _premarked:
        _require_built(path, "text")
    _recover_stats_debris(path)
    TS.require_unique_ids(docs, id_col, "upsert_text_index")
    doclen_path = os.path.join(path, "doclen")
    m = _read_dparts(path)
    batch_ids = docs.select(id_col)
    # latest LIVE registered dl per overlapping id (doclen accumulates
    # one row per generation; live-filter first — a DELETED id's stats
    # were already subtracted at delete time, so treating it as
    # existing here would double-subtract; it re-enters as a NEW doc)
    # — a dpart-pruned scan of the registry (r11), aggregated to two
    # scalars
    dl_reg = TS.live_rows(
        spark, _pruned_doclen(spark, path, batch_ids, id_col), path, id_col
    ).join(F.broadcast(batch_ids), id_col, "semi")
    w = Window.partitionBy(id_col).orderBy(F.col(TS.GEN_COL).desc())
    old = (
        dl_reg.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("old_dl"),
        )
        .collect()[0]
    )
    cur = spark.read.parquet(os.path.join(path, "stats")).collect()[0]
    add = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(ws_token_count(F.col(text_col))), F.lit(0)).alias(
            "total_dl"
        ),
    ).collect()[0]
    tf = _postings_of(docs, id_col, text_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    stale = docs.select(id_col).join(
        _pruned_doclen(spark, path, batch_ids, id_col).select(id_col),
        id_col,
        "semi",
    )
    TS.append_tombstones(spark, stale, path, id_col, dead_below=g)
    (
        TS.with_gen(tf, g)
        .repartition(1, F.col("token"))
        .sortWithinPartitions("token", id_col)
        .write.mode("append")
        .parquet(os.path.join(path, "postings"))
    )
    _write_doclen(
        _with_dpart(
            TS.with_gen(
                docs.select(
                    F.col(id_col), ws_token_count(F.col(text_col)).alias("dl")
                ),
                g,
            ),
            id_col,
            m,
        ),
        doclen_path,
        m,
        id_col,
        "append",
    )
    _swap_stats(
        spark,
        path,
        cur["n_docs"] + add["n_docs"] - old["n_overlap"],
        cur["total_dl"] + add["total_dl"] - old["old_dl"],
    )
    _mark_built(path, "text")
    return path


def delete_text_ids(
    spark: SparkSession,
    ids: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> str:
    """O(batch) DELETE via the shared tombstone sidecar (r9) — the
    forget-these-documents operation (takedown/GDPR shape, the other
    half of VERDICT r8 "What's missing" #1's update/delete ask):
    tombstone the ids at a bumped generation with NO replacement
    rows. Probes live-filter them out immediately; compaction later
    drops the bytes. The exact-integer stats subtract the victims'
    (count, dl) so BM25's n_docs/avgdl match a rebuild without them
    (pinned by pytest). Ids that are absent or ALREADY deleted are
    skipped (their stats were never counted / already subtracted —
    double-delete is a no-op, not a double-subtract). A deleted id
    re-enters through ``upsert_text_index`` (the insert-only append's
    registry check still sees its dead rows and refuses, by design).
    Marker-first; crash recovery is the standard rebuild."""
    from pyspark.sql import Window

    _require_built(path, "text")
    _recover_stats_debris(path)
    victims_in = ids.select(id_col).distinct()
    # registry read pruned to the victims' dpart dirs (r11)
    reg = TS.live_rows(
        spark, _pruned_doclen(spark, path, victims_in, id_col), path, id_col
    ).join(F.broadcast(victims_in), id_col, "semi")
    w = Window.partitionBy(id_col).orderBy(F.col(TS.GEN_COL).desc())
    # materialized: the tombstone append below must not re-read the
    # sidecar its own write is appending to through this lineage
    victims = (
        reg.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "dl")
        .localCheckpoint()
    )
    try:
        gone = victims.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("dl"),
        ).collect()[0]
        if gone["n"] == 0:
            return path  # nothing live to delete — no-op
        cur = spark.read.parquet(os.path.join(path, "stats")).collect()[0]
        try:
            os.remove(os.path.join(path, "_BUILT"))
        except FileNotFoundError:
            pass
        g = TS.bump_gen(path)
        TS.append_tombstones(
            spark, victims.select(id_col), path, id_col, dead_below=g
        )
        _swap_stats(
            spark, path, cur["n_docs"] - gone["n"], cur["total_dl"] - gone["dl"]
        )
        _mark_built(path, "text")
    finally:
        from etl_btc_spark.operators.dedup import _unpersist_local_checkpoint

        _unpersist_local_checkpoint(victims)
    return path


def delete_trigram_ids(
    spark: SparkSession, ids: DataFrame, path: str, id_col: str = "doc_id"
) -> str:
    """DELETE for the trigram family: tombstone-only (no stats to
    adjust). Absent ids tombstone harmlessly (no live rows die)."""
    _require_built(path, "trigram")
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(
        spark, ids.select(id_col).distinct(), path, id_col, dead_below=g
    )
    _mark_built(path, "trigram")
    return path


def compact_text_index(
    spark: SparkSession, path: str, id_col: str = "doc_id"
) -> str:
    """Fold the supersede sidecar in: rewrite only LIVE postings (and
    the latest doclen row per id) at generation 0 with the build's
    bucketed/sorted layout, clear tombstones. No-op without
    tombstones. Stats are already exact (the upserts maintained them
    integer-exactly), so they are untouched. Shadow-dir + rename
    publish under the marker-down window."""
    from pyspark.sql import Window

    _require_built(path, "text")
    if not TS.has_tombstones(path):
        return path
    TS.clear_fold_debris(path)
    live = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "postings")), path, id_col
    ).drop(TS.GEN_COL)
    # registry fold: live-filter BEFORE latest-per-id so a DELETED
    # id's registry row drops out entirely (keeping it would refuse a
    # legitimate re-append and double-subtract its dl on a re-upsert)
    w = Window.partitionBy(id_col).orderBy(F.col(TS.GEN_COL).desc())
    m = _read_dparts(path)
    latest_dl = (
        TS.live_rows(
            spark,
            spark.read.parquet(os.path.join(path, "doclen")).drop("dpart"),
            path,
            id_col,
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "dl")
    )
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    (
        TS.with_gen(live, 0)
        .transform(lambda d: _bucketed_postings_write(d, id_col))
        .write.mode("overwrite")
        .parquet(os.path.join(path, ".postings_shadow"))
    )
    # a fully-emptied registry (every doc deleted) can't land as a
    # partitioned dir — fold it back to the flat legacy layout (the
    # same empty-corpus posture the build takes)
    if m is not None and latest_dl.isEmpty():
        m = None
    _write_doclen(
        _with_dpart(TS.with_gen(latest_dl, 0), id_col, m),
        os.path.join(path, ".doclen_shadow"),
        m,
        id_col,
        "overwrite",
    )
    if m is None:
        try:
            os.remove(os.path.join(path, _DPARTS_FILE))
        except FileNotFoundError:
            pass
    TS.fold_swap(path, "postings", ".postings_shadow")
    TS.fold_swap(path, "doclen", ".doclen_shadow")
    TS.clear_tombstones(path)
    _mark_built(path, "text")
    return path


def bm25_probe(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-n documents by BM25 from the persisted index — NO corpus
    pass AT ALL (r9): ``token IN (...)`` pushes to the postings scan
    (row-group stats skip non-matching token runs), document
    frequencies reduce over those few rows, ``dl`` rides ON the
    posting rows (denormalized at build/append time — the former
    doclen join scanned a corpus-sized table per query), the 1-row
    stats and dfreq broadcast, and top-n is TakeOrdered.
    Scores/tie-breaks are IDENTICAL to textops.bm25_scores (the
    per-term contribution is literally the shared ``bm25_contrib``
    expression, and terms go through the same
    ``normalize_query_terms``) — pinned by the shared q99h oracle:
    index probe ≡ direct computation."""
    _require_built(path, "text")
    terms = normalize_query_terms(query_terms)
    # live_rows BEFORE dfreq: superseded postings must count in
    # neither the term nor the document frequencies
    tf = TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "postings")).filter(
            F.col("token").isin(terms)
        ),
        path,
        id_col,
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = _read_stats(spark, path)
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(bm25_contrib(k1, b)) + F.lit(1e-9), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(n)
    )


def bm25_join(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    max_distinct_terms: int = 100_000,
) -> DataFrame:
    """Batched retrieval: top-n BM25 documents for EVERY query row —
    the decontamination/eval-retrieval shape ("for each eval prompt,
    find its closest training docs"), the text analogue of the
    batched kNN joins (q84/q85). ``queries`` carries
    ``(query_id, terms array<string>)``.

    Scale shape: the batch's DISTINCT terms are collected under a
    bounded guard (they are vocabulary words — bounded by
    ``max_distinct_terms``, NOT by corpus size; same posture as the
    kNN joins' broadcast_max_queries) and pushed as a STATIC
    ``token IN (...)`` predicate so the postings scan stays pruned
    even for a dynamic query batch. Matching postings (which carry
    ``dl``, r9 — no doclen side table) then join the broadcast
    (query, token) pairs and the 1-row
    stats; one (query, doc) aggregate and one rank window
    (WindowGroupLimit) per query finish it. Per-term document
    frequencies are CORPUS-wide (reduced from the pruned postings),
    identical to bm25_probe's, so a 1-query batch returns exactly
    the single-probe answer (pinned by pytest)."""
    from pyspark.sql import Window

    _require_built(path, "text")
    qt = (
        queries.select(
            F.col(query_id_col), F.explode(F.col(terms_col)).alias("token")
        )
        # same canonical form as normalize_query_terms (ADVICE r8: a
        # whitespace-padded term matched in bm25_probe but silently
        # matched nothing here) — lower + ASCII-\s strip; since ADVICE
        # r9 normalize_query_terms strips ASCII-only too, so the two
        # entry points agree on every character
        .withColumn(
            "token",
            F.lower(F.regexp_replace(F.col("token"), r"^\s+|\s+$", "")),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    term_rows = qt.select("token").distinct().limit(max_distinct_terms + 1).collect()
    if len(term_rows) > max_distinct_terms:
        raise ValueError(
            "bm25_join: query batch exceeds %d distinct terms — split the "
            "batch (the static pushdown list must stay plan-sized)"
            % max_distinct_terms
        )
    terms = sorted(r["token"] for r in term_rows)
    tf = TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "postings")).filter(
            F.col("token").isin(terms)
        ),
        path,
        id_col,
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = _read_stats(spark, path)
    scored = (
        tf.join(F.broadcast(qt), "token")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(bm25_contrib(k1, b)) + F.lit(1e-9), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(query_id_col, "rank", id_col, "bm25")
    )


def term_lookup(
    spark: SparkSession, path: str, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Raw postings fetch for a term set (the contamination-triage /
    concordance primitive): (token, doc_id, tf) rows from a pruned
    scan of the artifact."""
    _require_built(path, "text")
    return TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "postings")).filter(
            F.col("token").isin(normalize_query_terms(terms))
        ),
        path,
        id_col,
    ).select("token", id_col, "tf")


def phrase_probe(
    spark: SparkSession,
    path: str,
    phrase: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT phrase search served ENTIRELY by the positional inverted
    index (r9, VERDICT r8 #4): document ids whose whitespace token
    sequence contains the phrase's tokens consecutively, in order —
    identical to a full-scan token-boundary LIKE over the normalized
    text (the oracle), with NO corpus pass: the phrase's distinct
    terms push as a static ``token IN (...)`` to the postings scan,
    positions explode only for those few rows, and the adjacency
    check is one aggregate.

    Adjacency as an anchor-offset vote: token t at position p matches
    phrase slot i ⇒ a candidate phrase START at p − i; a document
    contains the phrase iff some start accumulates ALL |phrase|
    distinct slots (duplicate phrase terms are handled — each slot
    votes independently). The phrase normalizes through the shared
    :func:`normalize_needle`, so its token split is exactly the
    doc-side tokenizer's. A 1-term phrase degenerates to a postings
    membership test; an empty phrase returns no rows."""
    _require_built(path, "text")
    terms = normalize_needle(phrase).split(" ")
    terms = [t for t in terms if t]
    id_field = (
        spark.read.parquet(os.path.join(path, "doclen")).schema[id_col]
    )
    if not terms:
        return spark.createDataFrame([], T.StructType([id_field]))
    qt = spark.createDataFrame(
        pd.DataFrame({"token": terms, "__slot": range(len(terms))}),
        T.StructType(
            [
                T.StructField("token", T.StringType()),
                T.StructField("__slot", T.IntegerType()),
            ]
        ),
    )
    tf = TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "postings")).filter(
            F.col("token").isin(sorted(set(terms)))
        ),
        path,
        id_col,
    )
    starts = (
        tf.select(F.col(id_col), "token", F.explode("positions").alias("__p"))
        .join(F.broadcast(qt), "token")
        .select(F.col(id_col), (F.col("__p") - F.col("__slot")).alias("__start"), "__slot")
    )
    return (
        starts.groupBy(id_col, "__start")
        .agg(F.count_distinct("__slot").alias("__n"))
        .filter(F.col("__n") == len(terms))
        .select(id_col)
        .distinct()
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# Trigram substring index (pg_trgm shape): substring search without a
# full-corpus scan per query
# ---------------------------------------------------------------------------


def _char_trigrams(s):
    """Distinct character 3-grams of an (already normalized) string
    column — pure codegen: sequence → substring gather → distinct."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(0))),
            lambda i: F.substring(s, i, F.lit(3)),
        )
    )


def normalize_needle(needle: str) -> str:
    """THE python-side mirror of :func:`textops.normalize_text` for
    probe literals (needles, phrases) — extracted r9 (VERDICT r8 #5)
    so doc-side and needle-side canonical forms cannot drift between
    entry points (the exact bug class the r8 review caught once in
    bm25_join). Uses the ASCII ``\\s`` class ONLY: Java's ``\\s`` —
    what the doc-side Spark regex collapses — matches no unicode
    spaces, while python's default unicode ``\\s`` also collapses
    NBSP etc.; the two sides must disagree on NO character or
    index-served results diverge from a raw scan."""
    import re as _re

    return _re.sub(
        r"\s+", " ", needle.strip(" \t\n\r\f\v").lower(), flags=_re.ASCII
    )


def _trigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, trigram) posting rows — the ONE encoder build, append and
    upsert share (distinct per doc: the probe counts matched grams
    per doc, so a duplicate row would inflate the pigeonhole count)."""
    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col), F.explode(_char_trigrams(norm)).alias("token")
    ).filter(F.length("token") == 3)


def build_trigram_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Persist (trigram, doc_id) postings over the normalized text —
    the pg_trgm play: ANY substring of length ≥ 3 that occurs in a
    document implies every one of its trigrams occurs, so a
    trigram-postings intersection is a LOSSLESS prefilter for
    substring search and the per-query cost becomes a pruned postings
    scan + an exact contains() verify on the few candidates, instead
    of scanning 100 TB of text per query. Same layout/marker/crash
    posture as the inverted token index (trigram-bucketed files,
    trigram-sorted within, marker-first invalidation); the trigram
    family registers its OWN ``trigram-v1`` marker — the artifacts
    are structurally identical postings tables, which is exactly why
    the marker must refuse cross-family probes (a token probe against
    trigram postings would silently return false negatives).
    """
    _recover_stats_debris(path)
    grams = _trigram_rows(df, id_col, text_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    TS.clear_tombstones(path)  # rebuild: supersede history is obsolete
    TS.clear_fold_debris(path)
    (
        TS.with_gen(grams, 0)
        .transform(lambda d: _bucketed_postings_write(d, id_col))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    _mark_built(path, "trigram")
    return path


def ensure_trigram_index(spark: SparkSession, df: DataFrame, path: str, **kw) -> str:
    if not _is_built(path, "trigram"):
        build_trigram_index(spark, df, path, **kw)
    return path


def append_trigram_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_new: bool = True,
    _premarked: bool = False,
) -> str:
    """Insert-only incremental maintenance for the trigram index (r9,
    VERDICT r8 #3 — without this a streaming corpus forced rebuilds):
    gram ONLY the batch and append its (id, trigram) rows at the
    current generation, so ``append ≡ rebuild`` holds for every probe
    (the encoder is shared with the build; there are no stats to
    merge). ``verify_new`` anti-joins batch ids against an id-only
    columnar scan of the postings (the trigram family has no doclen
    registry) and refuses overlap — a re-ingested id's stale grams
    would double-count in the pigeonhole filter; updates go through
    :func:`upsert_trigram_index`. Marker-first around the write.
    ``_premarked`` (sink-internal, r12): the streaming sink takes
    ``_BUILT`` down BEFORE its table MERGE so the whole merge+append
    transaction shares one marker-down window — True skips only the
    built-marker precondition."""
    if not _premarked:
        _require_built(path, "trigram")
    postings_path = os.path.join(path, "postings")
    if verify_new:
        existing = spark.read.parquet(postings_path).select(id_col)
        n_dup = new_docs.select(id_col).join(existing, id_col).limit(1).count()
        if n_dup:
            raise ValueError(
                "append_trigram_index: batch contains ids already indexed — "
                "trigram append is insert-only (stale grams would inflate "
                "the pigeonhole count); use upsert_trigram_index for "
                "update semantics"
            )
    grams = _trigram_rows(new_docs, id_col, text_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    (
        TS.with_gen(grams, TS.read_gen(path))
        .repartition(1, F.col("token"))  # append batches are small
        .sortWithinPartitions("token", id_col)
        .write.mode("append")
        .parquet(postings_path)
    )
    _mark_built(path, "trigram")
    return path


def upsert_trigram_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stale_ids: DataFrame | None = None,
    _premarked: bool = False,
) -> str:
    """O(batch) UPDATE maintenance via the shared tombstone sidecar
    (r9): already-indexed ids' gram rows die by supersede, the whole
    batch's grams append at a bumped generation, probes live-filter.
    One row per id enforced (ADVICE r9 — repeated rows would all land
    live and inflate the pigeonhole count). Marker-first; crash
    recovery is the standard rebuild. ``stale_ids=None`` computes the
    overlap from an id-only columnar scan of the postings (the family
    has no per-doc registry); the streaming sink passes its own
    table-classified changed set instead, skipping that O(index-rows)
    scan. ``_premarked`` (sink-internal, r12): the sink takes
    ``_BUILT`` down BEFORE its table MERGE so merge+upsert share one
    marker-down window — True skips only the marker precondition."""
    if not _premarked:
        _require_built(path, "trigram")
    TS.require_unique_ids(docs, id_col, "upsert_trigram_index")
    postings_path = os.path.join(path, "postings")
    if stale_ids is None:
        stale_ids = docs.select(id_col).join(
            spark.read.parquet(postings_path).select(id_col), id_col, "semi"
        )
    grams = _trigram_rows(docs, id_col, text_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(spark, stale_ids, path, id_col, dead_below=g)
    (
        TS.with_gen(grams, g)
        .repartition(1, F.col("token"))
        .sortWithinPartitions("token", id_col)
        .write.mode("append")
        .parquet(postings_path)
    )
    _mark_built(path, "trigram")
    return path


def compact_trigram_index(
    spark: SparkSession, path: str, id_col: str = "doc_id"
) -> str:
    """Fold the supersede sidecar in (no-op without tombstones):
    rewrite live gram rows at gen 0 in the build's bucketed/sorted
    layout, clear the sidecar."""
    _require_built(path, "trigram")
    if not TS.has_tombstones(path):
        return path
    TS.clear_fold_debris(path)
    live = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "postings")), path, id_col
    ).drop(TS.GEN_COL)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    (
        TS.with_gen(live, 0)
        .transform(lambda d: _bucketed_postings_write(d, id_col))
        .write.mode("overwrite")
        .parquet(os.path.join(path, ".postings_shadow"))
    )
    TS.fold_swap(path, "postings", ".postings_shadow")
    TS.clear_tombstones(path)
    _mark_built(path, "trigram")
    return path


def substring_search(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """EXACT substring search served by the trigram index: the
    needle's trigrams push as a static ``token IN (...)`` to the
    postings scan, a doc qualifies as a CANDIDATE only if it carries
    ALL of them (count == |trigrams| after the pruned scan), and the
    exact ``contains()`` verify runs on the candidates alone — the
    trigram prefilter is lossless, so the result is identical to a
    full-corpus LIKE scan (the oracle) at a fraction of the cost.
    Needles shorter than 3 normalized chars carry no trigram
    evidence and fall back to the direct scan, documented and
    plan-visible. Matching is over normalize_text (lower,
    whitespace-collapsed) on both sides — the needle goes through the
    shared :func:`normalize_needle` (r9: one helper, every probe
    literal — the ASCII-``\\s`` parity subtlety lives in ONE place).

    Pruned verify fetch (r12 — the kNN exact-re-rank lesson applied
    to text): without pruning, the candidate-verify semi-join scans
    the WHOLE ``docs`` frame (id + text ≈ the table's entire bytes)
    to check ≤candidates rows, so at 100 TB the "index probe"
    degenerates to a corpus scan. When ``docs`` is the streaming
    sinks' hash-partitioned layout, pass ``vpart_col``/
    ``n_table_parts`` and the verify reads ONLY the candidates'
    vpart directories (:func:`ann_index._pruned_rerank_base` — the
    candidates' partitions are collected as a bounded driver list,
    ≤ n_table_parts ints). The short-needle fallback cannot prune
    (no candidate evidence) and stays a direct scan by design.
    Scope-persists the candidate frame when pruning; callers release
    via ``dedup.release_scoped_caches``."""
    from etl_btc_spark.operators.ann_index import (
        _check_rerank_vparts,
        _pruned_rerank_base,
    )

    _check_rerank_vparts(docs, vpart_col, n_table_parts)
    norm_needle = normalize_needle(needle)
    norm = normalize_text(F.col(text_col))
    if len(norm_needle) < 3:
        # no trigram evidence — direct scan (still column-pruned)
        if vpart_col is not None:
            docs = docs.drop(vpart_col)
        return (
            docs.filter(F.contains(norm, F.lit(norm_needle)))
            .select(id_col)
            .orderBy(id_col)
        )
    _require_built(path, "trigram")
    grams = sorted(
        {norm_needle[i : i + 3] for i in range(len(norm_needle) - 2)}
    )
    cand = (
        TS.live_rows(
            spark,
            spark.read.parquet(os.path.join(path, "postings")).filter(
                F.col("token").isin(grams)
            ),
            path,
            id_col,
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") == len(grams))
        .select(id_col)
    )
    docs, cand = _pruned_rerank_base(
        docs, cand, id_col, vpart_col, n_table_parts, stats_out
    )
    return (
        docs.join(cand, id_col, "left_semi")
        .filter(F.contains(norm, F.lit(norm_needle)))
        .select(id_col)
        .orderBy(id_col)
    )
