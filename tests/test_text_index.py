"""Text-index (r8) pins: probe ≡ direct BM25 on arbitrary corpora,
plan shape (pushed token filter, no corpus shuffle in the probe), and
engine/oracle agreement for the direct scorer under fuzz."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_btc_spark.operators import text_index as TI
from etl_btc_spark.operators.textops import bm25_oracle_sql, bm25_scores

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_TERMS = ["join", "hash", "scan"]


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["join", "hash", "scan", "merge", "sort", "x", ""]),
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_bm25_direct_matches_duckdb_fuzz(spark, texts):
    """bm25_scores == its DuckDB oracle for arbitrary small corpora:
    repeated terms, docs with no query terms, empty docs — pins
    tokenizer, IDF form, length normalization, rounding, tie-break."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores(spark.createDataFrame(pdf), _TERMS, n=10).collect()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(map(tuple, con.execute(bm25_oracle_sql(_TERMS, n=10)).fetchall()))
    con.close()
    assert got == want


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["join", "hash", "scan", "merge", "sort", "y"]),
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_bm25_probe_equals_direct_fuzz(spark, texts, tmp_path_factory):
    """The persisted-index probe must return EXACTLY what the direct
    computation returns for any corpus — the build/probe split can
    never drift from the one-shot scorer (q99h/q99k share one oracle
    for the fixture; this pins it for arbitrary inputs)."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    direct = sorted(
        (r["doc_id"], r["bm25"]) for r in bm25_scores(df, _TERMS, n=10).collect()
    )
    path = str(tmp_path_factory.mktemp("ti") / "idx")
    TI.build_text_index(spark, df, path)
    probed = sorted(
        (r["doc_id"], r["bm25"])
        for r in TI.bm25_probe(spark, path, _TERMS, n=10).collect()
    )
    assert probed == direct


def test_bm25_probe_plan_pruned_no_shuffle(spark, tmp_path):
    """q99k plan pin: the probe pushes token IN (...) to the postings
    scan, joins everything as broadcasts, and tops out with
    TakeOrdered — ZERO Exchange, so at 100 TB the per-query cost is
    the pruned postings scan, never a corpus shuffle."""
    import contextlib
    import io
    import re

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": ["join hash scan merge sort row batch %d" % i for i in range(40)],
        }
    )
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, spark.createDataFrame(pdf), path)
    out = TI.bm25_probe(spark, path, _TERMS, n=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert re.search(r"PushedFilters: \[.*In\(token", p), p
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange hashpartitioning" not in p, p
    # r9: dl rides on the posting rows — NO scan of the corpus-sized
    # doclen table may appear in any probe plan (at 100 TB that join
    # was a full per-query corpus pass)
    assert "doclen" not in p, p


def test_text_index_probe_requires_built(spark, tmp_path):
    """A missing/stale marker refuses the probe (the crash-sweep's
    complete-or-refused contract, checked directly)."""
    with pytest.raises(ValueError, match="no complete"):
        TI.bm25_probe(spark, str(tmp_path / "nope"), _TERMS)


def test_term_lookup_pruned(spark, tmp_path):
    """term_lookup returns exactly the postings of the requested
    terms with true term frequencies."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["join join hash", "merge", "hash Join"],
        }
    )
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, spark.createDataFrame(pdf), path)
    got = {
        (r["token"], r["doc_id"]): r["tf"]
        for r in TI.term_lookup(spark, path, ["join", "hash"]).collect()
    }
    # normalize_text lowercases: doc 2's "Join" counts as join
    assert got == {("join", 0): 2, ("hash", 0): 1, ("hash", 2): 1, ("join", 2): 1}


def test_text_index_append_equals_rebuild(spark, tmp_path):
    """append ≡ rebuild bit-for-bit: BM25 reads tf/df/dl and the
    exact-integer stats row, all of which the insert-only append
    updates exactly — same maintenance guarantee the LSH family
    pins. Also: duplicate batch ids are refused (stale postings
    would double-count terms)."""
    base = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": ["join hash scan %d" % (i % 5) for i in range(30)],
        }
    )
    batch = pd.DataFrame(
        {
            "doc_id": range(100, 110),
            "text": ["merge join sort %d" % i for i in range(10)],
        }
    )
    appended = str(tmp_path / "app")
    TI.build_text_index(spark, spark.createDataFrame(base), appended)
    TI.append_text_index(spark, spark.createDataFrame(batch), appended)
    rebuilt = str(tmp_path / "reb")
    TI.build_text_index(
        spark, spark.createDataFrame(pd.concat([base, batch])), rebuilt
    )
    for terms in (["join"], ["merge", "scan"], ["sort", "hash", "join"]):
        a = [tuple(r) for r in TI.bm25_probe(spark, appended, terms, n=50).collect()]
        b = [tuple(r) for r in TI.bm25_probe(spark, rebuilt, terms, n=50).collect()]
        assert a == b, terms
    # exact-integer stats merged correctly
    sa = spark.read.parquet(appended + "/stats").collect()[0]
    sb = spark.read.parquet(rebuilt + "/stats").collect()[0]
    assert (sa["n_docs"], sa["total_dl"]) == (sb["n_docs"], sb["total_dl"])

    with pytest.raises(ValueError, match="insert-only"):
        TI.append_text_index(spark, spark.createDataFrame(batch), appended)


def test_doclen_registry_dpart_pruned_lookups(spark, tmp_path):
    """r11 (VERDICT r10 "What's missing" #3): the doclen registry is
    partitioned on dpart = pmod(xxhash64(id), m) so id-keyed
    maintenance lookups (append's duplicate check, upsert's overlap
    scan, the streaming sink's fresh anti-join — all via
    _pruned_doclen) read ONLY the batch ids' directories; a legacy
    flat registry (no _DPARTS meta) falls back to the full read."""
    import os

    base = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": ["join hash scan %d" % (i % 7) for i in range(200)],
        }
    )
    idx = str(tmp_path / "ti")
    TI.build_text_index(spark, spark.createDataFrame(base), idx, n_id_parts=8)
    assert TI._read_dparts(idx) == 8
    dirs = {
        d for d in os.listdir(os.path.join(idx, "doclen")) if d.startswith("dpart=")
    }
    assert len(dirs) == 8, dirs

    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [3, 17]}))
    touched = {
        r[0]
        for r in ids.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        ).collect()
    }
    pruned = TI._pruned_doclen(spark, idx, ids, "doc_id")
    files = [
        r[0]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files
    allowed = {"dpart=%d" % p for p in touched}
    forbidden = {"dpart=%d" % p for p in range(8)} - allowed
    assert forbidden, "fixture ids must not touch every dpart"
    for f in files:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f
    # the pruned read still yields exactly the ids' registry rows
    got = {
        (r["doc_id"], r["dl"])
        for r in pruned.join(ids, "doc_id", "semi").collect()
    }
    assert {d for d, _ in got} == {3, 17}

    # full lifecycle on the partitioned registry stays equivalent to
    # a rebuild over the final corpus (upsert + delete + compact all
    # read/write the dpart layout)
    upd = pd.DataFrame(
        {"doc_id": [3, 300], "text": ["merge join sort x", "merge scan y"]}
    )
    TI.upsert_text_index(spark, spark.createDataFrame(upd), idx)
    TI.delete_text_ids(
        spark, spark.createDataFrame(pd.DataFrame({"doc_id": [17]})), idx
    )
    TI.compact_text_index(spark, idx)
    final = pd.concat(
        [base[~base.doc_id.isin([3, 17])], upd]
    )
    reb = str(tmp_path / "reb")
    TI.build_text_index(spark, spark.createDataFrame(final), reb, n_id_parts=8)
    for terms in (["join"], ["merge", "scan"]):
        a = [tuple(r) for r in TI.bm25_probe(spark, idx, terms, n=50).collect()]
        b = [tuple(r) for r in TI.bm25_probe(spark, reb, terms, n=50).collect()]
        assert a == b, terms

    # legacy flat registry: no meta -> unpruned full read, same rows
    flat = str(tmp_path / "flat")
    TI.build_text_index(spark, spark.createDataFrame(base), flat)
    os.remove(os.path.join(flat, TI._DPARTS_FILE))
    legacy = TI._pruned_doclen(spark, flat, ids, "doc_id")
    assert legacy.count() == 200


def test_bm25_join_single_query_equals_probe(spark, tmp_path):
    """A 1-query bm25_join batch returns EXACTLY the single-probe
    answer (corpus-wide dfs, same scoring, same tie-break), and the
    vocabulary guard refuses an oversized term batch."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(25),
            "text": ["join hash scan merge %d extra words here" % (i % 7) for i in range(25)],
        }
    )
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, spark.createDataFrame(pdf), path)
    probe = [
        (r["doc_id"], r["bm25"])
        for r in TI.bm25_probe(spark, path, ["join", "merge"], n=8).collect()
    ]
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": [7], "terms": [["join", "merge"]]})
    )
    joined = [
        (r["doc_id"], r["bm25"])
        for r in TI.bm25_join(spark, path, qdf, n=8)
        .orderBy("rank")
        .collect()
    ]
    assert joined == probe

    with pytest.raises(ValueError, match="distinct terms"):
        TI.bm25_join(spark, path, qdf, n=8, max_distinct_terms=1)


def test_text_index_empty_corpus_then_append(spark, tmp_path):
    """An empty corpus builds a valid (empty) index with exact-zero
    stats — sum over nothing is NULL without the coalesce, and a NULL
    total_dl would crash the first append's integer merge. The first
    real batch then appends cleanly and probes correctly."""
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, empty, path)
    s = spark.read.parquet(path + "/stats").collect()[0]
    assert (s["n_docs"], s["total_dl"]) == (0, 0)
    assert TI.bm25_probe(spark, path, ["join"], n=5).count() == 0

    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["join hash", "join"]})
    )
    TI.append_text_index(spark, batch, path)
    got = [(r["doc_id"], r["bm25"]) for r in TI.bm25_probe(spark, path, ["join"], n=5).collect()]
    assert [d for d, _ in got] == [2, 1]  # shorter doc ranks first


def test_query_term_normalization_consistent(spark, tmp_path):
    """Review r8: every entry point lowercases query terms through the
    ONE shared normalize_query_terms — a mixed-case term must return
    identical results from the direct scorer, the single probe, the
    batched join, and term_lookup (it used to match in bm25_join but
    silently return nothing from bm25_probe)."""
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["join hash", "join join", "hash"]}
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, df, path)
    mixed = ["Join", "HASH"]
    lower = ["join", "hash"]
    direct_m = sorted(map(tuple, bm25_scores(df, mixed, n=5).collect()))
    direct_l = sorted(map(tuple, bm25_scores(df, lower, n=5).collect()))
    assert direct_m == direct_l and direct_m
    probe_m = sorted(map(tuple, TI.bm25_probe(spark, path, mixed, n=5).collect()))
    assert probe_m == direct_l
    qdf = spark.createDataFrame(pd.DataFrame({"query_id": [1], "terms": [mixed]}))
    join_m = sorted(
        (r["doc_id"], r["bm25"])
        for r in TI.bm25_join(spark, path, qdf, n=5).collect()
    )
    assert join_m == [(d, s) for d, s in sorted((r[0], r[1]) for r in direct_l)]
    assert TI.term_lookup(spark, path, ["JOIN"]).count() == 2


def test_stats_swap_debris_recovery(spark, tmp_path):
    """Review r8: a crash inside the append's stats swap stranded
    .stats_* dirs forever. The recovery pass restores a retired stats
    dir when the live one is missing and discards all debris on the
    next build/append."""
    import os

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["join hash", "join"]})
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, spark.createDataFrame(pdf), path)

    # simulate the crash window: stats renamed away, shadow present,
    # marker down (the append removes it before mutating)
    os.rename(os.path.join(path, "stats"), os.path.join(path, ".stats_old_ab"))
    os.makedirs(os.path.join(path, ".stats_cd"))
    os.remove(os.path.join(path, "_BUILT"))

    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": ["hash hash"]})
    )
    # ensure-path recovery: rebuild over the dir heals layout + debris
    TI.ensure_text_index(
        spark, spark.createDataFrame(pdf).union(batch), path
    )
    assert not [d for d in os.listdir(path) if d.startswith(".stats_")]
    s = spark.read.parquet(path + "/stats").collect()[0]
    assert s["n_docs"] == 3
    assert TI.bm25_probe(spark, path, ["hash"], n=5).count() == 2


@given(
    texts=st.lists(
        st.text(alphabet="abch ", min_size=0, max_size=12), min_size=1, max_size=6
    ),
    needle=st.text(alphabet="abch ", min_size=1, max_size=6),
)
@settings(**_SETTINGS)
def test_substring_search_equals_direct_scan_fuzz(spark, texts, needle, tmp_path_factory):
    """The trigram prefilter is LOSSLESS: index-served substring
    search must equal the direct contains() scan for arbitrary
    corpora and needles — including needles under 3 chars (fallback
    path), absent needles, whitespace-heavy needles, and docs shorter
    than the trigram width."""
    import re

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("tg") / "idx")
    TI.build_trigram_index(spark, df, path)
    got = [r["doc_id"] for r in TI.substring_search(spark, path, df, needle).collect()]
    norm_needle = re.sub(r"\s+", " ", needle.strip().lower())
    want = sorted(
        i
        for i, t in enumerate(texts)
        if norm_needle in re.sub(r"\s+", " ", t.strip().lower())
    )
    assert got == want


def test_substring_search_plan_pruned(spark, tmp_path):
    """The candidate pass pushes the needle's trigrams to the
    postings scan (row-group pruning) — never a full postings read."""
    import contextlib
    import io
    import re

    pdf = pd.DataFrame(
        {"doc_id": range(30), "text": ["hash join plan %d" % i for i in range(30)]}
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "idx")
    TI.build_trigram_index(spark, df, path)
    out = TI.substring_search(spark, path, df, "hash join")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert re.search(r"PushedFilters: \[.*In\(token", p), p
    assert [r["doc_id"] for r in out.collect()] == list(range(30))


def test_trigram_family_marker_and_unicode_needle(spark, tmp_path):
    """Review r8 follow-ups: (1) a TOKEN index probed as a trigram
    index must REFUSE (structurally identical postings, silently-
    wrong results otherwise — the marker family exists for this);
    (2) needle normalization uses the ASCII whitespace class Java's
    \\s matches, so a non-breaking space inside the needle is NOT
    collapsed — index-served results agree with the raw scan on
    unicode-whitespace content in both directions."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["hash join stays", "hash join collapses"],
        }
    )
    df = spark.createDataFrame(pdf)

    token_path = str(tmp_path / "tok")
    TI.build_text_index(spark, df, token_path)
    with pytest.raises(ValueError, match="no complete trigram"):
        TI.substring_search(spark, token_path, df, "hash join")

    tri_path = str(tmp_path / "tri")
    TI.build_trigram_index(spark, df, tri_path)
    # NBSP needle matches only the NBSP doc; ASCII needle only the other
    assert [r["doc_id"] for r in TI.substring_search(spark, tri_path, df, "hash join").collect()] == [0]
    assert [r["doc_id"] for r in TI.substring_search(spark, tri_path, df, "hash join").collect()] == [1]


# ---------------------------------------------------------------------------
# r9: positional phrase search + trigram append/upsert
# ---------------------------------------------------------------------------


def _phrase_direct(spark, docs, phrase):
    """Token-boundary full-scan reference: the q99q oracle's shape."""
    from etl_btc_spark.operators.textops import normalize_text

    norm = F.concat(F.lit(" "), normalize_text(F.col("text")), F.lit(" "))
    needle = " " + TI.normalize_needle(phrase) + " "
    return sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(norm, F.lit(needle))).select("doc_id").collect()
    )


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["join", "hash", "scan", "merge", "join", ""]),
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    phrase=st.lists(
        st.sampled_from(["join", "hash", "scan", "merge"]), min_size=1, max_size=3
    ).map(" ".join),
)
@settings(**_SETTINGS)
def test_phrase_probe_equals_direct_scan_fuzz(spark, texts, phrase, tmp_path_factory):
    """phrase_probe (positional index) ≡ the full-scan token-boundary
    contains — including REPEATED phrase terms ('join join'), phrases
    longer than some docs, and docs of empty tokens."""
    tmp = tmp_path_factory.mktemp("phr")
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    path = str(tmp / "idx")
    TI.build_text_index(spark, docs, path)
    got = [r["doc_id"] for r in TI.phrase_probe(spark, path, phrase).collect()]
    assert got == _phrase_direct(spark, docs, phrase)


def test_phrase_probe_edges(spark, tmp_path):
    """Duplicate-term adjacency, case/whitespace normalization of the
    phrase, 1-term degenerate, empty phrase, and no-match phrases."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "join join hash",          # matches "join join", "join hash"? no—join hash not adjacent? yes: tokens [join,join,hash]: "join hash" at 1
                "join hash join join",
                "hash",
                "  Join\tJOIN  hash ",     # normalizes to "join join hash"
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    path = str(tmp_path / "idx")
    TI.build_text_index(spark, docs, path)

    def probe(p):
        return [r["doc_id"] for r in TI.phrase_probe(spark, path, p).collect()]

    assert probe("join join") == [0, 1, 3]
    assert probe("  Join   JOIN ") == [0, 1, 3]  # shared needle normalization
    assert probe("join hash") == [0, 1, 3]
    assert probe("join join hash") == [0, 3]
    assert probe("hash join join") == [1]
    assert probe("hash") == [0, 1, 2, 3]
    assert probe("") == []
    assert probe("merge sort") == []


def test_trigram_append_equals_rebuild_and_upsert(spark, tmp_path):
    """r9 (VERDICT r8 #3): trigram append ≡ rebuild for every probe;
    duplicate ids refused on append; upsert supersedes via the shared
    sidecar; compaction folds."""
    from etl_btc_spark.operators import tombstones as TS

    base = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": ["alpha bravo charlie %d" % (i % 4) for i in range(20)],
        }
    )
    batch = pd.DataFrame(
        {"doc_id": range(100, 106), "text": ["delta echo foxtrot %d" % i for i in range(6)]}
    )
    appended = str(tmp_path / "app")
    TI.build_trigram_index(spark, spark.createDataFrame(base), appended)
    TI.append_trigram_index(spark, spark.createDataFrame(batch), appended)
    rebuilt = str(tmp_path / "reb")
    all_docs = spark.createDataFrame(pd.concat([base, batch]))
    TI.build_trigram_index(spark, all_docs, rebuilt)

    def search(p, needle, frame=None):
        return [
            r["doc_id"]
            for r in TI.substring_search(
                spark, p, frame if frame is not None else all_docs, needle
            ).collect()
        ]

    for needle in ("bravo", "echo fox", "charlie 1", "zzz"):
        assert search(appended, needle) == search(rebuilt, needle), needle

    with pytest.raises(ValueError, match="insert-only"):
        TI.append_trigram_index(spark, spark.createDataFrame(batch), appended)

    # upsert: doc 100's text changes entirely — old grams dead
    newb = pd.DataFrame({"doc_id": [100], "text": ["golf hotel india"]})
    TI.upsert_trigram_index(spark, spark.createDataFrame(newb), appended)
    assert TS.has_tombstones(appended)
    updated = spark.createDataFrame(
        pd.concat([base, batch[batch.doc_id != 100], newb])
    )
    assert search(appended, "golf hot", updated) == [100]
    # substring_search verifies against the docs frame, so the old
    # text can't match even pre-verify; the INDEX-side death is what
    # matters: candidates for the old text exclude 100
    cand_probe = TI.substring_search(spark, appended, updated, "delta echo")
    assert 100 not in {r["doc_id"] for r in cand_probe.collect()}

    TI.compact_trigram_index(spark, appended)
    assert not TS.has_tombstones(appended)
    assert search(appended, "golf hot", updated) == [100]


def test_substring_search_prunes_verify_to_candidate_vparts(spark, tmp_path):
    """r12 (the kNN exact-re-rank lesson applied to the trigram
    probe): when the docs frame is the streaming sinks'
    vpart-partitioned layout, the candidate-verify semi-join must
    read ONLY the candidates' vpart directories (inputFiles pin) and
    return the identical answer the unpruned probe does. n_parts
    exceeds the candidate count, so touched < n_parts
    deterministically — the pin proves files were genuinely
    skipped."""
    from etl_btc_spark.operators import dedup as DD

    n_parts = 64
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [
                "hash join plan %d" % i if i % 40 == 0 else "merge sort %d" % i
                for i in range(200)
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    table = str(tmp_path / "docs_v")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    docs.withColumn("vpart", part).write.partitionBy("vpart").parquet(table)
    docs_v = spark.read.parquet(table)
    path = str(tmp_path / "idx")
    TI.build_trigram_index(spark, docs, path)

    stats: dict = {}
    pruned = [
        r["doc_id"]
        for r in TI.substring_search(
            spark, path, docs_v, "hash join",
            vpart_col="vpart", n_table_parts=n_parts, stats_out=stats,
        ).collect()
    ]
    flat = [
        r["doc_id"]
        for r in TI.substring_search(spark, path, docs, "hash join").collect()
    ]
    assert pruned == flat == [0, 40, 80, 120, 160]
    assert 0 < len(stats["pruned_vparts"]) < n_parts
    allowed = {"vpart=%d" % v for v in stats["pruned_vparts"]}
    forbidden = {"vpart=%d" % v for v in range(n_parts)} - allowed
    assert stats["rerank_scanned_files"]
    for f in stats["rerank_scanned_files"]:
        assert any(("/%s/" % a) in f for a in allowed), f
        assert not any(("/%s/" % b) in f for b in forbidden), f
    DD.release_scoped_caches()

    # misuse refuses before any query-side work
    with pytest.raises(ValueError, match="n_table_parts"):
        TI.substring_search(spark, path, docs_v, "hash join", vpart_col="vpart")
    with pytest.raises(ValueError, match="columns"):
        TI.substring_search(
            spark, path, docs, "hash join",
            vpart_col="vpart", n_table_parts=n_parts,
        )
