"""Learned-merge BPE tokenizer family (r14 — operators/bpe.py): the
trained arm's determinism/prefix pins, encode equivalence against an
independent GPT-2-style min-rank reference, the artifact lifecycle,
and the misuse refusals the gate docstrings (q99au/q99av) cite."""

import os

import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import bpe as BP
from etl_btc_spark.tables import load_table

from conftest import SF_SMOKE


# --- independent reference: GPT-2 bpe() shape (min-rank iterate) ---


def _ref_encode(word, merges):
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    seq = list(word)
    while len(seq) >= 2:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(seq, seq[1:]))]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        best_rank = min(r for r, _ in pairs)
        left, right = merges[best_rank]
        # merge ALL occurrences of the min-rank pair, left-to-right
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


WORDS = [
    "the", "theory", "thermal", "ababab", "aaaa", "a", "", "xyz",
    "mississippi", "tht", "hth", "joinjoin", "scan", "batch",
]
MERGES = [
    ("t", "h"), ("th", "e"), ("a", "b"), ("ab", "ab"), ("a", "a"),
    ("i", "s"), ("is", "s"), ("i", "n"), ("j", "o"), ("jo", "in"),
]


def test_encode_matches_min_rank_reference():
    """One pass per rank == GPT-2 min-rank iteration for causally
    ordered merges (the equivalence the oracle relies on)."""
    for w in WORDS:
        assert BP.encode_word(w, MERGES) == _ref_encode(w, MERGES), w
    # and token boundaries reconstruct the word exactly
    for w in WORDS:
        assert "".join(BP.encode_word(w, MERGES)) == w


def test_train_determinism_and_prefix_property():
    wc = {"the": 50, "theory": 10, "then": 20, "batch": 30, "scan": 25,
          "than": 15, "that": 40, "cat": 5, "chat": 5}
    a = BP.train_bpe_merges(wc, 12)
    b = BP.train_bpe_merges(wc, 12)
    assert a == b and len(a) > 0
    longer = BP.train_bpe_merges(wc, 20)
    assert longer[: len(a)] == a  # greedy merges are prefix-stable
    BP._validate_merges(longer, "trained")  # causal by construction


def test_misuse_refusals():
    with pytest.raises(ValueError, match="causally"):
        BP._validate_merges([("th", "e")], "t")  # 'th' never produced
    with pytest.raises(ValueError, match="produce"):
        # (a,bc) and (ab,c) both -> 'abc'
        BP._validate_merges(
            [("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")], "t"
        )
    with pytest.raises(ValueError, match="whitespace"):
        BP._validate_merges([(" ", "a")], "t")
    with pytest.raises(ValueError, match="empty"):
        BP._validate_merges([("", "a")], "t")
    # oracle-envelope refusals (engine itself allows these)
    with pytest.raises(ValueError, match="classes"):
        BP.bpe_count_sql([("a", "1"), ("a1", "b")], "text")
    with pytest.raises(ValueError, match="placeholder"):
        # same-class pair (both punctuation) so the quote refusal —
        # not the r15 cross-class-pair refusal — is what fires
        BP.bpe_count_sql([("'", "-")], "text")


def test_vocab_lifecycle_roundtrip(spark, tmp_path):
    path = str(tmp_path / "vocab")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    BP.build_bpe_vocab(spark, docs, path, merges=MERGES)
    assert BP.load_bpe_merges(spark, path) == MERGES
    # crashed build: missing marker refuses
    os.remove(os.path.join(path, "_BUILT"))
    with pytest.raises(ValueError, match="_BUILT"):
        BP.load_bpe_merges(spark, path)
    # rebuild over the debris works (marker-first invalidation)
    BP.build_bpe_vocab(spark, docs, path, merges=MERGES)
    assert BP.load_bpe_merges(spark, path) == MERGES


def test_spark_encode_counts_and_passthrough(spark, tmp_path):
    path = str(tmp_path / "vocab")
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    )
    BP.build_bpe_vocab(spark, docs, path, merges=MERGES)
    enc = BP.bpe_encode(spark, docs, path).collect()
    assert len(enc) == docs.count()
    local = {
        r["doc_id"]: (r["lang"], r["text"]) for r in docs.collect()
    }
    for r in enc:
        lang, text = local[r["doc_id"]]
        assert r["lang"] == lang  # pass-through column survives
        want = []
        for w in BP.pretokenize(text):
            want.extend(BP.encode_word(w, MERGES))
        assert r["bpe_tokens"] == want
        assert r["n_bpe_tokens"] == len(want)
    # count-only twin agrees with the full encode
    cnt = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in BP.bpe_token_count(spark, docs, path).collect()
    }
    assert cnt == {r["doc_id"]: r["n_bpe_tokens"] for r in enc}


def test_trained_arm_through_spark(spark, tmp_path):
    """merges=None trains distributed (explode + groupBy + bounded
    TakeOrdered) — must equal the local greedy trainer on the same
    word-frequency table."""
    path = str(tmp_path / "trained")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    BP.build_bpe_vocab(spark, docs, path, n_merges=16)
    got = BP.load_bpe_merges(spark, path)
    wc: dict[str, int] = {}
    for r in docs.collect():
        for w in BP.pretokenize(r["text"]):
            wc[w] = wc.get(w, 0) + 1
    assert got == BP.train_bpe_merges(wc, 16)
    assert len(got) == 16


def test_token_ids_and_decode_roundtrip(spark, tmp_path):
    """r14 token-id layer: id assignment (codepoint | 256+rank | UNK),
    bpe_encode_ids ≡ local encode, decode_ids inverts the stream."""
    path = str(tmp_path / "vocab")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    BP.build_bpe_vocab(spark, docs, path, merges=MERGES)
    id_map = BP.token_id_map(MERGES)
    unk = BP.unk_id(MERGES)
    assert id_map["th"] == 256 and unk == 256 + len(MERGES)
    got = {r["doc_id"]: r for r in BP.bpe_encode_ids(spark, docs, path).collect()}
    for r in docs.collect():
        want = [
            i
            for w in BP.pretokenize(r["text"])
            for i in BP.encode_word_ids(w, MERGES, id_map, unk)
        ]
        assert got[r["doc_id"]]["bpe_ids"] == want
        assert got[r["doc_id"]]["n_bpe_tokens"] == len(want)
        # ids decode back to the document's non-whitespace chars
        assert BP.decode_ids(want, MERGES) == "".join(BP.pretokenize(r["text"]))
    # UNK + non-Latin-1: é (U+00E9, Latin-1) keeps its codepoint,
    # 中 (U+4E2D) maps to UNK and decodes to U+FFFD
    ids = BP.encode_word_ids("héllo中", MERGES, id_map, unk)
    assert 0xE9 in ids and ids.count(unk) == 1
    ids2 = BP.encode_word_ids("中", MERGES, id_map, unk)
    assert ids2 == [unk] and BP.decode_ids(ids2, MERGES) == "�"


def test_materialize_packs_consistent_with_assignments(spark, tmp_path):
    """r14: the materialized packs agree with token_packing's
    assignment contract — token conservation, stream order, full
    packs everywhere but shard tails, and each doc's first token
    landing exactly at its assigned (pack_id, pack_offset)."""
    from etl_btc_spark.operators import sampling as SP

    path = str(tmp_path / "vocab")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    BP.build_bpe_vocab(spark, docs, path, merges=MERGES)
    enc = BP.bpe_encode_ids(spark, docs, path).select("doc_id", "bpe_ids")
    budget, dps = 256, 32
    packs = {
        (r["shard"], r["pack_id"]): r
        for r in SP.materialize_packs(
            enc, budget=budget, ids_col="bpe_ids", docs_per_shard=dps
        ).collect()
    }
    rows = enc.collect()
    assert sum(r["n_tokens"] for r in packs.values()) == sum(
        len(r["bpe_ids"]) for r in rows
    )
    # reconstruct each shard's stream locally and compare pack by pack
    from collections import defaultdict

    stream = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        stream[r["doc_id"] // dps].extend(r["bpe_ids"])
    want = {}
    for sh, ids in stream.items():
        for p in range(0, (len(ids) + budget - 1) // budget):
            want[(sh, p)] = ids[p * budget : (p + 1) * budget]
    assert set(packs) == set(want)
    for key, ids in want.items():
        assert packs[key]["pack_ids"] == ids
        assert packs[key]["n_tokens"] == len(ids)
        # only a shard's last pack may be short
        if key[1] < max(p for s, p in want if s == key[0]):
            assert packs[key]["n_tokens"] == budget
    # assignment agreement: each doc STARTS at its token_packing slot
    asg = SP.token_packing(
        enc.selectExpr("doc_id", "size(bpe_ids) AS n"),
        budget=budget,
        docs_per_shard=dps,
        tokens_col="n",
    ).collect()
    pos_in_shard = defaultdict(int)
    doc_first = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        sh = r["doc_id"] // dps
        doc_first[r["doc_id"]] = pos_in_shard[sh]
        pos_in_shard[sh] += len(r["bpe_ids"])
    for a in asg:
        pos = doc_first[a["doc_id"]]
        assert a["pack_id"] == pos // budget
        assert a["pack_offset"] == pos % budget


def test_extend_equals_single_build(spark, tmp_path):
    """r14 vocab append posture: trained extend resumes greedy
    training from the replayed segmentation state, so build(N) then
    extend(M) equals one build(N+M) — merge-table identity; warm
    extend validates causality against existing outputs."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a = str(tmp_path / "two_step")
    b = str(tmp_path / "one_shot")
    BP.build_bpe_vocab(spark, docs, a, n_merges=10)
    BP.extend_bpe_vocab(spark, docs, a, n_more=8)
    BP.build_bpe_vocab(spark, docs, b, n_merges=18)
    assert BP.load_bpe_merges(spark, a) == BP.load_bpe_merges(spark, b)
    # warm extend: a merge using an output that only exists AFTER the
    # existing list is legal; one using a never-produced token refuses
    w = str(tmp_path / "warm")
    BP.build_bpe_vocab(spark, docs, w, merges=[("t", "h")])
    BP.extend_bpe_vocab(spark, docs, w, merges=[("th", "e")])
    assert BP.load_bpe_merges(spark, w) == [("t", "h"), ("th", "e")]
    with pytest.raises(ValueError, match="causally"):
        BP.extend_bpe_vocab(spark, docs, w, merges=[("ab", "c")])
    # extend on a missing/crashed artifact refuses via the marker
    with pytest.raises(ValueError, match="_BUILT"):
        BP.extend_bpe_vocab(spark, docs, str(tmp_path / "none"), n_more=2)


# --- r15: byte-level base alphabet (VERDICT r14 #1) ---


def _u8(s):
    return s.encode("utf-8").decode("latin-1")


BYTE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"),
    ("\xd0", "\xbf"), ("\xd1", "\x80"), (_u8("п"), _u8("р")),   # п р пр
    ("\xe6", "\x97"), ("\xe6\x97", "\xa5"),                     # 日
    ("\xf0", "\x9f"), ("\xf0\x9f", "\x99"), ("\xf0\x9f\x99", "\x82"),  # 🙂
]

MULTILINGUAL = [
    "привет мир the",
    "日本語テスト in the 日",
    "naïve café résumé",
    "🙂👍 mixed эmoji 中文",
    "",
    "   \t\n  ",
    "ascii only batch scan",
]


def _byte_ids(text, merges):
    id_map = BP.token_id_map(merges)
    unk = BP.unk_id(merges)
    return [
        i
        for w in BP.pretokenize(text)
        for i in BP.encode_word_ids(
            BP.word_to_byte_symbols(w), merges, id_map, unk
        )
    ]


def test_byte_level_ids_total_no_unk_and_lossless():
    """Byte mode is TOTAL: every unicode string encodes with ids in
    [0, 256+n_merges) — the UNK id is structurally unreachable — and
    decode_ids inverts losslessly (whitespace between pre-tokens is
    the only thing BPE ever discards)."""
    unk = BP.unk_id(BYTE_MERGES)
    for t in MULTILINGUAL:
        ids = _byte_ids(t, BYTE_MERGES)
        assert all(0 <= i < unk for i in ids), t
        assert BP.decode_ids(ids, BYTE_MERGES, byte_level=True) == "".join(
            BP.pretokenize(t)
        ), t


def test_byte_level_ids_property_hypothesis():
    """Property pin over arbitrary unicode text (hypothesis): no id
    ever reaches the UNK slot and the decode round-trip holds —
    including astral-plane chars the char-level layer UNK'd."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def check(t):
        ids = _byte_ids(t, BYTE_MERGES)
        assert all(0 <= i < BP.unk_id(BYTE_MERGES) for i in ids)
        assert BP.decode_ids(ids, BYTE_MERGES, byte_level=True) == "".join(
            BP.pretokenize(t)
        )

    check()


def test_byte_level_oracle_matches_engine_duckdb():
    """Engine ids == DuckDB replace-chain oracle over the byte-symbol
    string for 2-/3-/4-byte chars, merged and unmerged — the exact
    comparison the q99bh gate runs at scale."""
    import duckdb

    con = duckdb.connect()
    csv_sql = BP.bpe_ids_csv_sql(BYTE_MERGES, "txt", byte_level=True)
    cnt_sql = BP.bpe_count_sql(BYTE_MERGES, "txt", byte_level=True)
    for t in MULTILINGUAL + [None]:
        got = con.execute(
            f"SELECT {csv_sql}, {cnt_sql} FROM (SELECT ?::VARCHAR AS txt)",
            [t],
        ).fetchone()
        ids = _byte_ids(t or "", BYTE_MERGES)
        assert got[0] == ",".join(map(str, ids)), t
        assert got[1] == len(ids), t


def test_byte_level_spark_lifecycle_and_trained_extend(spark, tmp_path):
    """Artifact persists the byte_level flag; Spark encode matches the
    local path on multilingual text; trained build→extend identity
    holds in byte mode; extend INHERITS the flag."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    aug = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" привет 日本 🙂")).alias("text"),
    )
    path = str(tmp_path / "bytevocab")
    BP.build_bpe_vocab(spark, aug, path, merges=BYTE_MERGES, byte_level=True)
    assert BP.vocab_is_byte_level(path)
    got = {
        r["doc_id"]: r for r in BP.bpe_encode_ids(spark, aug, path).collect()
    }
    for r in aug.collect():
        want = _byte_ids(r["text"], BYTE_MERGES)
        assert got[r["doc_id"]]["bpe_ids"] == want
        assert got[r["doc_id"]]["n_bpe_tokens"] == len(want)
    # trained byte-mode arm: two-step == one-shot, flag inherited
    a, b = str(tmp_path / "two"), str(tmp_path / "one")
    BP.build_bpe_vocab(spark, aug, a, n_merges=8, byte_level=True)
    BP.extend_bpe_vocab(spark, aug, a, n_more=6)
    BP.build_bpe_vocab(spark, aug, b, n_merges=14, byte_level=True)
    assert BP.load_bpe_merges(spark, a) == BP.load_bpe_merges(spark, b)
    assert BP.vocab_is_byte_level(a)
    # a char-level artifact reads back as char-level (back-compat)
    c = str(tmp_path / "charvocab")
    BP.build_bpe_vocab(spark, docs, c, merges=MERGES)
    assert not BP.vocab_is_byte_level(c)


def test_byte_level_refusals():
    """Byte-mode merges over raw unicode chars refuse (they can never
    arise from byte segmentations); cross-class PAIRS refuse in the
    SQL oracle (whole-string replace would merge across an
    alpha-run/other-run boundary the engine never crosses)."""
    with pytest.raises(ValueError, match="non-byte symbol"):
        BP._validate_merges([("п", "р")], "t", byte_level=True)
    with pytest.raises(ValueError, match="mixes character"):
        BP.bpe_count_sql([("t", "h"), ("th", "\xd0")], "txt", byte_level=True)


def test_trainer_vocab_scale_smoke():
    """r15 incremental pair-count trainer (VERDICT r14 #6): a
    production-sized vocab (2k merges over a 40k-word table) trains
    in seconds, not hours — the old full re-scan was O(n_merges x
    total segmentation length). Correctness vs the re-scan is pinned
    by the determinism/prefix/extend tests; this pins the WALL."""
    import random
    import time

    rng = random.Random(7)
    wc = {}
    for _ in range(40_000):
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(3, 14))
        )
        wc[w] = wc.get(w, 0) + rng.randint(1, 50)
    t0 = time.time()
    merges = BP.train_bpe_merges(wc, 2_000)
    dt = time.time() - t0
    assert len(merges) == 2_000
    assert dt < 60, f"vocab-scale training took {dt:.1f}s"
    # the learned list is a valid causal, collision-free merge table
    BP._validate_merges(merges, "vocab_scale")


def test_sql_oracle_refuses_past_pua_envelope():
    """r15 ADVICE: placeholder chars chr(0xE000+rank) spill past the
    6400-slot PUA block into real CJK-compat codepoints where the
    corpus-collision check no longer protects — the SQL generators
    must refuse such lists (the ENGINE itself keeps supporting them;
    the 32k trainer makes this reachable)."""
    merges = [("a", "b")]
    for _ in range(6400):
        prev = merges[-1]
        merges.append((prev[0] + prev[1], "b"))
    assert len(merges) == 6401
    with pytest.raises(ValueError, match="6400"):
        BP.bpe_count_sql(merges, "text")
    with pytest.raises(ValueError, match="6400"):
        BP.bpe_ids_list_sql(merges, "text")
    # the engine is unaffected: encoding with the same list still works
    assert BP.encode_word("abb", merges) == ["abb"]
