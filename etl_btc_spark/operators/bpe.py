"""Learned-merge BPE subword tokenizer family (r14 — VERDICT r13 #1).

Training-data pipelines budget, pack and bill in the model
tokenizer's tokens; the engine's token economy previously ran on
whitespace tokens plus a regex "BPE-ish" count (textops.py:54,71),
which drifts 2-3x from real subword budgets. This module adds a real
byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public), built like
the index families:

- :func:`build_bpe_vocab` — TRAINED arm learns merges from the
  corpus with the classic greedy most-frequent-pair algorithm under
  deterministic tie-breaks (count desc, then lexicographically
  smallest pair). The word-frequency table is computed DISTRIBUTED
  (explode + groupBy + bounded TakeOrdered), so the driver holds only
  the top-``max_vocab_words`` (word, count) rows — never corpus text;
  the merge loop itself is driver-side python over that bounded
  table, the codebook-training posture. WARM-START arm accepts an
  explicit merge list — the oracle-able arm, mirroring the index
  families' warm centroids. Either way the merge table persists as a
  parquet artifact (rank, left, right) + ``_BUILT`` marker, loaded
  once per job and broadcast to executors inside the UDF closure.
- :func:`extend_bpe_vocab` — append-posture maintenance: continue
  the merge list past the persisted ranks (trained extend resumes
  from the replayed segmentation state, so build(N)+extend(M) ==
  build(N+M); existing token ids and packed batches stay valid).
- :func:`bpe_encode` / :func:`bpe_token_count` /
  :func:`bpe_encode_ids` — mapInPandas encode over the broadcast
  merge list (one Arrow crossing, per-worker unique-word cache; the
  corpus never shuffles); the ids variant emits the GPT-2-style
  int stream (codepoint | 256+rank | UNK) that
  :func:`sampling.materialize_packs` cuts into training batches,
  and :func:`decode_ids` inverts.
- :func:`bpe_count_sql` / :func:`bpe_ids_list_sql` — generate the
  DuckDB oracle expressions for a FIXED merge list, see below
  (gates q99au/q99av/q99ax/q99ay).

ENCODING SEMANTICS (shared verbatim with the SQL oracle):
pre-tokenize with :data:`PRETOKEN_RE` (alpha runs | digit runs |
other-non-ws runs; the whitespace set is exactly RE2's ``\\s`` =
``[ \\t\\n\\f\\r]`` so both engines agree); within each pre-token,
start from single characters and apply merges in rank order, ONE
left-to-right non-overlapping pass each. One pass per rank is
equivalent to the min-rank-iterate formulation (GPT-2 ``bpe()``):
merging a pair only creates adjacencies involving the NEW token, and
causal ordering (every merge's parts are single chars or outputs of
EARLIER merges — enforced at build) means rank i's pair can never
reappear after pass i. A left-to-right merge pass is exactly string
``replace()`` semantics, which is what makes the warm arm
SQL-expressible: the oracle applies the same merges as nested
``replace()`` calls over single-char placeholder symbols (Unicode
private-use area) and counts surviving non-whitespace symbols.

Tokens are identified BY STRING VALUE (the standard implementation
choice); the build refuses merge lists where two ranks would produce
the same output string, keeping the by-value engine and the by-rank
oracle in exact agreement.

BYTE-LEVEL MODE (r15 — VERDICT r14 #1): the char-level id layer UNKs
every codepoint >= 256, so multilingual corpora degrade to UNK
streams and cannot be budgeted/packed faithfully. Real GPT-2/tiktoken
tokenizers are byte-level over UTF-8 for exactly this reason (no UNK
ever exists). ``build_bpe_vocab(byte_level=True)`` switches the whole
family: each pre-token is mapped to its UTF-8 bytes viewed as a
Latin-1 string (byte b <-> chr(b), a bijection — every byte IS a
Latin-1 char), merges operate over those byte symbols, and ids are
base 0-255 = byte value, 256+rank = merge output — total, no UNK.
EVERYTHING else transplants verbatim, because a byte symbol is just a
char with ord < 256: the merge pass, the trainer, the per-worker
cache, and — the payoff — the replace-chain SQL oracle, which simply
gains a front-end expression converting the column to its
UTF-8-bytes-as-Latin-1-chars form (pure codepoint arithmetic in SQL).
Pre-token boundaries are PRESERVED by the byte mapping: ASCII bytes
map to themselves (same regex class) and every byte of a multi-byte
char is >= 0x80 (class "other"), matching the original char's class —
so pretokenize(bytes(text)) == bytes(pretokenize(text)) per segment
and the whole-string replace() argument carries over unchanged.
``decode_ids(byte_level=True)`` inverts via Latin-1 -> UTF-8.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark._pickle import ensure_serializable

#: whitespace = RE2's ``\s`` exactly, so Spark/Python/DuckDB agree on
#: what separates pre-tokens (Java's \s adds \x0B — never use bare \s)
WS_CHARS = " \t\n\f\r"
WS_CLASS = "[ \t\n\f\r]"
#: pre-tokenizer: alpha runs | digit runs | other-non-ws runs.
#: Maximal-munch runs mean two same-class pre-tokens are never
#: adjacent, so a class-pure merge can never span a boundary — the
#: property the whole-string replace() oracle relies on.
PRETOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9%s]+" % WS_CHARS

_PRETOKEN_CRE = re.compile(PRETOKEN_RE)

_FORMAT = "bpe-merges-v1"


def _char_class(ch: str) -> int:
    if ch.isascii() and ch.isalpha():
        return 0
    if ch.isascii() and ch.isdigit():
        return 1
    return 2


def pretokenize(text: str | None) -> list[str]:
    """Split text into pre-tokens; whitespace separates and is never
    a token. None behaves as empty text."""
    return _PRETOKEN_CRE.findall(text or "")


def word_to_byte_symbols(word: str) -> str:
    """UTF-8 bytes of ``word`` viewed as a Latin-1 string — the
    byte-level symbol alphabet (byte b <-> chr(b), bijective)."""
    return word.encode("utf-8").decode("latin-1")


def byte_symbols_to_text(symbols: str) -> str:
    """Inverse of :func:`word_to_byte_symbols`; invalid UTF-8 (ids
    cut mid-codepoint by a pack boundary) decodes to U+FFFD, the
    tiktoken/GPT-2 convention."""
    return symbols.encode("latin-1").decode("utf-8", errors="replace")


def _merge_pass(seq: list[str], left: str, right: str, out: str) -> list[str]:
    """One left-to-right non-overlapping merge pass — string
    ``replace()`` semantics over the token sequence."""
    res = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            res.append(out)
            i += 2
        else:
            res.append(seq[i])
            i += 1
    return res


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """BPE-encode one pre-token: chars, then each merge in rank order
    (one pass each — see the module docstring for why that equals the
    min-rank iteration)."""
    seq = list(word)
    for left, right in merges:
        if len(seq) < 2:
            break
        seq = _merge_pass(seq, left, right, left + right)
    return seq


def _validate_merges(
    merges: list[tuple[str, str]], where: str, byte_level: bool = False
) -> None:
    """Causality + by-value coherence: each part is a single char or
    an earlier output; no two ranks produce the same output string
    (by-value token identity would conflate them, and the by-rank
    placeholder oracle would not). Byte-level vocabularies
    additionally require every part char to BE a byte symbol
    (ord < 256) — a merge over raw unicode chars can never arise
    from byte segmentations."""
    produced: dict[str, int] = {}
    for rank, pair in enumerate(merges):
        if len(pair) != 2:
            raise ValueError(f"{where}: merge {rank} is not a (left, right) pair")
        left, right = pair
        for part in (left, right):
            if not isinstance(part, str) or not part:
                raise ValueError(f"{where}: merge {rank} has an empty/non-str part")
            if byte_level and any(ord(ch) >= 256 for ch in part):
                raise ValueError(
                    f"{where}: merge {rank} part {part!r} contains a "
                    "non-byte symbol (ord >= 256) — byte-level merges "
                    "operate over UTF-8 bytes as Latin-1 chars"
                )
            if len(part) > 1 and part not in produced:
                raise ValueError(
                    f"{where}: merge {rank} part {part!r} is neither a single "
                    "character nor the output of an earlier merge (merges "
                    "must be causally ordered)"
                )
            if any(ch in WS_CHARS for ch in part):
                raise ValueError(
                    f"{where}: merge {rank} part {part!r} contains whitespace "
                    "— whitespace separates pre-tokens and is never a token"
                )
        out = left + right
        if out in produced:
            # report the rank that actually produced the collision —
            # it can be a DIFFERENT pair (('a','bc') vs ('ab','c'))
            raise ValueError(
                f"{where}: merges {produced[out]} and {rank} both "
                f"produce {out!r} — by-value token identity requires distinct "
                "output strings"
            )
        produced[out] = rank


def train_bpe_merges(
    word_counts: dict[str, int],
    n_merges: int,
    min_pair_count: int = 2,
    initial: list[tuple[str, str]] | None = None,
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a (word -> count) table —
    deterministic: best pair by (count desc, left asc, right asc);
    stops early when the best surviving pair occurs fewer than
    ``min_pair_count`` times. Candidate pairs whose output string
    collides with an already-produced token value are skipped (see
    module docstring), as are cross-class pairs (impossible from
    segmentations, asserted for safety).

    ``initial`` continues training past an existing merge list (the
    :func:`extend_bpe_vocab` arm): segmentations replay the existing
    merges first, then ``n_merges`` NEW merges are learned. Returns
    only the new merges. Because greedy training is prefix-stable,
    train(N, initial=train(M)) == train(M+N)[M:] on the same table.

    INCREMENTAL pair-count maintenance (r15 — VERDICT r14 #6): the
    classic trainer optimization. Pair frequencies are counted ONCE;
    each merge then touches only the words that actually contain the
    merged pair (a pair→words occurrence index), applying count
    deltas and pushing updated entries onto a lazy-deletion max-heap
    ordered by (count desc, pair asc) — the same deterministic
    tie-break the full re-scan used, so the selected sequence is
    IDENTICAL (pinned by the determinism/prefix/extend pytests).
    Cost drops from O(n_merges · Σ|word|) to O(Σ|word| + touched
    work): a 32k-merge production vocab trains in seconds instead of
    hours. A popped heap entry is used only if its count is current
    (stale entries discard); an entry whose output string collides
    with an already-produced token is permanently ineligible, exactly
    the re-scan's skip."""
    import heapq

    segs = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    produced: set[str] = set()
    for left, right in initial or []:
        out = left + right
        produced.add(out)
        for w in segs:
            if len(segs[w]) >= 2:
                segs[w] = _merge_pass(segs[w], left, right, out)
    pair_counts: dict[tuple[str, str], int] = {}
    occurs: dict[tuple[str, str], set[str]] = {}
    for w, cnt in word_counts.items():
        seq = segs[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            occurs.setdefault(p, set()).add(w)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        c = -negc
        if pair_counts.get(pair, 0) != c:
            continue  # stale (count changed since this entry was pushed)
        if c < min_pair_count:
            break  # valid top = current max → nothing eligible remains
        left, right = pair
        out = left + right
        if out in produced:
            continue  # by-value collision: permanently ineligible
        merges.append(pair)
        produced.add(out)
        for w in sorted(occurs.get(pair, ())):
            old = segs[w]
            new = _merge_pass(old, left, right, out)
            if new == old:
                continue
            segs[w] = new
            cnt = word_counts[w]
            delta: Counter = Counter(zip(new, new[1:]))
            delta.subtract(Counter(zip(old, old[1:])))
            for p, d in delta.items():
                if d == 0:
                    continue
                nc = pair_counts.get(p, 0) + d * cnt
                if nc <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = nc
                    heapq.heappush(heap, (-nc, p))
                if d > 0:
                    occurs.setdefault(p, set()).add(w)
            gone = set(zip(old, old[1:])) - set(zip(new, new[1:]))
            for p in gone:
                s = occurs.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        occurs.pop(p, None)
    return merges


def _word_counts_distributed(
    docs: DataFrame,
    text_col: str,
    max_vocab_words: int,
) -> dict[str, int]:
    """Distributed pre-token frequency table, bounded collect: explode
    the pre-tokens, groupBy + count (map-side partial agg), TakeOrdered
    the top-``max_vocab_words`` by (count desc, word asc). The driver
    never sees corpus text — only the bounded vocabulary."""
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(PRETOKEN_RE),
                    0,  # whole-match extraction; the pattern has no groups
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_vocab_words)
        .collect()
    )
    return {r["w"]: int(r["n"]) for r in words}


def build_bpe_vocab(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    n_merges: int = 64,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    max_vocab_words: int = 65_536,
    min_pair_count: int = 2,
    byte_level: bool = False,
) -> str:
    """Write the BPE vocabulary artifact: ``path/merges`` parquet
    (rank, left, right), ``path/meta.json`` (format + pre-token
    convention + byte_level flag), ``path/_BUILT`` marker last
    (marker-first invalidation on rebuild, the index-family crash
    protocol). ``merges`` warm-starts from an explicit
    causally-ordered list (the oracle-able arm); None trains greedily
    from the corpus. ``byte_level=True`` trains/encodes over UTF-8
    byte symbols (module docstring) — the flag persists in the
    artifact and every probe inherits it."""
    if merges is None:
        wc = _word_counts_distributed(docs, text_col, max_vocab_words)
        if byte_level:
            wc = {word_to_byte_symbols(w): n for w, n in wc.items()}
        merges = train_bpe_merges(wc, n_merges, min_pair_count)
    else:
        merges = [tuple(p) for p in merges]
    _validate_merges(merges, "build_bpe_vocab", byte_level)
    _persist_merges(spark, path, merges, byte_level)
    return path


def _persist_merges(
    spark: SparkSession,
    path: str,
    merges: list[tuple[str, str]],
    byte_level: bool = False,
) -> None:
    """Marker-first artifact write shared by build and extend.

    r17 (optimization round, guide §5 — the driver should do almost
    no data work, and a 32-row table IS driver work): the merge table
    is vocabulary-bounded by contract (KBs), so it is written as one
    parquet file via pyarrow directly instead of spinning a Spark
    job (createDataFrame → coalesce(1) → write cost ~150 ms of
    cluster scheduling per build/extend — q99au pays it twice per
    run). Same directory layout, same schema, same marker-first
    crash protocol; Spark readers of the directory are unaffected."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    mdir = os.path.join(path, "merges")
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir)
    tbl = pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int32()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(mdir, "part-00000.parquet"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "format": _FORMAT,
                "n_merges": len(merges),
                "pretoken_re": PRETOKEN_RE,
                "byte_level": bool(byte_level),
            },
            f,
        )
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write(_FORMAT + "\n")


def extend_bpe_vocab(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    n_more: int = 32,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    max_vocab_words: int = 65_536,
    min_pair_count: int = 2,
) -> str:
    """Append-style maintenance for the vocab artifact — the index
    families' append posture applied to merges: CONTINUE the merge
    list past the persisted ranks without perturbing them (existing
    token ids, budgets and packed batches stay valid; new merges only
    refine future encodes). TRAINED arm: greedy training resumes from
    the replayed segmentation state, so ``build(N) then extend(M)``
    over the same corpus is IDENTICAL to ``build(N+M)`` (greedy
    prefix-stability — pinned by pytest). WARM arm: explicit new
    merges validated causally against the existing outputs. Same
    marker-first window as build: probes refuse mid-extend. The
    byte_level posture is INHERITED from the artifact — an extend can
    never flip the base alphabet under existing ids."""
    existing = load_bpe_merges(spark, path)
    byte_level = vocab_is_byte_level(path)
    if merges is None:
        wc = _word_counts_distributed(docs, text_col, max_vocab_words)
        if byte_level:
            wc = {word_to_byte_symbols(w): n for w, n in wc.items()}
        new = train_bpe_merges(
            wc, n_more, min_pair_count, initial=existing
        )
    else:
        new = [tuple(p) for p in merges]
    combined = existing + new
    _validate_merges(combined, "extend_bpe_vocab", byte_level)
    _persist_merges(spark, path, combined, byte_level)
    return path


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Read the merge table back in rank order (bounded — a vocab is
    tens of thousands of rows at most). Refuses a crashed/partial
    build via the marker, like the index probes."""
    marker = os.path.join(path, "_BUILT")
    if not os.path.exists(marker):
        raise ValueError(
            "no complete BPE vocab at %r (missing _BUILT marker — crashed "
            "build? run build_bpe_vocab first)" % path
        )
    with open(marker) as f:
        if f.read().strip() != _FORMAT:
            raise ValueError("BPE vocab at %r has an unknown format" % path)
    # r17: read via pyarrow — the table is vocab-bounded (KBs) and
    # lives on the artifact filesystem the markers already use, so a
    # Spark scan job (~60 ms scheduling) per load is pure overhead
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(path, "merges")).to_pydict()
    order = sorted(range(len(tbl["rank"])), key=lambda i: tbl["rank"][i])
    return [(tbl["left"][i], tbl["right"][i]) for i in order]


def vocab_is_byte_level(path: str) -> bool:
    """Read the persisted base-alphabet posture (False for pre-r15
    artifacts that carry no flag — char-level back-compat)."""
    try:
        with open(os.path.join(path, "meta.json")) as f:
            return bool(json.load(f).get("byte_level", False))
    except FileNotFoundError:
        return False


#: schema for bpe_encode — token array + count in one crossing
_ENCODE_SCHEMA_TAIL = [
    T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
    T.StructField("n_bpe_tokens", T.LongType()),
]


def _encode_gen(merges, text_col, with_tokens, byte_level=False):
    """mapInPandas generator factory: consumes ``text_col``, passes
    every OTHER input column through untouched (so callers can ride
    precomputed per-doc stats in the same Arrow crossing). A
    per-worker cache encodes each UNIQUE pre-token once — Zipf reuse
    makes this the hot-path win; the cache resets when oversized to
    stay bounded. In byte mode each pre-token is mapped to its UTF-8
    byte symbols first; token strings are then Latin-1 byte strings
    (valid unicode — safe through Arrow/parquet)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if len(cache) > 1_000_000:
                cache = {}
            toks_out, counts = [], []
            for text in pdf[text_col]:
                n = 0
                toks: list[str] = []
                for w in pretokenize(text if isinstance(text, str) else None):
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(
                            word_to_byte_symbols(w) if byte_level else w,
                            merges,
                        )
                        cache[w] = enc
                    n += len(enc)
                    if with_tokens:
                        toks.extend(enc)
                counts.append(n)
                if with_tokens:
                    toks_out.append(toks)
            out = pdf.drop(columns=[text_col])
            if with_tokens:
                out["bpe_tokens"] = toks_out
            out["n_bpe_tokens"] = pd.array(counts, dtype="int64")
            yield out

    return gen


def _out_schema(df: DataFrame, text_col: str, with_tokens: bool) -> T.StructType:
    fields = [f for f in df.schema.fields if f.name != text_col]
    if with_tokens:
        fields.append(_ENCODE_SCHEMA_TAIL[0])
    fields.append(_ENCODE_SCHEMA_TAIL[1])
    return T.StructType(fields)


def bpe_encode(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    text_col: str = "text",
) -> DataFrame:
    """Encode each row: all non-text input columns pass through, plus
    (bpe_tokens array<string>, n_bpe_tokens). The merge list rides
    inside the UDF closure (task-broadcast — a vocab is KBs); the
    corpus never shuffles."""
    merges = load_bpe_merges(spark, path)
    byte_level = vocab_is_byte_level(path)
    ensure_serializable()
    return df.mapInPandas(
        _encode_gen(merges, text_col, with_tokens=True, byte_level=byte_level),
        _out_schema(df, text_col, with_tokens=True),
    )


def bpe_token_count(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    text_col: str = "text",
) -> DataFrame:
    """Pass-through columns + n_bpe_tokens — the budget/packing arm:
    same crossing as :func:`bpe_encode` without materializing token
    arrays."""
    merges = load_bpe_merges(spark, path)
    byte_level = vocab_is_byte_level(path)
    ensure_serializable()
    return df.mapInPandas(
        _encode_gen(merges, text_col, with_tokens=False, byte_level=byte_level),
        _out_schema(df, text_col, with_tokens=False),
    )


def utf8_byte_symbols_sql(col: str) -> str:
    """DuckDB expression mapping ``col`` to its UTF-8 bytes viewed as
    Latin-1 chars (the byte-level symbol string — the SQL twin of
    :func:`word_to_byte_symbols`): per character, emit its UTF-8
    encoding by pure codepoint arithmetic (RFC 3629), each byte as
    ``chr(byte)``. Pre-token boundaries survive (module docstring),
    so the replace-chain oracle applies to this expression verbatim."""
    return (
        "(SELECT coalesce(array_to_string(list_transform("
        "[substring(__u8, i, 1) FOR i IN range(1, length(__u8) + 1)], "
        "c -> CASE "
        "WHEN unicode(c) < 128 THEN c "
        "WHEN unicode(c) < 2048 THEN "
        "chr(192 + unicode(c) // 64) || chr(128 + unicode(c) % 64) "
        "WHEN unicode(c) < 65536 THEN "
        "chr(224 + unicode(c) // 4096) || "
        "chr(128 + (unicode(c) // 64) % 64) || chr(128 + unicode(c) % 64) "
        "ELSE chr(240 + unicode(c) // 262144) || "
        "chr(128 + (unicode(c) // 4096) % 64) || "
        "chr(128 + (unicode(c) // 64) % 64) || chr(128 + unicode(c) % 64) "
        "END), ''), '') "
        f"FROM (SELECT coalesce({col}, '') AS __u8))"
    )


def bpe_count_sql(
    merges: list[tuple[str, str]], col: str, byte_level: bool = False
) -> str:
    """DuckDB oracle expression for the token COUNT of ``col`` under a
    FIXED merge list: apply each merge as a nested ``replace()`` over
    single-char placeholder symbols (rank i's output = U+E000+i, from
    the private-use area — absent from any sane corpus and checked
    against the merge alphabet), then count surviving non-whitespace
    symbols. Exact because (a) a left-to-right non-overlapping
    ``replace()`` IS one merge pass, (b) class-pure merges can never
    span a pre-token boundary (maximal-munch runs), and (c) causal
    order + distinct outputs make by-rank placeholders agree with the
    engine's by-value tokens. Refuses merge lists outside that
    SQL-expressible envelope — the engine itself has no such limit.
    ``byte_level=True`` prepends :func:`utf8_byte_symbols_sql` and the
    chain runs over byte symbols — the class-purity and whitespace
    arguments carry over byte-for-byte (module docstring)."""
    _validate_merges(merges, "bpe_count_sql", byte_level)
    if len(merges) > 6400:
        # the BMP private-use block U+E000..U+F8FF holds exactly 6400
        # codepoints; rank 6400+ placeholders would land on REAL
        # CJK-compat characters that the corpus-collision check below
        # (bounded to the PUA) no longer guards, so the oracle could
        # silently mis-map text. The engine itself has no such limit —
        # this is the documented SQL-expressible envelope (r15 ADVICE).
        raise ValueError(
            "bpe_count_sql: %d merges overflow the 6400-slot PUA "
            "placeholder block (U+E000..U+F8FF) — no SQL oracle past "
            "it (the engine still supports such vocabularies)"
            % len(merges)
        )
    pl: dict[str, str] = {}
    expr = (
        utf8_byte_symbols_sql(col) if byte_level else f"coalesce({col}, '')"
    )
    for i, (left, right) in enumerate(merges):
        # class purity over the WHOLE pair, not per part: a pair whose
        # parts are pure but of DIFFERENT classes (e.g. ('th', 'п'))
        # can never match inside a class-pure pre-token in the engine,
        # yet whole-string replace() would merge it across an
        # alpha-run/other-run boundary — outside the oracle envelope
        classes = {_char_class(ch) for ch in left + right}
        if len(classes) > 1:
            raise ValueError(
                "bpe_count_sql: merge %d (%r, %r) mixes character "
                "classes — a cross-class merge can span pre-token "
                "boundaries under whole-string replace(), so it has "
                "no SQL oracle (the engine still supports it)" % (i, left, right)
            )
        for part in (left, right):
            for ch in part:
                if ch in ("'", "\\") or 0xE000 <= ord(ch) <= 0xF8FF:
                    raise ValueError(
                        "bpe_count_sql: merge %d contains %r — quotes, "
                        "backslashes and private-use chars collide with "
                        "the placeholder encoding" % (i, ch)
                    )
        lp = pl.get(left, left)
        rp = pl.get(right, right)
        out = chr(0xE000 + i)
        pl[left + right] = out
        expr = f"replace({expr}, '{lp}{rp}', '{out}')"
    return (
        f"length(regexp_replace({expr}, '{WS_CLASS}', '', 'g'))"
    )


# ---------------------------------------------------------------------------
# Token-id layer (r14, byte mode r15) — the GPT-2 id convention. A
# packed training batch is int arrays, not strings; this layer makes
# the engine's BPE output model-consumable and keeps the id
# assignment corpus-independent. Char mode (legacy): id = codepoint
# for single chars < 256, 256+rank for merge outputs, UNK =
# 256+n_merges for anything else. Byte mode: id = BYTE VALUE (0-255)
# for base symbols, 256+rank for merge outputs — TOTAL over all
# unicode text, UNK structurally unreachable (every symbol is a byte).
# ---------------------------------------------------------------------------


def token_id_map(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token string -> id for MERGE OUTPUTS only (single chars map by
    codepoint, computed inline — the dict stays vocabulary-sized)."""
    return {left + right: 256 + rank for rank, (left, right) in enumerate(merges)}


def unk_id(merges: list[tuple[str, str]]) -> int:
    return 256 + len(merges)


def encode_word_ids(word: str, merges, id_map, unk: int) -> list[int]:
    return [
        id_map.get(t, ord(t) if len(t) == 1 and ord(t) < 256 else unk)
        for t in encode_word(word, merges)
    ]


def decode_ids(
    ids: list[int],
    merges: list[tuple[str, str]],
    byte_level: bool = False,
) -> str:
    """Inverse of :func:`encode_word_ids` over any id sequence:
    merge-output ids expand to their string; base ids to their char;
    the UNK id decodes to U+FFFD. Token boundaries are not
    recoverable (BPE is lossy only about boundaries, never bytes).
    Byte mode: the symbol string is Latin-1 bytes — decode through
    UTF-8 (invalid tails -> U+FFFD), making the round-trip LOSSLESS
    for every unicode string (no UNK id exists)."""
    outs = {256 + r: left + right for r, (left, right) in enumerate(merges)}
    if byte_level:
        syms = "".join(
            outs.get(i, chr(i) if i < 256 else "�") for i in ids
        )
        return byte_symbols_to_text(syms)
    unk = unk_id(merges)
    return "".join(
        "�" if i == unk else outs.get(i, chr(i) if i < 256 else "�")
        for i in ids
    )


def bpe_encode_ids(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    text_col: str = "text",
) -> DataFrame:
    """Pass-through columns + (bpe_ids array<int>, n_bpe_tokens) in
    one mapInPandas crossing — the model-consumable twin of
    :func:`bpe_encode`. Byte-mode artifacts yield a TOTAL id stream
    (no UNK can occur — every base symbol is a byte)."""
    merges = load_bpe_merges(spark, path)
    byte_level = vocab_is_byte_level(path)
    id_map = token_id_map(merges)
    unk = unk_id(merges)
    ensure_serializable()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            if len(cache) > 1_000_000:
                cache = {}
            ids_out, counts = [], []
            for text in pdf[text_col]:
                ids: list[int] = []
                for w in pretokenize(text if isinstance(text, str) else None):
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word_ids(
                            word_to_byte_symbols(w) if byte_level else w,
                            merges, id_map, unk,
                        )
                        cache[w] = enc
                    ids.extend(enc)
                ids_out.append(ids)
                counts.append(len(ids))
            out = pdf.drop(columns=[text_col])
            out["bpe_ids"] = ids_out
            out["n_bpe_tokens"] = pd.array(counts, dtype="int64")
            yield out

    fields = [f for f in df.schema.fields if f.name != text_col]
    fields.append(T.StructField("bpe_ids", T.ArrayType(T.IntegerType())))
    fields.append(_ENCODE_SCHEMA_TAIL[1])
    return df.mapInPandas(gen, T.StructType(fields))


def bpe_ids_list_sql(
    merges: list[tuple[str, str]], col: str, byte_level: bool = False
) -> str:
    """DuckDB oracle for the FULL id SEQUENCE of ``col`` as an INT
    list (scalar subquery): the replace-chain transform of
    :func:`bpe_count_sql` yields the token sequence as one symbol
    per char (placeholders for merge outputs); stripping whitespace
    and mapping each symbol — PUA placeholder U+E000+r (r < n_merges
    ONLY; higher PUA codepoints are corpus text, not placeholders)
    -> 256+r, base char -> codepoint, else UNK — reproduces the
    engine's id stream exactly. Same SQL-expressibility envelope as
    bpe_count_sql, with one addition: corpus text containing the
    actually-USED placeholder codepoints (U+E000..U+E000+n_merges-1)
    remains outside the oracle envelope (the replace chain cannot
    tell such a char from its own placeholder). Byte mode: the
    chain runs over the UTF-8 byte-symbol string, every non-
    placeholder symbol IS a byte, so the mapping is placeholder ->
    256+r ELSE unicode(c) — no UNK branch exists, and corpus text
    can never collide with a placeholder (bytes are < 256)."""
    _validate_merges(merges, "bpe_ids_list_sql", byte_level)
    # reuse the validated replace chain, then swap the final count for
    # a per-char id mapping
    count_expr = bpe_count_sql(merges, col, byte_level)
    prefix = "length(regexp_replace("
    suffix = f", '{WS_CLASS}', '', 'g'))"
    assert count_expr.startswith(prefix) and count_expr.endswith(suffix)
    stripped = "regexp_replace(" + count_expr[len(prefix):-len(suffix)] + (
        f", '{WS_CLASS}', '', 'g')"
    )
    if byte_level:
        id_case = (
            "c -> CASE WHEN unicode(c) >= 57344 "
            "THEN 256 + (unicode(c) - 57344) "
            "ELSE unicode(c) END) "
        )
    else:
        id_case = (
            f"c -> CASE WHEN unicode(c) >= 57344 AND unicode(c) < {57344 + len(merges)} "
            "THEN 256 + (unicode(c) - 57344) "
            "WHEN unicode(c) < 256 THEN unicode(c) "
            f"ELSE {unk_id(merges)} END) "
        )
    return (
        "(SELECT list_transform("
        "[substring(t, i, 1) FOR i IN range(1, length(t) + 1)], "
        + id_case
        + f"FROM (SELECT {stripped} AS t))"
    )


def bpe_ids_csv_sql(
    merges: list[tuple[str, str]], col: str, byte_level: bool = False
) -> str:
    """Comma-joined form of :func:`bpe_ids_list_sql` (empty doc ->
    empty string, matching the engine's join of an empty array)."""
    return (
        "coalesce(array_to_string("
        f"{bpe_ids_list_sql(merges, col, byte_level)}, ','), '')"
    )
