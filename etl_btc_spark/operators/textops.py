"""Text analysis operators (SURVEY.md §2.8 F1-F4 + the
training-data-pipeline text surface mandated by BASELINE.json §2.11):
HTML strip, whitespace normalization, tokenization/token counting,
quality scoring, language ID, document fingerprinting.

Everything is JVM-side column expressions (regexp/array functions) —
no Python on the hot path, so these run at full codegen speed over
100 TB of documents and every one of them has an exact ANSI-SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference news_etl_dag.py:65-67 strips HTML via BeautifulSoup
# get_text(separator=' ', strip=True); the engine's regex chain gives
# the same result for well-formed markup without a Python UDF.
_TAG_RE = "<[^>]+>"


def html_strip(c: Column) -> Column:
    """Strip tags → collapse whitespace → trim (F1)."""
    no_tags = F.regexp_replace(c, _TAG_RE, " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


HTML_STRIP_SQL = (
    "trim(regexp_replace(regexp_replace({col}, '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g'))"
)


def normalize_text(c: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase + squeezed
    whitespace + trim."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


NORMALIZE_SQL = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


def fingerprint(c: Column) -> Column:
    """Deterministic 256-bit document fingerprint over the normalized
    text (F10 — replaces the reference's uuid4 identity,
    news_etl_dag.py:147, making re-ingestion idempotent)."""
    return F.sha2(normalize_text(c), 256)


FINGERPRINT_SQL = f"sha256({NORMALIZE_SQL})"

#: word-ish tokenizer: letter runs, digit runs, or single punctuation
#: (a BPE-ish pre-tokenization split — same regex class both engines)
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_tokens(c: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    return F.split(F.trim(c), r"\s+")


def ws_token_count(c: Column) -> Column:
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(ws_tokens(c)))


WS_TOKEN_COUNT_SQL = (
    "CASE WHEN trim({col}) = '' THEN 0 ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
)


def bpe_ish_token_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


BPE_ISH_TOKEN_COUNT_SQL = "len(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))"

#: tiny per-language marker vocabularies for the n-gram/stopword
#: language-ID heuristic. Deterministic and oracle-expressible; a
#: production system would swap in a trained model via pandas_udf.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "las", "es", "y", "que"],
    "fr": ["le", "les", "est", "et", "une", "dans", "que"],
    "zh": ["de5", "shi4", "le5"],  # romanized placeholders
}
#: fixed priority order for argmax ties (higher-priority first)
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]


def lang_scores(tokens: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.array_intersect(tokens, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(c: Column) -> Column:
    """Marker-vocabulary language ID with deterministic tie-break:
    a language wins only by strictly beating every higher-priority
    language; all-zero scores → 'und'."""
    toks = F.array_distinct(ws_tokens(F.lower(c)))
    scores = lang_scores(toks)
    expr = F.lit("und")
    # build CASE from lowest priority up so higher priority wins ties
    for lang in reversed(LANG_PRIORITY):
        higher = LANG_PRIORITY[: LANG_PRIORITY.index(lang)]
        cond = scores[lang] > 0
        for h in higher:
            cond = cond & (scores[lang] > scores[h])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(col: str) -> str:
    toks = f"list_distinct(regexp_split_to_array(trim(lower({col})), '\\s+'))"
    # duckdb list literal: ['the', 'a', ...]
    score = {
        lang: "len(list_intersect(%s, [%s]))" % (toks, ", ".join(f"'{m}'" for m in markers))
        for lang, markers in LANG_MARKERS.items()
    }
    case = "'und'"
    for lang in reversed(LANG_PRIORITY):
        higher = LANG_PRIORITY[: LANG_PRIORITY.index(lang)]
        conds = [f"{score[lang]} > 0"] + [f"{score[lang]} > {score[h]}" for h in higher]
        case = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {case} END"
    return case


#: English stopwords for the quality heuristic
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "is", "in", "that", "it", "for"]


def quality_features(c: Column) -> dict[str, Column]:
    """Length / punctuation / stopword heuristics used for document
    quality scoring in LLM-data pipelines. All ratios are guarded
    against zero denominators."""
    n_chars = F.length(c)
    toks = ws_tokens(F.lower(c))
    # r17: count the LOWERED tokens (same count — lowercasing never
    # changes whitespace) so the expression tree shares `toks` and
    # codegen subexpression elimination runs ONE split per doc
    # instead of two on the quality-score hot path (q29/q59/q86/q97).
    n_words = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(toks))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in QUALITY_STOPWORDS]))
    )
    n_punct = F.regexp_count(c, F.lit("[^A-Za-z0-9 ]"))
    safe_words = F.greatest(n_words, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": (n_chars - (n_words - 1)) / safe_words.cast("double"),
        "stopword_ratio": n_stop / safe_words.cast("double"),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)).cast("double"),
    }


def quality_score(c: Column) -> Column:
    """Composite [0,1]-ish quality score: rewards mid-length docs with
    natural stopword density, penalizes punctuation soup."""
    f = quality_features(c)
    len_score = F.least(f["n_chars"].cast("double") / 500.0, F.lit(1.0))
    return 0.4 * len_score + 0.4 * f["stopword_ratio"] + 0.2 * (1.0 - f["punct_ratio"])


def quality_lang_profile(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
    with_lang: bool = True,
) -> DataFrame:
    """Per-document text-quality profile — ``(ids..., extras...,
    n_chars, n_words, quality, lang)`` — in ONE mapInArrow crossing
    (r18 optimization round, guide §4.2).

    The JVM expression tree behind :func:`quality_score` +
    :func:`lang_id` evaluates an interpreted higher-order ``filter``
    per token (stopword count), two regex ``split``s, an
    ``array_intersect`` per language and a ``regexp_count`` per doc —
    micro-benched at ~2.6× a bare scan at sf0.1 (quality 0.389 s,
    lang 0.313 s vs scan 0.147 s). Here one Python pass per doc does
    one split and set arithmetic. The arithmetic mirrors the JVM
    column expressions EXACTLY (same operand order, same int→double
    division points, ASCII ``\\s`` classes, space-only trim), so the
    emitted double is bit-equal modulo sub-1e-9 ulps that the
    callers' epsilon rounding (``sround``) absorbs; ``quality`` is
    emitted UNROUNDED and callers keep applying ``sround`` +
    filters SPARK-side, so rounding semantics never enter Python
    (Python ``round`` is banker's — deliberately not used).
    Equivalence pinned by ``test_quality_lang_profile_equals_jvm``.
    NULL text mirrors the JVM NULL-propagation: n_chars/n_words/
    quality NULL, lang 'und' (every score is NULL→false, so the CASE
    falls through)."""
    import re

    import pyarrow as pa

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()
    ids = list(id_cols) + list(extra_cols)
    src = df.select(*ids, F.col(text_col).alias("__t"))
    out_fields = [src.schema[c] for c in ids] + [
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("quality", T.DoubleType()),
    ]
    if with_lang:
        out_fields.append(T.StructField("lang", T.StringType(), False))
    out_schema = T.StructType(out_fields)
    names = ids + ["n_chars", "n_words", "quality"] + (
        ["lang"] if with_lang else []
    )
    ws = re.compile(r"\s+", re.ASCII)
    punct = re.compile(r"[^A-Za-z0-9 ]")
    stop = frozenset(QUALITY_STOPWORDS)
    markers = {l: frozenset(m) for l, m in LANG_MARKERS.items()}
    prio = list(LANG_PRIORITY)
    lang_on = with_lang

    def gen(batches):
        for batch in batches:
            cols = {c: batch.column(c) for c in ids}
            texts = batch.column("__t").to_pylist()
            o_nc, o_nw, o_q, o_l = [], [], [], []
            for t in texts:
                if t is None:
                    o_nc.append(None)
                    o_nw.append(None)
                    o_q.append(None)
                    o_l.append("und")
                    continue
                nc = len(t)
                toks = ws.split(t.lower().strip(" "))
                # n_words: 0 for space-only text (trim(c) == ''), else
                # the token count — lowercasing never changes the count
                nw = 0 if t.strip(" ") == "" else len(toks)
                n_stop = sum(1 for tok in toks if tok in stop)
                n_punct = len(punct.findall(t))
                safe = nw if nw > 1 else 1
                q = (
                    0.4 * min(nc / 500.0, 1.0)
                    + 0.4 * (n_stop / float(safe))
                    + 0.2 * (1.0 - n_punct / float(nc if nc > 1 else 1))
                )
                o_nc.append(nc)
                o_nw.append(nw)
                o_q.append(q)
                if lang_on:
                    ts = set(toks)
                    lang = "und"
                    for i, l in enumerate(prio):
                        sc = len(ts & markers[l])
                        if sc > 0 and all(
                            sc > len(ts & markers[h]) for h in prio[:i]
                        ):
                            lang = l
                            break
                    o_l.append(lang)
            arrays = [cols[c] for c in ids] + [
                pa.array(o_nc, pa.int32()),
                pa.array(o_nw, pa.int32()),
                pa.array(o_q, pa.float64()),
            ]
            if lang_on:
                arrays.append(pa.array(o_l, pa.string()))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return src.mapInArrow(gen, out_schema)


def quality_score_sql(col: str) -> str:
    toks = f"regexp_split_to_array(trim(lower({col})), '\\s+')"
    stop = ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)
    n_words = f"(CASE WHEN trim({col}) = '' THEN 0 ELSE len({toks}) END)"
    safe_words = f"greatest({n_words}, 1)"
    n_stop = f"len(list_filter({toks}, t -> list_contains([{stop}], t)))"
    n_punct = f"len(regexp_extract_all({col}, '[^A-Za-z0-9 ]'))"
    n_chars = f"length({col})"
    return (
        f"0.4 * least({n_chars}::DOUBLE / 500.0, 1.0) "
        f"+ 0.4 * ({n_stop}::DOUBLE / {safe_words}) "
        f"+ 0.2 * (1.0 - {n_punct}::DOUBLE / greatest({n_chars}, 1))"
    )


# ---------------------------------------------------------------------------
# PII scrubbing (§2.11 extension, r4)
# ---------------------------------------------------------------------------

#: RE2-and-Java-compatible patterns (no backrefs/lookaround), so the
#: engine and the DuckDB oracle run the IDENTICAL regex
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9 ()-]{7,}[0-9]"


def scrub_pii(c: Column) -> Column:
    """Redact emails then phone-shaped number runs — the minimal
    pre-training PII pass. Pure JVM regexp_replace: whole-stage
    codegen, no UDF, scan-speed at 100 TB."""
    no_mail = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_mail, PHONE_RE, "<PHONE>")


def pii_counts(c: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the raw text."""
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("int"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("int"),
    )


def scrub_pii_sql(col: str) -> str:
    return (
        f"regexp_replace(regexp_replace({col}, '{EMAIL_RE}', '<EMAIL>', 'g'),"
        f" '{PHONE_RE}', '<PHONE>', 'g')"
    )


def pii_counts_sql(col: str) -> tuple[str, str]:
    return (
        f"len(regexp_extract_all({col}, '{EMAIL_RE}'))",
        f"len(regexp_extract_all({col}, '{PHONE_RE}'))",
    )


def tfidf_keywords(df, k: int = 5, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document top-k TF-IDF keywords (r7 extension of the §2.11
    text-analysis surface — keyword extraction is the standard
    document-profiling step next to quality/lang-id, and the reference
    profiles documents before embedding them, init_qdrant.py:232-267).

    Plan shape at 100 TB: ONE explode shuffle to (doc, token) term
    counts — persisted, because both the scoring branch and the
    document-frequency branch hang off it; without the persist
    Catalyst re-optimizes the shared subtree per branch and the
    physical plan scans + explodes the corpus TWICE, doubling the
    dominant stage (VERDICT r7 "What's wrong" #1). On top of the
    materialized term counts: one token-level aggregate for document
    frequencies (a vocabulary-sized table, orders of magnitude
    smaller than the corpus), a token-key join of the two, and one
    rank window per document. The corpus cardinality joins in as a
    BROADCAST 1-row aggregate over a column-pruned scan, not a
    driver-side collect, so the whole thing is one lazy plan.
    Scores are epsilon-rounded BEFORE ranking so the cross-engine
    float comparison (Spark vs DuckDB ln) cannot flip near-tied
    ranks; ties break on token ascending.
    """
    from pyspark.sql import Window

    from .dedup import _scoped_persist

    toks = ws_tokens(normalize_text(F.col(text_col)))
    words = df.select(F.col(id_col), F.explode(toks).alias("token")).filter(
        # ws_tokens('') is [''] not [] (review r7): without this, an
        # empty/whitespace-only doc gets '' as a high-IDF rank-1
        # "keyword" — and the oracle agrees, so the gate can't catch it
        F.col("token") != ""
    )
    tf = _scoped_persist(
        words.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) + F.lit(1e-9), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tfidf")
    )


def tfidf_keywords_oracle_sql(k: int = 5) -> str:
    """DuckDB mirror of :func:`tfidf_keywords` over the documents
    view — identical tokenization, scoring, rounding and tie-break."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, token FROM (
                SELECT doc_id, unnest(t) AS token FROM w
            ) WHERE token <> ''
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
        ), dfreq AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        ), nd AS (
            SELECT count(DISTINCT doc_id) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.token,
                   round(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / dfreq.df) + 1e-9, 6) AS tfidf
            FROM tf JOIN dfreq USING (token), nd
        )
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tfidf
        FROM (
            SELECT doc_id, token, tfidf, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def normalize_query_terms(query_terms: list[str]) -> list[str]:
    """ONE normalization for every BM25/term-lookup entry point
    (review r8): corpus tokens are lowercased by normalize_text, so
    query terms must lowercase identically or a mixed-case term
    silently matches nothing in one entry point while another entry
    point (which did lowercase) matches — contradictory results with
    no error. Also strips/dedups/sorts and drops empties.

    The strip is ASCII-``\\s`` ONLY (ADVICE r9): the doc-side
    tokenizer splits on Java's ASCII ``\\s`` class, and
    ``bm25_join``'s Column-side mirror uses the same
    ``regexp_replace(^\\s+|\\s+$)`` — python's default unicode
    ``str.strip()`` would also eat NBSP etc. and make the same padded
    term normalize differently across entry points. ASCII-strip is
    the canonical form; all probe-literal helpers (this,
    ``text_index.normalize_needle``, bm25_join's expression) agree on
    it."""
    import re as _re

    out = set()
    for t in query_terms:
        if not t:
            continue
        t = _re.sub(r"^\s+|\s+$", "", t.lower(), flags=_re.ASCII)
        if t:
            out.add(t)
    return sorted(out)


def bm25_contrib(k1: float = 1.2, b: float = 0.75) -> Column:
    """The per-(doc, term) BM25 contribution, shared by the direct
    scorer and BOTH index-probe paths (review r8: the expression was
    copy-pasted three times and drifted once already). Expects the
    standard column names ``tf, df, dl, n_docs, avgdl`` in scope.
    IDF is the Robertson/Sparck-Jones form ln(1 + (N - df + 0.5) /
    (df + 0.5)), positive for any df."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    return idf * F.col("tf") * (k1 + 1.0) / denom


def bm25_contrib_sql(k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB mirror of :func:`bm25_contrib`, shared by every BM25
    oracle builder (same drift rationale). Same column-name contract:
    tf.tf, dfreq.df, dl.dl, stats.n_docs, stats.avgdl."""
    return (
        f"ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))"
        f" * tf.tf * ({k1} + 1.0)"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))"
    )


def sql_str_list(values: list[str]) -> str:
    """Comma-joined SQL string literals with quotes escaped (review
    r8: bare f"'{t}'" wrapping breaks — or injects into — the oracle
    for any term containing a quote, and apostrophe terms are
    legitimate vocabulary under the whitespace tokenizer)."""
    return ", ".join("'%s'" % v.replace("'", "''") for v in values)


def bm25_scores(
    df,
    query_terms: list[str],
    n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-n documents by BM25 relevance to a fixed query-term set
    (r8 §2.11 extension: the ranking function next to q99's TF-IDF —
    contamination triage, eval-set retrieval, and boosted-corpus
    selection all run exactly this shape over a training corpus).

    Plan shape at 100 TB: the explode is filtered to the |Q|-term
    query set BEFORE the term-frequency shuffle, so the shuffle
    carries only matching (doc, term) rows — a tiny fraction of the
    corpus — unlike TF-IDF's full-vocabulary aggregate. Document
    length comes from a pure codegen expression (no second tokenize
    pass), corpus stats (N, avgdl) ride in as ONE broadcast 1-row
    aggregate, and per-term document frequencies are a ≤|Q|-row
    broadcast. Top-n is TakeOrdered, no global sort. IDF uses the
    standard Robertson/Sparck-Jones form ln(1 + (N - df + 0.5) /
    (df + 0.5)), positive for any df. Scores epsilon-rounded before
    ranking; ties break on id ascending.
    """
    terms = normalize_query_terms(query_terms)
    toks = ws_tokens(normalize_text(F.col(text_col)))
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(ws_token_count(F.col(text_col))).alias("avgdl"),
    )
    dl = df.select(
        F.col(id_col), ws_token_count(F.col(text_col)).alias("dl")
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(bm25_contrib(k1, b)) + F.lit(1e-9), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(n)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    corpus_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB mirror of :func:`bm25_scores` over the documents view.
    ``corpus_sql`` substitutes a modified corpus (r10, the q99r index
    lifecycle gate: upserted texts applied, deleted ids removed) —
    stats, doc lengths and frequencies all derive from it, exactly as
    the index's exact-integer stats must after upsert/delete."""
    terms = sql_str_list(normalize_query_terms(query_terms))
    dl = WS_TOKEN_COUNT_SQL.format(col="text")
    return f"""
        WITH corpus AS ({corpus_sql}), w AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t
            FROM corpus
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM (
                SELECT doc_id, unnest(t) AS token FROM w
            ) WHERE token IN ({terms})
            GROUP BY doc_id, token
        ), dfreq AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        ), stats AS (
            SELECT count(*) AS n_docs, avg({dl}) AS avgdl FROM corpus
        ), dl AS (
            SELECT doc_id, {dl} AS dl FROM corpus
        )
        SELECT tf.doc_id,
               round(1e-9 + sum({bm25_contrib_sql(k1, b)}), 6) AS bm25
        FROM tf
        JOIN dfreq USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id, stats
        GROUP BY tf.doc_id
        ORDER BY bm25 DESC, tf.doc_id ASC
        LIMIT {n}
    """


def unigram_negloglik(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document average negative log-likelihood under the corpus
    unigram distribution (r8 §2.11 extension) — the cheapest
    perplexity proxy a pretraining pipeline runs: a doc full of
    corpus-typical tokens scores low, an outlier (wrong language,
    binary soup, boilerplate the corpus has never seen tokens for)
    scores high. The standard KenLM-perplexity filter slot, with the
    LM replaced by the corpus's own unigram model so it stays
    dependency-free and oracle-expressible.

    Plan shape at 100 TB: one explode→(token) aggregate builds the
    vocabulary-sized frequency table; the corpus token total rides as
    a broadcast 1-row aggregate ON TOP of that table (vocab-sized
    input, no second corpus pass); the exploded tokens then join the
    frequency table by token (vocab side broadcastable at moderate
    vocabularies, hash-join otherwise) and re-aggregate per doc.
    Exactly two corpus-wide shuffles, same budget as TF-IDF.
    Empty docs are dropped (no tokens → no likelihood).
    """
    from .dedup import _scoped_persist

    toks = ws_tokens(normalize_text(F.col(text_col)))
    words = df.select(F.col(id_col), F.explode(toks).alias("token")).filter(
        F.col("token") != ""
    )
    # persisted for the same reason tfidf_keywords persists tf: the
    # frequency branch and the scoring branch both hang off `words`,
    # and without a persist the corpus would tokenize twice. Persisting
    # the (doc, token) pairs (not an aggregate) keeps the scoring
    # branch's per-occurrence join input materialized too.
    words = _scoped_persist(words)
    freq = words.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    total = freq.agg(F.sum("n_tok").alias("n_total"))
    neg_ll = -F.log(F.col("n_tok") / F.col("n_total"))
    return (
        words.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(neg_ll) + F.lit(1e-9), 6).alias("avg_neg_loglik"),
        )
    )


def unigram_negloglik_oracle_sql() -> str:
    """DuckDB mirror of :func:`unigram_negloglik`."""
    return """
        WITH w AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, token FROM (
                SELECT doc_id, unnest(t) AS token FROM w
            ) WHERE token <> ''
        ), freq AS (
            SELECT token, count(*) AS n_tok FROM tok GROUP BY token
        ), total AS (
            SELECT sum(n_tok) AS n_total FROM freq
        )
        SELECT tok.doc_id,
               count(*) AS n_tokens,
               round(1e-9 + avg(-ln(freq.n_tok / total.n_total)), 6) AS avg_neg_loglik
        FROM tok JOIN freq USING (token), total
        GROUP BY tok.doc_id
    """


# ---------------------------------------------------------------------------
# Intra-document repetition features (§2.11 extension, r10)
# ---------------------------------------------------------------------------

#: Gopher-style removal thresholds (Rae et al. 2021, table A1 family):
#: docs whose repetition fractions exceed these are boilerplate/spam-
#: shaped and get flagged for removal by pretraining pipelines.
REP_TOP2GRAM_MAX = 0.20
REP_DUP5GRAM_MAX = 0.15
REP_DUP_LINE_MAX = 0.30
REP_DUP_LINE_CHAR_MAX = 0.20


def _word_ngrams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams of a token array (space-joined), empty
    when the doc has fewer than n tokens. Pure JVM expressions — the
    transform(sequence) is codegen'd, no Python worker."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document intra-repetition profile — the Gopher repetition
    filter slot in an LLM-data pipeline (duplicate-line /
    top-n-gram / duplicate-n-gram fractions with the published
    removal thresholds). Exact semantics (ours, stated so the oracle
    can mirror them precisely):

    - ``dup_line_frac``: over non-empty trimmed newline-split lines,
      (line occurrences − distinct lines) / line occurrences — the
      fraction of lines that repeat an earlier one. 0 with ≤1 line.
    - ``dup_line_char_frac``: characters in ALL occurrences of
      duplicated lines / characters in all lines (Gopher's
      "fraction of characters in duplicated lines").
    - ``top2gram_char_frac``: max over word-2-grams of
      occurrences × gram length (incl. the joining space) / doc
      length. 0 with <2 tokens.
    - ``dup5gram_char_frac``: Σ over word-5-grams occurring more
      than once of occurrences × gram length / doc length —
      overlapping occurrences count per occurrence, which
      upper-bounds Gopher's character-coverage definition but keeps
      the statistic exact, deterministic and SQL-expressible; capped
      at 1.0 (as is ``top2gram_char_frac``) so saturated repetition
      still reads as a fraction. 0 with <5 tokens.
    - ``repetitious``: true iff any fraction exceeds its threshold.

    Plan shape at 100 TB: three explode→(doc, unit) aggregates
    (lines, 2-grams, 5-grams), each a partial-aggregated shuffle on
    (doc_id, unit), re-aggregated per doc and joined back to the
    per-doc stats frame on doc_id — every join co-partitions on the
    same key, no broadcast of anything corpus-sized, no Python
    workers anywhere. Fractions are epsilon-rounded to 6 dp so
    cross-engine double ulps cannot flip the hash compare."""
    from .dedup import _scoped_persist

    toks = ws_tokens(F.col(text_col))
    # NOTE: the transform lambda must be unary — passing F.trim
    # directly would let transform bind its (element, index) BINARY
    # form, resolving to the two-parameter TRIM(str, trimStr) with
    # the array index as the trim character set
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    # persisted (scoped, released by release_scoped_caches like every
    # multi-branch tokenize in this module): the per-doc stats frame
    # and all three explode branches hang off `base` — without the
    # persist the corpus would tokenize four times
    base = _scoped_persist(
        df.select(
            F.col(id_col),
            F.length(F.col(text_col)).alias("__n_chars"),
            toks.alias("__toks"),
            lines.alias("__lines"),
        )
    )
    lc = (
        base.select(id_col, F.explode("__lines").alias("l"))
        .groupBy(id_col, "l")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("__nl"),
            F.sum(F.length("l") * F.col("c")).alias("__cl"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "__dup_l"
            ),
            F.sum(
                F.when(F.col("c") > 1, F.length("l") * F.col("c")).otherwise(0)
            ).alias("__dup_cl"),
            F.count(F.lit(1)).alias("__distinct_l"),
        )
    )
    g2 = (
        base.select(
            id_col, F.explode(_word_ngrams(F.col("__toks"), 2)).alias("g")
        )
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max(F.col("c") * F.length("g")).alias("__top2_chars"))
    )
    g5 = (
        base.select(
            id_col, F.explode(_word_ngrams(F.col("__toks"), 5)).alias("g")
        )
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(0)
            ).alias("__dup5_chars")
        )
    )
    safe_chars = F.greatest(F.col("__n_chars"), F.lit(1)).cast("double")
    dup_line_frac = (
        (F.coalesce(F.col("__nl"), F.lit(0)) - F.coalesce(F.col("__distinct_l"), F.lit(0)))
        / F.greatest(F.coalesce(F.col("__nl"), F.lit(0)), F.lit(1)).cast("double")
    )
    dup_line_char_frac = F.coalesce(F.col("__dup_cl"), F.lit(0)) / F.greatest(
        F.coalesce(F.col("__cl"), F.lit(0)), F.lit(1)
    ).cast("double")
    # overlapping occurrences count per occurrence, so the raw char
    # products can exceed the doc length on pathological repetition
    # ("go go go…") — cap at 1.0 to keep both statistics honest
    # fractions (a saturated doc is maximally repetitious either way;
    # the thresholds sit far below 1)
    top2 = F.least(
        F.coalesce(F.col("__top2_chars"), F.lit(0)) / safe_chars, F.lit(1.0)
    )
    dup5 = F.least(
        F.coalesce(F.col("__dup5_chars"), F.lit(0)) / safe_chars, F.lit(1.0)
    )
    eps = 1e-9
    out = (
        base.select(id_col, "__n_chars")
        .join(lc, id_col, "left")
        .join(g2, id_col, "left")
        .join(g5, id_col, "left")
        .select(
            F.col(id_col),
            F.round(dup_line_frac + eps, 6).alias("dup_line_frac"),
            F.round(dup_line_char_frac + eps, 6).alias("dup_line_char_frac"),
            F.round(top2 + eps, 6).alias("top2gram_char_frac"),
            F.round(dup5 + eps, 6).alias("dup5gram_char_frac"),
            (
                (F.round(dup_line_frac + eps, 6) > REP_DUP_LINE_MAX)
                | (F.round(dup_line_char_frac + eps, 6) > REP_DUP_LINE_CHAR_MAX)
                | (F.round(top2 + eps, 6) > REP_TOP2GRAM_MAX)
                | (F.round(dup5 + eps, 6) > REP_DUP5GRAM_MAX)
            ).alias("repetitious"),
        )
    )
    return out


def repetition_features_oracle_sql() -> str:
    """DuckDB mirror of :func:`repetition_features` over the
    ``documents`` view — identical tokenization (trim + \\s+ split),
    identical n-gram joining, identical guards and rounding."""
    return r"""
        WITH base AS (
            SELECT doc_id, length(text) AS n_chars,
                   regexp_split_to_array(trim(text), '\s+') AS toks,
                   list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines
            FROM documents
        ), lc AS (
            SELECT doc_id,
                   sum(c) AS nl, sum(length(l) * c) AS cl,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_l,
                   sum(CASE WHEN c > 1 THEN length(l) * c ELSE 0 END) AS dup_cl,
                   count(*) AS distinct_l
            FROM (
                SELECT doc_id, l, count(*) AS c
                FROM (SELECT doc_id, unnest(lines) AS l FROM base)
                GROUP BY doc_id, l
            ) GROUP BY doc_id
        ), g2 AS (
            SELECT doc_id, max(c * length(g)) AS top2_chars
            FROM (
                SELECT doc_id, g, count(*) AS c FROM (
                    SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
                    FROM base, unnest(range(1, len(toks))) AS t(i)
                    WHERE len(toks) >= 2
                ) GROUP BY doc_id, g
            ) GROUP BY doc_id
        ), g5 AS (
            SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup5_chars
            FROM (
                SELECT doc_id, g, count(*) AS c FROM (
                    SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS g
                    FROM base, unnest(range(1, len(toks) - 3)) AS t(i)
                    WHERE len(toks) >= 5
                ) GROUP BY doc_id, g
            ) GROUP BY doc_id
        ), j AS (
            SELECT base.doc_id,
                   (coalesce(nl, 0) - coalesce(distinct_l, 0))::DOUBLE
                       / greatest(coalesce(nl, 0), 1) AS dlf,
                   coalesce(dup_cl, 0)::DOUBLE / greatest(coalesce(cl, 0), 1) AS dlcf,
                   least(coalesce(top2_chars, 0)::DOUBLE / greatest(n_chars, 1), 1.0) AS t2f,
                   least(coalesce(dup5_chars, 0)::DOUBLE / greatest(n_chars, 1), 1.0) AS d5f
            FROM base
            LEFT JOIN lc USING (doc_id)
            LEFT JOIN g2 USING (doc_id)
            LEFT JOIN g5 USING (doc_id)
        )
        SELECT doc_id,
               round(dlf + 1e-9, 6) AS dup_line_frac,
               round(dlcf + 1e-9, 6) AS dup_line_char_frac,
               round(t2f + 1e-9, 6) AS top2gram_char_frac,
               round(d5f + 1e-9, 6) AS dup5gram_char_frac,
               (round(dlf + 1e-9, 6) > %r OR round(dlcf + 1e-9, 6) > %r
                OR round(t2f + 1e-9, 6) > %r OR round(d5f + 1e-9, 6) > %r)
                   AS repetitious
        FROM j
    """ % (
        REP_DUP_LINE_MAX,
        REP_DUP_LINE_CHAR_MAX,
        REP_TOP2GRAM_MAX,
        REP_DUP5GRAM_MAX,
    )
