"""Training-data sampling, ordering & packing operators (§2.11
extensions, r4-r5) — everything an LLM pretraining pipeline runs
between "curated corpus" and "tokenized shards", all DETERMINISTIC
(pure functions of ids + salted md5 buckets, zero RNG state, so
re-runs/retries/incremental ingests make identical decisions and
every decision is expressible verbatim in the DuckDB oracles):

- **Stratified sampling** (`stratified_sample`) — keep a per-stratum
  fraction via a hash-bucket predicate. Scan + filter: zero shuffle.
- **Train/val/test split** (`train_val_test_split`) — salted bucket
  ranges; documents never migrate splits as the corpus grows, and
  the split salt is independent of the sampling salt.
- **Domain-mixture rebalance** (`domain_mix_rates`) — integer-exact
  per-domain keep rates from one count aggregate (downsample-only,
  output maximized at rate ≤ 1), fed back into the sampler.
- **Training-order shuffle** (`training_shuffle`) — seed-keyed md5
  permutation: hash shard + per-shard order window, no global sort;
  new seed = new epoch order.
- **Token packing** (`token_packing`) — GPT-style sequence packing
  via one exclusive-prefix-sum window per shard (id order, or a
  precomputed (shard, pos) layout such as the shuffle's); shard
  count is data-derived so parallelism scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_btc_spark.operators.textops import ws_token_count

#: hash-bucket modulus: md5-prefix-32-bit → 0..4294967295, reduced
#: mod 1e4 (32 bits, NOT 16 — review r8: 65536 mod 10000 would skew
#: low buckets by 7/6, exactly the bias hash_bucket's docstring
#: explains; 2^32 mod 10000 bias is ~1e-6)
BUCKETS = 10_000


def _md5_prefix32(id_col: Column, salt: str) -> Column:
    """The shared 32-bit hash every sampling decision derives from:
    first 8 hex chars of md5('<salt><id>') as a bigint. ONE
    implementation (plus its SQL mirror) keeps the bucket, split,
    and shuffle-shard draws bit-identical to their oracles."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")


def hash_bucket(id_col: Column, salt: str = "doc") -> Column:
    """Deterministic 0..9999 bucket from a document id: first 8 hex
    chars (32 bits) of md5('<salt><id>') — stable across engines,
    sessions and languages (the oracle computes the identical
    expression). 32 bits matter: a 16-bit prefix mod 10000 would make
    low buckets 7/6 as likely as high ones (65536 = 6·10000 + 5536),
    systematically over-sampling every stratum; at 32 bits the
    residue bias is ~2e-6. Distinct ``salt`` values give INDEPENDENT
    bucket draws — the split assignment salts differently from the
    sampling decision, so "kept by sampling" can't correlate with
    "lands in val"."""
    return (_md5_prefix32(id_col, salt) % BUCKETS).alias("bucket")


def hash_bucket_sql(id_col: str, salt: str = "doc") -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    return (
        f"(('0x' || substring(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {BUCKETS})"
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ``rates[stratum] / 10000`` of each stratum (unlisted
    strata are dropped). One scan, one pushed-down filter, zero
    shuffle; deterministic under retries and incremental re-runs."""
    if not rates:  # no strata enabled -> keep nothing, don't crash
        return df.filter(F.lit(False))
    rate = None
    for s, r in sorted(rates.items()):
        c = F.when(F.col(stratum_col) == s, F.lit(r))
        rate = c if rate is None else rate.when(F.col(stratum_col) == s, F.lit(r))
    rate = rate.otherwise(F.lit(0))
    return df.filter(hash_bucket(F.col(id_col)) < rate)


def stratified_sample_sql(rates: dict[str, int], stratum_col: str = "lang", id_col: str = "doc_id") -> str:
    if not rates:
        # mirror contract (review r8): stratified_sample({}) keeps
        # nothing; a zero-WHEN CASE is a DuckDB parse error, so emit
        # a valid always-false predicate instead
        return "(1 = 0)"
    cases = " ".join(f"WHEN {stratum_col} = '{s}' THEN {r}" for s, r in sorted(rates.items()))
    return f"{hash_bucket_sql(id_col)} < (CASE {cases} ELSE 0 END)"


def token_shard_sql(id_col: str = "doc_id", docs_per_shard: int = 65536) -> str:
    """DuckDB mirror of :func:`token_packing`'s derived shard key."""
    return f"CAST({id_col} // {docs_per_shard} AS BIGINT)"


def token_packing(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    docs_per_shard: int = 65536,
    shard_col: str | None = None,
    order_col: str | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document its position in the packed token stream:
    within a shard, docs concatenate in id order and the stream is
    cut every ``budget`` tokens. Returns (doc_id, shard, n_tokens,
    pack_id, pack_offset) where pack_id is the sequence index the
    document STARTS in and pack_offset its token offset there. A doc
    may straddle a boundary — exactly like pretraining packing, where
    sequences are cut mid-document.

    Sharding is DATA-DERIVED by default (round-5): ``shard = id DIV
    docs_per_shard``, so the shard count — and with it the packing
    window's parallelism — grows linearly with the corpus instead of
    being pinned to a constant (8 tasks each sorting 1/8th of 100 TB).
    A pure function of the row: zero extra passes, oracle-mirrorable
    verbatim, and append-only ingests (fresh ids) only ever extend the
    tail shards — existing pack assignments never move. Passing
    ``n_shards`` keeps the legacy ``id % n_shards`` interleave for
    callers that need a fixed shard count.

    ``shard_col``/``order_col`` pack along a PRECOMPUTED layout
    instead — e.g. :func:`training_shuffle`'s (shard, pos), so an
    epoch-shuffled corpus packs in shuffled order through the SAME
    cumsum implementation (one packing contract, used by q81, q86
    and the q93 capstone).

    ``tokens_col`` packs by a PRECOMPUTED per-doc token count instead
    of counting whitespace tokens from ``text_col`` — the r14 hook
    that lets the learned-BPE budget (operators/bpe.py) flow through
    the SAME packing contract (q99av)."""
    if shard_col is not None:
        shard = F.col(shard_col).cast("bigint")
        order = order_col if order_col is not None else id_col
    else:
        if order_col is not None:
            # review r7: this combination used to silently pack in id
            # order, discarding the caller's requested layout — the
            # order only has meaning alongside the precomputed shard
            raise ValueError(
                "token_packing: order_col requires shard_col (a "
                "precomputed layout); derived shards always pack in "
                "id order"
            )
        order = id_col
        if n_shards is not None:
            shard = (F.col(id_col) % n_shards).cast("bigint")
        else:
            # exact integer FLOOR division — DIV truncates toward
            # zero, which disagrees with the oracle's // (floor) for
            # negative ids (review r8); subtracting the nonnegative
            # pmod first makes DIV exact floor with no float round
            # trip (ids above 2^53 would round in double space)
            shard = F.expr(
                f"CAST(({id_col} - pmod({id_col}, {docs_per_shard}))"
                f" DIV {docs_per_shard} AS BIGINT)"
            )
    toks = (
        F.col(tokens_col).cast("bigint")
        if tokens_col is not None
        else ws_token_count(F.col(text_col))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = [F.col(id_col), shard.alias("shard")]
    if order != id_col:
        keep.append(F.col(order))
    t = df.select(*keep, toks.alias("n_tokens"))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        id_col,
        "shard",
        *([order] if order != id_col else []),
        "n_tokens",
        F.floor(cum / budget).cast("bigint").alias("pack_id"),
        (cum % budget).cast("bigint").alias("pack_offset"),
    )


def materialize_packs(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    ids_col: str = "bpe_ids",
    docs_per_shard: int = 65536,
) -> DataFrame:
    """Materialize the ACTUAL packed training sequences (r14 — the
    output half of the packing contract; :func:`token_packing` emits
    the assignments, this emits the batches a trainer consumes):
    within each derived shard, documents' token-id arrays concatenate
    in id order and the stream is cut every ``budget`` tokens. Output
    one row per (shard, pack_id): ``pack_ids`` in stream order and
    ``n_tokens`` (the tail pack of a shard may be short — kept, the
    padding/drop policy belongs to the trainer).

    Scale shape: the exclusive prefix-sum window runs per shard
    (parallelism grows with the corpus, the token_packing argument),
    then ONE token-level posexplode — unavoidable, the tokens ARE the
    output — shuffles into a (shard, pack_id) aggregation whose
    groups are bounded by ``budget`` rows each: perfectly even keys,
    no skew surface, and the per-group sort is an in-memory
    ``array_sort`` over ≤ budget elements."""
    from pyspark.sql import Window

    shard = F.expr(
        f"CAST(({id_col} - pmod({id_col}, {docs_per_shard}))"
        f" DIV {docs_per_shard} AS BIGINT)"
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = (
        df.select(F.col(id_col), shard.alias("shard"), F.col(ids_col).alias("__ids"))
        .withColumn("__n", F.coalesce(F.size("__ids"), F.lit(0)))
        .withColumn("__cum", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    )
    tok = t.select(
        "shard", "__cum", F.posexplode("__ids").alias("__i", "__tid")
    ).select(
        "shard",
        (F.col("__cum") + F.col("__i")).alias("__pos"),
        "__tid",
    )
    return (
        tok.groupBy(
            "shard", F.floor(F.col("__pos") / budget).cast("bigint").alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tid"))),
                lambda s: s["__tid"],
            ).alias("pack_ids"),
        )
    )


def _check_split_fractions(fractions: dict[str, int]) -> None:
    """Reject the two silently-wrong shapes: no labels at all, and
    widths past the bucket space (a label whose range starts beyond
    9999 would silently get less than its requested share)."""
    if not fractions:
        raise ValueError("train_val_test_split: fractions must be non-empty")
    if any(w < 0 for w in fractions.values()):
        # review r7: a negative width passed the sum check but shifted
        # every later label's range, silently zeroing out a split
        raise ValueError(
            "train_val_test_split: negative fraction widths %r"
            % {k: v for k, v in fractions.items() if v < 0}
        )
    if sum(fractions.values()) > BUCKETS:
        raise ValueError(
            "train_val_test_split: fraction widths sum to %d > %d buckets"
            % (sum(fractions.values()), BUCKETS)
        )


def train_val_test_split(
    df: DataFrame,
    fractions: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every document a held-out split label — the
    train/val/test assignment every training pipeline pins down
    before any model sees the data. ``fractions`` maps label →
    bucket count out of 10000, in PRIORITY ORDER of the sorted
    labels' cumulative ranges (default 9800/100/100
    train/val/test); fractions that don't sum to 10000 leave the
    remainder unassigned (split = NULL) — an explicit "held back"
    state, not a silent drop.

    Same scale shape as :func:`stratified_sample`: the label is a
    pure function of the id (salted independently of the sampling
    bucket, so sampling can't bias the split), zero shuffle, zero
    RNG state, identical decisions on re-runs and incremental
    ingests — a document NEVER migrates between splits as the
    corpus grows, which is the property ad-hoc ``rand()`` splits
    break."""
    if fractions is None:
        fractions = {"train": 9800, "val": 100, "test": 100}
    _check_split_fractions(fractions)
    b = hash_bucket(F.col(id_col), salt=salt)
    expr = None
    lo = 0
    for label, width in sorted(fractions.items()):
        cond = (b >= lo) & (b < lo + width)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += width
    return df.withColumn("split", expr.otherwise(F.lit(None)))


def train_val_test_split_sql(
    fractions: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB mirror of :func:`train_val_test_split`'s split CASE."""
    if fractions is None:
        fractions = {"train": 9800, "val": 100, "test": 100}
    _check_split_fractions(fractions)
    b = hash_bucket_sql(id_col, salt=salt)
    cases, lo = [], 0
    for label, width in sorted(fractions.items()):
        cases.append(f"WHEN {b} >= {lo} AND {b} < {lo + width} THEN '{label}'")
        lo += width
    return "CASE " + " ".join(cases) + " ELSE NULL END"


def domain_mix_rates(
    df: DataFrame,
    target: dict[str, int] | None = None,
    stratum_col: str = "source",
    weight_fn=None,
) -> dict[str, int]:
    """Per-domain keep rates (buckets out of 10000) that rebalance
    the corpus to a target mixture by DOWNSAMPLING only — the
    data-mixing step (Pile/DoReMi-style domain weights) run before
    packing. ``target`` maps domain → INTEGER relative weight
    (defaults to a balanced mix over the domains present); domains
    absent from an explicit target are dropped, like unlisted
    strata in :func:`stratified_sample`. ``weight_fn`` (domain →
    int weight) is the one-pass alternative to ``target``: weights
    are derived from the count aggregate's OWN domain list, so
    callers don't pay a separate distinct() scan just to enumerate
    domains (mutually exclusive with ``target``).

    Output size is maximized subject to keep_rate ≤ 1, in pure
    integer arithmetic (W = Σw):

        Mi     = min_d (count_d · W) // w_d
        rate_d = (10000 · w_d · Mi) // (W · count_d)   (≤ 10000)

    One count aggregate; the resulting dict is bounded by the
    number of domains (driver-safe) and feeds
    :func:`stratified_sample`, so the data pass stays a pushed-down
    scan+filter. Integer-only math means the DuckDB oracle
    reproduces the rates bit-for-bit from the same counts — no
    float-boundary drift in the keep predicate."""
    # argument check FIRST (review r8): after the aggregate, an
    # invalid call paid a corpus scan before failing — and on an
    # empty corpus the early return skipped validation entirely
    if target is not None and weight_fn is not None:
        raise ValueError("domain_mix_rates: pass target OR weight_fn, not both")
    counts = {
        r[stratum_col]: r["cnt"]
        for r in df.groupBy(stratum_col).agg(F.count("*").alias("cnt")).collect()
        if r[stratum_col] is not None
    }
    if not counts:
        return {}
    if target is None:
        target = {d: (weight_fn(d) if weight_fn else 1) for d in counts}
    weights = {d: w for d, w in target.items() if d in counts and w > 0}
    if not weights:
        return {}
    W = sum(weights.values())
    mi = min((counts[d] * W) // w for d, w in weights.items())
    return {
        d: (10_000 * w * mi) // (W * counts[d]) for d, w in weights.items()
    }


def domain_mix_rates_sql(
    weight_case: str, stratum_col: str = "source", table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`domain_mix_rates` as a CTE producing
    (stratum, rate): ``weight_case`` is a SQL expression OVER THE
    ALIAS ``s`` giving the same integer weights (e.g. ``CASE WHEN s
    = 'src0' THEN 3 ELSE 1 END``) — written against ``s`` directly
    so no string rewriting of the caller's expression is needed (a
    naive substring replace would corrupt literals containing the
    column name)."""
    return f"""
        c AS (SELECT {stratum_col} AS s, count(*) AS cnt
              FROM {table} WHERE {stratum_col} IS NOT NULL
              GROUP BY {stratum_col}),
        t AS (SELECT s, cnt, ({weight_case}) AS w FROM c
              WHERE ({weight_case}) > 0),
        ws AS (SELECT SUM(w) AS wsum FROM t),
        mi AS (SELECT MIN((cnt * wsum) // w) AS m FROM t, ws),
        r AS (SELECT s, (10000 * w * m) // (wsum * cnt) AS rate FROM t, ws, mi)
    """


def training_shuffle(
    df: DataFrame,
    seed: str = "epoch-0",
    n_shards: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    (shard, pos) coordinate in a pseudo-random permutation keyed by
    ``seed`` — change the seed per epoch for a fresh order, re-run
    the same seed for the identical one. No RNG state anywhere: the
    order key is ``md5(seed || id)``, so retries, partial re-runs
    and different cluster sizes all produce the same permutation
    (``rand()``-based shuffles break on every one of those).

    Scale shape — the way every distributed shuffle is built: hash
    into ``n_shards`` buckets, order WITHIN each shard by the md5
    hex key (one window per shard, parallelism = n_shards, no
    global sort); reading shards in (shard, pos) order yields the
    full permutation. The shard comes from the order key's own
    32-bit prefix mod n_shards — for a power-of-two ``n_shards``
    (the default) that reduction is EXACTLY uniform (n divides
    2^32), where reducing the 0..9999 sampling bucket would skew
    shards by up to ~11% at n=1024."""
    clash = {"shard", "okey", "pos"} & set(df.columns)
    if clash:
        raise ValueError(
            "training_shuffle: input already has column(s) %s — rename "
            "them first (the output claims shard/pos and okey is internal)"
            % sorted(clash)
        )
    okey = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    h32 = _md5_prefix32(F.col(id_col), seed)
    w = Window.partitionBy("shard").orderBy("okey", id_col)
    return (
        df.select(
            F.col("*"), (h32 % n_shards).alias("shard"), okey.alias("okey")
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("okey")
    )


def training_shuffle_sql(
    seed: str = "epoch-0", n_shards: int = 1024, id_col: str = "doc_id", table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`training_shuffle`."""
    okey = f"md5('{seed}' || CAST({id_col} AS VARCHAR))"
    return f"""
        SELECT {id_col}, shard,
               CAST(row_number() OVER (
                   PARTITION BY shard ORDER BY okey, {id_col}
               ) - 1 AS BIGINT) AS pos
        FROM (SELECT {id_col}, {okey} AS okey,
                     (('0x' || substring({okey}, 1, 8))::BIGINT % {n_shards}) AS shard
              FROM {table})
    """


def exact_n_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "doc",
) -> DataFrame:
    """Exactly-N deterministic sampling: keep the ``n_per_stratum``
    documents with the LOWEST salted md5 order key in each stratum —
    the "give me exactly 10k docs per language" request that
    rate-based :func:`stratified_sample` can only approximate.
    Deterministic and STABLE under growth in a one-sided way: a
    document only ever leaves the sample when a new document with a
    smaller key enters its stratum (hash-min reservoir semantics),
    never because of reordering. One rank window per stratum; at
    100 TB the window input can be pre-pruned with a bucket
    predicate (keep hash buckets well below n/|stratum| quantile)
    before ranking, making the sort input a sliver of the corpus."""
    if "__rn" in df.columns:
        raise ValueError("exact_n_sample: input must not carry a __rn column")
    okey = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(okey, id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: Column,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Derandomized Efraimidis–Spirakis weighted sampling WITHOUT
    replacement (r8): keep the ``n`` rows with the largest
    ``ln(u) / w`` where ``u ∈ (0,1)`` comes from the salted md5 of
    the id (same engine-portable hash as every sampler here) and
    ``w`` is the row's weight — quality-weighted corpus selection
    ("sample 1M docs, prefer high quality") is this exact op. The
    classic E-S key is ``u^(1/w)``; ``ln`` of it is monotone in it,
    better-conditioned for the cross-engine epsilon-round, and keeps
    the inclusion law: P(top-n) ∝ weight, deterministic under retries
    and incremental re-runs because there is no RNG state.

    Scale shape: one scan computing (key, weight) in codegen, a
    BROADCAST 1-row max-weight aggregate, and one TakeOrdered top-n —
    no data shuffle, no window, no driver data. Weights are floored
    at 1e-6 (a zero/negative weight would send the key to -inf and
    just means "never pick me, unless nothing else is left").

    The raw E-S log-key ln(u)/w is normalized by the corpus's MAX
    weight before the cross-engine epsilon-round (review r8): without
    the normalization, weights around 1e4 squeeze every key into
    [-0.0022, 0] and round(·, 6) collapses them into massive ties —
    selection degrades to lowest-id-first instead of P ∝ weight.
    ln(u)·w_max/w is a positive-constant multiple of the raw key
    (order-identical, so the inclusion law is untouched) whose top
    of the ranking always lives near 0 at unit scale, making the
    6-decimal round scale-invariant. w_max·(÷w) are single IEEE
    multiplies/divides — correctly rounded in every engine, so only
    ln() ULPs remain, same as every other ln-based oracle here.
    Ties break on id ascending.
    """
    clash = {"es_key", "w_max"} & set(df.columns)
    if clash:
        raise ValueError(
            "weighted_sample: input must not carry reserved columns %s"
            % sorted(clash)
        )
    u = (_md5_prefix32(F.col(id_col), salt) + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.greatest(weight_col.cast("double"), F.lit(1e-6))
    wmax = df.agg(F.max(w).alias("w_max"))
    key = F.round(F.lit(1e-9) + F.log(u) * F.col("w_max") / w, 6)
    return (
        df.crossJoin(F.broadcast(wmax))
        .withColumn("es_key", key)
        .drop("w_max")
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def weighted_sample_key_sql(
    weight_sql: str, id_col: str = "doc_id", salt: str = "wsample"
) -> str:
    """DuckDB mirror of :func:`weighted_sample`'s key expression.
    Expects a joined 1-row relation aliased ``wmax`` providing
    ``w_max`` (see :func:`weighted_sample_wmax_sql`)."""
    u = (
        f"((('0x' || substring(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
        f" + 0.5) / 4294967296.0)"
    )
    return (
        f"round(1e-9 + ln({u}) * wmax.w_max / greatest({weight_sql}, 1e-6), 6)"
    )


def weighted_sample_wmax_sql(weight_sql: str, table: str = "documents") -> str:
    """The 1-row max-weight subquery the key expression joins."""
    return f"(SELECT max(greatest({weight_sql}, 1e-6)) AS w_max FROM {table}) wmax"


def dsir_log_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — §2.11 extension,
    r11): score every document by how much more likely its hashed
    n-gram bag is under the TARGET distribution (the rows where
    ``is_target`` holds — a wiki-like/high-quality slice) than under
    the SOURCE (the whole corpus). The standard pretraining move for
    tilting a raw crawl toward a target domain: keep/resample docs by
    ``exp(log_weight)``; composes with :func:`weighted_sample` (use
    the weight as the ES key's weight) or a plain top-k.

    Model: bag of word unigrams + bigrams, hashed into ``n_buckets``
    via the shared salted-md5 draw (oracle-expressible, stable across
    engines), with add-1 smoothing per bucket — exactly the paper's
    hashed n-gram generative model. ``log_weight = Σ_feat [ln p̂_t(b)
    − ln p̂_s(b)]`` over the doc's feature occurrences.

    Plan shape at 100 TB: ONE tokenize→gram explode (persisted — the
    model aggregate and the scoring join both hang off it), one
    bucket-keyed partial-aggregated shuffle builds BOTH models in a
    single pass (conditional sum for the target counts — the target
    is a subset of the source, never a second corpus scan), the
    bucket model is n_buckets rows (broadcast to the scorer), and one
    per-doc aggregate emits the weights. Two corpus-wide shuffles,
    the q99/q99j budget. Docs with zero features (empty/NULL text)
    drop out, like the perplexity proxy. Deterministic: pure
    function of the corpus, zero RNG.
    """
    from etl_btc_spark.operators.dedup import _scoped_persist
    from etl_btc_spark.operators.textops import (
        _word_ngrams,
        normalize_text,
        ws_tokens,
    )

    toks = ws_tokens(normalize_text(F.col(text_col)))
    base = df.select(
        F.col(id_col), is_target.alias("__t"), toks.alias("__toks")
    )
    grams = base.select(
        F.col(id_col),
        "__t",
        F.explode(
            F.concat(
                F.filter(F.col("__toks"), lambda x: x != F.lit("")),
                _word_ngrams(F.col("__toks"), 2),
            )
        ).alias("gram"),
    )
    feats = _scoped_persist(
        grams.select(
            F.col(id_col),
            "__t",
            (_md5_prefix32(F.col("gram"), salt) % n_buckets).alias("b"),
        )
    )
    model = feats.groupBy("b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cs"),
    )
    totals = model.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns"))
    scored = model.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(float(n_buckets))))
            - F.log((F.col("cs") + F.lit(1.0)) / (F.col("ns") + F.lit(float(n_buckets))))
        ).alias("__lw"),
    )
    return (
        feats.join(F.broadcast(scored), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("__lw") + F.lit(1e-9), 6).alias("log_weight"),
        )
    )


def dsir_oracle_sql(
    target_pred_sql: str,
    n_buckets: int = 4096,
    salt: str = "dsir",
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`dsir_log_weights` — same tokenization
    as every text oracle, same salted-md5 bucket draw, same add-1
    smoothing arithmetic."""
    bucket = (
        f"(('0x' || substring(md5('{salt}' || gram), 1, 8))::BIGINT % {n_buckets})"
    )
    return f"""
        WITH w AS (
            SELECT doc_id, {target_pred_sql} AS is_t,
                   regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t
            FROM {table}
        ), grams AS (
            SELECT doc_id, is_t, gram FROM (
                SELECT doc_id, is_t, unnest(t) AS gram FROM w
            ) WHERE gram <> ''
            UNION ALL
            SELECT doc_id, is_t,
                   unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
            FROM w
        ), feats AS (
            SELECT doc_id, is_t, {bucket} AS b FROM grams
        ), model AS (
            SELECT b,
                   sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                   count(*) AS cs
            FROM feats GROUP BY b
        ), totals AS (
            SELECT sum(ct) AS nt, sum(cs) AS ns FROM model
        ), scored AS (
            SELECT b,
                   ln((ct + 1.0) / (nt + {float(n_buckets)}))
                   - ln((cs + 1.0) / (ns + {float(n_buckets)})) AS lw
            FROM model, totals
        )
        SELECT feats.doc_id,
               count(*) AS n_feats,
               round(1e-9 + sum(scored.lw), 6) AS log_weight
        FROM feats JOIN scored USING (b)
        GROUP BY feats.doc_id
    """
