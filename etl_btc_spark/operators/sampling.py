"""Training-data sampling & packing operators (§2.11 extensions, r4).

Two operations every LLM pretraining pipeline runs between "corpus"
and "tokenized shards":

- **Stratified sampling** — rebalance the language/source mix by
  keeping a per-stratum fraction of documents. Deterministic: the
  keep/drop decision is a pure function of the document id (an
  md5-prefix hash bucket), so re-runs, retries and incremental
  ingests make identical decisions — no RNG state, no seed plumbing,
  and the SAME predicate is expressible in any engine (the DuckDB
  oracle runs it verbatim). At 100 TB this is a scan + filter:
  pushdown-friendly, zero shuffle.

- **Token packing** — GPT-style sequence packing: concatenate the
  token stream in a deterministic document order and cut it into
  fixed-budget sequences; each document lands at (pack_id, offset).
  Computed as one per-shard cumulative-sum window (exclusive prefix
  sum over doc order), so the shuffle is bounded by the shard key —
  the 100 TB shape is "pack within shard", embarrassingly parallel
  across shards, and each shard's window is a single ordered pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_btc_spark.operators.textops import ws_token_count

#: hash-bucket modulus: md5-prefix-16-bit → 0..65535, reduced mod 1e4
BUCKETS = 10_000


def hash_bucket(id_col: Column) -> Column:
    """Deterministic 0..9999 bucket from a document id: first 8 hex
    chars (32 bits) of md5('doc<id>') — stable across engines,
    sessions and languages (the oracle computes the identical
    expression). 32 bits matter: a 16-bit prefix mod 10000 would make
    low buckets 7/6 as likely as high ones (65536 = 6·10000 + 5536),
    systematically over-sampling every stratum; at 32 bits the
    residue bias is ~2e-6."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("doc"), id_col.cast("string"))), 1, 8), 16, 10)
    return (h.cast("bigint") % BUCKETS).alias("bucket")


def hash_bucket_sql(id_col: str) -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    return (
        f"(('0x' || substring(md5('doc' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
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
    callers that need a fixed shard count."""
    if n_shards is not None:
        shard = (F.col(id_col) % n_shards).cast("bigint")
    else:
        # exact integer division (DIV), not floor(double) — ids above
        # 2^53 would round in float space
        shard = F.expr(f"CAST({id_col} DIV {docs_per_shard} AS BIGINT)")
    toks = ws_token_count(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = df.select(F.col(id_col), shard.alias("shard"), toks.alias("n_tokens"))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum / budget).cast("bigint").alias("pack_id"),
        (cum % budget).cast("bigint").alias("pack_offset"),
    )
