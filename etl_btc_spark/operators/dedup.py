"""Deduplication suite (SURVEY.md §2.3 P6 + BASELINE.json §2.11):
exact, n-gram Jaccard, MinHash + LSH banding, SimHash, and
embedding-cosine near-dup.

Scale notes baked into each shape:

- exact: hash-groupBy on a content fingerprint — one shuffle with
  map-side partials; the canonical representative is min(id), never
  an arbitrary first() (deterministic under retries).
- pairwise Jaccard is O(n^2) and exists only as the small-scope
  verifier; the scalable path is MinHash banding, where expected
  candidates ~ true near-dups, then exact Jaccard on candidates only.
- MinHash permutations use fixed (a, b) parameters over a crc32 token
  base — fully deterministic across sessions, unlike MLlib's
  MinHashLSH random coefficients.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_btc_spark.operators.textops import fingerprint, normalize_text, ws_tokens

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keyed on the normalized-content fingerprint:
    one row per distinct content, deterministic representative
    (min id), duplicate count retained for audit."""
    return (
        df.withColumn("content_id", fingerprint(F.col(text_col)))
        .groupBy("content_id")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(c: Column, n: int = 1) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    toks = ws_tokens(normalize_text(c))
    if n == 1:
        return F.array_distinct(toks)
    # greatest(...) guard: < n words would otherwise make sequence()
    # descend (negative end) — emit one truncated gram instead
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def char_shingles(c: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles of normalized text."""
    norm = normalize_text(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: F.substring(norm, i, n),
    )
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1)).cast("double")


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (a < b). O(n^2) verifier
    — gate the input before calling; the scale path is
    :func:`minhash_lsh_candidates` + exact Jaccard on candidates."""
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), ngram).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair_j = jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            pair_j.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_perm(token_hash: Column, a: int, b: int) -> Column:
    """Universal-hash permutation over a 61-bit Mersenne prime field.

    ``a`` is bounded below 2^30 by the caller so ``a*crc32 + b``
    stays under 2^63 (ANSI mode would otherwise raise on overflow).
    """
    return (a * token_hash + b) % F.lit(_MERSENNE)


def minhash_signature(shingles: Column, n_hashes: int = 32, seed: int = 7) -> Column:
    """Array of ``n_hashes`` minima over deterministic permutations of
    crc32(shingle). Fixed (a, b) per permutation (seeded python RNG)
    so signatures are stable across runs and clusters."""
    import random

    rng = random.Random(seed)
    # a < 2^30: crc32 < 2^32, so a*h + b < 2^62 + 2^61 < 2^63 (no
    # 64-bit overflow under ANSI arithmetic)
    params = [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 61)) for _ in range(n_hashes)]
    base = F.transform(shingles, lambda s: F.crc32(s))
    mins = [
        F.array_min(F.transform(base, lambda h: _minhash_perm(h, a, b))) for a, b in params
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 8,
    ngram: int = 1,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding: signature →
    split into ``n_bands`` bands → self-join on identical
    (band, band-signature) buckets → distinct pairs (a < b).

    The self-join is a hash join on the band key, so total cost is
    O(sum of bucket sizes squared) — near-linear when near-dups are
    sparse. Exact-Jaccard verify on the candidate set afterward.
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(word_shingles(F.col(text_col), ngram), n_hashes)
    banded = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice(sig, b * rows_per_band + 1, rows_per_band).alias("bsig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dupes(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    **lsh_kwargs,
) -> DataFrame:
    """Scale-path near-dup pairs: LSH candidates, then exact Jaccard
    re-check >= threshold. Output (id_a, id_b, jaccard).

    Word *3-gram* shingles by default: unigram sets of topically
    similar docs overlap heavily (the fixture corpus averages ~0.6
    unigram Jaccard), which floods LSH buckets; 3-gram overlap of
    non-duplicates is ~0.001, so candidate volume ≈ true-dup volume.
    """
    cands = minhash_lsh_candidates(df, id_col, text_col, ngram=ngram, **lsh_kwargs)
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), ngram).alias("sh"))
    j = (
        cands.join(sh.alias("sa"), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sh.alias("sb"), F.col("id_b") == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", jaccard(F.col("sa.sh"), F.col("sb.sh")).alias("jaccard"))
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash64(c: Column) -> Column:
    """64-bit SimHash over word tokens: bit j of crc32-based token
    hash votes ±1; sign of the vote sum sets bit j. Near-dup docs
    have small Hamming distance between signatures."""
    toks = ws_tokens(normalize_text(c))
    # two independent 32-bit lanes -> 64 bits total
    h1 = F.transform(toks, lambda t: F.crc32(t))
    h2 = F.transform(toks, lambda t: F.crc32(F.concat(t, F.lit("#salt"))))
    out = F.lit(0).cast("long")
    for lane in (h1, h2):
        for j in range(32):
            vote = F.aggregate(
                lane,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            out = F.shiftleft(out, 1) + F.when(vote >= 0, 1).otherwise(0).cast("long")
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def embedding_near_dupes(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine >= threshold).
    O(n^2) verifier shape; at scale the same re-rank runs on
    similarity.knn_lsh band-bucket candidates instead of the full
    cross product."""
    from etl_btc_spark.operators.similarity import cosine

    v = df.select(F.col(id_col), F.col(vec_col).alias("v"))
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
