"""Vector similarity search (SURVEY.md §2.1 S8, §2.4 J3, §2.7 O5 +
BASELINE.json's similarity-search mandate).

Three tiers, in increasing scale:

1. :func:`cosine` / :func:`knn_exact` — exact brute force. The query
   vector is a one-row broadcast; the scan stays columnar and the
   top-k collapses to TakeOrderedAndProject (no global sort). Right
   answer for one query vector over any corpus size: O(n) scan,
   perfectly parallel.
2. :func:`knn_lsh` — random-hyperplane (signed random projection)
   LSH bucketing. Deterministic seeded planes, band-bucket join,
   exact re-rank inside candidate buckets. Sub-linear candidate set
   at 100 TB; recall tunable via (n_planes, n_bands).
3. :func:`knn_ivf` — IVF-style coarse quantization: k-means-ish
   centroids picked deterministically from the data (seeded sample),
   vectors assigned to nearest centroid at write time; queries probe
   the ``nprobe`` nearest centroids only.

All math is ``zip_with``/``aggregate`` fold in DOUBLE — JVM-side,
bit-compatible with the DuckDB oracle's list_dot_product.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Zero-norm-safe cosine: ``try_divide`` yields NULL instead of
    raising DIVIDE_BY_ZERO under ANSI mode (Spark 4.x default); the
    NULL is coalesced to 0.0 so degenerate vectors sort last
    deterministically instead of aborting the job."""
    return F.coalesce(F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0))


def pair_cosine_udf():
    """Arrow-batched pandas UDF: cosine of two equal-length vector
    columns, one numpy ``einsum`` per batch. The expression form
    (:func:`cosine`) is an interpreted higher-order-function fold —
    fine on O(n) rows, but a candidate-pair re-rank evaluates it on
    O(sum bucket²) rows where interpretation overhead dominates
    (~65 µs/pair vs ~10 ns/pair vectorized). Zero-norm pairs yield
    0.0, same as :func:`cosine`."""
    import numpy as np

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()

    def _kernel(a_rows: list, b_rows: list) -> "np.ndarray":
        a = np.array(a_rows, dtype=np.float64)
        b = np.array(b_rows, dtype=np.float64)
        dots = np.einsum("ij,ij->i", a, b)
        denom = np.sqrt(np.einsum("ij,ij->i", a, a)) * np.sqrt(np.einsum("ij,ij->i", b, b))
        with np.errstate(divide="ignore", invalid="ignore"):
            c = dots / denom
        c[~np.isfinite(c)] = 0.0
        return c

    @F.pandas_udf(T.DoubleType())
    def _udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        # NULL rows → 0.0, matching cosine()'s coalesce (review r8:
        # np.array over a mix of None and lists raised on the whole
        # batch, so one NULL vector killed the stage — parity with
        # the expression form means degrading per-row instead)
        null_mask = va.isna().to_numpy() | vb.isna().to_numpy()
        if null_mask.any():
            out = np.zeros(len(va), dtype=np.float64)
            ok = ~null_mask
            if ok.any():
                out[ok] = _kernel(
                    va[ok].tolist(), vb[ok].tolist()
                )
            return pd.Series(out)
        return pd.Series(_kernel(va.tolist(), vb.tolist()))

    return _udf


DOT_SQL = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def cosine_sql(a: str, b: str) -> str:
    d = DOT_SQL.format(a=a, b=b)
    na = DOT_SQL.format(a=a, b=a)
    nb = DOT_SQL.format(a=b, b=b)
    return f"coalesce({d} / nullif(sqrt({na}) * sqrt({nb}), 0), 0.0)"


def knn_exact(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame.

    ``crossJoin(broadcast(query))`` keeps the big side un-shuffled;
    ``orderBy().limit(k)`` becomes TakeOrderedAndProject (per-partition
    top-k + driver merge — no global sort at any scale).
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    return (
        vectors.crossJoin(q)
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def topk_per_group(
    scored: DataFrame, group: str, score: str, k: int, tiebreak: str
) -> DataFrame:
    """Per-group top-k via rank window (O5 per-group flavor)."""
    w = Window.partitionBy(group).orderBy(F.col(score).desc(), F.col(tiebreak))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# LSH: deterministic signed random projections
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (numpy PCG64, fixed
    seed) — reproducible across runs/sessions, unlike MLlib's
    per-fit randomness."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def band_signatures_np(vec, dim: int, n_bands: int, bits_per_band: int, seed: int = 42):
    """Band signatures of ONE vector, computed locally (numpy) with
    the same plane family as :func:`lsh_band_sig_udf` — used by index
    probes to turn the query's buckets into static pushdown
    predicates instead of a join side."""
    import numpy as np

    n_planes = n_bands * bits_per_band
    planes = np.array(_planes(dim, n_planes, seed), dtype=np.float64)
    weights = np.left_shift(1, np.arange(bits_per_band - 1, -1, -1, dtype=np.int64))
    bits = (planes @ np.asarray(vec, dtype=np.float64) >= 0).astype(np.int64)
    return [int(b) for b in bits.reshape(n_bands, bits_per_band) @ weights]


def lsh_band_sig_udf(dim: int, n_bands: int, bits_per_band: int, seed: int = 42):
    """Arrow-batched pandas UDF: array<float> vector → array<long> of
    ``n_bands`` band signatures (bit i of a band = sign(vec·plane_i)).

    All ``n_bands * bits_per_band`` hyperplane projections happen in
    ONE numpy matmul per Arrow batch ((batch, dim) @ (dim, planes)),
    replacing round 2's per-plane interpreted ``aggregate`` folds that
    made the "sub-linear" LSH path 7× slower than brute force
    (VERDICT.md "What's wrong" #2).
    """
    import numpy as np

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()
    n_planes = n_bands * bits_per_band
    planes = np.array(_planes(dim, n_planes, seed), dtype=np.float64)  # (planes, dim)
    weights = np.left_shift(
        1, np.arange(bits_per_band - 1, -1, -1, dtype=np.int64)
    )  # big-endian bit order == round 2's shiftleft loop

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        # review r7: empty Arrow batches and NULL vectors both crashed
        # the matmul (shape-(0,) and ragged None input) — a single
        # NULL embedding aborted the whole query. NULL in -> NULL sig
        # out (downstream posexplode drops the row, matching the
        # oracle's WHERE embedding IS NOT NULL).
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        null_mask = vecs.isna()
        if not null_mask.any():
            # r17 (optimization round, guide §4.2): the common all-
            # non-null batch stacks the Arrow-provided float32 arrays
            # directly — no per-row list() materialization. float32 →
            # float64 upcast is exact, so projections (and signs) are
            # bit-identical to the row-by-row path below.
            mat = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        else:
            rows = [([0.0] * dim if m else list(v)) for m, v in zip(null_mask, vecs)]
            mat = np.array(rows, dtype=np.float64)  # (batch, dim)
        bits = (mat @ planes.T >= 0).astype(np.int64)  # (batch, planes)
        sigs = bits.reshape(len(mat), n_bands, bits_per_band) @ weights  # (batch, bands)
        out = pd.Series(sigs.tolist())
        out[null_mask.to_numpy()] = None
        return out

    return _udf


def lsh_sigs_sql(
    vec_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bands: int = 8,
    bits_per_band: int = 4,
    seed: int = 42,
    prefix: str = "ls",
) -> str:
    """DuckDB CTE reproducing :func:`lsh_band_sig_udf`'s (band, sig)
    rows: ``{prefix}_sigs({id_col}, band, sig)``. The hyperplanes are
    data-independent constants of (dim, n_planes, seed) — their exact
    float64 reprs are inlined as literals (repr round-trips to the
    identical double), the same move as inlining MinHash's (a, b)
    params. Bit i of a band = sign(vec·plane), big-endian within the
    band, matching the numpy weights vector."""
    planes = _planes(dim, n_bands * bits_per_band, seed)
    rows = ",\n                  ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(planes)
    )
    weight_case = " ".join(
        f"WHEN {r} THEN {1 << (bits_per_band - 1 - r)}" for r in range(bits_per_band)
    )
    return f"""
        {prefix}_planes AS (
            SELECT * FROM (VALUES {rows}) AS p(plane, pv)
        ), {prefix}_sigs AS (
            SELECT e.{id_col}, p.plane // {bits_per_band} AS band,
                   sum(CASE WHEN list_dot_product(CAST(e.{vec_col} AS DOUBLE[]), p.pv) >= 0
                            THEN (CASE p.plane % {bits_per_band} {weight_case} END)
                            ELSE 0 END)::BIGINT AS sig
            FROM {vec_table} e, {prefix}_planes p
            WHERE e.{vec_col} IS NOT NULL
            GROUP BY 1, 2
        )
    """


def _banded(df: DataFrame, sig_udf, vec_col: str, keep: list[str]) -> DataFrame:
    """Explode per-vector band signatures to (band, sig) rows."""
    return df.select(
        *keep,
        F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig"),
    )


def knn_lsh(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bands: int = 8,
    bits_per_band: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidate = shares >=1 LSH band with the
    query; exact cosine re-rank on candidates only.

    Scale shape: vectors are exploded to n_bands (band, sig) rows
    carrying IDS ONLY (review r8: carrying the embedding through the
    ×n_bands explode and a groupBy-first duplicated every vector 8×
    through two shuffles — the re-rank joins vectors back by id on
    the deduped candidate set instead, the same posture
    embedding_near_dupes_lsh documents and the persisted-index probes
    use) and hash-joined against the query's (tiny, broadcast) band
    table: a sub-linear bucket probe instead of a full scan. At
    100 TB the banded table is the precomputed "index" (written once,
    bucketed by signature — see
    :mod:`etl_btc_spark.operators.ann_index`).
    """
    sig_udf = lsh_band_sig_udf(dim, n_bands, bits_per_band)
    v_banded = _banded(vectors, sig_udf, vec_col, [id_col])
    q_banded = F.broadcast(
        _banded(query.select(F.col(vec_col).alias("__qvec")), sig_udf, "__qvec", ["__qvec"])
    )
    cands = (
        v_banded.join(q_banded, ["band", "sig"])
        .groupBy(id_col)
        .agg(F.first("__qvec").alias("__qvec"))
    )
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    return (
        cands.join(vectors.select(id_col, vec_col), id_col)
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF: coarse quantization with deterministic centroids
# ---------------------------------------------------------------------------


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Pick ``n_centroids`` deterministic seed vectors (lowest ids —
    a stand-in for k-means; the assignment/probe plumbing is what
    matters) and assign every vector to its nearest centroid.

    Returns (assigned, centroids). At scale, ``assigned`` would be
    written partitioned by ``centroid_id`` so probes prune partitions.
    """
    # NULL embeddings can't seed or be assigned (review r8): unfiltered,
    # a NULL among the lowest ids became a degenerate all-sims-0
    # centroid and NULL rows tie-broke into centroid 1, surfacing as
    # sim-0.0 "neighbors" — the persisted-index family and every
    # DuckDB oracle drop NULLs, so this in-memory variant must too
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    centroids = F.broadcast(
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    scored = vectors.crossJoin(centroids).withColumn(
        "centroid_sim", cosine(F.col(vec_col), F.col("centroid_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("centroid_sim").desc(), F.col("centroid_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return assigned, centroids


def knn_ivf(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by similarity to the query, scan only
    vectors assigned to the ``nprobe`` best centroids, exact re-rank."""
    assigned, centroids = ivf_assign(vectors, n_centroids, vec_col, id_col)
    q = query.select(F.col(vec_col).alias("__qvec"))
    probe = F.broadcast(
        centroids.crossJoin(F.broadcast(q))
        .withColumn("sim", cosine(F.col("centroid_vec"), F.col("__qvec")))
        .orderBy(F.col("sim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id", "__qvec")
    )
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    return (
        assigned.join(probe, "centroid_id")
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_diagnostics(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding-space diagnostics (r7 extension): class
    size, mean L2 norm, and mean cosine-to-class-centroid (intra-class
    cohesion) — the standard pre-training sanity report over an
    embedding column (degenerate norms and collapsed classes surface
    here before a model trains on them).

    Scale shape: centroids come from ONE posexplode shuffle keyed
    (label, pos) — the aggregate output is labels x dim rows (tiny) —
    reassembled in order and joined back as a BROADCAST, then one
    per-label aggregate over the corpus. No driver-side collect, no
    all-pairs anything; NULL vectors are excluded (consistent with
    the index builders)."""
    vec = F.col(vec_col)
    base = df.filter(vec.isNotNull())
    comp = base.select(F.col(label_col), F.posexplode(vec).alias("pos", "v"))
    cen = comp.groupBy(label_col, "pos").agg(F.avg(F.col("v").cast("double")).alias("c"))
    centroids = cen.groupBy(label_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    return (
        base.join(F.broadcast(centroids), label_col)
        .select(
            F.col(label_col),
            norm(vec).alias("nrm"),
            cosine(vec, F.col("centroid")).alias("cos_c"),
        )
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm") + F.lit(1e-9), 6).alias("avg_norm"),
            F.round(F.avg("cos_c") + F.lit(1e-9), 6).alias("avg_centroid_cos"),
        )
    )


def embedding_diagnostics_oracle_sql() -> str:
    """DuckDB mirror of :func:`embedding_diagnostics` over the
    embeddings view (DuckDB lacks WITH ORDINALITY — subscripts come
    from generate_series instead; 1-based vs Spark's 0-based pos is
    irrelevant: only the ORDER is used to reassemble)."""
    cos = cosine_sql("e.embedding", "c.centroid")
    nrm = "sqrt(" + DOT_SQL.format(a="e.embedding", b="e.embedding") + ")"
    return f"""
        WITH e AS (
            SELECT label, embedding FROM embeddings WHERE embedding IS NOT NULL
        ), comp AS (
            SELECT label, i AS pos, embedding[i] AS v
            FROM e, UNNEST(generate_series(1, len(embedding))) AS t(i)
        ), cen AS (
            SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c
            FROM comp GROUP BY label, pos
        ), c AS (
            SELECT label, list(c ORDER BY pos) AS centroid FROM cen GROUP BY label
        )
        SELECT e.label,
               count(*) AS n,
               round(avg({nrm}) + 1e-9, 6) AS avg_norm,
               round(avg({cos}) + 1e-9, 6) AS avg_centroid_cos
        FROM e JOIN c USING (label)
        GROUP BY e.label
    """


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval): combine BOUNDED ranked
# lists from heterogeneous retrievers (BM25 postings probe, vector
# kNN, trigram search...) into one ranking — the standard
# Cormack/Clarke/Buettcher RRF used by every hybrid-search stack
# ---------------------------------------------------------------------------


#: upper bound on a single retriever list accepted by the fusers —
#: RRF's unpartitioned (rrf_fuse) / per-query (rrf_fuse_batched)
#: row_number windows are only safe because inputs are bounded top-n
#: candidate lists; this makes the contract ENFORCED instead of
#: assumed (VERDICT r12 #5, mirroring ann_index._query_batch_is_small)
RRF_MAX_CANDIDATES = 100_000


def _rrf_guard(
    df: DataFrame,
    part_cols: list,
    id_col: str,
    max_candidates: int,
    op: str = "rrf_fuse",
):
    """Plan-side contract checks for one fused input frame: (a) ids
    are unique within a ranked list (a duplicate would earn two ranks
    and silently sum both 1/(k+rank) terms, inflating that doc —
    ADVICE r12), (b) the list is bounded (the window sort is a
    single-task/tiny-partition sort only while inputs are top-n
    lists). Both run INSIDE the plan via two window counts +
    assert_true — bounded frames make the windows cheap, and the
    retriever plan is NOT evaluated twice (the posture
    tombstones.require_unique_ids takes with an extra job, done here
    lazily because the fusers' inputs may be expensive probe plans)."""
    w_id = Window.partitionBy(*part_cols, id_col)
    w_all = Window.partitionBy(*part_cols)
    chk = F.assert_true(
        (F.count(F.lit(1)).over(w_id) == 1)
        & (F.count(F.lit(1)).over(w_all) <= max_candidates),
        F.lit(
            "%s: each input must be a bounded ranked list with "
            "unique %s per list (duplicate ids would sum multiple "
            "reciprocal-rank terms; lists above %d rows exceed the "
            "bounded-top-n contract)" % (op, id_col, max_candidates)
        ),
    )
    # filter on the assert's NULL result so Catalyst can't prune the
    # check column away
    return df.withColumn("__rrf_chk", chk).filter(
        F.col("__rrf_chk").isNull()
    ).drop("__rrf_chk")


def rrf_fuse(
    frames: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
    max_candidates: int = RRF_MAX_CANDIDATES,
) -> DataFrame:
    """Fuse bounded ranked lists with reciprocal-rank fusion:
    ``score(d) = Σ_i 1 / (k_rrf + rank_i(d))`` over the lists that
    contain ``d`` (absence contributes nothing). ``frames`` is a list
    of ``(df, score_col)``; each df must be a BOUNDED candidate list
    (a probe's top-n — ≤ hundreds of rows), because ranks are
    assigned with an unpartitioned row_number window: that is a
    single-task sort over an already-bounded frame, NOT a corpus
    shuffle — the expensive work happened inside the retrievers,
    which scan their own pruned artifacts (postings / band dirs /
    codes). Rank ties break by id on every list, so fusion is
    deterministic and oracle-expressible end to end. Scores are
    rounded to 9 dp (sums of 1/(k+r) at distinct ranks differ far
    above that; the round kills float-association noise only).

    Contract (enforced): ``frames`` non-empty; within each list ids
    unique and row count ≤ ``max_candidates`` (checked in-plan by
    :func:`_rrf_guard` — a duplicated id would silently sum two
    reciprocal-rank terms, ADVICE r12).
    """
    if not frames:
        raise ValueError("rrf_fuse: at least one ranked list required")
    parts = []
    for df, score_col in frames:
        df = _rrf_guard(df, [], id_col, max_candidates)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        parts.append(
            df.select(
                F.col(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(k_rrf) + F.row_number().over(w))
                ).alias("__s"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(F.round(F.sum("__s") + F.lit(1e-9), 9).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )


def rrf_fuse_batched(
    frames: list[tuple[DataFrame, str]],
    query_col: str,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
    max_candidates: int = RRF_MAX_CANDIDATES,
) -> DataFrame:
    """Per-query RRF over batched retrieval joins: each input frame
    carries (query_col, id_col, score_col) rows — a retriever's
    per-query top-n — and ranks are assigned WITHIN each query
    (window partitioned by ``query_col``, so every partition is a
    bounded top-n list: no skew surface — a hot query still holds ≤ n
    rows per retriever). Output: per query, the fused top-k with the
    same deterministic tie-breaks as :func:`rrf_fuse`.

    Contract (enforced, per query partition): ``frames`` non-empty;
    (query, id) pairs unique and per-query list ≤ ``max_candidates``
    (:func:`_rrf_guard`)."""
    if not frames:
        raise ValueError("rrf_fuse_batched: at least one ranked list required")
    parts = []
    for df, score_col in frames:
        df = _rrf_guard(
            df, [query_col], id_col, max_candidates, op="rrf_fuse_batched"
        )
        w = Window.partitionBy(query_col).orderBy(
            F.col(score_col).desc(), F.col(id_col)
        )
        parts.append(
            df.select(
                F.col(query_col),
                F.col(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(k_rrf) + F.row_number().over(w))
                ).alias("__s"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, id_col).agg(
        F.round(F.sum("__s") + F.lit(1e-9), 9).alias("rrf_score")
    )
    w2 = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
