"""Product-quantization (PQ) index (K4 extension, r11).

The third ANN compression scheme next to the int8 scalar quantization
the IVF artifact uses (the reference's Qdrant scalar quantization,
init_qdrant.py:51-57) and the hyperplane-LSH signatures: each vector
splits into ``m`` subspaces, each subspace quantizes to one of
``n_codes`` learned codewords, and a document costs ``m`` BYTES in the
index (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
Neighbor Search" — the faiss ``IndexPQ`` shape with the
inner-product/ADC metric). Probes never touch the fp32 corpus until
the re-rank: the query builds an ``m × n_codes`` lookup table of
subspace dot products once, and every candidate scores as ``m`` table
lookups + adds over its byte codes — asymmetric distance computation
(ADC).

Spark mapping:

- **Build**: codebooks come either from WARM-START rows (explicit
  corpus ids — their subvectors ARE the codewords, the q99g trick
  that makes the whole probe chain oracle-expressible) or from a
  deterministic per-subspace Lloyd's k-means over a bounded
  ``TakeOrdered`` sample on the driver (fixed iteration count,
  first-rows init, empty clusters keep their previous center — same
  input, same codebooks, every build). Encoding is one Arrow-batched
  pandas UDF pass: per subspace, argmin squared-L2 against the
  broadcast codebook (ties to the smallest code id), emitting ``m``
  uint8 codes packed as BINARY. The artifact is (codebooks parquet,
  codes parquet hash-partitioned on ``cpart = pmod(xxhash64(id),
  n_id_parts)`` — id-keyed maintenance prunes to the batch's
  directories, the doclen-registry lesson).
- **Probe** (:func:`pq_adc_topk` / :func:`knn_pq_indexed`): the ADC
  scan reads codes only (m bytes/vector — the point of PQ: the
  100 TB corpus scans as ~1/32 of its fp32 bytes); ``knn_pq_indexed``
  re-ranks an oversampled shortlist exactly from the base table, the
  same oversample-then-rescore tail every quantized family here uses.
- **Maintenance**: insert-only append encodes the batch against the
  FROZEN codebooks (codebook drift is the standard PQ trade — rebuild
  per corpus version restores fit, exactly the IVF posture);
  update/delete go through the shared superseded-ids tombstone
  sidecar; compaction folds live rows back to generation 0. All
  marker-first with the family's crash posture.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark.operators import tombstones as TS
from etl_btc_spark.operators.ann_index import (
    _check_rerank_vparts,
    _is_built,
    _mark_built,
    _pruned_rerank_base,
    _require_built,
)
from etl_btc_spark.operators.dedup import spread

#: codes-table partition modulus: id-keyed maintenance (append's
#: duplicate check, upsert's overlap scan, delete's victim scan)
#: prunes to the batch ids' directories instead of the corpus-sized
#: id column — the text index's doclen-registry posture
_PQ_ID_PARTS = 32


def _meta_path(path: str) -> str:
    return os.path.join(path, "_META")


def _write_meta(path: str, m: int, n_codes: int, dim: int) -> None:
    os.makedirs(path, exist_ok=True)
    with open(_meta_path(path), "w") as f:
        json.dump({"m": m, "n_codes": n_codes, "dim": dim}, f)


def _read_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def _cpart_of(id_col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(_PQ_ID_PARTS)).cast("int")


def _collect_codebooks(spark: SparkSession, path: str):
    """(m, n_codes, sub_d) float64 numpy codebook tensor read back
    from the artifact — bounded (m × n_codes rows), never the corpus."""
    import numpy as np

    meta = _read_meta(path)
    rows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    sub_d = meta["dim"] // meta["m"]
    cb = np.zeros((meta["m"], meta["n_codes"], sub_d), dtype=np.float64)
    for r in rows:
        cb[r["j"], r["c"]] = np.asarray(r["subvec"], dtype=np.float64)
    return meta, cb


def _train_codebooks(vectors, m: int, n_codes: int, iters: int = 10):
    """Deterministic per-subspace Lloyd's k-means over a driver-side
    numpy sample: init = the first ``n_codes`` sample rows' subvectors
    (callers pass an id-ordered sample, so the init is a pure function
    of the data), squared-L2 assignment with ties to the smaller code,
    fixed iteration count, emptied clusters keep their previous
    center. No RNG anywhere."""
    import numpy as np

    n, dim = vectors.shape
    sub_d = dim // m
    cb = np.zeros((m, n_codes, sub_d), dtype=np.float64)
    for j in range(m):
        x = vectors[:, j * sub_d : (j + 1) * sub_d]
        c = x[:n_codes].copy()
        for _ in range(iters):
            # ||x-c||^2 = x·x - 2 x·c + c·c ; argmin ties -> smaller c
            d = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = d.argmin(axis=1)
            for ci in range(n_codes):
                mask = assign == ci
                if mask.any():
                    c[ci] = x[mask].mean(axis=0)
        cb[j] = c
    return cb


def _encode_udf(cb_bc, m: int, sub_d: int):
    """Arrow-batched encoder: vector -> m uint8 codes as BINARY.
    Squared-L2 argmin per subspace against the broadcast codebooks
    (numpy argmin keeps the FIRST minimum — ties to the smallest code
    id, the same rule the SQL oracle's (dist, c) ordering applies)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()

    @pandas_udf("binary")
    def enc(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        cb = cb_bc.value  # (m, k, sub_d)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.zeros((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * sub_d : (j + 1) * sub_d]
            c = cb[j]
            d = (
                (xs * xs).sum(axis=1, keepdims=True)
                - 2.0 * (xs @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            out[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pd.Series([row.tobytes() for row in out])

    return enc


def _encoded(
    spark: SparkSession, vectors: DataFrame, path: str, vec_col: str, id_col: str
) -> DataFrame:
    """(id, cpart, codes) rows for a vector frame against the
    artifact's codebooks — the ONE encoder build, append and upsert
    share (family drift would silently corrupt ADC scores)."""
    meta, cb = _collect_codebooks(spark, path)
    cb_bc = spark.sparkContext.broadcast(cb)
    enc = _encode_udf(cb_bc, meta["m"], meta["dim"] // meta["m"])
    return (
        spread(vectors)
        .filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            _cpart_of(id_col).alias("cpart"),
            enc(F.col(vec_col)).alias("codes"),
        )
    )


def build_pq_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    m: int = 8,
    n_codes: int = 16,
    codebook_ids: list | None = None,
    sample_rows: int = 65_536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Write the PQ artifact. ``codebook_ids`` warm-starts the
    codebooks from literal corpus rows (their subvectors become the
    codewords — deterministic AND SQL-expressible, so the ADC probe
    carries a full value oracle, the q99g construction); ``None``
    trains per-subspace k-means on the id-ordered ``sample_rows``
    sample (TakeOrdered — no global sort). ``dim % m == 0`` required.
    Marker-first around the writes, same crash posture as the other
    families; a rebuild clears supersede history."""
    import numpy as np

    first = (
        vectors.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    )
    if first is None:
        raise ValueError("build_pq_index: vectors input has no indexable rows")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(
            "build_pq_index: dim %d is not divisible by m=%d" % (dim, m)
        )
    if not 1 <= n_codes <= 256:
        # codes persist as uint8 (ADVICE r11): with n_codes > 256 the
        # per-subspace argmin can exceed 255 and astype(uint8) would
        # silently WRAP, corrupting every encoded vector and every
        # ADC score with no error anywhere downstream
        raise ValueError(
            "build_pq_index: n_codes=%d out of range — codes are stored "
            "as one uint8 per subspace, so 1 <= n_codes <= 256" % n_codes
        )
    sub_d = dim // m
    if codebook_ids is not None:
        if len(codebook_ids) != n_codes:
            raise ValueError(
                "build_pq_index: %d codebook_ids for n_codes=%d"
                % (len(codebook_ids), n_codes)
            )
        rows = {
            r[id_col]: np.asarray(r[vec_col], dtype=np.float64)
            for r in vectors.filter(
                F.col(id_col).isin(list(codebook_ids))
                & F.col(vec_col).isNotNull()
            ).collect()
        }
        missing = [i for i in codebook_ids if i not in rows]
        if missing:
            raise ValueError(
                "build_pq_index: codebook_ids not found (or NULL): %r" % missing
            )
        mat = np.stack([rows[i] for i in codebook_ids])
        cb = np.stack(
            [mat[:, j * sub_d : (j + 1) * sub_d] for j in range(m)]
        )
    else:
        sample = [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in vectors.filter(F.col(vec_col).isNotNull())
            .select(id_col, vec_col)
            .orderBy(id_col)
            .limit(max(sample_rows, n_codes))
            .collect()
        ]
        if len(sample) < n_codes:
            raise ValueError(
                "build_pq_index: %d sample rows < n_codes=%d"
                % (len(sample), n_codes)
            )
        cb = _train_codebooks(np.stack(sample), m, n_codes)
    # marker-first invalidation + supersede-history reset (rebuild
    # re-derives from the source of truth)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    TS.clear_tombstones(path)
    TS.clear_fold_debris(path)
    _write_meta(path, m, n_codes, dim)
    cb_pdf = pd.DataFrame(
        {
            "j": [j for j in range(m) for _ in range(n_codes)],
            "c": [c for _ in range(m) for c in range(n_codes)],
            "subvec": [
                [float(v) for v in cb[j, c]]
                for j in range(m)
                for c in range(n_codes)
            ],
        }
    )
    spark.createDataFrame(
        cb_pdf, "j int, c int, subvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    codes = _encoded(spark, vectors, path, vec_col, id_col)
    (
        TS.with_gen(codes, 0)
        .repartition(_PQ_ID_PARTS, F.col("cpart"))
        .write.mode("overwrite")
        .partitionBy("cpart")
        .parquet(os.path.join(path, "codes"))
    )
    _mark_built(path, "pq")
    return path


def ensure_pq_index(spark: SparkSession, vectors: DataFrame, path: str, **kw) -> str:
    if not _is_built(path, "pq"):
        build_pq_index(spark, vectors, path, **kw)
    return path


def _pruned_codes(
    spark: SparkSession, path: str, batch_ids: DataFrame, id_col: str
) -> DataFrame:
    """Codes read pruned to the batch ids' cpart directories — the
    id-keyed maintenance lookups never scan the corpus-sized table."""
    touched = sorted(
        r[0]
        for r in batch_ids.select(_cpart_of(id_col).alias("p"))
        .distinct()
        .collect()
    )
    return spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("cpart").isin(touched) if touched else F.lit(False)
    )


def append_pq_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    verify_new: bool = True,
    _premarked: bool = False,
) -> str:
    """Insert-only maintenance: encode ONLY the batch against the
    frozen codebooks and append its code rows — O(batch), the IVF
    append posture (codebook drift is the rebuild-per-corpus-version
    trade). ``verify_new`` duplicate check reads only the batch's
    cpart directories, LIVE rows only (ADVICE r11): a tombstone-
    deleted id is a legitimate re-entry — its dead code rows must not
    refuse the append (the delete contract documents re-entry as a
    new doc, the text path's posture). ``_premarked`` (sink-internal,
    r12): the streaming sink takes ``_BUILT`` down before its table
    MERGE — True skips only the built-marker precondition."""
    if not _premarked:
        _require_built(path, "pq")
    if verify_new:
        existing = TS.live_rows(
            spark,
            _pruned_codes(spark, path, new_vectors.select(id_col), id_col),
            path,
            id_col,
        ).select(id_col)
        if new_vectors.select(id_col).join(existing, id_col).limit(1).count():
            raise ValueError(
                "append_pq_index: batch contains ids already indexed — "
                "PQ append is insert-only; use upsert_pq_index"
            )
    codes = _encoded(spark, new_vectors, path, vec_col, id_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    (
        TS.with_gen(codes, TS.read_gen(path))
        .repartition(1, F.col("cpart"))
        .write.mode("append")
        .partitionBy("cpart")
        .parquet(os.path.join(path, "codes"))
    )
    _mark_built(path, "pq")
    return path


def upsert_pq_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stale_ids: DataFrame | None = None,
    _premarked: bool = False,
) -> str:
    """O(batch) UPDATE via the shared superseded-ids sidecar: stale
    code rows die by tombstone, the batch's new codes append at a
    bumped generation (frozen codebooks — upsert ≡ rebuild at the
    same codebooks, pinned by pytest). ``stale_ids=None`` computes
    the overlap from the batch's cpart directories only."""
    if not _premarked and not _is_built(path, "pq"):
        raise ValueError("upsert_pq_index: no built index at %r" % path)
    TS.require_unique_ids(new_vectors, id_col, "upsert_pq_index")
    if stale_ids is None:
        existing = _pruned_codes(
            spark, path, new_vectors.select(id_col), id_col
        ).select(id_col).distinct()
        stale_ids = new_vectors.select(id_col).join(existing, id_col, "semi")
    codes = _encoded(spark, new_vectors, path, vec_col, id_col)
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(spark, stale_ids, path, id_col, dead_below=g)
    (
        TS.with_gen(codes, g)
        .repartition(1, F.col("cpart"))
        .write.mode("append")
        .partitionBy("cpart")
        .parquet(os.path.join(path, "codes"))
    )
    _mark_built(path, "pq")
    return path


def delete_pq_ids(
    spark: SparkSession, ids: DataFrame, path: str, id_col: str = "vec_id"
) -> str:
    """O(batch) DELETE via the shared tombstone sidecar; absent ids
    tombstone harmlessly. Marker-first."""
    _require_built(path, "pq")
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(
        spark, ids.select(id_col).distinct(), path, id_col, dead_below=g
    )
    _mark_built(path, "pq")
    return path


def compact_pq_index(spark: SparkSession, path: str, id_col: str = "vec_id") -> str:
    """Fold the supersede sidecar in: live code rows rewrite at gen 0
    in the cpart layout, tombstones clear. No-op without tombstones;
    shadow + rename publish under the marker-down window."""
    _require_built(path, "pq")
    if not TS.has_tombstones(path):
        return path
    TS.clear_fold_debris(path)
    live = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "codes")), path, id_col
    ).drop(TS.GEN_COL)
    if live.limit(1).count() == 0:
        # every code row tombstoned (ADVICE r11): the shadow write
        # would emit a ZERO-partition codes dir and subsequent reads
        # would die on parquet schema inference instead of a clean
        # refusal — name the state and the way out
        raise ValueError(
            "compact_pq_index: every indexed id is tombstoned — the "
            "index is empty. Rebuild over the current corpus "
            "(build_pq_index) or remove the artifact dir; compaction "
            "has nothing to fold."
        )
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    (
        TS.with_gen(live, 0)
        .repartition(_PQ_ID_PARTS, F.col("cpart"))
        .write.mode("overwrite")
        .partitionBy("cpart")
        .parquet(os.path.join(path, ".codes_shadow"))
    )
    TS.fold_swap(path, "codes", ".codes_shadow")
    TS.clear_tombstones(path)
    _mark_built(path, "pq")
    return path


def pq_adc_topk(
    spark: SparkSession,
    path: str,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ASYMMETRIC DISTANCE (inner-product ADC): the query
    builds one ``m × n_codes`` dot-product lookup table (driver-side
    numpy — bounded by the codebook, never the corpus) and every
    candidate scores as ``m`` byte-indexed lookups + adds over ONE
    pruned-column scan of the codes table (m bytes per vector — the
    1/32-of-fp32 scan that is PQ's point at 100 TB). Tombstoned rows
    live-filter out. Output: (id, adc_dot), adc desc / id asc —
    fully deterministic, and with warm-start codebooks the whole
    chain is SQL-expressible (the q99ad value gate)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable

    _require_built(path, "pq")
    meta, cb = _collect_codebooks(spark, path)
    qrow = query.select(F.col(vec_col).alias("__qv")).first()
    if qrow is None or qrow["__qv"] is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    spark.read.parquet(os.path.join(path, "codes")).schema[id_col],
                    T.StructField("adc_dot", T.DoubleType()),
                ]
            ),
        )
    qv = np.asarray(qrow["__qv"], dtype=np.float64)
    m, sub_d = meta["m"], meta["dim"] // meta["m"]
    # the ADC lookup table: table[j, c] = dot(q_j, codebook[j][c])
    table = np.stack(
        [cb[j] @ qv[j * sub_d : (j + 1) * sub_d] for j in range(m)]
    )
    ensure_serializable()
    t_bc = spark.sparkContext.broadcast(table)

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        t = t_bc.value
        arr = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in codes]
        ).astype(np.int64)
        # one gather per subspace, summed — no per-row python
        out = np.zeros(len(arr), dtype=np.float64)
        for j in range(t.shape[0]):
            out += t[j][arr[:, j]]
        return pd.Series(out)

    codes = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "codes")), path, id_col
    )
    return (
        codes.select(F.col(id_col), adc(F.col("codes")).alias("adc_dot"))
        .orderBy(F.col("adc_dot").desc(), F.col(id_col))
        .limit(k)
    )


def knn_pq_indexed(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """PQ probe with the family's exact tail: ADC shortlist of
    ``shortlist`` candidates (codes-only scan), then exact fp32
    cosine re-rank joined back from the base table by id — the
    oversample-then-rescore shape the int8 IVF and HNSW probes use,
    pruned to the candidates' vpart directories when the base table
    carries ``vpart_col``/``n_table_parts``
    (:func:`ann_index._pruned_rerank_base` — r12, VERDICT r11 #1).
    Output: (id, cosine_sim) top-k."""
    from etl_btc_spark.operators.similarity import cosine

    _check_rerank_vparts(vectors, vpart_col, n_table_parts)
    cand = pq_adc_topk(
        spark, path, query, k=max(shortlist, k), vec_col=vec_col, id_col=id_col
    ).select(id_col)
    qrow = query.select(F.col(vec_col).alias("__qv")).first()
    if qrow is None or qrow["__qv"] is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    vectors.schema[id_col],
                    T.StructField("cosine_sim", T.DoubleType()),
                ]
            ),
        )
    base, cand = _pruned_rerank_base(
        vectors, cand, id_col, vpart_col, n_table_parts, stats_out
    )
    qcol = F.array(*[F.lit(float(v)) for v in qrow["__qv"]])
    return (
        base.join(cand, id_col)
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_pq_join(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    broadcast_max_queries: int = 200_000,
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Batched kNN JOIN against the PQ artifact — the family's
    ``knn_lsh_join``/``knn_ivf_join``/``knn_hnsw_join`` twin: N query
    vectors at once, the true 100 TB retrieval shape.

    1. the query batch collects once (bounded by
       ``broadcast_max_queries`` — a larger batch must be chunked by
       the caller) and its ADC lookup tables travel as ONE broadcast
       tensor (Q × m × n_codes doubles — codebook-sized per query,
       never corpus-sized);
    2. ONE pruned-column scan of the codes table scores every (row,
       query) pair — a single numpy gather+add per Arrow batch per
       subspace, emitted as an array and exploded to (query, id, adc);
    3. per-query rank window keeps the ``shortlist`` ADC candidates,
       and the exact fp32 cosine re-rank joins the base table by id
       and the broadcast query vectors by query id — the family's
       oversample-then-rescore tail.

    The fp32 corpus is never shuffled; the only corpus-shaped work is
    the m-bytes-per-row codes scan, amortized across the whole query
    batch."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable
    from etl_btc_spark.operators.similarity import pair_cosine_udf

    _require_built(path, "pq")
    _check_rerank_vparts(vectors, vpart_col, n_table_parts)
    meta, cb = _collect_codebooks(spark, path)
    m, sub_d = meta["m"], meta["dim"] // meta["m"]
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .limit(broadcast_max_queries + 1)
        .collect()
    )
    if len(qrows) > broadcast_max_queries:
        raise ValueError(
            "knn_pq_join: query batch exceeds broadcast_max_queries=%d; "
            "chunk the batch" % broadcast_max_queries
        )
    out_fields = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[id_col].dataType),
            T.StructField(id_col, vectors.schema[id_col].dataType),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    if not qrows:
        return spark.createDataFrame([], out_fields)
    qids = [r[id_col] for r in qrows]
    qmat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    # (Q, m, n_codes): tables[q, j, c] = dot(query_q_sub_j, cb[j][c])
    tables = np.stack(
        [
            np.stack(
                [cb[j] @ qv[j * sub_d : (j + 1) * sub_d] for j in range(m)]
            )
            for qv in qmat
        ]
    )
    ensure_serializable()
    t_bc = spark.sparkContext.broadcast(tables)

    @pandas_udf("array<double>")
    def adc_all(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        t = t_bc.value  # (Q, m, k)
        arr = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in codes]
        ).astype(np.int64)
        out = np.zeros((len(arr), t.shape[0]), dtype=np.float64)
        for j in range(t.shape[1]):
            # (Q, rows): every query's subspace-j lookup in one gather
            out += t[:, j, :][:, arr[:, j]].T
        return pd.Series([row for row in out])

    codes = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "codes")), path, id_col
    )
    scored = codes.select(
        F.col(id_col), F.posexplode(adc_all(F.col("codes"))).alias("__qi", "__adc")
    )
    w = Window.partitionBy("__qi").orderBy(F.col("__adc").desc(), F.col(id_col))
    cand = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max(shortlist, k))
        .select("__qi", id_col)
    )
    vectors, cand = _pruned_rerank_base(
        vectors, cand, id_col, vpart_col, n_table_parts, stats_out
    )
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "__qi": list(range(len(qids))),
                query_id_col: qids,
                # plain floats, not numpy scalars: without Arrow (a plain
                # foreign SparkSession) the strict type-verifier rejects
                # numpy.float64 inside an array<float> column
                "__qvec": [[float(x) for x in v] for v in qmat],
            }
        ),
        T.StructType(
            [
                T.StructField("__qi", T.IntegerType()),
                T.StructField(query_id_col, queries.schema[id_col].dataType),
                T.StructField("__qvec", queries.schema[vec_col].dataType),
            ]
        ),
    )
    cos = pair_cosine_udf()
    reranked = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "__qi")
        .select(
            query_id_col,
            F.col(id_col),
            cos(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
