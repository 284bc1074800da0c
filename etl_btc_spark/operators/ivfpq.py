"""IVFPQ — the IVFADC composite index (K4 extension, r13).

The eighth persisted index family, and the structure billion-scale
ANN systems actually deploy (Jégou, Douze, Schmid 2011 §IVFADC — the
faiss ``IndexIVFPQ`` shape with the inner-product metric): a coarse
IVF quantizer splits the corpus into Voronoi lists, and each vector
stores only the PQ codes of its RESIDUAL against its list's centroid
— ``m`` bytes per document, scanned only for the ``nprobe`` probed
lists. Next to the repo's flat families this composes their two
pruning axes: the IVF family prunes the scan to probed lists but
stores 1 byte/dim int8 codes; the PQ family stores m bytes/vector
but scans ALL of them; IVFPQ scans m bytes/vector over probed lists
only — at 100 TB the probe touches ``nprobe/n_centroids`` of
``m/(4·dim)`` of the corpus bytes.

Inner-product ADC over residuals: ``dot(q, x) ≈ dot(q, c_list(x)) +
Σ_j dot(q_j, cb[j][code_j(x)])`` — one ``m × n_codes`` lookup table
per query (list-independent, unlike the L2 variant) plus one
per-probed-list constant ``dot(q, c)``, broadcast as an
``nprobe``-row frame.

Spark mapping:

- **Build**: the coarse centroids come from the IVF family's shared
  trainers (:func:`ann_index._warm_centroid_matrix` /
  :func:`ann_index._sampled_centroids` — warm-start rows make the
  whole probe chain SQL-expressible, the q99g trick). Residual
  codebooks come either from WARM-START ``codebook_ids`` (those
  corpus rows' residuals against their own assigned centroids become
  the codewords — also SQL-expressible) or from
  :func:`pq._train_codebooks` on a bounded TakeOrdered sample's
  residuals. Assignment (cosine argmax, first-max ties — the shared
  :func:`ann_index._top_m_centroids` semantics, n_assign fixed at 1
  like faiss) + residual + PQ encoding fuse into ONE ``mapInPandas``
  pass, so the fp32 vectors cross Arrow once. Codes persist
  partitioned by ``centroid_id`` — the probe's directory pruning.
- **Probe** (:func:`ivfpq_adc_topk` / :func:`knn_ivfpq_indexed`):
  rank the bounded centroid table, scan ONLY the ``nprobe`` probed
  partitions' codes (m bytes/vector), ADC-score via one numpy gather
  per subspace + a broadcast-joined per-list addend, then the
  family's exact fp32 re-rank from the base table — pruned to the
  candidates' vpart dirs via :func:`ann_index._pruned_rerank_base`.
- **Maintenance**: frozen centroids AND codebooks (the IVF/PQ
  posture — rebuild per corpus version restores fit; with warm-start
  geometry, maintenance ≡ rebuild exactly). Insert-only append
  encodes the batch and appends under its lists; update/delete go
  through the shared superseded-ids tombstone sidecar; compaction
  folds live rows to generation 0. Marker-first everywhere, so the
  family slots into ``stream_vector_index_maintain`` unchanged.

The reference's vector store exposes one flat HNSW collection
(init_qdrant.py); this family is the scale path past it.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark.operators import tombstones as TS
from etl_btc_spark.operators.ann_index import (
    _check_rerank_vparts,
    _is_built,
    _mark_built,
    _pruned_rerank_base,
    _require_built,
    _sampled_centroids,
    _top_m_centroids,
    _warm_centroid_matrix,
)
from etl_btc_spark.operators.dedup import spread
from etl_btc_spark.operators.pq import _train_codebooks


def _meta_path(path: str) -> str:
    return os.path.join(path, "_META")


def _write_meta(path: str, m: int, n_codes: int, dim: int, n_centroids: int) -> None:
    os.makedirs(path, exist_ok=True)
    with open(_meta_path(path), "w") as f:
        json.dump(
            {"m": m, "n_codes": n_codes, "dim": dim, "n_centroids": n_centroids}, f
        )


def _read_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def _collect_centroids(spark: SparkSession, path: str):
    """(cids int64, cmat_raw float64 (k, dim)) read back from the
    bounded centroids table, ordered by centroid_id."""
    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    cids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    cmat = np.array(
        [np.asarray(r["centroid_vec"], dtype=np.float64) for r in rows]
    )
    return cids, cmat


def _collect_codebooks(spark: SparkSession, path: str):
    """(meta, (m, n_codes, sub_d) float64 codebook tensor) — bounded
    by the codebook (m × n_codes rows), never the corpus."""
    import numpy as np

    meta = _read_meta(path)
    rows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    sub_d = meta["dim"] // meta["m"]
    cb = np.zeros((meta["m"], meta["n_codes"], sub_d), dtype=np.float64)
    for r in rows:
        cb[r["j"], r["c"]] = np.asarray(r["subvec"], dtype=np.float64)
    return meta, cb


def _normalized(cmat):
    import numpy as np

    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return cmat / norms


def _assign_residuals(vecs, cids, cmat):
    """Driver/executor-shared residual kernel: cosine argmax against
    the normalized centroids (first-max ties — the
    :func:`_top_m_centroids` semantics the IVF family assigns with),
    residual = vector − RAW assigned centroid. float32 inputs widen
    to float64, so the subtraction is EXACT and the SQL oracle's
    ``list_transform`` residual reproduces it bit-for-bit. Returns
    (assigned centroid_ids, residual matrix)."""
    best = _top_m_centroids(vecs, _normalized(cmat), 1)[:, 0]
    return cids[best], vecs - cmat[best]


def _assign_encode(
    spark: SparkSession, vectors: DataFrame, path: str, vec_col: str, id_col: str
) -> DataFrame:
    """(id, centroid_id, codes) rows for a vector frame against the
    artifact's FROZEN centroids + codebooks — the ONE encoder build,
    append and upsert share. Assignment, residual and PQ encoding
    fuse into a single ``mapInPandas`` pass (the ``_assign_quantized``
    lesson: fp32 vectors cross Arrow once)."""
    import numpy as np

    from etl_btc_spark._pickle import ensure_serializable

    meta, cb = _collect_codebooks(spark, path)
    cids, cmat = _collect_centroids(spark, path)
    m, sub_d = meta["m"], meta["dim"] // meta["m"]
    ensure_serializable()
    geo_bc = spark.sparkContext.broadcast((cids, cmat, cb))
    out_schema = T.StructType(
        [
            vectors.schema[id_col],
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("codes", T.BinaryType()),
        ]
    )

    def gen(batches):
        g_cids, g_cmat, g_cb = geo_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            assigned, resid = _assign_residuals(v, g_cids, g_cmat)
            out = np.zeros((len(v), m), dtype=np.uint8)
            for j in range(m):
                xs = resid[:, j * sub_d : (j + 1) * sub_d]
                c = g_cb[j]
                d = (
                    (xs * xs).sum(axis=1, keepdims=True)
                    - 2.0 * (xs @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                # argmin keeps the FIRST minimum -> smallest code wins
                # ties, the rule the SQL oracle's (dist, c) order applies
                out[:, j] = d.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid_id": assigned.astype("int32"),
                    "codes": [row.tobytes() for row in out],
                }
            )

    return (
        spread(vectors)
        .filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInPandas(gen, out_schema)
    )


def build_ivfpq_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    centroid_ids: list | None = None,
    codebook_ids: list | None = None,
    sample_rows: int = 65_536,
    sample_factor: int = 64,
    max_iters: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Write the IVFPQ artifact: (centroids table, residual-space
    codebooks, codes partitioned by centroid_id). ``centroid_ids``
    warm-starts the coarse quantizer from literal corpus rows
    (1-based rank in the sorted id list — the IVF convention);
    ``codebook_ids`` warm-starts the residual codebooks from those
    rows' residuals against their own assigned centroids (code =
    position in the ASCENDING-sorted id list, so the SQL oracle's
    vec_id-labeled codewords carry the same tie order). Either may be
    None: centroids then train via the shared sample-D²-Lloyd,
    codebooks via per-subspace k-means on a TakeOrdered sample's
    residuals — both deterministic, no RNG. ``dim % m == 0``
    required; ``n_codes ∈ [1, 256]`` (codes persist as uint8).

    A codebook_ids row whose residual is ~zero (the row IS a
    centroid) would waste a codeword — refused, since the caller
    controls both id lists."""
    import numpy as np

    vectors = vectors.filter(F.col(vec_col).isNotNull())
    first = vectors.select(vec_col).first()
    if first is None:
        raise ValueError("build_ivfpq_index: vectors input has no indexable rows")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(
            "build_ivfpq_index: dim %d is not divisible by m=%d" % (dim, m)
        )
    if not 1 <= n_codes <= 256:
        raise ValueError(
            "build_ivfpq_index: n_codes=%d out of range — codes are stored "
            "as one uint8 per subspace, so 1 <= n_codes <= 256" % n_codes
        )
    # --- coarse quantizer (shared IVF trainers) ---
    if centroid_ids is not None:
        cmat = _warm_centroid_matrix(
            vectors, centroid_ids, vec_col, id_col, "build_ivfpq_index"
        )
    else:
        cmat = _sampled_centroids(
            vectors, n_centroids, sample_factor, max_iters, vec_col, id_col,
            "build_ivfpq_index",
        )
    k = len(cmat)
    # Round the centroids through the dtype they will persist under
    # BEFORE computing any residuals: a float32 corpus stores float32
    # centroids, so training against unrounded float64 Lloyd centroids
    # would fit codebooks the encoder (which reads the artifact back)
    # never sees (ADVICE r13). Warm-start centroids are literal corpus
    # rows, already representable — the round-trip is a no-op there.
    if isinstance(vectors.schema[vec_col].dataType.elementType, T.FloatType):
        cmat = cmat.astype(np.float32).astype(np.float64)
    cids = np.arange(1, k + 1, dtype=np.int64)
    sub_d = dim // m
    # --- residual codebooks (frozen at build) ---
    if codebook_ids is not None:
        if len(codebook_ids) != n_codes:
            raise ValueError(
                "build_ivfpq_index: %d codebook_ids for n_codes=%d"
                % (len(codebook_ids), n_codes)
            )
        want = sorted(codebook_ids)
        if len(set(want)) != len(want):
            raise ValueError(
                "build_ivfpq_index: duplicate codebook_ids — each id maps "
                "to one code position, duplicates would shift the codes"
            )
        fetched = (
            vectors.filter(F.col(id_col).isin(want))
            .select(id_col, vec_col)
            .collect()
        )
        if len(fetched) > len(want):
            raise ValueError(
                "build_ivfpq_index: corpus has duplicate %s values among "
                "the codebook ids — dedup the corpus before indexing" % id_col
            )
        rows = {
            r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for r in fetched
        }
        missing = [i for i in want if i not in rows]
        if missing:
            raise ValueError(
                "build_ivfpq_index: codebook_ids not in corpus: %r" % missing
            )
        src = np.stack([rows[i] for i in want])
        _, resid = _assign_residuals(src, cids, cmat)
        flat = np.abs(resid).max(axis=1)
        if float(flat.min()) < 1e-12:
            # per-ROW check: one centroid row among the codebook ids
            # would silently ship a useless all-zero codeword
            bad = [want[i] for i in range(len(want)) if flat[i] < 1e-12]
            raise ValueError(
                "build_ivfpq_index: codebook_ids %r have ~zero residuals "
                "(the rows ARE centroids) — their residual codewords "
                "would be zero; pick non-centroid corpus rows" % bad
            )
        cb = np.stack(
            [resid[:, j * sub_d : (j + 1) * sub_d] for j in range(m)]
        )
    else:
        sample = [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in vectors.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(max(sample_rows, n_codes))
            .collect()
        ]
        if len(sample) < n_codes:
            raise ValueError(
                "build_ivfpq_index: %d sample rows < n_codes=%d"
                % (len(sample), n_codes)
            )
        _, resid = _assign_residuals(np.stack(sample), cids, cmat)
        cb = _train_codebooks(resid, m, n_codes)
    # --- publish: marker-first invalidation + supersede reset ---
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    TS.clear_tombstones(path)
    TS.clear_fold_debris(path)
    _write_meta(path, m, n_codes, dim, k)
    # cmat is already rounded through the persistence dtype above, so
    # writing the float64 values under the corpus vec_col's dataType is
    # lossless for BOTH float and double corpora (ADVICE r13: a blanket
    # fp32 downcast silently truncated array<double> centroids).
    cent_pdf = pd.DataFrame(
        {
            "centroid_id": [int(i) for i in cids],
            "centroid_vec": [
                [float(x) for x in cmat[i]] for i in range(k)
            ],
        }
    )
    cent_schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("centroid_vec", vectors.schema[vec_col].dataType),
        ]
    )
    spark.createDataFrame(cent_pdf, cent_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
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
    codes = _assign_encode(spark, vectors, path, vec_col, id_col)
    # pre-write clustering (the _write_ivf_artifact shape): bound the
    # artifact at ~max(parallelism, k) files while keeping every core
    # writing — the shuffle moves m-byte codes, never fp32
    par = spark.sparkContext.defaultParallelism
    fanout = max(1, par // max(k, 1))
    (
        TS.with_gen(codes, 0)
        .repartition(
            max(k * fanout, 1),
            F.col("centroid_id"),
            F.pmod(F.hash(F.col(id_col)), F.lit(fanout)),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "codes"))
    )
    _mark_built(path, "ivfpq")
    return path


def ensure_ivfpq_index(
    spark: SparkSession, vectors: DataFrame, path: str, **kw
) -> str:
    if not _is_built(path, "ivfpq"):
        build_ivfpq_index(spark, vectors, path, **kw)
    return path


def append_ivfpq_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    verify_new: bool = True,
    _premarked: bool = False,
) -> str:
    """Insert-only maintenance: assign + encode ONLY the batch against
    the frozen geometry and append its code rows under their lists —
    O(batch). The ``verify_new`` duplicate check is a LIVE-filtered
    id-column scan (a tombstone-deleted id legitimately re-enters —
    the delete contract); the codes table is centroid-partitioned, so
    unlike the PQ family the check can't prune by id hash — it reads
    two thin columns (id + gen), never the code bytes. ``_premarked``
    (sink-internal): the streaming sink takes ``_BUILT`` down before
    its table MERGE — True skips only the built-marker precondition."""
    if not _premarked:
        _require_built(path, "ivfpq")
    if verify_new:
        existing = TS.live_rows(
            spark,
            spark.read.parquet(os.path.join(path, "codes")).select(
                id_col, TS.GEN_COL
            ),
            path,
            id_col,
        ).select(id_col)
        if new_vectors.select(id_col).join(existing, id_col).limit(1).count():
            raise ValueError(
                "append_ivfpq_index: batch contains ids already indexed — "
                "IVFPQ append is insert-only; use upsert_ivfpq_index"
            )
    meta = _read_meta(path)
    codes = _assign_encode(spark, new_vectors, path, vec_col, id_col)
    codes = codes.repartition(max(meta["n_centroids"], 1), F.col("centroid_id"))
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    TS.with_gen(codes, TS.read_gen(path)).write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(os.path.join(path, "codes"))
    _mark_built(path, "ivfpq")
    return path


def upsert_ivfpq_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stale_ids: DataFrame | None = None,
    _premarked: bool = False,
) -> str:
    """O(batch) UPDATE via the shared superseded-ids sidecar: an
    updated id's stale code rows STAY under their old centroid's
    partition, dead by tombstone; the re-assignment appends under the
    new centroid at a bumped generation (frozen geometry ⇒ upsert ≡
    rebuild exactly, pinned by pytest and the q99am/q99an gates)."""
    if not _premarked and not _is_built(path, "ivfpq"):
        raise ValueError("upsert_ivfpq_index: no built index at %r" % path)
    TS.require_unique_ids(new_vectors, id_col, "upsert_ivfpq_index")
    if stale_ids is None:
        existing = (
            spark.read.parquet(os.path.join(path, "codes"))
            .select(id_col)
            .distinct()
        )
        stale_ids = new_vectors.select(id_col).join(existing, id_col, "semi")
    meta = _read_meta(path)
    codes = _assign_encode(spark, new_vectors, path, vec_col, id_col)
    codes = codes.repartition(max(meta["n_centroids"], 1), F.col("centroid_id"))
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(spark, stale_ids, path, id_col, dead_below=g)
    TS.with_gen(codes, g).write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(os.path.join(path, "codes"))
    _mark_built(path, "ivfpq")
    return path


def delete_ivfpq_ids(
    spark: SparkSession, ids: DataFrame, path: str, id_col: str = "vec_id"
) -> str:
    """O(batch) DELETE via the shared tombstone sidecar — the rows
    stay under their lists and die by tombstone; probes live-filter,
    compaction reclaims. Absent ids tombstone harmlessly."""
    _require_built(path, "ivfpq")
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    g = TS.bump_gen(path)
    TS.append_tombstones(
        spark, ids.select(id_col).distinct(), path, id_col, dead_below=g
    )
    _mark_built(path, "ivfpq")
    return path


def compact_ivfpq_index(
    spark: SparkSession, path: str, id_col: str = "vec_id"
) -> str:
    """Fold the supersede sidecar in: live code rows rewrite at gen 0
    in the centroid-partitioned layout, tombstones clear. No-op
    without tombstones; shadow + rename publish under the marker-down
    window; a fully-tombstoned index refuses cleanly."""
    _require_built(path, "ivfpq")
    if not TS.has_tombstones(path):
        return path
    TS.clear_fold_debris(path)
    live = TS.live_rows(
        spark, spark.read.parquet(os.path.join(path, "codes")), path, id_col
    ).drop(TS.GEN_COL)
    if live.limit(1).count() == 0:
        raise ValueError(
            "compact_ivfpq_index: every indexed id is tombstoned — the "
            "index is empty. Rebuild over the current corpus "
            "(build_ivfpq_index) or remove the artifact dir; compaction "
            "has nothing to fold."
        )
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    par = spark.sparkContext.defaultParallelism
    (
        TS.with_gen(live, 0)
        .repartition(
            par,
            F.col("centroid_id"),
            F.pmod(F.hash(F.col(id_col)), F.lit(max(2, par // 4))),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, ".codes_shadow"))
    )
    TS.fold_swap(path, "codes", ".codes_shadow")
    TS.clear_tombstones(path)
    _mark_built(path, "ivfpq")
    return path


def ivfpq_adc_topk(
    spark: SparkSession,
    path: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by inner-product ADC over the probed lists: rank the
    bounded centroid table against the query (cosine desc, id asc),
    scan ONLY the ``nprobe`` winners' code partitions (directory
    pruning — m bytes/vector over nprobe/n_centroids of the corpus),
    and score each candidate as ``dot(q, c_list) + Σ_j
    table[j][code_j]`` — the per-list constants travel as a broadcast
    nprobe-row frame, the lookup table as one numpy gather per
    subspace. Tombstoned rows live-filter out. Output: (id, adc_dot),
    adc desc / id asc — with warm-start geometry the whole chain is
    SQL-expressible (the q99am value gate)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable

    _require_built(path, "ivfpq")
    meta, cb = _collect_codebooks(spark, path)
    cids, cmat = _collect_centroids(spark, path)
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
    # centroid ranking on the driver (bounded k rows): cosine desc,
    # centroid_id asc — the _top_m_centroids tie rule
    qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
    sims = _normalized(cmat) @ qn
    order = sorted(range(len(cids)), key=lambda i: (-sims[i], cids[i]))
    probe = order[: max(nprobe, 1)]
    probe_ids = [int(cids[i]) for i in probe]
    addends = pd.DataFrame(
        {
            "centroid_id": probe_ids,
            "__qc": [float(cmat[i] @ qv) for i in probe],
        }
    )
    # the ADC lookup table: table[j, c] = dot(q_j, codebook[j][c]) —
    # list-independent under the inner-product metric
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
        out = np.zeros(len(arr), dtype=np.float64)
        for j in range(t.shape[0]):
            out += t[j][arr[:, j]]
        return pd.Series(out)

    codes = TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "codes")).filter(
            F.col("centroid_id").isin(probe_ids)  # partition pruning
        ),
        path,
        id_col,
    )
    adf = spark.createDataFrame(
        addends, "centroid_id int, __qc double"
    )
    return (
        codes.join(F.broadcast(adf), "centroid_id")
        .select(
            F.col(id_col),
            (F.col("__qc") + adc(F.col("codes"))).alias("adc_dot"),
        )
        .orderBy(F.col("adc_dot").desc(), F.col(id_col))
        .limit(k)
    )


def knn_ivfpq_indexed(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """IVFPQ probe with the family's exact tail: ADC shortlist over
    the probed lists, then exact fp32 cosine re-rank joined back from
    the base table by id — pruned to the candidates' vpart
    directories when the base table carries ``vpart_col``/
    ``n_table_parts`` (:func:`ann_index._pruned_rerank_base`).
    Output: (id, cosine_sim) top-k."""
    from etl_btc_spark.operators.similarity import cosine

    _check_rerank_vparts(vectors, vpart_col, n_table_parts)
    cand = ivfpq_adc_topk(
        spark,
        path,
        query,
        k=max(shortlist, k),
        nprobe=nprobe,
        vec_col=vec_col,
        id_col=id_col,
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


def knn_ivfpq_join(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    broadcast_max_queries: int = 200_000,
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Batched kNN JOIN against the IVFPQ artifact — the family's
    ``knn_lsh_join``/``knn_ivf_join``/``knn_pq_join``/``knn_hnsw_join``
    twin: N query vectors at once, the true 100 TB retrieval shape.

    1. the query batch collects once (bounded by
       ``broadcast_max_queries``) and ships as TWO bounded
       broadcasts: the residual ADC tables (Q × m × n_codes doubles)
       and a (query, probed list, dot(q, c)) addend frame — Q × nprobe
       rows, the coarse ranking done on the driver against the
       bounded centroid matrix;
    2. ONE codes scan pruned to the UNION of every query's probed
       lists (directory pruning on centroid_id); the broadcast-hash
       join against the addend frame fans each code row out to
       exactly the queries probing its list, and an Arrow-batched
       gather scores every (row, query) pair from that query's table;
    3. per-query rank window keeps the ``shortlist`` ADC candidates,
       and the exact fp32 cosine re-rank joins the base table by id —
       pruned to the candidates' vpart dirs — and the broadcast query
       vectors by query id.

    The fp32 corpus is never shuffled; the only corpus-shaped work is
    the m-bytes-per-row scan of the probed partitions, amortized
    across the whole query batch."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable
    from etl_btc_spark.operators.similarity import pair_cosine_udf

    _require_built(path, "ivfpq")
    _check_rerank_vparts(vectors, vpart_col, n_table_parts)
    meta, cb = _collect_codebooks(spark, path)
    cids, cmat = _collect_centroids(spark, path)
    m, sub_d = meta["m"], meta["dim"] // meta["m"]
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .limit(broadcast_max_queries + 1)
        .collect()
    )
    if len(qrows) > broadcast_max_queries:
        raise ValueError(
            "knn_ivfpq_join: query batch exceeds broadcast_max_queries=%d; "
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
    # coarse ranking for the whole batch: one (Q, k) matmul on the
    # driver (bounded by the centroid table) — per query, the nprobe
    # best lists + their dot(q, c) addends
    cn = _normalized(cmat)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0.0] = 1.0
    sims = (qmat / qnorm[:, None]) @ cn.T
    npr = max(min(nprobe, len(cids)), 1)
    addend_rows = []
    for qi in range(len(qids)):
        order = sorted(range(len(cids)), key=lambda i: (-sims[qi, i], cids[i]))
        for i in order[:npr]:
            addend_rows.append(
                (qi, int(cids[i]), float(cmat[i] @ qmat[qi]))
            )
    adf = spark.createDataFrame(
        pd.DataFrame(
            addend_rows, columns=["__qi", "centroid_id", "__qc"]
        ),
        "__qi int, centroid_id int, __qc double",
    )
    probe_union = sorted({r[1] for r in addend_rows})
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

    @pandas_udf("double")
    def adc_at(codes: pd.Series, qi: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        t = t_bc.value  # (Q, m, k)
        arr = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in codes]
        ).astype(np.int64)
        q = qi.to_numpy().astype(np.int64)
        out = np.zeros(len(arr), dtype=np.float64)
        for j in range(t.shape[1]):
            out += t[q, j, arr[:, j]]
        return pd.Series(out)

    codes = TS.live_rows(
        spark,
        spark.read.parquet(os.path.join(path, "codes")).filter(
            F.col("centroid_id").isin(probe_union)  # partition pruning
        ),
        path,
        id_col,
    )
    scored = codes.join(F.broadcast(adf), "centroid_id").select(
        "__qi",
        F.col(id_col),
        (F.col("__qc") + adc_at(F.col("codes"), F.col("__qi"))).alias("__adc"),
    )
    from pyspark.sql import Window

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
