"""sf0.1 upsert-equivalence sweep (r10, VERDICT r9 #4): re-verify the
tombstone-sidecar UPDATE paths at 10x the driver gate's data, with the
same probe-equivalence contract the pytest family pins at toy scale
(tests/test_tombstones.py). The text and trigram families are covered
at sf0.1 by the q99r/q99s lifecycle queries under the DuckDB value
gate (scripts/selfcheck.py); this script covers the three families
whose probes are not oracle-expressible at this scale: MinHash bands,
hyperplane LSH, and IVF.

For each family over the REAL sf0.1 tables:
  build over the base corpus -> upsert a 200-row mutated batch ->
  probe == probe of a from-scratch rebuild over the updated corpus
  (frozen-centroid twin for IVF) -> compact -> probe still equal.

Usage: python scripts/sweep_upserts_sf01.py [sf_dir]
Prints one PASS/FAIL line per family; exits nonzero on any FAIL.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_btc_spark.operators import ann_index as ANN  # noqa: E402
from etl_btc_spark.operators import dedup as DD  # noqa: E402
from etl_btc_spark.plans.queries import (  # noqa: E402
    IVF_INDEX_PARAMS,
    LSH_INDEX_PARAMS,
)
from etl_btc_spark.session import get_spark  # noqa: E402
from etl_btc_spark.tables import load_table  # noqa: E402

ROOT = os.path.join(
    os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", "/root/repo/.artifacts"),
    "sweep_upserts",
)


def sweep_minhash(spark, sf_dir: str) -> bool:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") < 200).withColumn(
        "text", F.concat(F.col("text"), F.lit(" rewritten sweep variant xyz"))
    )
    updated = docs.filter(F.col("doc_id") >= 200).unionByName(batch)
    path = os.path.join(ROOT, "mh")
    rebuilt = os.path.join(ROOT, "mh_rebuilt")
    DD.build_minhash_index(spark, docs, path)
    DD.upsert_minhash_index(spark, batch, path, stale_ids=batch.select("doc_id"))
    DD.build_minhash_index(spark, updated, rebuilt)
    # probes: near-dups of updated text (must hit), old text (must not
    # resolve to the updated id), untouched text (unchanged behavior)
    probe = (
        batch.filter(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 900000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 910000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= 1000) & (F.col("doc_id") < 1010)
            ).select((F.col("doc_id") + 920000).alias("doc_id"), "text")
        )
    )

    def run(p):
        out = sorted(
            (r["batch_id"], r["corpus_id"], round(r["jaccard"], 6))
            for r in DD.incremental_near_dupes(
                spark, p, updated, probe, 0.8
            ).collect()
        )
        DD.release_scoped_caches()
        return out

    got, want = run(path), run(rebuilt)
    ok = got == want and len(want) > 0
    DD.compact_minhash_index(spark, path)
    ok = ok and run(path) == want
    print("minhash_upsert sf0.1: %s (%d probe pairs)" % ("PASS" if ok else "FAIL", len(want)))
    return ok


def sweep_lsh(spark, sf_dir: str) -> bool:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    moved = emb.filter(F.col("vec_id") < 200).withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.25))
    )
    updated = emb.filter(F.col("vec_id") >= 200).unionByName(moved)
    path = os.path.join(ROOT, "lsh")
    rebuilt = os.path.join(ROOT, "lsh_rebuilt")
    ANN.build_lsh_index(spark, emb, path, **LSH_INDEX_PARAMS)
    ANN.upsert_lsh_index(spark, moved, path, stale_ids=moved.select("vec_id"))
    ANN.build_lsh_index(spark, updated, rebuilt, **LSH_INDEX_PARAMS)

    queries = [
        updated.filter(F.col("vec_id") == vid).select(
            (F.col("vec_id") + 990000).alias("vec_id"), "embedding"
        )
        for vid in (0, 5, 1000)
    ]

    def run(p):
        out = []
        for q in queries:
            out.append(
                [
                    (r["vec_id"], round(r["cosine_sim"], 6))
                    for r in ANN.knn_lsh_indexed(
                        spark, p, updated, q, k=10, **LSH_INDEX_PARAMS
                    ).collect()
                ]
            )
            ANN.release_scoped_broadcasts()
        return out

    got, want = run(path), run(rebuilt)
    ok = got == want and all(len(w) > 0 for w in want)
    ANN.compact_lsh_index(spark, path)
    ok = ok and run(path) == want
    print("lsh_upsert sf0.1: %s" % ("PASS" if ok else "FAIL"))
    return ok


def sweep_ivf(spark, sf_dir: str) -> bool:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    moved = emb.filter(F.col("vec_id") < 200).withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.25))
    )
    updated = emb.filter(F.col("vec_id") >= 200).unionByName(moved)
    path = os.path.join(ROOT, "ivf")
    twin = os.path.join(ROOT, "ivf_twin")
    ANN.build_ivf_index(spark, emb, path, **IVF_INDEX_PARAMS)
    ANN.upsert_ivf_index(spark, moved, path, stale_ids=moved.select("vec_id"))
    # frozen-centroid twin: re-assign the updated corpus under THIS
    # index's centroid matrix (upserts never move centroids)
    cents = sorted(
        spark.read.parquet(os.path.join(path, "centroids")).collect(),
        key=lambda r: r["centroid_id"],
    )
    cmat = np.array([r["centroid_vec"] for r in cents], dtype=np.float64)
    ANN._write_ivf_artifact(
        spark, updated, twin, cmat, len(cents), "embedding", "vec_id", n_assign=2
    )

    queries = [
        updated.filter(F.col("vec_id") == vid).select(
            (F.col("vec_id") + 990000).alias("vec_id"), "embedding"
        )
        for vid in (0, 5, 1000)
    ]

    def run(p):
        out = []
        for q in queries:
            out.append(
                [
                    (r["vec_id"], round(r["cosine_sim"], 6))
                    for r in ANN.knn_ivf_indexed(
                        spark, p, updated, q, k=8, nprobe=2
                    ).collect()
                ]
            )
            ANN.release_scoped_broadcasts()
        return out

    got, want = run(path), run(twin)
    ok = got == want and all(len(w) > 0 for w in want)
    ANN.compact_ivf_index(spark, path)
    ok = ok and run(path) == want
    print("ivf_upsert sf0.1: %s" % ("PASS" if ok else "FAIL"))
    return ok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark("sweep-upserts")
    ok = sweep_minhash(spark, sf_dir)
    ok = sweep_lsh(spark, sf_dir) and ok
    ok = sweep_ivf(spark, sf_dir) and ok
    shutil.rmtree(ROOT, ignore_errors=True)
    print("0 failures" if ok else "SWEEP FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
