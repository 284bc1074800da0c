"""One-off A/B: LSH index build+probe cost at sf0.1 under different
AQE coalesce floors for the index write. Informs the q37 fix
(VERDICT r6 'Next round' #1).

CONCLUSION (r7): the minPartitionNum floors are INERT — Spark 4.1
ignores that conf for REPARTITION_BY_COL shuffles, so every trial
produced the same coalesced layout; the fix that shipped is an
explicit size-derived partition count in build_lsh_index (see
operators/ann_index.py). Kept as methodology documentation."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.session import get_spark
from etl_btc_spark import sinks as SK
from etl_btc_spark.operators import ann_index as ANN
from etl_btc_spark.plans.queries import REGISTRY, LSH_INDEX_PARAMS
from etl_btc_spark.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MINPN_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionNum"

spark = get_spark("ab-lsh-floor")
emb = load_table(spark, SF, "embeddings")
q37 = REGISTRY["q37_knn_lsh"]

# warm-up
q37.fn(spark, SF).write.mode("overwrite").format("noop").save()


def trial(label, floor):
    idx = SK.artifact_path(SF, "lsh_index")
    shutil.rmtree(idx, ignore_errors=True)
    prev = spark.conf.get(MINPN_KEY, None)
    if floor is not None:
        spark.conf.set(MINPN_KEY, str(floor))
    try:
        t0 = time.time()
        ANN.build_lsh_index(spark, emb, idx, **LSH_INDEX_PARAMS)
        build = time.time() - t0
    finally:
        if floor is not None:
            if prev is None:
                spark.conf.unset(MINPN_KEY)
            else:
                spark.conf.set(MINPN_KEY, prev)
    nfiles = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(os.path.join(idx, "bands"))
    )
    probes = []
    for _ in range(5):
        t0 = time.time()
        q37.fn(spark, SF).write.mode("overwrite").format("noop").save()
        probes.append(time.time() - t0)
    print(
        f"{label:24s} build={build:6.2f}s files={nfiles:3d} "
        f"probe_best={min(probes):.3f}s probes={[round(p,3) for p in probes]}",
        flush=True,
    )


trial("aqe-free (current)", None)
trial("floor=8", 8)
trial("floor=16", 16)
trial("floor=32", 32)
trial("aqe-free (repeat)", None)
