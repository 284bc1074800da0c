"""A/B: spark.sql.adaptive.coalescePartitions.minPartitionSize.

r17 profile finding: at bench scale (sf0.1, sub-MB shuffles) AQE's
partition coalescing collapses window/re-rank stages to 1-5 tasks
(q17's whole Bollinger window chain ran on ONE core for 595 ms of a
894 ms query). `parallelismFirst=true` (default) ignores the advisory
size and packs partitions to `minPartitionSize` (default 1 MB) — so a
1.5 MB shuffle becomes 1-2 tasks no matter how many cores are idle.

Interleaved A/B in ONE JVM (the ab_partition_floor.py methodology):
each rep flips the runtime conf, runs every query once, alternating,
so machine drift hits both arms equally.

Usage: python scripts/ab_aqe_minpartition.py [sf_dir] [minsize]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.operators.dedup import release_scoped_caches  # noqa: E402
from etl_btc_spark.operators.ann_index import release_scoped_broadcasts  # noqa: E402
from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q17_bollinger_signals",
    "q15_sma30",
    "q23_series_features",
    "q59_corpus_prep",
    "q86_corpus_pipeline",
    "q56_embedding_near_dupes_lsh",
    "q21_asof_join",
    "q20_hourly_candles",
    "q93_training_prep_pipeline",
    "q97_cluster_best_dedup",
    # r18 (VERDICT r17 #3): the two driver-regressed queries the floor
    # was suspected of hurting — star-join over tiny AQE stages and
    # the HNSW probe — interleaved against the same arms
    "q07_star_join_revenue",
    "q89_knn_hnsw_join",
]

KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def run(spark, name: str, sf: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, sf).write.mode("overwrite").format("noop").save()
    sec = time.time() - t0
    release_scoped_caches()
    release_scoped_broadcasts()
    return sec


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    minsize = sys.argv[2] if len(sys.argv) > 2 else "64k"
    # r18: the session factory now DEFAULTS to 256k, so the "off" arm
    # must name the stock value explicitly — reading the session conf
    # back compared 256k against itself
    default = sys.argv[3] if len(sys.argv) > 3 else "1MB"
    spark = get_spark("ab-aqe-minpartition")
    # settle both arms once
    for n in QUERIES:
        run(spark, n, sf)
    reps = 3
    a: dict[str, list[float]] = {n: [] for n in QUERIES}
    b: dict[str, list[float]] = {n: [] for n in QUERIES}
    for r in range(reps):
        for arm, store in (("off", a), ("on", b)):
            spark.conf.set(KEY, default if arm == "off" else minsize)
            for n in QUERIES:
                store[n].append(run(spark, n, sf))
    print(f"\n=== {KEY}: default({default}) vs {minsize}, best of {reps} ===")
    ta = tb = 0.0
    for n in QUERIES:
        ba, bb = min(a[n]), min(b[n])
        ta += ba
        tb += bb
        print(f"{n:38s} off={ba:6.3f}  on={bb:6.3f}  delta={bb - ba:+6.3f}")
    print(f"{'TOTAL':38s} off={ta:6.3f}  on={tb:6.3f}  delta={tb - ta:+6.3f}")


if __name__ == "__main__":
    main()
