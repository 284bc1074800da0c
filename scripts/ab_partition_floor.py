"""A/B the `spark.sql.files.minPartitionNum = 32` scan floor on warm
index probes (VERDICT r15 "What's wrong" #2).

BENCH_r15's graded run recorded q99k_bm25_indexed at 2.0-2.5 s — 3.3x
its r14 band (0.609-0.716) and 3x the builder's committed sidecar from
the SAME commit. The only engine-wide change plausibly taxing a warm
KB-sized pruned posting-bucket scan is the r15 global partition floor
(session.py), which forces every tiny artifact scan into 32 tasks.
This script interleaves floor-on / floor-off reps (A/B/A/B, so machine
drift hits both arms equally) over q99k plus one warm probe per index
family, and prints per-arm min/median/max. Run:

    python scripts/ab_partition_floor.py [sf_dir] [reps]

The floor is a runtime SQL conf, so both arms share one JVM — no
process-level cold-start asymmetry.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402

#: q99k (the regressed query) + one warm probe per index family that
#: serves from a persisted KB-scale artifact
QUERIES = [
    "q99k_bm25_indexed",   # text inverted index
    "q99m_substring_search",  # trigram index
    "q37_knn_lsh",         # LSH bands
    "q38_knn_ivf",         # IVF lists
    "q99ad_pq_lifecycle",  # PQ codes
]

FLOOR_KEY = "spark.sql.files.minPartitionNum"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-partition-floor")
    qs = {n: REGISTRY[n] for n in QUERIES}

    def run(name: str) -> float:
        t0 = time.time()
        qs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # settle sweep: builds land, JIT/page-cache warm, both arms exercised
    for arm in ("floor32", "nofloor"):
        _set_arm(spark, arm)
        for name in QUERIES:
            run(name)

    times: dict[str, dict[str, list[float]]] = {
        n: {"floor32": [], "nofloor": []} for n in QUERIES
    }
    for _ in range(reps):
        for arm in ("floor32", "nofloor"):
            _set_arm(spark, arm)
            for name in QUERIES:
                times[name][arm].append(run(name))

    out = {}
    for name in QUERIES:
        row = {}
        for arm in ("floor32", "nofloor"):
            v = times[name][arm]
            row[arm] = {
                "min": round(min(v), 3),
                "median": round(statistics.median(v), 3),
                "max": round(max(v), 3),
            }
        row["ratio_floor_over_nofloor"] = round(
            row["floor32"]["median"] / row["nofloor"]["median"], 3
        )
        out[name] = row
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}, indent=2))


def _set_arm(spark, arm: str) -> None:
    if arm == "floor32":
        spark.conf.set(FLOOR_KEY, "32")
    else:
        spark.conf.unset(FLOOR_KEY)


if __name__ == "__main__":
    main()
