"""Per-query fixed-floor profiler (r18 optimization round, VERDICT
r17 #6): splits each headline query's wall-clock into

  - ``plan_sec``  — everything ``q.fn(spark, sf_dir)`` does before an
    action exists: python plan construction, py4j chatter, and any
    EAGER driver work the query path runs (artifact marker checks,
    ``query.first()`` probes, geometry reads, bloom-bitmap collects);
  - ``exec_sec``  — the noop-sink write of the returned frame.

The r17 scaling block showed ratios near (or below) 1.0 on half the
set — fixed cost dominates at sf0.1 — but nobody has measured WHERE
the floor lives per query. Settle pass first, then best-of-N on each
phase, same session.

Usage: python scripts/profile_floor.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.operators.dedup import release_scoped_caches  # noqa: E402
from etl_btc_spark.operators.ann_index import release_scoped_broadcasts  # noqa: E402
from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or sorted(
        n for n, q in REGISTRY.items() if q.headline
    )
    spark = get_spark("profile-floor")
    out: dict[str, dict] = {}
    reps = 3
    for n in names:
        q = REGISTRY[n]
        # settle: warm artifacts, codegen, python workers
        q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_scoped_caches()
        release_scoped_broadcasts()
        plans, execs = [], []
        for _ in range(reps):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            plans.append(t1 - t0)
            execs.append(t2 - t1)
            release_scoped_caches()
            release_scoped_broadcasts()
        out[n] = {
            "plan_sec": round(min(plans), 3),
            "exec_sec": round(min(execs), 3),
        }
        print(
            "%-38s plan=%6.3f exec=%6.3f"
            % (n, out[n]["plan_sec"], out[n]["exec_sec"])
        )
    side = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
    )
    os.makedirs(side, exist_ok=True)
    with open(os.path.join(side, "profile_floor.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
