"""Per-query stage-level profiler (r17 optimization round).

For each named registry query: one untimed settle pass (warm
artifacts/codegen), then a timed noop-sink pass with the Spark UI
enabled; afterwards the Spark UI REST API is diffed around the timed
pass to attribute wall-clock to stages — executor run time, shuffle
read/write bytes, input bytes, task counts — so optimization targets
the measured stage, not a guess (guide §1.1/§7.1).

Usage: python scripts/profile_stages.py [sf_dir] query [query ...]
Writes .benchmarks/profile_stages.json and prints a per-query table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.operators.dedup import release_scoped_caches  # noqa: E402
from etl_btc_spark.operators.ann_index import release_scoped_broadcasts  # noqa: E402
from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402


def _stages(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    out: dict[int, dict] = {}
    for s in json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    ):
        key = (s["stageId"], s["attemptId"])
        out[key] = s
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query {n}")
    spark = get_spark("profile-stages", **{"spark.ui.enabled": "true"})
    ui = "http://localhost:4040"
    report: dict[str, dict] = {}
    for n in names:
        q = REGISTRY[n]
        # settle: builds artifacts, warms codegen/page cache
        q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        before = _stages(ui)
        spark.sparkContext.setJobDescription(f"profile:{n}")
        t0 = time.time()
        q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sec = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.6)
        after = _stages(ui)
        new = [s for k, s in after.items() if k not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        rows = []
        for s in new:
            rows.append(
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:90],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "py_ms": s.get("peakExecutionMemory", 0) and None,
                }
            )
        report[n] = {
            "wall_sec": round(sec, 3),
            "n_stages": len(new),
            "sum_run_ms": sum(s.get("executorRunTime", 0) for s in new),
            "stages": rows,
        }
        print(f"\n== {n}: {sec:.3f}s wall, {len(new)} stages ==")
        for r in rows[:14]:
            print(
                f"  stage {r['stage']:>5} run={r['run_ms']:>7}ms cpu={r['cpu_ms']:>7}ms "
                f"tasks={r['tasks']:>3} in={r['input_mb']:>8} shR={r['sh_read_mb']:>8} "
                f"shW={r['sh_write_mb']:>8}  {r['name']}"
            )
        release_scoped_caches()
        release_scoped_broadcasts()
    side = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchmarks"
    )
    os.makedirs(side, exist_ok=True)
    with open(os.path.join(side, "profile_stages.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("\nwritten .benchmarks/profile_stages.json")


if __name__ == "__main__":
    main()
