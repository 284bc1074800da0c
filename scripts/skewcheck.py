"""Skew stress harness (VERDICT r12 #3): empirical evidence behind the
100×-scale claims that so far rested on plan shape alone.

Builds a seed-pinned HOT-KEY corpus — the two pathologies a real
pretraining corpus throws at a dedup pipeline —

  * one boilerplate 8-token block embedded verbatim in 10,000 docs, so
    its interior 5-gram spans each occur 10^4 times (the license-block
    shape ``duplicate_span_dedup`` was de-skewed for in r12), and
  * one exact-template cluster holding ~18% of all docs, so every
    MinHash band key of the template is a single hot LSH bucket (the
    shape the banded self-join must survive),

then runs ``duplicate_span_dedup`` and ``minhash_lsh_candidates`` on
it under a UI-enabled session and pins, via the Spark status REST API
(/api/v1/.../taskSummary), that NO stage is dominated by a single
straggler task: for every stage whose slowest task ran ≥ ``FLOOR_MS``,
max task duration / median task duration must stay ≤ ``MAX_RATIO``.

AQE skew-split thresholds are lowered proportionally to the fixture
(the hot shuffle partitions here are ~10^2 KB; at 100 TB the same
join shape crosses the DEFAULT 256 MB threshold and splits without
any tuning) — what is being pinned is the PLAN SHAPE's splittability:
a ``row_number() OVER (PARTITION BY span)`` or a non-equi hot join
would fail this harness no matter the thresholds, because AQE cannot
split those.

Runs standalone (``python scripts/skewcheck.py``) printing one JSON
line; tests/test_skew_stress.py subprocesses it (the pytest session's
UI is disabled, and the REST API needs its own JVM).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_BOILER = 10_000   # docs carrying the shared boilerplate block
N_COPIES = 2_400    # exact-template near-dup cluster (~18% of corpus)
N_UNIQUE = 600      # fully unique tail
FLOOR_MS = 1_000    # stages whose slowest task is below this are noise
MAX_RATIO = 10.0    # max/median task-duration bound per heavy stage

BOILER = " ".join("boiler%d" % j for j in range(8))
TEMPLATE = " ".join("tmpl%d" % j for j in range(40))


def build_fixture(spark: SparkSession, path: str) -> None:
    """Deterministic hot-key corpus — no RNG, so every run (and the
    README-recorded ratio) reproduces bit-identically."""
    half = 15
    ids = spark.range(N_BOILER + N_COPIES + N_UNIQUE).withColumnRenamed(
        "id", "doc_id"
    )
    pre = F.concat_ws(
        " ", *[F.format_string(f"u%da{j}", "doc_id") for j in range(half)]
    )
    post = F.concat_ws(
        " ", *[F.format_string(f"u%db{j}", "doc_id") for j in range(half)]
    )
    uniq = F.concat_ws(" ", pre, post)
    text = (
        F.when(
            F.col("doc_id") < N_BOILER,
            F.concat_ws(" ", pre, F.lit(BOILER), post),
        )
        .when(F.col("doc_id") < N_BOILER + N_COPIES, F.lit(TEMPLATE))
        .otherwise(uniq)
    )
    ids.select("doc_id", text.alias("text")).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)


def _api(base: str, route: str):
    with urllib.request.urlopen(base + route, timeout=30) as r:
        return json.loads(r.read())


def stage_ratios(spark: SparkSession, seen: set[int]) -> tuple[list, set[int]]:
    """(per-new-stage [stageId, n_tasks, med_ms, max_ms] sorted by
    max desc, updated seen-set) via the status REST API."""
    base = "%s/api/v1/applications/%s" % (
        spark.sparkContext.uiWebUrl,
        spark.sparkContext.applicationId,
    )
    out = []
    now = set()
    for st in _api(base, "/stages?status=complete"):
        sid = st["stageId"]
        now.add(sid)
        if sid in seen or st["numCompleteTasks"] < 1:
            continue
        q = _api(
            base,
            "/stages/%d/%d/taskSummary?quantiles=0.5,1.0"
            % (sid, st["attemptId"]),
        )
        med, mx = q["duration"]
        out.append([sid, st["numCompleteTasks"], med, mx])
    out.sort(key=lambda r: -r[3])
    return out, now


def check(name: str, stages: list) -> dict:
    """Worst max/median among stages heavy enough to matter."""
    worst = {"stage": None, "ratio": 0.0, "max_ms": 0.0, "med_ms": 0.0}
    for sid, n, med, mx in stages:
        if mx < FLOOR_MS or n < 2:
            continue
        ratio = mx / max(med, 1.0)
        if ratio > worst["ratio"]:
            worst = {"stage": sid, "ratio": round(ratio, 2),
                     "max_ms": mx, "med_ms": med}
    heaviest = stages[0] if stages else None
    return {
        "op": name,
        "n_stages": len(stages),
        "heaviest_stage_max_ms": heaviest[3] if heaviest else 0,
        "worst": worst,
        "ok": worst["ratio"] <= MAX_RATIO,
    }


def main() -> int:
    from etl_btc_spark.session import get_spark

    spark = get_spark(
        "skewcheck",
        **{
            "spark.ui.enabled": "true",
            # scale the AQE skew machinery to the fixture: hot shuffle
            # partitions here are ~10^2 KB; the DEFAULT 256 MB
            # threshold fires at the same shape at corpus scale
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        },
    )
    from etl_btc_spark.operators import dedup as DD

    fixture = os.path.join("spark-warehouse", "skew_fixture")
    build_fixture(spark, fixture)
    docs = spark.read.parquet(fixture)

    results = []
    _, seen = stage_ratios(spark, set())  # fixture-build stages: skip

    out = DD.duplicate_span_dedup(docs, n=5)
    n_span = out.agg(
        F.count(F.lit(1)), F.sum("n_removed")
    ).collect()[0]
    DD.release_scoped_caches()
    stages, seen = stage_ratios(spark, seen)
    r = check("duplicate_span_dedup", stages)
    r["rows"], r["tokens_removed"] = n_span[0], int(n_span[1])
    results.append(r)

    cands = DD.minhash_lsh_candidates(docs, ngram=3)
    n_pairs = cands.count()
    DD.release_scoped_caches()
    stages, seen = stage_ratios(spark, seen)
    r = check("minhash_lsh_candidates", stages)
    r["candidate_pairs"] = n_pairs
    results.append(r)

    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "fixture_docs": N_BOILER + N_COPIES + N_UNIQUE,
        "hot_span_occurrences": N_BOILER,
        "hot_bucket_docs": N_COPIES,
        "max_ratio_bound": MAX_RATIO,
        "floor_ms": FLOOR_MS,
        "ops": results,
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
