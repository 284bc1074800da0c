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

The r14 TEXT arm (VERDICT r13 #4) extends the same pin to the
inverted-index family's hot-TOKEN shapes: the ×16-expanded fixture
(boiler tokens in 77% of docs) drives ``build_text_index``, the
hot-term ``bm25_probe`` (its aggregations are doc-keyed by
construction, so it carries no hot-key shuffle — reported for the
record) and the hot-trigram ``substring_search``; and a dedicated
3.2M-doc STOPWORD corpus (one token = 25% of all postings rows)
pins the range-partitioned postings write under a TIGHTER 3.0 bound
— reverted to the old single-key hash repartition the same write
measures a 5.1× straggler on this box, so the tightened bound turns
a de-skew regression into a failing check.

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
EX_TOKEN = 16       # corpus expansion for the text-index arm (r14)
EX_TRIGRAM = 4      # trigram arm expansion (gram rows are ~6x postings)
N_STOPDOCS = 3_200_000  # stopword-corpus docs (hot token = 25% of postings)

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


def check(name: str, stages: list, bound: float = MAX_RATIO) -> dict:
    """Worst max/median among stages heavy enough to matter. A per-op
    ``bound`` tightens the pin where the fixture's measured skew
    signal sits below the global 10× (the stopword build:
    range-partitioned ~1.0, single-key hash 5.1 — a 3.0 bound catches
    the regression)."""
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
        "bound": bound,
        "ok": worst["ratio"] <= bound,
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

    # --- text-index arm (r14, VERDICT r13 #4): the hot-TOKEN shapes —
    # the boiler tokens occur in 77% of fixture docs, a worse-than-
    # realistic stopword. The corpus expands ×EX (distinct ids) so the
    # postings shuffle is heavy enough for the ratio to mean something;
    # what is being pinned is the range-partitioned postings write
    # (repartition by token ALONE put a stopword's postings — O(corpus
    # docs) rows at 100 TB — through one task; the range exchange's
    # sampler splits the hot run) plus the hot-term BM25 probe and the
    # hot-trigram substring search.
    from etl_btc_spark.operators import text_index as TI

    big = docs.crossJoin(
        spark.range(EX_TOKEN).withColumnRenamed("id", "__r")
    ).select(
        (F.col("doc_id") * EX_TOKEN + F.col("__r")).alias("doc_id"), "text"
    )
    tix = os.path.join("spark-warehouse", "skew_text_index")
    _, seen = stage_ratios(spark, seen)  # isolate from expansion noise
    TI.build_text_index(spark, big, tix)
    stages, seen = stage_ratios(spark, seen)
    r = check("text_index_build_hot_token", stages)
    results.append(r)

    hot = TI.bm25_probe(spark, tix, ["boiler3", "u17a3"], n=20).collect()
    stages, seen = stage_ratios(spark, seen)
    r = check("bm25_probe_hot_token", stages)
    r["rows"] = len(hot)
    results.append(r)

    trg_docs = big.filter(F.col("doc_id") % EX_TOKEN < EX_TRIGRAM)
    trg = os.path.join("spark-warehouse", "skew_trigram_index")
    TI.build_trigram_index(spark, trg_docs, trg)
    stages, seen = stage_ratios(spark, seen)
    r = check("trigram_index_build_hot_gram", stages)
    results.append(r)

    n_sub = TI.substring_search(spark, trg, trg_docs, "boiler3 boiler4").count()
    stages, seen = stage_ratios(spark, seen)
    r = check("substring_search_hot_trigram", stages)
    r["matches"] = n_sub
    results.append(r)

    # --- true-STOPWORD postings write (r14): short docs where ONE
    # token carries 25% of all postings rows (3.2M of 12.8M — the
    # "the"-shaped vocabulary a real corpus has). Under the old
    # hash(token)-only repartition this is a single 3.4M-row straggler
    # task (measured ratio 5.09 on this box); the range-partitioned
    # write (_bucketed_postings_write) levels it to ~1.0, and the
    # TIGHTER 3.0 bound makes reverting to single-key hashing a
    # failing regression, not an under-10x near-miss.
    stop = spark.range(N_STOPDOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("hotstop"),
            F.format_string("s%da", "id"),
            F.format_string("s%db", "id"),
            F.format_string("s%dc", "id"),
        ).alias("text"),
    )
    stix = os.path.join("spark-warehouse", "skew_stopword_index")
    _, seen = stage_ratios(spark, seen)
    TI.build_text_index(spark, stop, stix)
    stages, seen = stage_ratios(spark, seen)
    r = check("text_index_build_stopword25pct", stages, bound=3.0)
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
