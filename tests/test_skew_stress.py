"""Skew stress pins (VERDICT r12 #3): the 100×-scale claims for the
dedup surface get their first EMPIRICAL leg — a seed-pinned hot-key
corpus (one 5-gram span occurring 10^4 times, one LSH bucket holding
~18% of all docs) must flow through ``duplicate_span_dedup`` and the
MinHash band self-join WITHOUT a dominant straggler task.

The r14 text arm extends the pin to the inverted-index family: the
×16 fixture's hot-token build/probe/substring shapes under the global
10× bound, plus a 3.2M-doc stopword corpus (one token = 25% of all
postings rows) whose range-partitioned postings write is pinned at
≤ 3.0 — reverting text_index._bucketed_postings_write to the old
single-key hash repartition measures 5.1× on this box, so the
tighter bound makes a de-skew regression a failing check.

Runs scripts/skewcheck.py as a subprocess: the harness needs its own
JVM because the pytest session runs with spark.ui.enabled=false and
the task-duration quantiles come from the status REST API. See the
script docstring for why lowered AQE thresholds don't weaken the pin
(plan-shape splittability is what's under test, not the thresholds).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hot_key_corpus_has_no_dominant_task():
    proc = subprocess.run(
        [sys.executable, "scripts/skewcheck.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=840,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    rep = json.loads(line)
    assert rep["ok"] is True
    ops = {r["op"]: r for r in rep["ops"]}
    # both stressed ops present, both under the 10x straggler bound
    span = ops["duplicate_span_dedup"]
    mh = ops["minhash_lsh_candidates"]
    assert span["ok"] and mh["ok"]
    # the fixture actually exercised the hot paths: every boilerplate
    # occurrence outside the canonical doc lost its covered tokens,
    # and the hot bucket produced its C(2400,2) pair volume
    assert span["rows"] == rep["fixture_docs"]
    assert span["tokens_removed"] > 100_000
    assert mh["candidate_pairs"] >= 2_878_800  # C(2400, 2)
    # the heavy stages were heavy enough for the ratio to mean
    # something (guards against the fixture silently shrinking)
    assert mh["heaviest_stage_max_ms"] >= 1_000
    # r14 text arm: hot-token build/probe/substring + the stopword
    # write under its TIGHTER per-op bound
    tix = ops["text_index_build_hot_token"]
    sub = ops["substring_search_hot_trigram"]
    stop = ops["text_index_build_stopword25pct"]
    assert tix["ok"] and sub["ok"] and stop["ok"]
    assert ops["trigram_index_build_hot_gram"]["ok"]
    assert ops["bm25_probe_hot_token"]["rows"] == 20
    assert sub["matches"] == 40_000  # every expanded boiler doc matched
    assert stop["bound"] == 3.0  # single-key hash measures ~5x -> must fail
    # the pinned stages were real work, not floor noise
    assert tix["heaviest_stage_max_ms"] >= 1_000
    assert stop["heaviest_stage_max_ms"] >= 1_000
