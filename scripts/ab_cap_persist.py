"""A/B (r18, ADVICE r17 #3): should the stop-bucket cap's output be
re-persisted before the LSH self-join?

The r17 cap rewrite (partial-agg width count + anti join) left the
CAPPED frame unpersisted: both self-join aliases re-run the `wide`
aggregate + anti join against the cached banded table — two extra
passes per query. Arms, interleaved in one JVM:

  A (current) — anti join per alias over the scoped-persisted banded
  B (persist) — _scoped_persist the post-anti-join frame, self-join that
  C (persist wide) — _scoped_persist only the over-cap keys

Usage: python scripts/ab_cap_persist.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_btc_spark.operators import dedup as DD  # noqa: E402
from etl_btc_spark.operators.dedup import (  # noqa: E402
    _minhash_banded,
    _scoped_persist,
    release_scoped_caches,
)
from etl_btc_spark.session import get_spark  # noqa: E402
from etl_btc_spark.tables import load_table  # noqa: E402

MAX_BUCKET = 16


def _cands(banded, id_col="doc_id"):
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def arm_a(docs):
    banded = _scoped_persist(_minhash_banded(docs, "doc_id", "text", 32, 8, 3))
    wide = (
        banded.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("__bw"))
        .filter(F.col("__bw") > MAX_BUCKET)
        .select("bkey")
    )
    return _cands(banded.join(wide, "bkey", "anti"))


def arm_b(docs):
    banded = _scoped_persist(_minhash_banded(docs, "doc_id", "text", 32, 8, 3))
    wide = (
        banded.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("__bw"))
        .filter(F.col("__bw") > MAX_BUCKET)
        .select("bkey")
    )
    capped = _scoped_persist(banded.join(wide, "bkey", "anti"))
    return _cands(capped)


def arm_c(docs):
    banded = _scoped_persist(_minhash_banded(docs, "doc_id", "text", 32, 8, 3))
    wide = _scoped_persist(
        banded.groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("__bw"))
        .filter(F.col("__bw") > MAX_BUCKET)
        .select("bkey")
    )
    return _cands(banded.join(wide, "bkey", "anti"))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-cap-persist")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    arms = {"A_current": arm_a, "B_persist_capped": arm_b, "C_persist_wide": arm_c}
    # value identity
    rows = {}
    for n, fn in arms.items():
        rows[n] = sorted(tuple(r) for r in fn(docs).collect())
        release_scoped_caches()
    assert rows["A_current"] == rows["B_persist_capped"] == rows["C_persist_wide"]
    print("VALUE IDENTITY OK: %d candidate pairs" % len(rows["A_current"]))
    for n, fn in arms.items():  # settle
        fn(docs).write.mode("overwrite").format("noop").save()
        release_scoped_caches()
    reps = 5
    times = {n: [] for n in arms}
    for _ in range(reps):
        for n, fn in arms.items():
            t0 = time.time()
            fn(docs).write.mode("overwrite").format("noop").save()
            times[n].append(time.time() - t0)
            release_scoped_caches()
    for n in arms:
        print("%-18s best=%6.3f all=%s" % (n, min(times[n]), [round(t, 3) for t in times[n]]))


if __name__ == "__main__":
    main()
