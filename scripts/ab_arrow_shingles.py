"""A/B: Arrow-native shingling for the decontamination corpus stage
(r18 optimization round, VERDICT r17 #4).

Arms, each timed with the noop sink, best-of-N, interleaved in ONE
JVM so machine drift hits both equally:

  q99bb_jvm    — current engine: explode(word_shingles) JVM HOF +
                 codegen bloom probes + groupBy(doc_id)
  q99bb_arrow  — dedup.bloom_shingle_doc_stats: one mapInArrow,
                 zero shuffle
  q99bw_jvm    — current q99bw corpus side (explode + probe filter)
  q99bw_arrow  — dedup.bloom_shingle_survivors feeding the same
                 exact-verify join

Also verifies VALUE IDENTITY of each pair before timing (collected
row sets must match exactly — FPs included).

Usage: python scripts/ab_arrow_shingles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_btc_spark.operators import dedup as DD  # noqa: E402
from etl_btc_spark.operators import sketches as SKT  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402
from etl_btc_spark.tables import load_table  # noqa: E402

N_BITS = 131_072


def _bits(spark, sf):
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    tsh = (
        DD.spread(docs.filter(F.col("doc_id") % 23 == 0))
        .select(F.explode(DD.word_shingles(F.col("text"), 5)).alias("s"))
        .distinct()
    )
    return SKT.build_bloom_bits(tsh, "s", n_bits=N_BITS)


def arms(spark, sf, bits):
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = DD.spread(docs.filter(F.col("doc_id") % 23 != 0))

    def jvm_stats():
        csh = corpus.select(
            "doc_id", F.explode(DD.word_shingles(F.col("text"), 5)).alias("s")
        )
        member = SKT.bloom_contains(F.col("s"), bits, n_bits=N_BITS)
        return csh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(member.cast("int")).cast("bigint").alias("n_bloom_hits"),
            (F.sum(member.cast("int")) > 0).alias("flagged"),
        )

    def arrow_stats():
        return DD.bloom_shingle_doc_stats(corpus, bits, N_BITS, ngram=5)

    def jvm_survivors():
        csh = corpus.select(
            "doc_id", F.explode(DD.word_shingles(F.col("text"), 5)).alias("s")
        )
        member = SKT.bloom_contains(F.col("s"), bits, n_bits=N_BITS)
        return csh.filter(member)

    def arrow_survivors():
        return DD.bloom_shingle_survivors(corpus, bits, N_BITS, ngram=5)

    return {
        "stats_jvm": jvm_stats,
        "stats_arrow": arrow_stats,
        "surv_jvm": jvm_survivors,
        "surv_arrow": arrow_survivors,
    }


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-arrow-shingles")
    bits = _bits(spark, sf)
    A = arms(spark, sf, bits)

    # value identity first
    s_jvm = sorted(tuple(r) for r in A["stats_jvm"]().collect())
    s_arw = sorted(tuple(r) for r in A["stats_arrow"]().collect())
    assert s_jvm == s_arw, (
        "stats arms diverge: %d vs %d rows; first diff: %r vs %r"
        % (
            len(s_jvm),
            len(s_arw),
            next((a for a, b in zip(s_jvm, s_arw) if a != b), None),
            next((b for a, b in zip(s_jvm, s_arw) if a != b), None),
        )
    )
    v_jvm = sorted(tuple(r) for r in A["surv_jvm"]().collect())
    v_arw = sorted(tuple(r) for r in A["surv_arrow"]().collect())
    assert v_jvm == v_arw, "survivor arms diverge: %d vs %d rows" % (
        len(v_jvm),
        len(v_arw),
    )
    print(
        "VALUE IDENTITY OK: stats %d rows, survivors %d rows"
        % (len(s_jvm), len(v_jvm))
    )

    # settle
    for fn in A.values():
        fn().write.mode("overwrite").format("noop").save()
    reps = 5
    best: dict[str, float] = {}
    times: dict[str, list[float]] = {n: [] for n in A}
    for _ in range(reps):
        for n, fn in A.items():
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            times[n].append(time.time() - t0)
    for n in A:
        best[n] = min(times[n])
        print("%-12s best=%6.3f  all=%s" % (n, best[n], [round(t, 3) for t in times[n]]))
    print(
        "stats: jvm %.3f -> arrow %.3f (%.2fx) | surv: jvm %.3f -> arrow %.3f (%.2fx)"
        % (
            best["stats_jvm"],
            best["stats_arrow"],
            best["stats_jvm"] / best["stats_arrow"],
            best["surv_jvm"],
            best["surv_arrow"],
            best["surv_jvm"] / best["surv_arrow"],
        )
    )


if __name__ == "__main__":
    main()
