"""Cross-engine HLL sketch (r14, operators/sketches.py): error bound
across register counts, mergeability (the property that makes it a
sketch), and misuse refusals — the pins behind the q99az gate."""

import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import sketches as SKT
from etl_btc_spark.tables import load_table

from conftest import SF_ORACLE


def test_hll_error_bound_and_p_sensitivity(spark):
    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for p, tol in ((10, 0.10), (12, 0.06)):
        got = {
            r["event_type"]: r["hll_distinct"]
            for r in SKT.hll_distinct(ev, "user_id", ["event_type"], p=p).collect()
        }
        for k, n in exact.items():
            assert abs(got[k] - n) / n <= tol, (p, k, got[k], n)


def test_hll_merge_property(spark):
    """Estimating the UNION must equal merging the halves' registers
    (per-register max) — computed here by estimating over the union
    frame vs the full frame: identical by construction, and the
    estimate must be invariant to how rows are partitioned."""
    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 != 0)
    whole = {
        tuple(r)
        for r in SKT.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    unioned = {
        tuple(r)
        for r in SKT.hll_distinct(
            a.unionByName(b).repartition(7), "user_id", ["event_type"]
        ).collect()
    }
    assert whole == unioned


def test_hll_misuse_and_nulls(spark):
    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    with pytest.raises(ValueError, match="p="):
        SKT.hll_distinct(ev, "user_id", ["event_type"], p=2)
    # NULL keys are ignored, not hashed
    withnull = ev.withColumn(
        "user_id", F.when(F.col("user_id") % 3 == 0, None).otherwise(F.col("user_id"))
    )
    out = SKT.hll_distinct(withnull, "user_id", ["event_type"]).collect()
    assert all(r["hll_distinct"] > 0 for r in out)


def test_histogram_quantiles_error_bound_and_merge(spark):
    """Error <= bin width per group; estimate invariant to row
    partitioning (bin counts add — the mergeable property); misuse
    refusals."""
    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "value")
    n_bins = 512
    got = {
        r["event_type"]: r
        for r in SKT.histogram_quantiles(
            ev, "value", ["event_type"], n_bins=n_bins
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("value"), F.lit(0.95)).alias("p95"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    for k, e in exact.items():
        binw = (e["hi"] - e["lo"]) / n_bins
        assert abs(got[k]["q_50"] - e["p50"]) <= binw * 1.5, k
        assert abs(got[k]["q_95"] - e["p95"]) <= binw * 1.5, k
    re = {
        tuple(r)
        for r in SKT.histogram_quantiles(
            ev.repartition(13), "value", ["event_type"], n_bins=n_bins
        ).collect()
    }
    assert re == {tuple(r) for r in got.values()}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quantiles"):
        SKT.histogram_quantiles(ev, "value", ["event_type"], quantiles=[])
    with _pytest.raises(ValueError, match="inside"):
        SKT.histogram_quantiles(ev, "value", ["event_type"], quantiles=[1.0])
    with _pytest.raises(ValueError, match="n_bins"):
        SKT.histogram_quantiles(ev, "value", ["event_type"], n_bins=1)
    # degenerate group: constant values answer the constant
    const = spark.createDataFrame(
        [("a", 7.0)] * 5, "g string, value double"
    )
    row = SKT.histogram_quantiles(const, "value", ["g"]).collect()[0]
    assert row["q_50"] == 7.0 and row["q_95"] == 7.0


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Membership never misses a true key; FP rate stays near the
    theoretical (1 - e^{-kn/m})^k; degenerate/misuse refusals."""
    from pyspark.sql import functions as _F

    n_bits, k, n_keys = 16_384, 4, 1_000
    keys = spark.createDataFrame([(f"m{i}",) for i in range(n_keys)], "s string")
    bits = SKT.build_bloom_bits(keys, "s", n_bits=n_bits, k=k)
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(n_keys)] + [(f"x{i}",) for i in range(4_000)],
        "s string",
    )
    got = {
        r["s"]
        for r in probe.filter(
            SKT.bloom_contains(_F.col("s"), bits, n_bits, k)
        ).collect()
    }
    assert all(f"m{i}" in got for i in range(n_keys))  # no false negatives
    fp = len([s for s in got if s.startswith("x")]) / 4_000
    import math

    theo = (1 - math.exp(-k * n_keys / n_bits)) ** k
    assert fp <= theo * 3 + 0.01, (fp, theo)
    with pytest.raises(ValueError, match="multiple of 32"):
        SKT.build_bloom_bits(keys, "s", n_bits=100)
    with pytest.raises(ValueError, match="k="):
        SKT.build_bloom_bits(keys, "s", k=0)


def test_cms_one_sided_error_and_merge(spark):
    """Estimates never undercount; overcount bounded by 2N/w with
    margin on this fixture; partition-invariant; misuse refusals."""
    from pyspark.sql import functions as _F
    import collections

    rows = [(f"t{i % 111}",) for i in range(6_000)] + [("hot",)] * 800
    occ = spark.createDataFrame(rows, "tok string")
    d, w = 4, 1024
    cells = SKT.cms_build(occ, "tok", d=d, w=w)
    true = collections.Counter(t for t, in rows)
    got = {
        r["tok"]: r["e"]
        for r in occ.select("tok")
        .distinct()
        .select("tok", SKT.cms_estimate(_F.col("tok"), cells, d, w).alias("e"))
        .collect()
    }
    n_total = len(rows)
    for t, n in true.items():
        assert got[t] >= n, (t, got[t], n)  # one-sided, never under
        assert got[t] - n <= 2 * n_total / w * 4, (t, got[t], n)
    # mergeability: counters add — any partitioning gives the table
    cells2 = SKT.cms_build(occ.repartition(9), "tok", d=d, w=w)
    assert cells == cells2
    with pytest.raises(ValueError, match="cms_build"):
        SKT.cms_build(occ, "tok", d=0)


def test_stream_hll_debris_recovery_and_identity(spark, tmp_path):
    """The streamed register swap self-heals from a crash between the
    two renames, and the streamed estimate is value-identical to the
    one-pass batch estimator."""
    import os
    import shutil

    from pyspark.sql import functions as _F

    from etl_btc_spark.streaming import incremental as INC

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    landing = str(tmp_path / "landing")
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(_F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        f"{landing}/a"
    )
    INC.stream_hll_maintain(
        spark, f"{landing}/*", ev.schema, regs, ckpt,
        key_col="user_id", group_cols=["event_type"],
    )
    ev.filter(_F.col("user_id") % 2 != 0).coalesce(1).write.parquet(
        f"{landing}/b"
    )
    INC.stream_hll_maintain(
        spark, f"{landing}/*", ev.schema, regs, ckpt,
        key_col="user_id", group_cols=["event_type"],
    )
    streamed = {
        tuple(r)
        for r in INC.hll_estimate_from_table(spark, regs, ["event_type"]).collect()
    }
    batch = {
        tuple(r) for r in SKT.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    assert streamed == batch
    # simulate a crash between the renames: regs gone, retired present
    os.rename(os.path.join(regs, "regs"), os.path.join(regs, ".regs_old_dead"))
    os.makedirs(os.path.join(regs, ".regs_shadow_dead"))
    healed = {
        tuple(r)
        for r in INC.hll_estimate_from_table(spark, regs, ["event_type"]).collect()
    }
    assert healed == batch
    assert not os.path.exists(os.path.join(regs, ".regs_shadow_dead"))


def test_hll_recovery_restores_newest_retired_by_mtime(spark, tmp_path):
    """TWO coexisting retired register dirs (an ignore_errors rmtree
    that silently failed, then a crash between the swap renames): the
    recovery must restore the NEWEST by mtime, not by uuid-sorted name
    (r16 VERDICT #3 — the name order is arbitrary hex, and the stale
    dir here sorts LAST so a name-ordered recovery would resurrect the
    half-corpus registers)."""
    import os
    import shutil

    from pyspark.sql import functions as _F

    from etl_btc_spark.streaming import incremental as INC

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    landing = str(tmp_path / "landing")
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(_F.col("user_id") % 2 == 0).coalesce(1).write.parquet(f"{landing}/a")
    INC.stream_hll_maintain(
        spark, f"{landing}/*", ev.schema, regs, ckpt,
        key_col="user_id", group_cols=["event_type"],
    )
    # retire the half-corpus registers under a name that sorts LAST
    # ('z' > any hex suffix) and backdate its mtime — stale by time,
    # newest by name
    stale = os.path.join(regs, ".regs_old_zzzz_stale")
    shutil.copytree(os.path.join(regs, "regs"), stale)
    old = os.path.getmtime(stale) - 3600
    os.utime(stale, (old, old))
    ev.filter(_F.col("user_id") % 2 != 0).coalesce(1).write.parquet(f"{landing}/b")
    INC.stream_hll_maintain(
        spark, f"{landing}/*", ev.schema, regs, ckpt,
        key_col="user_id", group_cols=["event_type"],
    )
    # crash between the renames: regs gone, BOTH retired dirs present
    os.rename(os.path.join(regs, "regs"), os.path.join(regs, ".regs_old_0000_good"))
    healed = {
        tuple(r)
        for r in INC.hll_estimate_from_table(spark, regs, ["event_type"]).collect()
    }
    batch = {
        tuple(r) for r in SKT.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    assert healed == batch  # the full-corpus registers, not the stale half
    assert not os.path.exists(stale)  # losers are swept


def test_stream_cms_epoch_guard_and_identity(spark, tmp_path):
    """Streamed counters equal the batch sketch; a REPLAYED epoch
    (sink retry after the swap landed but before the checkpoint
    committed) is skipped by the applied-marker ledger instead of
    double-counted."""
    import os

    from pyspark.sql import functions as _F

    from etl_btc_spark.streaming import incremental as INC

    rows = [(f"t{i % 53}",) for i in range(2_000)] + [("hot",)] * 300
    occ = spark.createDataFrame(rows, "tok string")
    landing = str(tmp_path / "landing")
    cnt = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    occ.coalesce(1).write.parquet(f"{landing}/a")
    INC.stream_cms_maintain(
        spark, f"{landing}/*", occ.schema, cnt, ckpt, key_col="tok"
    )
    streamed = INC.cms_cells_from_table(spark, cnt)
    assert streamed == SKT.cms_build(occ, "tok")
    # simulate an epoch replay: call the guard path directly — the
    # marker for epoch 0 exists, so re-running the WHOLE stream with
    # a FRESH checkpoint (which would re-deliver epoch 0's files as
    # epoch 0 again) must not change a single counter
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    INC.stream_cms_maintain(
        spark, f"{landing}/*", occ.schema, cnt, ckpt, key_col="tok"
    )
    assert INC.cms_cells_from_table(spark, cnt) == streamed
    # the ledger rides INSIDE cells/ so it publishes atomically with
    # the rename swap (r14 ADVICE: no marker-after-swap crash window)
    assert os.path.exists(os.path.join(cnt, "cells", "_applied_0"))
    assert not os.path.exists(os.path.join(cnt, "_applied"))


# --- r15: KMV/theta sketch with set operations (VERDICT r14 #3) ---


def test_kmv_error_bound_and_exact_branch(spark):
    """KMV cardinality error within the classic ~1/sqrt(k-2) regime
    at k=256 over 5000 distinct keys; with k above the cardinality
    the SAME formula returns the exact count (the sketch is the
    whole hash set)."""
    n = 5_000
    df = spark.range(n * 3).select((F.col("id") % n).alias("key"))
    est = SKT.kmv_estimate_from_sketch(
        SKT.kmv_sketch(df.withColumn("g", F.lit("a")), "key", ["g"], k=256),
        ["g"], k=256,
    ).collect()[0]["kmv_distinct"]
    assert abs(est - n) / n <= 4.0 / (256 ** 0.5), est  # ±25% is generous
    small = spark.range(100).select((F.col("id")).alias("key"), F.lit("a").alias("g"))
    exact = SKT.kmv_estimate_from_sketch(
        SKT.kmv_sketch(small, "key", ["g"], k=256), ["g"], k=256
    ).collect()[0]["kmv_distinct"]
    assert exact == 100.0


def test_kmv_merge_partition_invariance(spark):
    """k-min of part sketches == k-min of the whole — the sketch is
    invariant to HOW the rows were partitioned (set identity, not an
    approximation), so distributed merges drift by zero."""
    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    whole = {
        tuple(r)
        for r in SKT.kmv_sketch(ev, "user_id", ["event_type"], k=64).collect()
    }
    parts = SKT.kmv_sketch(
        ev.filter(F.col("user_id") % 2 == 0), "user_id", ["event_type"], k=64
    ).unionByName(
        SKT.kmv_sketch(
            ev.filter(F.col("user_id") % 2 != 0), "user_id", ["event_type"], k=64
        )
    )
    merged = {
        tuple(r) for r in SKT.kmv_merge(parts, ["event_type"], k=64).collect()
    }
    assert merged == whole


def test_kmv_overlap_exact_when_under_k(spark):
    """When both sets fit under k the sketches are complete and the
    union/intersection ESTIMATES equal the exact counts — same
    formula, no special-casing (the q99bj sf0.001 regime)."""
    a = spark.range(60).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    b = spark.range(40, 90).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    ska = SKT.kmv_sketch(a, "key", ["g"], k=256)
    skb = SKT.kmv_sketch(b, "key", ["g"], k=256)
    r = SKT.kmv_overlap(ska, skb, ["g"], k=256).collect()[0]
    assert r["kmv_union"] == 90.0   # 0..89
    assert r["kmv_intersection"] == 20.0  # 40..59


def test_kmv_intersection_error_bound(spark):
    """Estimator regime: two 4000-key sets overlapping in 2000 keys,
    k=256 — union and intersection estimates land within the
    published multiplicative bounds (generous 25%/35% envelopes)."""
    a = spark.range(4_000).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    b = spark.range(2_000, 6_000).select(
        F.col("id").alias("key"), F.lit("g").alias("g")
    )
    ska = SKT.kmv_sketch(a, "key", ["g"], k=256)
    skb = SKT.kmv_sketch(b, "key", ["g"], k=256)
    r = SKT.kmv_overlap(ska, skb, ["g"], k=256).collect()[0]
    assert abs(r["kmv_union"] - 6_000) / 6_000 <= 0.25, r
    assert abs(r["kmv_intersection"] - 2_000) / 2_000 <= 0.35, r


# --- r15: literal-plan envelope + broadcast arms (VERDICT r14 wrong #1) ---


def test_literal_sketch_envelope_refusals(spark):
    """A 100 TB-honest geometry (33M words) must refuse the literal
    arm instead of stalling the driver serializing a 33M-element
    plan literal — the bcast arms are the documented path."""
    with pytest.raises(ValueError, match="bloom_contains_bcast"):
        SKT.bloom_contains(F.lit("x"), [0] * 2_000_000, n_bits=64_000_000)
    with pytest.raises(ValueError, match="cms_estimate_bcast"):
        SKT.cms_estimate(F.lit("x"), [0] * 2_000_000, d=4, w=500_000)


def test_bloom_bcast_identity_with_literal(spark):
    """The broadcast-variable probe answers EXACTLY the literal
    codegen probe — same hashes, same bitmap, per key (FPs included)."""
    n_bits, k = 16_384, 4
    keys = spark.createDataFrame([(f"m{i}",) for i in range(800,)], "s string")
    bits = SKT.build_bloom_bits(keys, "s", n_bits=n_bits, k=k)
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(800)] + [(f"x{i}",) for i in range(2_000)],
        "s string",
    )
    lit = {
        r["s"]: r["hit"]
        for r in probe.select(
            "s", SKT.bloom_contains(F.col("s"), bits, n_bits, k).alias("hit")
        ).collect()
    }
    bc = {
        r["s"]: r["bloom_hit"]
        for r in SKT.bloom_contains_bcast(
            probe, "s", bits, n_bits, k
        ).collect()
    }
    assert lit == bc


def test_cms_bcast_identity_with_literal(spark):
    """Broadcast CMS point estimates == literal-arm estimates for
    every key (overcounts included)."""
    rows = [(f"t{i % 97}",) for i in range(4_000)] + [("hot",)] * 500
    occ = spark.createDataFrame(rows, "tok string")
    d, w = 4, 1024
    cells = SKT.cms_build(occ, "tok", d=d, w=w)
    keys = occ.select("tok").distinct()
    lit = {
        r["tok"]: r["e"]
        for r in keys.select(
            "tok", SKT.cms_estimate(F.col("tok"), cells, d, w).alias("e")
        ).collect()
    }
    bc = {
        r["tok"]: r["cms_count"]
        for r in SKT.cms_estimate_bcast(keys, "tok", cells, d, w).collect()
    }
    assert lit == bc


# --- r15: streamed Bloom + histogram (the matrix completes at 4/4) ---


def test_stream_bloom_identity_and_debris(spark, tmp_path):
    """Streamed bitmap == one-pass batch bitmap (bit-identical, OR is
    exact); debris from a crash between the renames self-heals."""
    import os
    import shutil

    from etl_btc_spark.streaming import incremental as INC

    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(3_000)], "s string"
    )
    landing, bloom, ckpt = (
        str(tmp_path / d) for d in ("landing", "bloom", "ckpt")
    )
    n_bits = 16_384
    keys.filter(F.col("s") < "k2").coalesce(1).write.parquet(f"{landing}/a")
    INC.stream_bloom_maintain(
        spark, f"{landing}/*", keys.schema, bloom, ckpt, key_col="s",
        n_bits=n_bits,
    )
    keys.filter(F.col("s") >= "k2").coalesce(1).write.parquet(f"{landing}/b")
    INC.stream_bloom_maintain(
        spark, f"{landing}/*", keys.schema, bloom, ckpt, key_col="s",
        n_bits=n_bits,
    )
    streamed = INC.bloom_bits_from_table(spark, bloom, n_bits=n_bits)
    assert streamed == SKT.build_bloom_bits(keys, "s", n_bits=n_bits)
    # crash between the renames: words gone, retired beside it
    os.rename(
        os.path.join(bloom, "words"), os.path.join(bloom, ".words_old_dead")
    )
    os.makedirs(os.path.join(bloom, ".words_shadow_dead"))
    healed = INC.bloom_bits_from_table(spark, bloom, n_bits=n_bits)
    assert healed == streamed
    assert not os.path.exists(os.path.join(bloom, ".words_shadow_dead"))
    with pytest.raises(ValueError, match="multiple of 32"):
        INC.stream_bloom_maintain(
            spark, f"{landing}/*", keys.schema, bloom, ckpt, key_col="s",
            n_bits=100,
        )


def test_stream_hist_identity_epoch_guard_and_clamp(spark, tmp_path):
    """Streamed quantiles equal the frozen-grid batch computation; a
    fresh-checkpoint full replay no-ops via the in-directory epoch
    ledger; values outside the frozen grid clamp into edge bins (the
    documented mergeability trade)."""
    import os
    import shutil

    from etl_btc_spark.streaming import incremental as INC

    rows = [("a", float(i)) for i in range(1_000)]
    ev = spark.createDataFrame(rows, "g string, value double")
    landing, hist, ckpt = (
        str(tmp_path / d) for d in ("landing", "hist", "ckpt")
    )

    def run():
        INC.stream_hist_maintain(
            spark, f"{landing}/*", ev.schema, hist, ckpt,
            value_col="value", group_cols=["g"], n_bins=64,
        )

    ev.filter(F.col("value") < 500).coalesce(1).write.parquet(f"{landing}/a")
    run()
    # second batch includes values OUTSIDE the frozen [0, 499] grid
    ev.filter(F.col("value") >= 500).coalesce(1).write.parquet(f"{landing}/b")
    run()
    got = {
        r["g"]: r
        for r in INC.hist_quantiles_from_table(
            spark, hist, ["g"], n_bins=64
        ).collect()
    }
    # frozen grid: estimates can never leave [lo, hi] = [0, 499]; with
    # half the mass clamped into the top bin, p95 sits at the edge
    assert 0.0 <= got["a"]["q_50"] <= 499.0
    assert abs(got["a"]["q_95"] - 499.0) < (499.0 / 64) * 2
    # the batch twin over the SAME frozen grid must agree exactly
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(f"('a', {float(i)!r}::DOUBLE)" for i in range(1_000))
        + ") t(g, value)"
    )
    sql = SKT.histogram_quantiles_frozen_sql(
        "value", "g", "events",
        "SELECT g, min(value) AS lo, max(value) AS hi FROM events "
        "WHERE value < 500 GROUP BY g",
        n_bins=64,
    )
    want = con.execute(sql).fetchone()
    assert abs(got["a"]["q_50"] - want[1]) < 1e-9
    assert abs(got["a"]["q_95"] - want[2]) < 1e-9
    # fresh-checkpoint full replay: already-applied epochs no-op
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(hist, "bins")).collect()
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    run()
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(hist, "bins")).collect()
    )
    assert before == after
    assert os.path.exists(os.path.join(hist, "bins", "_applied_0"))


def test_stream_kmv_identity_redelivery_and_debris(spark, tmp_path):
    """Streamed KMV sketch == one-pass batch sketch (set identity);
    redelivery is a no-op (union is idempotent); crash debris heals."""
    import os

    from etl_btc_spark.streaming import incremental as INC

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    landing, skp, ckpt = (
        str(tmp_path / d) for d in ("landing", "kmv", "ckpt")
    )

    def run():
        INC.stream_kmv_maintain(
            spark, f"{landing}/*", ev.schema, skp, ckpt,
            key_col="user_id", group_cols=["event_type"], k=64,
        )

    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(f"{landing}/a")
    run()
    ev.filter(F.col("user_id") % 2 != 0).coalesce(1).write.parquet(f"{landing}/b")
    run()
    # redelivery of the first half: no hash may move
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(f"{landing}/c")
    run()
    streamed = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(skp, "mins")).collect()
    }
    batch = {
        tuple(r)
        for r in SKT.kmv_sketch(ev, "user_id", ["event_type"], k=64).collect()
    }
    assert streamed == batch
    # crash between the renames heals on next read
    os.rename(os.path.join(skp, "mins"), os.path.join(skp, ".mins_old_dead"))
    os.makedirs(os.path.join(skp, ".mins_shadow_dead"))
    healed = {
        tuple(r)
        for r in INC.kmv_estimate_from_table(
            spark, skp, ["event_type"], k=64
        ).collect()
    }
    want = {
        tuple(r)
        for r in SKT.kmv_estimate_from_sketch(
            SKT.kmv_sketch(ev, "user_id", ["event_type"], k=64),
            ["event_type"], k=64,
        ).collect()
    }
    assert healed == want
    assert not os.path.exists(os.path.join(skp, ".mins_shadow_dead"))


# --- r16: KMV set differences + ADVICE fixes ---


def test_kmv_overlap_set_differences_exact(spark):
    """Both set-difference estimates collapse to exact counts when
    the sketches are complete (same no-special-case property as the
    union/intersection): A=0..59, B=40..89 -> |A\\B|=40, |B\\A|=30."""
    a = spark.range(60).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    b = spark.range(40, 90).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    ska = SKT.kmv_sketch(a, "key", ["g"], k=256)
    skb = SKT.kmv_sketch(b, "key", ["g"], k=256)
    r = SKT.kmv_overlap(ska, skb, ["g"], k=256).collect()[0]
    assert r["kmv_a_minus_b"] == 40.0
    assert r["kmv_b_minus_a"] == 30.0
    # identity: union = intersection + both differences (exact regime)
    assert r["kmv_union"] == r["kmv_intersection"] + r["kmv_a_minus_b"] + r["kmv_b_minus_a"]


def test_kmv_set_difference_error_bound(spark):
    """Estimator regime: 4000-key sets overlapping in 2000 — each
    difference is 2000; the union-fraction estimator lands within a
    generous 35% envelope (same regime as the intersection)."""
    a = spark.range(4_000).select(F.col("id").alias("key"), F.lit("g").alias("g"))
    b = spark.range(2_000, 6_000).select(
        F.col("id").alias("key"), F.lit("g").alias("g")
    )
    ska = SKT.kmv_sketch(a, "key", ["g"], k=256)
    skb = SKT.kmv_sketch(b, "key", ["g"], k=256)
    r = SKT.kmv_overlap(ska, skb, ["g"], k=256).collect()[0]
    assert abs(r["kmv_a_minus_b"] - 2_000) / 2_000 <= 0.35, r
    assert abs(r["kmv_b_minus_a"] - 2_000) / 2_000 <= 0.35, r


def test_bcast_arms_accept_empty_frames(spark):
    """r15 ADVICE: np.vstack raises on a zero-row batch — the bcast
    probe UDFs must short-circuit empties instead of failing the
    task. Exercised end-to-end on 0-row inputs."""
    empty = spark.range(0).select(F.col("id").cast("string").alias("key"))
    assert SKT.bloom_contains_bcast(empty, "key", [0] * 512).collect() == []
    assert SKT.cms_estimate_bcast(empty, "key", [0] * 4096).collect() == []


def test_stream_cms_legacy_external_ledger_migrates(spark, tmp_path):
    """r15 ADVICE: a long-lived sink upgraded across the r15 ledger
    relocation (external _applied/<epoch> dir -> in-cells markers)
    must still skip a crash-replayed pre-upgrade epoch. Simulate the
    pre-upgrade layout by stripping the in-dir markers and planting a
    legacy _applied/0, then replay epoch 0 with a fresh checkpoint:
    counters must not move and the legacy dir is retired."""
    import glob as _glob
    import os
    import shutil

    from etl_btc_spark.streaming import incremental as INC

    occ = spark.createDataFrame([(f"t{i % 29}",) for i in range(500)], "tok string")
    landing = str(tmp_path / "landing")
    cnt = str(tmp_path / "cnt")
    ckpt = str(tmp_path / "ckpt")
    occ.coalesce(1).write.parquet(f"{landing}/a")
    INC.stream_cms_maintain(
        spark, f"{landing}/*", occ.schema, cnt, ckpt, key_col="tok"
    )
    streamed = INC.cms_cells_from_table(spark, cnt)
    # devolve to the pre-upgrade layout
    for m in _glob.glob(os.path.join(cnt, "cells", "_applied_*")):
        os.remove(m)
    os.makedirs(os.path.join(cnt, "_applied"))
    with open(os.path.join(cnt, "_applied", "0"), "w") as f:
        f.write("applied\n")
    shutil.rmtree(ckpt, ignore_errors=True)  # re-delivers epoch 0
    INC.stream_cms_maintain(
        spark, f"{landing}/*", occ.schema, cnt, ckpt, key_col="tok"
    )
    assert INC.cms_cells_from_table(spark, cnt) == streamed
    assert not os.path.exists(os.path.join(cnt, "_applied"))
    assert os.path.exists(os.path.join(cnt, "cells", "_applied_0"))


def test_recover_swap_restores_newest_by_mtime(tmp_path):
    """r15 ADVICE: retired-dir suffixes are random uuids, so
    lexicographic 'newest' is arbitrary — restoration must go by
    mtime or stale state can resurrect after a double-crash."""
    import os
    import time

    from etl_btc_spark.streaming.incremental import _recover_swap

    base = str(tmp_path)
    older = os.path.join(base, ".x_old_zzzzzz")  # sorts LAST by name
    newer = os.path.join(base, ".x_old_aaaaaa")  # sorts first by name
    os.makedirs(older)
    with open(os.path.join(older, "state"), "w") as f:
        f.write("stale")
    t = time.time()
    os.utime(older, (t - 100, t - 100))
    os.makedirs(newer)
    with open(os.path.join(newer, "state"), "w") as f:
        f.write("fresh")
    os.utime(newer, (t, t))
    _recover_swap(base, "x")
    live = os.path.join(base, "x")
    with open(os.path.join(live, "state")) as f:
        assert f.read() == "fresh"
    assert not os.path.exists(older)


def test_stream_hist_group_absent_from_first_batch(spark, tmp_path):
    """r15 ADVICE: a group with NO rows in the first batch freezes
    its grid at FIRST SIGHT in a later batch — the engine must carry
    it (grid = that batch's bounds) and the per-group first-slice
    oracle (q99bl's _Q99BL_GRID_SQL shape) must agree exactly."""
    import duckdb

    from etl_btc_spark.streaming import incremental as INC

    rows = [("a", float(i)) for i in range(200)] + [
        ("late", 100.0 + float(i)) for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "g string, value double")
    landing, hist, ckpt = (
        str(tmp_path / d) for d in ("landing", "hist", "ckpt")
    )

    def run():
        INC.stream_hist_maintain(
            spark, f"{landing}/*", ev.schema, hist, ckpt,
            value_col="value", group_cols=["g"], n_bins=64,
        )

    # batch 0: only group 'a'; batch 1: 'late' appears + more 'a'
    ev.filter((F.col("g") == "a") & (F.col("value") < 100)).coalesce(
        1
    ).write.parquet(f"{landing}/b0")
    run()
    ev.filter((F.col("g") == "late") | (F.col("value") >= 100)).coalesce(
        1
    ).write.parquet(f"{landing}/b1")
    run()
    got = {
        r["g"]: r
        for r in INC.hist_quantiles_from_table(
            spark, hist, ["g"], n_bins=64
        ).collect()
    }
    assert set(got) == {"a", "late"}
    # oracle with the per-group first-sight grid: 'a' froze on batch 0
    # ([0, 99] — later values clamp), 'late' froze on batch 1 (its
    # true bounds [100, 299])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{g}', {v!r}::DOUBLE, {0 if (g == 'a' and v < 100) else 1})"
            for g, v in rows
        )
        + ") t(g, value, slice)"
    )
    grid = (
        "SELECT e.g, min(e.value) AS lo, max(e.value) AS hi "
        "FROM events e JOIN (SELECT g, min(slice) AS s0 FROM events "
        "GROUP BY g) fs ON e.g = fs.g AND e.slice = fs.s0 GROUP BY e.g"
    )
    sql = SKT.histogram_quantiles_frozen_sql(
        "value", "g", "events", grid, n_bins=64
    )
    want = {r[0]: r for r in con.execute(sql).fetchall()}
    for g in ("a", "late"):
        assert abs(got[g]["q_50"] - want[g][1]) < 1e-9, g
        assert abs(got[g]["q_95"] - want[g][2]) < 1e-9, g
    # 'late' was never clamped: its p95 sits inside (100, 300)
    assert 100.0 < got["late"]["q_95"] <= 300.0


def test_kmv_merge_global_no_group_cols(spark):
    """The q99bu/q99bz global arm: kmv_merge with EMPTY group_cols
    (one global sketch) over per-part sketches equals the direct
    global sketch — the set identity with no grouping column."""
    df = spark.range(1_000).select(
        (F.col("id") % 300).alias("key"), (F.col("id") % 7).alias("part")
    )
    whole = {r["__h"] for r in SKT.kmv_sketch(df, "key", [], k=64).collect()}
    daily = SKT.kmv_sketch(df, "key", ["part"], k=64)
    merged = {
        r["__h"]
        for r in SKT.kmv_merge(daily.select("__h"), [], k=64).collect()
    }
    assert merged == whole and len(merged) == 64
