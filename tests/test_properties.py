"""Property-based tests (hypothesis): laws that must hold for ANY
input, not just the fixtures — targeted at the operators where a
hand-picked example can hide a bug (as-of join NULL handling, upsert
merge semantics, fingerprint normalization)."""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_btc_spark import sinks as SK
from etl_btc_spark.operators.asof import asof_join
from etl_btc_spark.operators.textops import normalize_text

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# small integer grids keep frames tiny and collisions (equal ts, equal
# keys, NULL attrs) likely — that's where the bugs live
_ts = st.integers(min_value=0, max_value=5)
_key = st.integers(min_value=1, max_value=2)
_val = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))


@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=6),
    right=st.lists(st.tuples(_key, _ts, _val, _val), min_size=1, max_size=6),
)
@settings(**_SETTINGS)
def test_asof_join_matches_duckdb(spark, left, right):
    """asof_join == DuckDB ASOF LEFT JOIN for arbitrary frames with
    duplicate keys/timestamps and NULL right attributes."""
    lpd = pd.DataFrame(
        {
            "k": [k for k, _ in left],
            "ts": pd.to_datetime([t for _, t in left], unit="h"),
            "lv": range(len(left)),
        }
    )
    # dedupe right on (k, ts): at equal timestamps ASOF semantics are
    # tie-ambiguous between engines, and real event streams key time
    rpd = pd.DataFrame(
        {
            "k": [k for k, *_ in right],
            "ts": pd.to_datetime([t for _, t, *_ in right], unit="h"),
            "rv": pd.array([v for *_, v, _ in right], dtype="Int64"),
            "rw": pd.array([v for *_, _, v in right], dtype="Int64"),
        }
    ).drop_duplicates(subset=["k", "ts"], keep="first")

    got = {
        r["lv"]: (r["rv"], r["rw"])
        for r in asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd), on="k"
        ).collect()
    }
    want = {
        lv: (rv, rw)
        for lv, rv, rw in duckdb.sql(
            "SELECT l.lv, r.rv, r.rw FROM lpd l ASOF LEFT JOIN rpd r"
            " ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    norm = lambda d: {k: tuple(None if pd.isna(x) else int(x) for x in v) for k, v in d.items()}  # noqa: E731
    assert norm(got) == norm(want)


@given(
    b1=st.lists(st.tuples(st.sampled_from("abcd"), st.integers(0, 9)), min_size=1, max_size=5),
    b2=st.lists(st.tuples(st.sampled_from("abcd"), st.integers(0, 9)), min_size=1, max_size=5),
)
@settings(**_SETTINGS)
def test_upsert_laws(spark, tmp_path_factory, b1, b2):
    """For any two batches: (1) one row per key, (2) re-upserting the
    last batch is a no-op, (3) surviving rows come from the latest
    batch that contained the key (min order_col within it)."""
    path = str(tmp_path_factory.mktemp("upsert") / "t")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame({"content_id": [k for k, _ in rows], "doc_id": [v for _, v in rows]})
    )
    SK.upsert_by_key(spark, mk(b1), path, order_col="doc_id")
    SK.upsert_by_key(spark, mk(b2), path, order_col="doc_id")
    once = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    SK.upsert_by_key(spark, mk(b2), path, order_col="doc_id")
    twice = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert once == twice  # idempotent re-ingest

    want = {}
    for batch in (b1, b2):
        per_key = {}
        for k, v in batch:
            per_key[k] = min(per_key.get(k, v), v)
        want.update(per_key)
    assert once == want


@given(s=st.text(alphabet=" \t\naAbB.,", max_size=30))
@settings(**_SETTINGS)
def test_fingerprint_normalization_invariance(spark, s):
    """Case + whitespace variants of the same content hash equal."""
    df = spark.createDataFrame(pd.DataFrame({"t": [s, "  " + s.upper() + "\t"]}))
    out = df.select(F.sha2(normalize_text(F.col("t")), 256).alias("h")).collect()
    assert out[0]["h"] == out[1]["h"]


def test_r4_operators_empty_and_degenerate_inputs(spark):
    """r4 operators must not blow up on empty / degenerate inputs:
    empty corpus, empty strata map, single-doc packing."""
    import pandas as pd

    from etl_btc_spark.operators import sampling as SP
    from etl_btc_spark.operators.dedup import contamination_check, edit_distance_pairs

    empty = spark.createDataFrame([], "doc_id bigint, text string, lang string")
    assert SP.stratified_sample(empty, {"en": 5000}).count() == 0
    assert SP.token_packing(empty).count() == 0
    assert edit_distance_pairs(empty, max_dist=4).count() == 0
    assert contamination_check(empty, empty).count() == 0

    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": ["hello world"], "lang": ["en"]})
    )
    # empty rates map -> keep nothing (config-driven callers)
    assert SP.stratified_sample(one, {}).count() == 0
    # unlisted stratum -> dropped; listed at full rate -> kept
    assert SP.stratified_sample(one, {"de": 10000}).count() == 0
    assert SP.stratified_sample(one, {"en": 10000}).count() == 1
    row = SP.token_packing(one).collect()[0]
    assert (row["n_tokens"], row["pack_id"], row["pack_offset"]) == (2, 0, 0)
    # a doc paired only with itself -> no pairs
    assert edit_distance_pairs(one, max_dist=4).count() == 0
    assert contamination_check(one, one).count() == 0


@given(
    b1=st.lists(st.tuples(st.sampled_from("abcd"), st.integers(0, 9)), min_size=1, max_size=5),
    b2=st.lists(st.tuples(st.sampled_from("abcd"), st.integers(0, 9)), min_size=1, max_size=5),
)
@settings(**_SETTINGS)
def test_upsert_pruned_laws(spark, tmp_path_factory, b1, b2):
    """The partition-pruned MERGE obeys the SAME laws as the flat
    path for any two batches (keys partition-stably mapped to two
    langs): one row per key, idempotent re-ingest, latest-batch-wins
    — plus the pruned path must never lose rows in partitions the
    second batch doesn't touch."""
    path = str(tmp_path_factory.mktemp("upsert_pruned") / "t")
    lang_of = lambda k: "lx" if k in "ab" else "ly"  # noqa: E731
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(
            {
                "content_id": [k for k, _ in rows],
                "doc_id": [v for _, v in rows],
                "lang": [lang_of(k) for k, _ in rows],
            }
        )
    )
    SK.upsert_by_key(spark, mk(b1), path, order_col="doc_id", partition_by="lang")
    SK.upsert_by_key(spark, mk(b2), path, order_col="doc_id", partition_by="lang")
    once = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    SK.upsert_by_key(spark, mk(b2), path, order_col="doc_id", partition_by="lang")
    twice = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert once == twice  # idempotent re-ingest

    want = {}
    for batch in (b1, b2):
        per_key = {}
        for k, v in batch:
            per_key[k] = min(per_key.get(k, v), v)
        want.update(per_key)
    assert once == want


def test_contamination_broadcast_guard(spark):
    """Oversized test side (round-5 guard): past broadcast_max_rows
    the broadcast hint is dropped — the shuffle-join path must return
    the IDENTICAL result, and the guarded plan must not carry the
    explicit broadcast hint on the posting-list join."""
    import pandas as pd

    from etl_btc_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(20),
                "text": [
                    f"alpha beta gamma delta epsilon zeta {i}" for i in range(20)
                ],
            }
        )
    )
    test = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100, 101],
                "text": [
                    "alpha beta gamma delta epsilon zeta 3",
                    "totally unrelated words here nothing shared at all",
                ],
            }
        )
    )
    via_bcast = sorted(
        map(tuple, contamination_check(corpus, test).collect())
    )
    guarded = contamination_check(corpus, test, broadcast_max_rows=1)
    assert sorted(map(tuple, guarded.collect())) == via_bcast
    assert via_bcast and via_bcast[0][0] == 100
    # the guarded plan must not hint the posting-list broadcast; AQE
    # may still CHOOSE a runtime broadcast, so pin the logical hint
    logical = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical


def test_token_packing_derived_shards(spark):
    """Round-5: the default shard key is id DIV docs_per_shard — the
    shard count grows with the corpus (window parallelism scales),
    consecutive ids stay co-located, and the legacy n_shards override
    still interleaves by modulo."""
    import pandas as pd

    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "text": ["one two three"] * 200})
    )
    derived = SP.token_packing(df, budget=7, docs_per_shard=50)
    shards = sorted(r["shard"] for r in derived.select("shard").distinct().collect())
    assert shards == [0, 1, 2, 3]
    # within a shard docs pack in id order: doc 50 starts shard 1 at 0
    first = derived.filter(F.col("doc_id") == 50).collect()[0]
    assert (first["pack_id"], first["pack_offset"]) == (0, 0)
    # doubling the corpus doubles the derived shard count
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(400), "text": ["one two three"] * 400})
    )
    assert SP.token_packing(df2, budget=7, docs_per_shard=50).select(
        "shard"
    ).distinct().count() == 8
    # legacy override: modulo interleave, fixed count
    legacy = SP.token_packing(df, budget=7, n_shards=8)
    assert legacy.select("shard").distinct().count() == 8
    assert legacy.filter(F.col("doc_id") == 9).collect()[0]["shard"] == 1


def test_split_stable_under_growth_and_independent_salt(spark):
    """q90 split laws: labels partition the id space (every doc gets
    exactly one label with the default 9800/100/100), assignments
    never migrate when the corpus grows, and the split bucket is
    salted independently of the q80 sampling bucket."""
    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(500)}))
    small = SP.train_val_test_split(df.filter(F.col("doc_id") < 200))
    big = SP.train_val_test_split(df)
    assert big.filter(F.col("split").isNull()).count() == 0
    sm = {r["doc_id"]: r["split"] for r in small.collect()}
    bg = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(bg[i] == sm[i] for i in sm)  # no migration on growth
    # independence: the two salted buckets differ for most ids
    both = df.select(
        SP.hash_bucket(F.col("doc_id"), salt="doc").alias("b_doc"),
        SP.hash_bucket(F.col("doc_id"), salt="split").alias("b_split"),
    )
    assert both.filter(F.col("b_doc") == F.col("b_split")).count() < 5
    # partial fractions leave an explicit NULL remainder
    part = SP.train_val_test_split(df, {"train": 5000})
    n_null = part.filter(F.col("split").isNull()).count()
    assert 0 < n_null < 500


def test_domain_mix_rates_laws(spark):
    """q91 rate laws: rates ≤ 10000, the binding domain keeps
    (nearly) everything, and realized proportions track the target
    weights; empty/missing domains behave like unlisted strata."""
    from etl_btc_spark.operators import sampling as SP

    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "source": ["a"] * 700 + ["b"] * 200 + ["c"] * 100,
        }
    )
    df = spark.createDataFrame(pdf)
    rates = SP.domain_mix_rates(df, {"a": 1, "b": 1, "c": 1})
    assert set(rates) == {"a", "b", "c"}
    assert all(r <= 10_000 for r in rates.values())
    assert rates["c"] == 10_000  # smallest domain binds, keeps all
    out = SP.stratified_sample(df, rates, stratum_col="source")
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # balanced target: each domain lands within hash noise of 100
    for s in "abc":
        assert abs(got[s] - 100) <= 25, got
    # a domain absent from the target is dropped entirely
    rates2 = SP.domain_mix_rates(df, {"a": 1, "b": 1})
    assert "c" not in rates2
    assert SP.domain_mix_rates(df.filter(F.lit(False))) == {}


def test_training_shuffle_laws(spark):
    """q92 laws: (shard, pos) is a bijection onto the corpus, the
    same seed reproduces the identical permutation, a different seed
    produces a different one, and the permutation is not the
    identity (ids actually move)."""
    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(300)}))
    a = SP.training_shuffle(df, seed="epoch-0", n_shards=8).collect()
    b = SP.training_shuffle(df, seed="epoch-0", n_shards=8).collect()
    c = SP.training_shuffle(df, seed="epoch-1", n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(a) == key(b)  # same seed, same permutation
    assert key(a) != key(c)  # new seed, new permutation
    # bijection: every doc exactly once, positions dense per shard
    assert len({r["doc_id"] for r in a}) == 300
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # reading in (shard, pos) order is not the identity order
    order = [r["doc_id"] for r in sorted(a, key=lambda r: (r["shard"], r["pos"]))]
    assert order != sorted(order)


def test_sampling_guard_validation(spark):
    """Review r5 round 2: split fractions validate (empty dict and
    over-allocation raise instead of silently misassigning), the
    shuffle rejects colliding column names, and domain_mix_rates
    rejects target+weight_fn together."""
    import pytest as _pytest

    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(10)}))
    with _pytest.raises(ValueError, match="non-empty"):
        SP.train_val_test_split(df, {})
    with _pytest.raises(ValueError, match="buckets"):
        SP.train_val_test_split(df, {"train": 9000, "val": 2000})
    with _pytest.raises(ValueError, match="buckets"):
        SP.train_val_test_split_sql({"a": 10001})

    with _pytest.raises(ValueError, match="rename"):
        SP.training_shuffle(df.withColumn("shard", F.lit(1)))

    d2 = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "source": ["a"]}))
    with _pytest.raises(ValueError, match="not both"):
        SP.domain_mix_rates(d2, target={"a": 1}, weight_fn=lambda d: 1)


def test_token_packing_precomputed_layout(spark):
    """token_packing(shard_col, order_col) packs along the supplied
    layout — packing a shuffled corpus through the operator equals
    the inline cumsum it replaced (here: hand-checked positions)."""
    from etl_btc_spark.operators import sampling as SP

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "d e", "f", "g h i j"],
            "shard": [0, 0, 1, 1],
            "pos": [1, 0, 0, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["doc_id"]: (r["shard"], r["pos"], r["n_tokens"], r["pack_id"], r["pack_offset"])
        for r in SP.token_packing(df, budget=4, shard_col="shard", order_col="pos").collect()
    }
    # shard 0 order: doc2 (2 toks) then doc1 (3 toks); shard 1: doc3 (1) then doc4 (4)
    assert out[2] == (0, 0, 2, 0, 0)
    assert out[1] == (0, 1, 3, 0, 2)
    assert out[3] == (1, 0, 1, 0, 0)
    assert out[4] == (1, 1, 4, 0, 1)


def test_upsert_order_insensitive_under_versions(spark, tmp_path):
    """MERGE law: with distinct versions per key, applying two
    batches in EITHER order converges to the same table — the
    property the streaming refresh's replay convergence rests on."""
    from etl_btc_spark import sinks as SK

    b_new = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": ["a1", "b1"], "ver": [1, 1]})
    )
    b_old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 3], "v": ["a0", "c0"], "ver": [0, 0]})
    )
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    SK.upsert_by_key(spark, b_old, pa, key="k", order_col="k", ver_col="ver")
    SK.upsert_by_key(spark, b_new, pa, key="k", order_col="k", ver_col="ver")
    SK.upsert_by_key(spark, b_new, pb, key="k", order_col="k", ver_col="ver")
    SK.upsert_by_key(spark, b_old, pb, key="k", order_col="k", ver_col="ver")
    ra = sorted(map(tuple, spark.read.parquet(pa).collect()))
    rb = sorted(map(tuple, spark.read.parquet(pb).collect()))
    assert ra == rb == [(1, "a1", 1), (2, "b1", 1), (3, "c0", 0)]


def test_training_shuffle_shard_balance(spark):
    """The 32-bit-prefix shard derivation must spread a corpus evenly
    (power-of-two n_shards divides 2^32 exactly): every shard of a
    2000-doc corpus lands within ±40% of the expected 250."""
    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(2000)}))
    out = SP.training_shuffle(df, seed="bal", n_shards=8)
    counts = {r["shard"]: r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 8
    for s, n in counts.items():
        assert 150 <= n <= 350, (s, n)


def test_hash_bucket_uniformity(spark):
    """q80/q90's sampling rests on the md5 bucket being uniform: over
    10k ids, each decile of the bucket space holds 1000 ± 35%."""
    from etl_btc_spark.operators import sampling as SP

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(10_000)}))
    dec = (SP.hash_bucket(F.col("doc_id")) / 1000).cast("int").alias("d")
    counts = {r["d"]: r["n"] for r in df.select(dec).groupBy("d").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 10
    for d, n in counts.items():
        assert 650 <= n <= 1350, (d, n)


def test_exact_n_sample_laws(spark):
    """q98 laws: exactly N per stratum (or all rows when the stratum
    is smaller), deterministic across calls, and one-sided stability:
    growing the corpus only ever REPLACES members with lower-key
    newcomers — survivors keep their membership, never reshuffle."""
    from etl_btc_spark.operators import sampling as SP

    pdf = pd.DataFrame(
        {"doc_id": range(300), "lang": ["a", "b", "c"] * 100}
    )
    df = spark.createDataFrame(pdf)
    small = df.filter(F.col("doc_id") < 150)
    s1 = SP.exact_n_sample(small, 10)
    s2 = SP.exact_n_sample(small, 10)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10, "c": 10}
    # stratum smaller than N -> keep all of it
    tiny = SP.exact_n_sample(df.filter(F.col("doc_id") < 9), 10)
    assert tiny.count() == 9
    # one-sided stability: anyone sampled from the FULL corpus who
    # already existed in the small corpus must be sampled there too
    big_ids = {r["doc_id"] for r in SP.exact_n_sample(df, 10).collect()}
    small_ids = {r["doc_id"] for r in s1.collect()}
    assert {i for i in big_ids if i < 150} <= small_ids


def test_sampling_laws_at_sf01(spark):
    """VERDICT r5 #7: the r5 sampling laws re-asserted at 100k rows
    (sf0.1 events, ~100x the smoke fixtures) — guards the
    integer-rate and exact-N invariants against md5-bucket
    discretization surprises that smoke-scale property runs cannot
    see."""
    from etl_btc_spark.operators import sampling as SP
    from etl_btc_spark.tables import load_table

    sf = "/root/testdata/sf0.1"
    ev = load_table(spark, sf, "events").select(
        "event_id", (F.col("user_id") % 8).cast("string").alias("dom")
    )
    n = ev.count()
    assert n >= 100_000, n  # the point is scale

    # exact-N: exactly 1000 per stratum, bit-deterministic re-run
    s1 = SP.exact_n_sample(ev, 1000, stratum_col="dom", id_col="event_id")
    per = {r["dom"]: r["n"] for r in s1.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert set(per.values()) == {1000}, per
    s2 = SP.exact_n_sample(ev, 1000, stratum_col="dom", id_col="event_id")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0

    # split: no unassigned rows, every fraction within 5 sigma of its
    # 9800/100/100 target, and the label is a pure function of the id
    # (a subset scan assigns identical labels)
    sp = SP.train_val_test_split(ev, id_col="event_id")
    counts = {
        r["split"]: r["n"]
        for r in sp.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert None not in counts, counts
    for label, width in (("train", 9800), ("val", 100), ("test", 100)):
        p = width / 10_000
        exp, sd = n * p, (n * p * (1 - p)) ** 0.5
        assert abs(counts[label] - exp) <= 5 * sd + 1, (label, counts[label], exp)
    sub = SP.train_val_test_split(
        ev.filter(F.col("event_id") % 7 == 0), id_col="event_id"
    )
    diverged = (
        sub.select("event_id", F.col("split").alias("s_sub"))
        .join(sp.select("event_id", "split"), "event_id")
        .filter(F.col("s_sub") != F.col("split"))
        .count()
    )
    assert diverged == 0

    # domain-mix integer rates at scale: uniform target -> every
    # domain's kept count lands within 5 sigma of cnt * rate / 10000,
    # and the post-mix domains are near-equal (that's the goal of the
    # rebalance)
    rates = SP.domain_mix_rates(ev, stratum_col="dom")
    cnts = {
        r["dom"]: r["n"]
        for r in ev.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    kept = SP.stratified_sample(ev, rates, stratum_col="dom", id_col="event_id")
    kc = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    for d, rate in rates.items():
        p = rate / 10_000
        exp, sd = cnts[d] * p, (cnts[d] * p * (1 - p)) ** 0.5
        assert abs(kc[d] - exp) <= 5 * sd + 1, (d, kc[d], exp)
    assert max(kc.values()) - min(kc.values()) <= 5 * max(
        (cnts[d] * (rates[d] / 1e4) * (1 - rates[d] / 1e4)) ** 0.5 for d in rates
    ) * 2 + 1


def test_minhash_simhash_oracle_null_and_empty_docs(spark):
    """ADVICE r6: the SimHash/MinHash oracle CTEs must match the UDFs
    on NULL and degenerate documents — DuckDB's list_sum/list_min over
    a NULL token array yields NULL, while the UDFs emit the all-ones
    lane (simhash -1, sig all-MERSENNE). The COALESCE guards pin the
    empty-doc convention; this fixture is exactly the future-fixture
    case the advice warned would break q40/q41's hash-compare."""
    from etl_btc_spark.operators import dedup as DD
    from etl_btc_spark.operators.textops import normalize_text as NT
    from etl_btc_spark.operators.textops import ws_tokens as WT

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["bitcoin rallies again today", None, "", "   "],
        }
    )
    docs = spark.createDataFrame(pdf)
    toks = WT(NT(F.col("text")))
    got_mh = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id", DD.minhash_signature_udf(32, 7, ngram=3)(toks).alias("sig")
        ).collect()
    }
    got_sh = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", DD.simhash64(F.col("text")).alias("sh")).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    tokens_w = """
        w AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS t
            FROM documents
        )"""
    mh = {
        r[0]: [int(v) for v in r[1]]
        for r in con.execute(
            f"WITH {tokens_w}, {DD.minhash_oracle_ctes()} "
            "SELECT doc_id, list_transform(sig, x -> CAST(x AS BIGINT)) FROM mh_sig"
        ).fetchall()
    }
    sh = {
        r[0]: r[1]
        for r in con.execute(
            f"WITH {tokens_w}, {DD.simhash_oracle_ctes()} "
            "SELECT doc_id, simhash FROM sim_sig"
        ).fetchall()
    }
    con.close()
    assert got_mh == mh
    assert got_sh == sh
    # and the convention itself: NULL doc -> all-ones lane
    assert got_sh[2] == -1
    assert set(got_mh[2]) == {(1 << 61) - 1}


def test_md5p32_cached_throughput_floor():
    """VERDICT r6 #8: the md5-prefix base hash bought oracle
    expressibility; its memo must keep cached-vocabulary hashing
    cheap. Floor: 1M lookups over a 10k-token vocabulary in < 3s
    (~330k/s — an order of magnitude under the measured rate, so only
    a pathological cache-policy change can trip it)."""
    import time

    from etl_btc_spark.operators.dedup import _md5p32_fn

    h32 = _md5p32_fn()
    vocab = ["token-%d" % i for i in range(10_000)]
    for t in vocab:  # warm the cache
        h32(t)
    t0 = time.time()
    for _ in range(100):
        for t in vocab:
            h32(t)
    elapsed = time.time() - t0
    assert elapsed < 3.0, f"1M cached md5p32 lookups took {elapsed:.2f}s"
    # LRU bound (ADVICE r6): the cache can never exceed its maxsize
    info = h32.cache_info()
    assert info.maxsize == 1 << 17 and info.currsize <= info.maxsize
    # ...and the callable must survive the UDF pickle boundary with
    # the cache dropped (workers rebuild their own)
    import pickle

    h2 = pickle.loads(pickle.dumps(h32))
    assert h2("token-0") == h32("token-0")


def test_connected_components_reclaims_checkpoints(spark):
    """ADVICE r6: per-round label checkpoints must actually leave
    executor storage when the round ends (Dataset.unpersist silently
    no-ops on localCheckpointed frames). After materializing the CC
    result, at most the FINAL checkpoint's blocks may remain."""
    from etl_btc_spark.operators import dedup as DD

    sc = spark.sparkContext
    # quiesce: drop anything earlier tests left cached
    DD.release_scoped_caches()
    spark.catalog.clearCache()
    base = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    # a path graph propagates the min one hop per round: 10 edges ->
    # ~10 rounds of checkpoints, well under max_iters but plenty to
    # leak if the per-round drop no-ops
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a: bigint, id_b: bigint"
    )
    out = DD.connected_components(pairs)
    assert out.filter(F.col("cluster_id") != 0).count() == 0
    after = [i for i in sc._jsc.sc().getRDDStorageInfo() if i.id() not in base]
    # final checkpoint only — one storage entry, not one per round
    assert len(after) <= 1, [(i.id(), i.name()) for i in after]


def test_connected_components_fails_loud_past_max_iters(spark):
    """r7: an unconverged CC must raise, not return a silently split
    component (min-label propagation moves one hop per round, so a
    path longer than max_iters cannot have converged)."""
    import pytest as _pytest

    from etl_btc_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a: bigint, id_b: bigint"
    )
    with _pytest.raises(RuntimeError, match="max_iters"):
        DD.connected_components(pairs, max_iters=3)
    # and the same graph converges fine with enough rounds
    ok = DD.connected_components(pairs, max_iters=12)
    assert ok.filter(F.col("cluster_id") != 0).count() == 0


def test_connected_components_log_rounds_on_long_chain(spark):
    """r7 pointer jumping: a 200-edge path (diameter 200) must
    converge well inside 20 rounds (pure one-hop propagation would
    need 200) and still label every node with the component min."""
    from etl_btc_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a: bigint, id_b: bigint"
    )
    out = DD.connected_components(pairs, max_iters=20)
    assert out.count() == 201
    assert out.filter(F.col("cluster_id") != 0).count() == 0
    # two disjoint chains keep distinct minima
    pairs2 = pairs.union(
        spark.createDataFrame(
            [(1000 + i, 1001 + i) for i in range(50)], "id_a: bigint, id_b: bigint"
        )
    )
    out2 = DD.connected_components(pairs2, max_iters=20)
    got = {r["cluster_id"] for r in out2.select("cluster_id").distinct().collect()}
    assert got == {0, 1000}


def test_connected_components_dedup_edges_off_same_labels(spark):
    """r17 optimization: ``dedup_edges=False`` skips the edge-distinct
    shuffle for callers whose pair set is already distinct — and must
    give the SAME labels even when the caller lied and duplicates (or
    both orientations) are present, because min-label propagation is
    idempotent over duplicate edges."""
    from etl_btc_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (0, 1), (2, 1)], "id_a: bigint, id_b: bigint"
    )
    ref = {
        (r["node"], r["cluster_id"])
        for r in DD.connected_components(pairs).collect()
    }
    fast = {
        (r["node"], r["cluster_id"])
        for r in DD.connected_components(pairs, dedup_edges=False).collect()
    }
    assert fast == ref
    assert {c for _, c in fast} == {0, 5}


def test_connected_components_round1_specialization_converges(spark):
    """r17: round 1 runs the specialized identity-labels step (one
    aggregation, no pointer join). A star graph whose hub is the min
    converges in that single round — and a graph needing label
    propagation through the hub still reaches the fixpoint."""
    from etl_btc_spark.operators import dedup as DD

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a: bigint, id_b: bigint"
    )
    out = DD.connected_components(star, stats_out=(stats := {}))
    assert out.filter(F.col("cluster_id") != 0).count() == 0
    # one specialized change round + one generic confirm round
    assert stats["rounds"] == 2
    # reversed star (hub is the max): needs a second round to pull the
    # min through the hub — exercises the generic-round path after the
    # specialized first round
    rstar = spark.createDataFrame(
        [(i, 9) for i in range(1, 6)], "id_a: bigint, id_b: bigint"
    )
    out2 = DD.connected_components(rstar, stats_out=(stats2 := {}))
    assert out2.filter(F.col("cluster_id") != 1).count() == 0
    assert stats2["rounds"] >= 2


def test_minhash_cap_anti_join_equals_width_filter(spark):
    """r17: the stop-bucket cap now drops over-wide buckets via a
    partial-agg + anti join instead of a bkey window — the kept row
    set must equal the reference width-count filter exactly."""
    from pyspark.sql import Window

    from etl_btc_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(i, "flood common text body shared by everyone") for i in range(40)]
        + [(100 + i, f"unique document number {i} with words {i * 7}") for i in range(20)],
        "doc_id: bigint, text: string",
    )
    banded = DD._minhash_banded(docs, "doc_id", "text", 32, 8, 3)
    wb = Window.partitionBy("bkey")
    ref = {
        (r["doc_id"], r["bkey"])
        for r in banded.withColumn("__bw", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bw") <= 16)
        .drop("__bw")
        .collect()
    }
    capped_pairs = DD.minhash_lsh_candidates(docs, max_bucket=16, ngram=3)
    # reconstruct the capped banded set the anti join kept: every pair
    # side must come from a kept (id, bkey) row — weaker but direct:
    # the capped candidate set must equal pairs generated from ref
    import itertools

    by_bucket: dict = {}
    for doc_id, bkey in ref:
        by_bucket.setdefault(bkey, set()).add(doc_id)
    want = set()
    for members in by_bucket.values():
        for x, y in itertools.combinations(sorted(members), 2):
            want.add((x, y))
    got = {(r["id_a"], r["id_b"]) for r in capped_pairs.collect()}
    assert got == want
    DD.release_scoped_caches()


@given(
    texts=st.lists(
        st.text(alphabet=" \t\naAbBcC.,!?0-", max_size=24), min_size=1, max_size=6
    )
)
@settings(**_SETTINGS)
def test_tfidf_matches_duckdb_fuzz(spark, texts):
    """q99's engine/oracle agreement for ARBITRARY small corpora —
    mixed case, repeated tokens, punctuation-only and empty docs —
    not just the fixture text. Pins tokenizer semantics (Java vs RE2
    \\s), the empty-token filter, rounding, and rank tie-breaks."""
    from etl_btc_spark.operators.textops import (
        tfidf_keywords,
        tfidf_keywords_oracle_sql,
    )

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = sorted(
        (r["doc_id"], r["rank"], r["token"], r["tfidf"])
        for r in tfidf_keywords(spark.createDataFrame(pdf), k=3).collect()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(map(tuple, con.execute(tfidf_keywords_oracle_sql(k=3)).fetchall()))
    con.close()
    from etl_btc_spark.operators import dedup as DD

    DD.release_scoped_caches()
    assert got == want


def test_tfidf_single_tokenize_plan(spark):
    """q99 plan pin (VERDICT r7 'What's wrong' #1): the TF aggregate
    is persisted, so BOTH the scoring branch and the document-
    frequency branch read the SAME InMemoryRelation — the corpus is
    scanned+exploded once, not once per branch. Without the persist
    Catalyst re-optimizes the shared subtree per branch and the plan
    shows two independent Scan→Generate→aggregate chains."""
    import re

    from etl_btc_spark.operators import dedup as DD
    from etl_btc_spark.operators.textops import tfidf_keywords
    from etl_btc_spark.tables import table_path

    docs_df = spark.read.parquet(table_path("/root/testdata/sf0.001", "documents"))
    out = tfidf_keywords(docs_df, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two cache READ sites (tf branch + dfreq branch)...
    assert plan.count("InMemoryTableScan") == 2, plan
    # ...over ONE cached relation: every Generate line in the printed
    # plan is the identical node (same expression ids) inside the one
    # InMemoryRelation subtree, rendered once per scan site.
    gen_lines = {ln.strip().lstrip(":+- ") for ln in plan.splitlines() if "Generate" in ln}
    assert len(gen_lines) == 1, gen_lines
    # the only OTHER corpus scan is the column-pruned n_docs count —
    # no FileScan outside the cached subtree may read `text`.
    cached_start = plan.index("InMemoryRelation")
    filescans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln
    ]
    text_scans = [ln for ln in filescans if re.search(r"ReadSchema:.*text", ln)]
    # text-reading scans appear only as the cached subtree printed at
    # each of the two scan sites; the n_docs scan reads doc_id only.
    assert len(filescans) == 3, plan
    assert len(text_scans) == 2, text_scans
    DD.release_scoped_caches()


def test_weighted_sample_inclusion_law_and_plan(spark):
    """q99i's sampler: (1) the derandomized Efraimidis-Spirakis key
    obeys the weighted-inclusion law — across many salts, items with
    10x the weight are included in the top-n far more often than the
    rest (the law lives in the FORMULA, so it's checked with a fast
    local mirror of the exact md5/ln key) — and, per review r8, it
    keeps obeying it at weights ~1e4 where the UN-normalized key
    collapsed under the 6-decimal round; (2) Spark's output for one
    salt equals the locally computed top-n exactly (engine agreement,
    incl. tie-break); (3) the plan is scan + broadcast 1-row max +
    TakeOrdered — no data Exchange of the corpus."""
    import hashlib
    import math

    from etl_btc_spark.operators import sampling as SP

    n_items, n_pick = 200, 20
    heavy = set(range(0, n_items, 10))

    def mirror_key(i: int, salt: str, weights: dict) -> float:
        h = hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 4294967296.0
        w_max = max(max(weights.values()), 1e-6)
        return round(1e-9 + math.log(u) * w_max / max(weights[i], 1e-6), 6)

    def rates(weights: dict) -> tuple[float, float]:
        hits_heavy = hits_light = 0
        for s in range(60):
            order = sorted(
                range(n_items),
                key=lambda i: (-mirror_key(i, f"s{s}_", weights), i),
            )
            t = set(order[:n_pick])
            hits_heavy += len(t & heavy)
            hits_light += len(t - heavy)
        return (
            hits_heavy / (60 * len(heavy)),
            hits_light / (60 * (n_items - len(heavy))),
        )

    # 10x weight → much higher inclusion; 4x is a loose floor (E-S
    # theory puts it near 8x for this geometry). The law must hold at
    # BOTH unit-scale and 1e4-scale weights — the second regime is
    # where the un-normalized round(ln(u)/w, 6) key collapsed into
    # lowest-id-first ties (review r8).
    for scale in (1.0, 1e4):
        weights = {
            i: (0.9 if i in heavy else 0.09) * scale for i in range(n_items)
        }
        rate_heavy, rate_light = rates(weights)
        assert rate_heavy > 4 * rate_light, (scale, rate_heavy, rate_light)

    weights = {i: (0.9 if i in heavy else 0.09) * 1e4 for i in range(n_items)}
    pdf = pd.DataFrame(
        {"doc_id": range(n_items), "w": [weights[i] for i in range(n_items)]}
    )
    out = SP.weighted_sample(spark.createDataFrame(pdf), n_pick, F.col("w"))
    got = [r["doc_id"] for r in out.collect()]
    want_order = sorted(
        range(n_items), key=lambda i: (-mirror_key(i, "wsample", weights), i)
    )[:n_pick]
    assert got == want_order

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # the 1-row max rides in as a broadcast; the corpus itself is
    # never hash-shuffled
    assert "Exchange hashpartitioning" not in plan, plan


@given(
    pads=st.lists(st.text(alphabet="xyz qrs", min_size=0, max_size=30), min_size=4, max_size=4),
    texts=st.lists(st.text(alphabet="abch ", max_size=20), min_size=1, max_size=3),
)
@settings(**_SETTINGS)
def test_winnow_guarantee_and_oracle_fuzz(spark, pads, texts):
    """Winnowing (q99o): (1) THE GUARANTEE — any substring of length
    ≥ k + w - 1 shared by two documents contributes at least one
    identical fingerprint to both, so the planted-passage pair is
    always detected regardless of surrounding context; (2) the Spark
    pipeline hash-matches its DuckDB oracle for arbitrary corpora
    (empty/short docs, repeated content)."""
    from etl_btc_spark.operators import dedup as DD

    k, w = 8, 4
    passage = "the stolen paragraph travels verbatim"  # 37 ≥ k+w-1=11
    docs = [
        pads[0] + " " + passage + " " + pads[1],
        pads[2] + " " + passage + " " + pads[3],
    ] + texts
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    df = spark.createDataFrame(pdf)
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in DD.winnow_overlap_pairs(df, min_shared=1, k=k, w=w).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1  # the guarantee

    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        (a, b): n
        for a, b, n in con.execute(
            "WITH " + DD.winnow_oracle_ctes(k=k, w=w)
            + " SELECT id_a, id_b, n_shared FROM wpairs WHERE n_shared >= 1"
        ).fetchall()
    }
    con.close()
    DD.release_scoped_caches()
    assert pairs == want


def test_winnow_hash_array_not_inlined(spark):
    """The k-gram hash array must materialize as its own column: if
    Catalyst ever inlines __hs into the window-min lambda, every
    window position re-evaluates the WHOLE k-gram transform — O(n²)
    md5 calls per document (measured: the sf0.001 pass went from
    stuck-past-4-minutes to 4.8 s when this landed)."""
    from etl_btc_spark.operators import dedup as DD

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["some text long enough here"]})
    )
    plan = (
        DD.winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("__hs") >= 2, plan


def test_repetition_features_edges_and_oracle_parity(spark):
    """r10 Gopher-style repetition filter: engine ≡ DuckDB oracle on
    hand-made edge docs the synthetic corpus can't exercise —
    multi-line duplicates (the corpus has no newlines), blank-line
    filtering, empty doc, single token, overlapping-gram saturation
    (pins the 1.0 cap), and lines ending in digits (pins the unary
    transform lambda: passing F.trim directly would bind transform's
    binary (element, index) form and TRIM the INDEX's digits off the
    line ends)."""
    from etl_btc_spark.operators import textops as TX

    rows = [
        (0, "11 aa 11\n11 aa 11\nbb\n11 aa 11\n"),  # dup lines, digit ends
        (1, "x y z\n\n   \nx y z"),  # blank lines dropped
        (2, ""),  # empty doc
        (3, "one"),  # single token -> no grams
        (4, "a b c d e a b c d e a b c d e"),  # dup 5-grams
        (5, "go go go go go go"),  # saturated 2-gram soup
    ]
    pdf = pd.DataFrame(
        {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
    )
    got = [
        tuple(r)
        for r in TX.repetition_features(spark.createDataFrame(pdf))
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.register("docs_pd", pdf)
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    want = [
        tuple(r)
        for r in con.execute(
            TX.repetition_features_oracle_sql() + " ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want
    by_id = {r[0]: r for r in got}
    # doc 0: 3 occurrences of one line + 1 unique -> 2/4 dup; trailing
    # digits intact (the binary-trim bug would change every fraction)
    assert by_id[0][1] == 0.5 and by_id[0][5] is True
    # blank/whitespace lines are not lines
    assert by_id[1][1] == 0.5
    # degenerate docs: all-zero, unflagged
    assert by_id[2] == (2, 0.0, 0.0, 0.0, 0.0, False)
    assert by_id[3] == (3, 0.0, 0.0, 0.0, 0.0, False)
    # saturation cap: overlapping-gram char products exceed doc length
    # but the reported fractions stay <= 1
    assert by_id[4][4] == 1.0 and by_id[5][3] == 1.0
    assert by_id[4][5] is True and by_id[5][5] is True
    from etl_btc_spark.operators.dedup import release_scoped_caches

    release_scoped_caches()


def test_word_shingle_rows_equals_jvm_explode(spark):
    """r18 (VERDICT r17 #4): the Arrow-native shingler must emit the
    EXACT row set of explode(word_shingles(text, n)) — adversarial
    whitespace, empties, short docs, dup grams, NULLs."""
    import pandas as pd

    from etl_btc_spark.operators import dedup as DD

    texts = [
        "one two three four five six seven",
        "  leading and   trailing  ",
        "\t tab\nnewline\x0bvtab\ffeed\rcr end",
        "",
        " ",
        "single",
        "a a a a a a a a",          # dup grams collapse
        "UPPER Case MiXeD",
        "x" * 50,
        None,
        "five words here exactly now",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    for n in (1, 3, 5):
        jvm = sorted(
            tuple(r)
            for r in df.select(
                "doc_id", F.explode(DD.word_shingles(F.col("text"), n)).alias("s")
            ).collect()
        )
        arw = sorted(
            tuple(r) for r in DD.word_shingle_rows(df, n).collect()
        )
        assert jvm == arw, (n, jvm[:5], arw[:5])


def test_bloom_shingle_kernels_equal_jvm_path(spark):
    """r18: the fused shingle+probe kernels (doc stats / survivors)
    must reproduce the JVM explode→bloom_contains→groupBy rows
    EXACTLY, false positives included."""
    import pandas as pd

    from etl_btc_spark.operators import dedup as DD
    from etl_btc_spark.operators import sketches as SKT

    rng = __import__("random").Random(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 40)))
        for _ in range(120)
    ]
    texts += ["", None, "alpha beta gamma delta eps"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    eval_side = df.filter(F.col("doc_id") % 7 == 0)
    corpus = df.filter(F.col("doc_id") % 7 != 0)
    n_bits = 4096
    tsh = eval_side.select(
        F.explode(DD.word_shingles(F.col("text"), 3)).alias("s")
    ).distinct()
    bits = SKT.build_bloom_bits(tsh, "s", n_bits=n_bits)

    csh = corpus.select(
        "doc_id", F.explode(DD.word_shingles(F.col("text"), 3)).alias("s")
    )
    member = SKT.bloom_contains(F.col("s"), bits, n_bits=n_bits)
    jvm_stats = sorted(
        tuple(r)
        for r in csh.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(member.cast("int")).cast("bigint").alias("n_bloom_hits"),
            (F.sum(member.cast("int")) > 0).alias("flagged"),
        )
        .collect()
    )
    arw_stats = sorted(
        tuple(r)
        for r in DD.bloom_shingle_doc_stats(
            corpus, bits, n_bits, ngram=3
        ).collect()
    )
    assert jvm_stats == arw_stats

    jvm_surv = sorted(tuple(r) for r in csh.filter(member).collect())
    arw_surv = sorted(
        tuple(r)
        for r in DD.bloom_shingle_survivors(
            corpus, bits, n_bits, ngram=3
        ).collect()
    )
    assert jvm_surv == arw_surv
    assert len(jvm_surv) > 0  # the probe actually fired


def test_quality_lang_profile_equals_jvm(spark):
    """r18: the Arrow quality/lang kernel must reproduce the JVM
    column expressions exactly — n_chars/n_words integer-equal, lang
    string-equal, quality equal after the callers' epsilon rounding
    (sub-1e-9 ulps are the only permitted difference), across
    adversarial whitespace, stopword-dense, punctuation-soup, empty,
    NULL and marker-collision fixtures."""
    import pandas as pd

    from etl_btc_spark.operators import textops as TX

    texts = [
        "the quick brown fox and the lazy dog of the hour",
        "der die das und ist nicht ein morgen",
        "el la los las es y que hoy",
        "le les est et une dans que demain",
        "de5 shi4 le5",
        "the der el le de5",          # marker collision across langs
        "",
        " ",
        "   ",
        "\t tab\nnewline\x0bvtab\ffeed\rcr end the of",
        "!!!@#$%^&*()",
        "a" * 600,
        "the " * 100,
        "word",
        None,
        "the la and der le of und",
        "x y z " * 40 + "\t",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    from etl_btc_spark.plans.queries import sround

    jvm = {
        r["doc_id"]: tuple(r)[1:]
        for r in df.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            TX.ws_token_count(F.col("text")).alias("n_words"),
            sround(TX.quality_score(F.col("text")), 6).alias("q6"),
            TX.lang_id(F.col("text")).alias("lang"),
        ).collect()
    }
    arw = {
        r["doc_id"]: tuple(r)[1:]
        for r in TX.quality_lang_profile(df)
        .select(
            "doc_id",
            "n_chars",
            "n_words",
            sround(F.col("quality"), 6).alias("q6"),
            "lang",
        )
        .collect()
    }
    assert jvm == arw, {k: (jvm[k], arw[k]) for k in jvm if jvm[k] != arw[k]}
    # q29 rounds WITHOUT the epsilon nudge, so the kernel's raw double
    # must be BIT-identical to the JVM expression (same IEEE ops in
    # the same order), not merely ulp-close
    jvm_raw = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", TX.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    arw_raw = {
        r["doc_id"]: r["quality"]
        for r in TX.quality_lang_profile(df).select("doc_id", "quality").collect()
    }
    assert jvm_raw == arw_raw, {
        k: (jvm_raw[k], arw_raw[k]) for k in jvm_raw if jvm_raw[k] != arw_raw[k]
    }
