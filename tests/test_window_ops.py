"""Unit tests for the sliding-window operators against pandas
reference semantics on a single in-memory series."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from etl_btc_spark.operators import window_ops as WO
from etl_btc_spark.operators.asof import asof_join


def _series_df(spark, values, series_id=0):
    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "series_id": series_id,
            "ts": [ts0 + pd.Timedelta(hours=i) for i in range(len(values))],
            "close": values,
        }
    )
    return spark.createDataFrame(pdf)


def test_sma_matches_pandas_rolling(spark):
    vals = np.cumsum(np.random.default_rng(7).normal(0, 1, 120)) + 50
    df = _series_df(spark, vals)
    w = WO.series_window()
    got = (
        df.select("ts", WO.sma("close", 30, w).alias("sma"))
        .orderBy("ts")
        .toPandas()["sma"]
        .to_numpy()
    )
    want = pd.Series(vals).rolling(30, min_periods=1).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rolling_median_repair_matches_pandas(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(50, 10, 200).round(2)
    dirty = vals.copy()
    dirty[::13] = np.nan
    df = _series_df(spark, dirty)
    w = WO.series_window()
    got = (
        df.select("ts", WO.rolling_median_repair("close", w).alias("v"))
        .orderBy("ts")
        .toPandas()["v"]
        .to_numpy()
    )
    s = pd.Series(dirty)
    want = s.fillna(s.rolling(5, min_periods=1).median()).to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_bollinger_matches_pandas(spark):
    vals = np.cumsum(np.random.default_rng(3).normal(0, 2, 150)) + 100
    df = _series_df(spark, vals)
    out = WO.bollinger(df).orderBy("ts").toPandas()
    s = pd.Series(vals)
    mid = s.rolling(20, min_periods=1).mean()
    sd = s.rolling(20, min_periods=1).std(ddof=0)
    np.testing.assert_allclose(out["bb_mid"], mid, rtol=1e-9)
    np.testing.assert_allclose(out["bb_upper"], mid + 2 * sd, rtol=1e-9)
    lower = mid - 2 * sd
    buy = (s.shift(1) > lower.shift(1)) & (s < lower)
    sell = (s.shift(1) < (mid + 2 * sd).shift(1)) & (s > (mid + 2 * sd))
    assert out["bbands_buy_signal"].tolist() == buy.fillna(False).tolist()
    assert out["bbands_sell_signal"].tolist() == sell.fillna(False).tolist()


def test_gaussian_smooth_interior_matches_reflect_variant(spark):
    # away from edges, truncated-renormalized == reflect-padded
    from etl_btc_spark.operators.recurrence import gaussian_reflect

    vals = np.cumsum(np.random.default_rng(5).normal(0, 1, 100)) + 10
    df = _series_df(spark, vals)
    w = WO.series_window()
    got = (
        df.select("ts", WO.gaussian_smooth("close", w).alias("g"))
        .orderBy("ts")
        .toPandas()["g"]
        .to_numpy()
    )
    want = gaussian_reflect(vals)
    np.testing.assert_allclose(got[13:-13], want[13:-13], rtol=1e-10)
    assert len(got) == len(vals)


def test_tumbling_candles_semantics(spark):
    pdf = pd.DataFrame(
        {
            "series_id": [0] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 10:05", "2024-01-01 10:20", "2024-01-01 10:45", "2024-01-01 11:10"]
            ),
            "close": [10.0, 30.0, 20.0, 99.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["bucket_ts"].hour: r
        for r in WO.tumbling_candles(df).collect()
    }
    c10 = out[10]
    assert (c10["open"], c10["high"], c10["low"], c10["close"]) == (10.0, 30.0, 10.0, 20.0)
    assert c10["n_ticks"] == 3 and abs(c10["volume"] - 60.0) < 1e-9
    assert out[11]["open"] == out[11]["close"] == 99.0


def test_asof_join_small_case(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "ts": pd.to_datetime(["2024-01-01 03:00", "2024-01-01 05:00", "2024-01-01 01:00"]),
                "lv": [1.0, 2.0, 3.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "ts": pd.to_datetime(
                    ["2024-01-01 02:00", "2024-01-01 04:00", "2024-01-01 06:00", "2024-01-01 02:00"]
                ),
                "rv": [10.0, 20.0, 30.0, 40.0],
            }
        )
    )
    out = {
        (r["k"], r["lv"]): (r["rv"], r["ts_asof"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, 1.0)][0] == 10.0  # 03:00 -> right@02:00
    assert out[(1, 2.0)][0] == 20.0  # 05:00 -> right@04:00
    assert out[(2, 3.0)][0] is None  # 01:00 -> no prior right row


def test_asof_join_null_attr_no_tearing(spark):
    """A matched right row with a NULL attribute must contribute that
    NULL — not let the column backfill from an OLDER row while sibling
    columns come from the newer one (row tearing). Oracle: DuckDB
    ASOF LEFT JOIN on the same frames."""
    import duckdb

    lpd = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 03:00", "2024-01-01 05:00"]),
            "lv": [1.0, 2.0],
        }
    )
    rpd = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 02:00", "2024-01-01 04:00"]),
            "rv": [10.0, None],  # newest matched row has NULL rv
            "rw": [100.0, 200.0],
        }
    )
    got = {
        r["lv"]: (r["rv"], r["rw"])
        for r in asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd), on="k"
        ).collect()
    }
    oracle = duckdb.sql(
        "SELECT l.lv, r.rv, r.rw FROM lpd l ASOF LEFT JOIN rpd r"
        " ON l.k = r.k AND l.ts >= r.ts"
    ).fetchall()
    want = {lv: (rv, rw) for lv, rv, rw in oracle}
    # the 05:00 left row matches right@04:00: rv must be NULL (not 10.0
    # torn from right@02:00), rw must be 200.0
    assert got[2.0] == (None, 200.0)
    assert {k: (v[0], v[1]) for k, v in got.items()} == {
        k: (v[0], v[1]) for k, v in want.items()
    }


def test_interval_join_matches_theta_and_stays_hash_join(spark):
    """asof.interval_join must equal the naive theta join row-for-row
    while compiling to a hash join (SortMergeJoin/ShuffledHashJoin/
    BroadcastHashJoin) — never BroadcastNestedLoopJoin."""
    import contextlib
    import io

    from etl_btc_spark.operators.asof import interval_join
    from etl_btc_spark.tables import load_table

    from conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        (F.col("user_id") % 8).cast("bigint").alias("series_id"),
        "ts",
        "event_id",
    )
    iv = ev.filter(F.col("event_id") % 50 == 0).select(
        "series_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("event_id").alias("interval_id"),
    )
    binned = interval_join(ev, iv, on="series_id", bin_seconds=3600)
    naive = ev.join(iv, "series_id").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    key = lambda r: (r["series_id"], r["interval_id"], r["event_id"])
    assert sorted(map(key, binned.collect())) == sorted(map(key, naive.collect()))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        binned.explain("formatted")
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()
