"""Golden tests for the recurrence numerics (SURVEY.md §5 item 2).

Each engine kernel is checked against an *independently written*
straight-line implementation of the published formula (plus pandas
where pandas defines the semantics, e.g. ewm/rolling), and against
structural invariants (warm-up NaN spans, length preservation,
polynomial reproduction, wavelet roundtrip).
"""

import numpy as np
import pandas as pd
import pytest

from etl_btc_spark.operators import recurrence as RC

rng = np.random.default_rng(42)
X = np.cumsum(rng.normal(0, 1, 400)) + 100.0


def test_ema_matches_pandas_ewm():
    got = RC.ema(X, span=12)
    want = pd.Series(X).ewm(span=12, adjust=False).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ses_recurrence_straight_line():
    alpha = 0.2
    want = np.empty_like(X)
    want[0] = X[0]
    for i in range(1, len(X)):
        want[i] = alpha * X[i] + (1 - alpha) * want[i - 1]
    np.testing.assert_allclose(RC.ses(X, alpha=alpha), want, rtol=1e-12)


def test_macd_is_ema_difference():
    line, sig, hist = RC.macd(X)
    np.testing.assert_allclose(line, RC.ema(X, 12) - RC.ema(X, 26), rtol=1e-12)
    np.testing.assert_allclose(sig, RC.ema(line, 9), rtol=1e-12)
    np.testing.assert_allclose(hist, line - sig, rtol=1e-12)


def test_rsi_wilder_straight_line():
    period = 14
    got = RC.wilder_rsi(X, period)
    assert np.isnan(got[:period]).all() and not np.isnan(got[period:]).any()
    # independent: Wilder's published recurrence, scalar loop
    deltas = np.diff(X)
    avg_g = np.mean([max(d, 0) for d in deltas[:period]])
    avg_l = np.mean([max(-d, 0) for d in deltas[:period]])
    want = []
    want.append(100 - 100 / (1 + avg_g / avg_l))
    for d in deltas[period:]:
        avg_g = (avg_g * (period - 1) + max(d, 0)) / period
        avg_l = (avg_l * (period - 1) + max(-d, 0)) / period
        want.append(100 - 100 / (1 + avg_g / avg_l))
    np.testing.assert_allclose(got[period:], want, rtol=1e-10)
    assert ((got[period:] >= 0) & (got[period:] <= 100)).all()


def test_rsi_monotone_series_extremes():
    up = np.arange(50, dtype=float)
    assert np.allclose(RC.wilder_rsi(up)[14:], 100.0)
    dn = up[::-1].copy()
    assert np.allclose(RC.wilder_rsi(dn)[14:], 0.0)


def test_adx_warmup_and_range():
    high, low, close = X * 1.01, X * 0.99, X
    adx, pdi, mdi = RC.wilder_adx(high, low, close, 14)
    assert np.isnan(pdi[:14]).all() and not np.isnan(pdi[14:]).any()
    assert np.isnan(adx[:27]).all() and not np.isnan(adx[27:]).any()
    for a in (adx[27:], pdi[14:], mdi[14:]):
        assert ((a >= 0) & (a <= 100)).all()


def test_kalman_straight_line():
    q, r = 1e-4, 1e-3
    est, p = X[0], 1.0
    want = []
    for z in X:
        p = p + q
        k = p / (p + r)
        est = est + k * (z - est)
        p = (1 - k) * p
        want.append(est)
    np.testing.assert_allclose(RC.kalman_1d(X), want, rtol=1e-12)


def test_kalman_converges_to_signal():
    const = np.full(200, 42.0)
    out = RC.kalman_1d(const)
    assert abs(out[-1] - 42.0) < 1e-9


def test_savgol_reproduces_quartic_exactly():
    # A degree-4 polynomial is in the model space of savgol(21, 4):
    # interior convolution AND edge polyfits must reproduce it.
    t = np.linspace(-2, 2, 200)
    poly = 3 + t - 0.5 * t**2 + 0.1 * t**3 - 0.02 * t**4
    np.testing.assert_allclose(RC.savgol(poly, 21, 4), poly, atol=1e-9)


def test_savgol_short_series_polyfit_fallback():
    t = np.arange(10, dtype=float)
    out = RC.savgol(t * 2 + 1, 21, 4)
    np.testing.assert_allclose(out, t * 2 + 1, atol=1e-8)


def test_savgol_preserves_length_and_smooths():
    noisy = X + rng.normal(0, 5, len(X))
    out = RC.savgol(noisy)
    assert len(out) == len(noisy)
    assert np.var(np.diff(out)) < np.var(np.diff(noisy))


def test_wavelet_filterbank_orthonormal():
    lo = RC._SYM4_DEC_LO
    assert abs(lo.sum() - np.sqrt(2)) < 1e-10
    assert abs((lo**2).sum() - 1.0) < 1e-10


@pytest.mark.parametrize("n", [37, 64, 100, 101, 400])
def test_wavelet_dwt_roundtrip(n):
    x = rng.normal(size=n)
    ca, cd = RC._dwt(x)
    np.testing.assert_allclose(RC._idwt(ca, cd, n), x, atol=1e-10)


def test_wavelet_denoise_properties():
    out = RC.wavelet_denoise(X, level=2)
    assert len(out) == len(X)
    # constant signal is pure approximation: denoising is identity
    const = np.full(128, 7.0)
    np.testing.assert_allclose(RC.wavelet_denoise(const), const, atol=1e-8)
    # zeroing detail bands smooths: high-freq energy strictly drops
    noisy = X + rng.normal(0, 5, len(X))
    assert np.var(np.diff(RC.wavelet_denoise(noisy))) < np.var(np.diff(noisy))


def test_gaussian_reflect_matches_direct_convolution():
    sigma = 20 / 6.0
    radius = int(4 * sigma + 0.5)
    k = np.exp(-np.arange(-radius, radius + 1) ** 2 / (2 * sigma**2))
    k /= k.sum()
    pad = np.r_[X[:radius][::-1], X, X[-radius:][::-1]]
    want = np.convolve(pad, k[::-1], mode="valid")
    np.testing.assert_allclose(RC.gaussian_reflect(X), want, rtol=1e-12)
    # kernel mass = 1: constant in, constant out
    const = np.full(100, 5.5)
    np.testing.assert_allclose(RC.gaussian_reflect(const), const, atol=1e-12)


def test_crossover_strictness_and_nan_coercion():
    line = np.array([np.nan, 1.0, 2.0, 3.0, 3.0, 2.0])
    level = np.array([np.nan, 2.0, 2.0, 2.0, 3.0, 3.0])
    got = RC._crossover(line, level)
    # idx2: prev 1<2 and cur 2>2 is FALSE (strict); idx3: prev 2<2 false
    assert got.tolist() == [False, False, False, False, False, False]
    line2 = np.array([1.0, 3.0])
    level2 = np.array([2.0, 2.0])
    assert RC._crossover(line2, level2).tolist() == [False, True]


def test_approx_distinct_error_bound(spark):
    """q72's HLL++ sketch must land within 5% of the exact distinct
    count per group (Spark's default rsd=0.05)."""
    from pyspark.sql import functions as F

    from etl_btc_spark.plans.queries import REGISTRY
    from etl_btc_spark.tables import load_table
    from conftest import SF_SMOKE

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q72_approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(1, 0.05 * e), (k, approx[k], e)


def test_approx_distinct_error_bound_sf01(spark):
    """VERDICT r7 #7: the ≤5% HLL++ bound, scale-tested. The smoke-SF
    test above exercises tiny cardinalities where HLL++ is exact by
    construction; this one runs the same sketch at sf0.1 (the bench
    SF) over the documents and events tables so the error-bound claim
    is empirical at the scale the sampling laws are tested at. One
    aggregate per table — fast, no window, no join.

    Uses q72's rsd=0.015 (3σ≈4.5%): writing this test at the DEFAULT
    rsd=0.05 actually failed — 6.6% error at 5k distinct — because
    rsd is a standard deviation, not a bound; that measurement is why
    q72 overrides the default."""
    from pyspark.sql import functions as F

    from etl_btc_spark.tables import load_table

    for table, col in (("documents", "doc_id"), ("events", "user_id")):
        row = (
            load_table(spark, "/root/testdata/sf0.1", table)
            .agg(
                F.approx_count_distinct(col, rsd=0.015).alias("approx"),
                F.countDistinct(col).alias("exact"),
            )
            .collect()[0]
        )
        assert row["exact"] > 1000, (table, row["exact"])  # scale is the point
        rel = abs(row["approx"] - row["exact"]) / row["exact"]
        assert rel <= 0.05, (table, row["approx"], row["exact"], rel)


def test_short_series_kernels_no_crash():
    """Review r7: series shorter than the smoothing radius/filter
    support must produce length-n output (NaN-padded where undefined),
    not crash the applyInPandas stage. Long-series behavior is pinned
    unchanged by the oracle suite."""
    import numpy as np

    from etl_btc_spark.operators import recurrence as R

    for n in (1, 2, 5, 12):
        x = np.linspace(100.0, 101.0, n)
        g = R.gaussian_reflect(x, window_size=20)
        assert len(g) == n, (n, len(g))
        assert np.isfinite(g).all()
        w = R.wavelet_denoise(x, level=2)
        assert len(w) == n, (n, len(w))
        assert np.isfinite(w).all()


def test_wilder_rsi_flat_window_talib_parity():
    """Review r7: a fully flat warm-up window (avg gain == avg loss
    == 0) is RSI 0 in talib's denominator-zero branch — the engine
    emitted 100 and could fire phantom sell-signal crossovers."""
    import numpy as np

    from etl_btc_spark.operators import recurrence as R

    flat = np.full(20, 50.0)
    out = R.wilder_rsi(flat, period=14)
    assert np.isnan(out[:14]).all()
    assert (out[14:] == 0.0).all()
    # all-gain stays 100; mixed stays in (0, 100)
    rising = np.arange(20, dtype=np.float64)
    assert (R.wilder_rsi(rising, 14)[14:] == 100.0).all()
    mixed = 50.0 + np.sin(np.arange(40))
    m = R.wilder_rsi(mixed, 14)[14:]
    assert ((m > 0) & (m < 100)).all()


def test_compute_features_deterministic_under_tied_timestamps():
    """Review r8: bare sort_values('ts') was an unstable quicksort,
    so two rows sharing a timestamp folded in input-order — which is
    shuffle-dependent. With the stable value tie-break, the feature
    stack must be identical no matter how the input rows arrive."""
    import numpy as np
    import pandas as pd

    from etl_btc_spark.operators import recurrence as RC

    rng = np.random.RandomState(3)
    n = 60
    ts = pd.date_range("2024-01-01", periods=n, freq="h").to_numpy()
    ts[10] = ts[11]  # tied timestamps with different values
    ts[30] = ts[31]
    pdf = pd.DataFrame(
        {
            "series_id": 1,
            "ts": ts,
            "close": rng.rand(n) * 100,
            "high": rng.rand(n) * 100 + 100,
            "low": rng.rand(n) * 10,
        }
    )
    a = RC._compute_features(pdf.copy())
    b = RC._compute_features(pdf.iloc[::-1].reset_index(drop=True))
    cols = [c for c in a.columns if c not in ("series_id",)]
    pd.testing.assert_frame_equal(
        a[cols].reset_index(drop=True), b[cols].reset_index(drop=True)
    )
