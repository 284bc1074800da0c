"""Sequential per-series recurrences as grouped-map pandas UDFs
(SURVEY.md §2.6 W2, W4-W9, W11).

These operators (EMA-family, Wilder RSI/ADX, Kalman, Savitzky-Golay,
wavelet denoise) are inherently sequential along the time axis and
cannot be expressed as bounded Window frames. The Spark-native shape
is ``df.groupBy(series_key).applyInPandas(fn, schema)``: each series
lands in one Arrow batch, the recurrence runs vectorized in numpy,
and the result streams back columnar. Cross-series parallelism is
full; within a series the math is O(n) numpy, not row-at-a-time
Python.

Scale posture (100 TB): series count (symbols) provides the
parallelism; a single series long enough to blow an executor would be
chunked by date range with a warm-up overlap — exactly the
reference's own incremental strategy (btc_usdt_etl_dag.py:31,72
reloads a 299-row lookback so every recurrence re-converges). See
streaming/incremental.py for that policy.

Numerics are pure numpy re-implementations (scipy/pywt/filterpy/
statsmodels are not runtime deps). Formula provenance:

- EMA: pandas ``ewm(adjust=False)`` recurrence s_t = a*x_t+(1-a)s_{t-1}.
- SES (reference smoothers.py:27-33): same recurrence, s_0 = x_0,
  alpha fixed — engine-defined simplification of statsmodels'
  fitted-values initialization.
- MACD/PPO (reference ta_signals.py:28-53): EMA12/EMA26 (+EMA9
  signal line); talib seeds EMAs with an SMA — we use the pandas
  seed s_0 = x_0 (documented deviation; crossover *semantics* match).
- RSI/ADX (reference ta_signals.py:6-14,56-69): Wilder smoothing with
  talib-style seeding (SMA of the first ``period`` deltas), NaN
  during warm-up.
- Kalman (reference filters.py:8-27): 1-d predict/update,
  x0 = first observation, P0 = 1, F = H = 1, Q = 1e-4, R = 1e-3.
- Savitzky-Golay (reference filters.py:30-35): win=21 poly=4,
  polynomial edge fitting (scipy mode='interp' equivalent).
- Wavelet (reference filters.py:38-60): sym4 level-2 wavedec with
  symmetric extension, detail coeffs zeroed, waverec, truncate.
- Gaussian (reference smoothers.py:7-16): reflect-padded Gaussian
  kernel, sigma = window/6, truncate 4σ (scipy-equivalent); the
  pure-SQL renormalized variant lives in window_ops.gaussian_smooth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# numpy numerics (series in, series out)
# ---------------------------------------------------------------------------


def ema(x: np.ndarray, span: int | None = None, alpha: float | None = None) -> np.ndarray:
    """EMA with s_0 = x_0 (pandas ewm(adjust=False))."""
    if alpha is None:
        if span is None:
            raise ValueError("need span or alpha")
        alpha = 2.0 / (span + 1.0)
    out = np.empty_like(x, dtype=np.float64)
    s = x[0]
    for i, v in enumerate(x):
        s = alpha * v + (1.0 - alpha) * s if i else v
        out[i] = s
    return out


def ses(x: np.ndarray, alpha: float = 0.2) -> np.ndarray:
    """Simple exponential smoothing level series (reference W11)."""
    return ema(x, alpha=alpha)


def macd(x: np.ndarray, fast: int = 12, slow: int = 26, signal: int = 9):
    line = ema(x, span=fast) - ema(x, span=slow)
    sig = ema(line, span=signal)
    return line, sig, line - sig


def ppo(x: np.ndarray, fast: int = 12, slow: int = 26, signal: int = 9):
    efast, eslow = ema(x, span=fast), ema(x, span=slow)
    line = (efast - eslow) / eslow * 100.0
    sig = ema(line, span=signal)
    return line, sig


def wilder_rsi(x: np.ndarray, period: int = 14) -> np.ndarray:
    """talib-compatible RSI: NaN for t < period; Wilder smoothing of
    gains/losses seeded with the mean of the first ``period`` deltas."""
    n = len(x)
    out = np.full(n, np.nan)
    if n <= period:
        return out
    delta = np.diff(x)
    gain = np.where(delta > 0, delta, 0.0)
    loss = np.where(delta < 0, -delta, 0.0)
    ag = gain[:period].mean()
    al = loss[:period].mean()

    def rsi_of(ag, al):
        # review r7 talib parity: avgLoss==0 gives 100 only when some
        # gain exists; a fully FLAT window (ag==al==0) is RSI 0 in
        # talib's denominator-zero branch, not 100
        if al:
            return 100.0 - 100.0 / (1.0 + ag / al)
        return 100.0 if ag else 0.0

    out[period] = rsi_of(ag, al)
    for i in range(period + 1, n):
        ag = (ag * (period - 1) + gain[i - 1]) / period
        al = (al * (period - 1) + loss[i - 1]) / period
        out[i] = rsi_of(ag, al)
    return out


def wilder_adx(high: np.ndarray, low: np.ndarray, close: np.ndarray, period: int = 14):
    """talib-compatible ADX / +DI / -DI (Wilder's method).

    +DI/-DI first valid at index ``period``; ADX (Wilder-smoothed DX)
    first valid at ``2*period - 1``.
    """
    n = len(close)
    plus_di = np.full(n, np.nan)
    minus_di = np.full(n, np.nan)
    adx = np.full(n, np.nan)
    if n <= period:
        return adx, plus_di, minus_di
    up = high[1:] - high[:-1]
    dn = low[:-1] - low[1:]
    plus_dm = np.where((up > dn) & (up > 0), up, 0.0)
    minus_dm = np.where((dn > up) & (dn > 0), dn, 0.0)
    tr = np.maximum.reduce(
        [
            high[1:] - low[1:],
            np.abs(high[1:] - close[:-1]),
            np.abs(low[1:] - close[:-1]),
        ]
    )
    # Wilder running sums seeded with the plain sum of the first period
    str_, spdm, smdm = tr[:period].sum(), plus_dm[:period].sum(), minus_dm[:period].sum()
    dx = np.full(n, np.nan)

    def _di(i):
        plus_di[i] = 100.0 * spdm / str_ if str_ else 0.0
        minus_di[i] = 100.0 * smdm / str_ if str_ else 0.0
        s = plus_di[i] + minus_di[i]
        dx[i] = 100.0 * abs(plus_di[i] - minus_di[i]) / s if s else 0.0

    _di(period)
    for i in range(period + 1, n):
        str_ = str_ - str_ / period + tr[i - 1]
        spdm = spdm - spdm / period + plus_dm[i - 1]
        smdm = smdm - smdm / period + minus_dm[i - 1]
        _di(i)
    if n > 2 * period - 1:
        adx[2 * period - 1] = np.nanmean(dx[period : 2 * period])
        for i in range(2 * period, n):
            adx[i] = (adx[i - 1] * (period - 1) + dx[i]) / period
    return adx, plus_di, minus_di


def kalman_1d(x: np.ndarray, q: float = 1e-4, r: float = 1e-3) -> np.ndarray:
    """Reference filters.py:8-27: scalar Kalman, x0 = x[0], P0 = 1."""
    out = np.empty_like(x, dtype=np.float64)
    est, p = x[0], 1.0
    for i, z in enumerate(x):
        p = p + q  # predict (F = 1)
        k = p / (p + r)  # update (H = 1)
        est = est + k * (z - est)
        p = (1.0 - k) * p
        out[i] = est
    return out


def savgol_coeffs(window: int, poly: int) -> np.ndarray:
    half = window // 2
    pos = np.arange(-half, half + 1, dtype=np.float64)
    a = np.vander(pos, poly + 1, increasing=True)
    # least-squares smoothing weights evaluated at the window center
    return np.linalg.pinv(a)[0]


def savgol(x: np.ndarray, window: int = 21, poly: int = 4) -> np.ndarray:
    """Savitzky-Golay with polynomial edge interpolation (scipy
    mode='interp' semantics): interior = convolution with the
    center-evaluated LSQ weights; the first/last half-window values
    come from polynomials fitted to the first/last full window."""
    n = len(x)
    if n < window:
        pos = np.arange(n, dtype=np.float64)
        coef = np.polynomial.polynomial.polyfit(pos, x, min(poly, n - 1))
        return np.polynomial.polynomial.polyval(pos, coef)
    half = window // 2
    out = np.convolve(x, savgol_coeffs(window, poly)[::-1], mode="same")
    pos = np.arange(window, dtype=np.float64)
    head = np.polynomial.polynomial.polyfit(pos, x[:window], poly)
    out[:half] = np.polynomial.polynomial.polyval(pos[:half], head)
    tail = np.polynomial.polynomial.polyfit(pos, x[-window:], poly)
    out[-half:] = np.polynomial.polynomial.polyval(pos[-half:], tail)
    return out


# sym4 filter bank (public wavelet tables; verified: sum = sqrt(2),
# L2 norm = 1, and dwt→idwt roundtrip error < 1e-11 in tests)
_SYM4_DEC_LO = np.array(
    [
        -0.07576571478927333,
        -0.02963552764599851,
        0.49761866763201545,
        0.8037387518059161,
        0.29785779560527736,
        -0.09921954357684722,
        -0.012603967262037833,
        0.0322231006040427,
    ]
)
_L = len(_SYM4_DEC_LO)
_SYM4_DEC_HI = np.array([(-1) ** k * _SYM4_DEC_LO[_L - 1 - k] for k in range(_L)])
_SYM4_REC_LO = _SYM4_DEC_LO[::-1].copy()
_SYM4_REC_HI = _SYM4_DEC_HI[::-1].copy()


def _sympad(x: np.ndarray, n: int) -> np.ndarray:
    # np.pad(symmetric) == concat([x[:n][::-1], x, x[-n:][::-1]]) when
    # n <= len(x), and keeps tiling correctly when the series is
    # SHORTER than the pad (review r7: the manual concat under-padded
    # n<=5 series and the valid-mode convolutions crashed the stage)
    return np.pad(x, n, mode="symmetric")


def _dwt(x: np.ndarray):
    p = _sympad(x, _L - 1)
    lo = np.convolve(p, _SYM4_DEC_LO, mode="valid")[1::2]
    hi = np.convolve(p, _SYM4_DEC_HI, mode="valid")[1::2]
    return lo, hi


def _idwt(ca: np.ndarray, cd: np.ndarray, n: int) -> np.ndarray:
    up_a = np.zeros(2 * len(ca))
    up_a[::2] = ca
    up_d = np.zeros(2 * len(cd))
    up_d[::2] = cd
    y = np.convolve(up_a, _SYM4_REC_LO) + np.convolve(up_d, _SYM4_REC_HI)
    start = _L - 2
    return y[start : start + 2 * len(ca) - _L + 2][:n]


def wavelet_denoise(x: np.ndarray, level: int = 2) -> np.ndarray:
    """sym4 multilevel decompose → zero all detail coefficients →
    reconstruct → truncate to input length (reference filters.py:38-60)."""
    lengths, approx = [], x.astype(np.float64)
    for _ in range(level):
        lengths.append(len(approx))
        approx, _detail = _dwt(approx)
    out = approx
    for n in reversed(lengths):
        out = _idwt(out, np.zeros((n + _L - 1) // 2), n)
    return out[: len(x)]


def gaussian_reflect(x: np.ndarray, window_size: int = 20, sigma: float | None = None) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d-equivalent (reflect padding,
    truncate=4σ) — exact-parity variant of window_ops.gaussian_smooth."""
    if sigma is None:
        sigma = window_size / 6.0
    radius = int(4.0 * sigma + 0.5)
    k = np.exp(-np.arange(-radius, radius + 1) ** 2 / (2.0 * sigma * sigma))
    k /= k.sum()
    if len(x) == 0:
        return x.astype(np.float64)
    # symmetric tiling for the same reason as _sympad (review r7: a
    # series shorter than the 13-sample radius under-padded and the
    # output length no longer matched the group, aborting the job)
    pad = np.pad(x.astype(np.float64), radius, mode="symmetric")
    return np.convolve(pad, k[::-1], mode="valid")


def _crossover(line: np.ndarray, level: np.ndarray) -> np.ndarray:
    """Strict crossover with NaN→False coercion (ta_signals.py shape)."""
    prev_line = np.concatenate([[np.nan], line[:-1]])
    prev_level = np.concatenate([[np.nan], level[:-1]])
    with np.errstate(invalid="ignore"):
        return np.nan_to_num((prev_line < prev_level) & (line > level)).astype(bool)


# ---------------------------------------------------------------------------
# Spark plumbing: one applyInPandas pass computes every feature column
# ---------------------------------------------------------------------------

FEATURE_FIELDS = [
    ("close_kalman_filter", T.DoubleType()),
    ("close_savitzky_golay_filter", T.DoubleType()),
    ("close_wavelet_filter", T.DoubleType()),
    ("close_gaussian_smoothing", T.DoubleType()),
    ("close_exponential_smoothing", T.DoubleType()),
    ("macd_line", T.DoubleType()),
    ("macd_signal_line", T.DoubleType()),
    ("ppo_line", T.DoubleType()),
    ("ppo_signal_line", T.DoubleType()),
    ("rsi", T.DoubleType()),
    ("adx", T.DoubleType()),
    ("plus_di", T.DoubleType()),
    ("minus_di", T.DoubleType()),
    ("macd_buy_signal", T.BooleanType()),
    ("macd_sell_signal", T.BooleanType()),
    ("ppo_buy_signal", T.BooleanType()),
    ("ppo_sell_signal", T.BooleanType()),
    ("rsi_buy_signal", T.BooleanType()),
    ("rsi_sell_signal", T.BooleanType()),
    ("adx_buy_signal", T.BooleanType()),
    ("adx_sell_signal", T.BooleanType()),
]


def _feature_schema(base: T.StructType) -> T.StructType:
    fields = list(base.fields) + [T.StructField(n, t) for n, t in FEATURE_FIELDS]
    return T.StructType(fields)


def _compute_features(pdf: pd.DataFrame) -> pd.DataFrame:
    # stable sort + value tie-break (review r8, mirrored in the
    # streaming folds): unstable sort over shuffle-ordered input made
    # tied timestamps fold in a run-dependent order
    tie = [c for c in ("close", "high", "low") if c in pdf.columns]
    pdf = pdf.sort_values(["ts"] + tie, kind="mergesort").reset_index(drop=True)
    x = pdf["close"].to_numpy(dtype=np.float64)
    pdf["close_kalman_filter"] = kalman_1d(x)
    pdf["close_savitzky_golay_filter"] = savgol(x)
    pdf["close_wavelet_filter"] = wavelet_denoise(x)
    pdf["close_gaussian_smoothing"] = gaussian_reflect(x)
    pdf["close_exponential_smoothing"] = ses(x)
    m_line, m_sig, _ = macd(x)
    p_line, p_sig = ppo(x)
    rsi = wilder_rsi(x)
    adx, pdi, mdi = wilder_adx(
        pdf["high"].to_numpy(np.float64), pdf["low"].to_numpy(np.float64), x
    )
    pdf["macd_line"], pdf["macd_signal_line"] = m_line, m_sig
    pdf["ppo_line"], pdf["ppo_signal_line"] = p_line, p_sig
    pdf["rsi"], pdf["adx"], pdf["plus_di"], pdf["minus_di"] = rsi, adx, pdi, mdi
    pdf["macd_buy_signal"] = _crossover(m_line, m_sig)
    pdf["macd_sell_signal"] = _crossover(m_sig, m_line)
    pdf["ppo_buy_signal"] = _crossover(p_line, p_sig)
    pdf["ppo_sell_signal"] = _crossover(p_sig, p_line)
    # RSI: buy = crosses UP through oversold(30); sell = crosses DOWN
    # through overbought(70) (ta_signals.py:6-14)
    pdf["rsi_buy_signal"] = _crossover(rsi, np.full_like(rsi, 30.0))
    pdf["rsi_sell_signal"] = _crossover(np.full_like(rsi, 70.0), rsi)
    with np.errstate(invalid="ignore"):
        strong = np.nan_to_num(adx > 25.0).astype(bool)
    pdf["adx_buy_signal"] = _crossover(pdi, mdi) & strong
    pdf["adx_sell_signal"] = _crossover(mdi, pdi) & strong
    return pdf


def with_series_features(df: DataFrame, series: str = "series_id") -> DataFrame:
    """Append every recurrence-derived feature/signal column to a
    (series_id, ts, close, high, low) DataFrame in ONE grouped-map
    pass — a single shuffle by series key, then embarrassingly
    parallel numpy per series (SURVEY §2.6 W2,W4-W9,W11 + §2.3's
    derived-column surface in one stage)."""
    from etl_btc_spark._pickle import ensure_serializable

    ensure_serializable()
    schema = _feature_schema(df.schema)
    return df.groupBy(series).applyInPandas(_compute_features, schema=schema)
