"""Sliding-window time-series operators (SURVEY.md §2.6 W1/W3/W10,
§2.5 A5/A6, §2.3 P7, §2.10 T7).

Everything here is expressible with Spark's built-in Window frames and
aggregates — no Python on the hot path, fully whole-stage-codegen'd.
Windows are ``partitionBy(series_key).orderBy(ts)``: each series is
shuffled once to its partition and all frames evaluate within it.
At 100 TB the series key (symbol) has high cardinality, so this is a
single well-balanced shuffle; there is deliberately NO global
(unpartitioned) window anywhere in the engine.

Warm-up semantics (SURVEY §2.6 note): the reference's pandas/talib
comparisons coerce NaN warm-up values to False. Spark ``lag`` yields
NULL at partition edges; :func:`crossover_up` therefore wraps the
boolean in ``coalesce(..., false)`` so signal columns are never NULL
and hash-match an ANSI-SQL oracle doing the same.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(series_col: str = "series_id", ts_col: str = "ts") -> WindowSpec:
    return Window.partitionBy(series_col).orderBy(ts_col)


def sma(col: str | Column, window: int, w: WindowSpec) -> Column:
    """Simple moving average, ``min_periods=1`` pandas semantics
    (reference smoothers.py:19-24): partial windows average whatever
    rows exist, so there is no NULL warm-up."""
    c = F.col(col) if isinstance(col, str) else col
    return F.avg(c).over(w.rowsBetween(-(window - 1), 0))


def rolling_median_repair(col: str | Column, w: WindowSpec, window: int = 5) -> Column:
    """NULL repair via rolling median (reference init_influxdb.py:68-71:
    ``fillna(rolling(window=5, min_periods=1).median())``).

    Spark disallows ``median()`` as a framed window function, so the
    exact median of the bounded frame is computed via
    ``array_sort(collect_list(...))`` — collect_list skips NULLs
    (matching pandas' NaN-skipping rolling median), the frame is tiny
    (``window`` rows) so the per-row array is O(window), and even-count
    frames interpolate ``(lo + hi) / 2`` like pandas/DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array_sort(F.collect_list(c).over(w.rowsBetween(-(window - 1), 0)))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    med = F.when(n == 0, F.lit(None).cast("double")).when(n % 2 == 1, odd).otherwise(even)
    return F.coalesce(c, med)


def crossover_up(line: Column, level: Column, w: WindowSpec) -> Column:
    """Strict upward crossover: prev(line) < prev(level) AND line > level
    (reference ta_signals.py:11-12 shape). NULL (warm-up) → false."""
    prev_line = F.lag(line, 1).over(w)
    prev_level = F.lag(level, 1).over(w)
    return F.coalesce((prev_line < prev_level) & (line > level), F.lit(False))


def bollinger(
    df: DataFrame,
    close: str = "close",
    series: str = "series_id",
    ts: str = "ts",
    period: int = 20,
    ndev: float = 2.0,
) -> DataFrame:
    """Bollinger bands + crossover signals (reference ta_signals.py:17-25).

    Band math uses *population* stddev (talib's convention). Signals:
    buy  = close crosses DOWN through the lower band,
    sell = close crosses UP through the upper band,
    both strict and false during warm-up (see module docstring).
    """
    w = series_window(series, ts)
    mid = sma(close, period, w)
    sd = F.stddev_pop(close).over(w.rowsBetween(-(period - 1), 0))
    upper = mid + ndev * sd
    lower = mid - ndev * sd
    c = F.col(close)
    out = (
        df.withColumn("bb_mid", mid)
        .withColumn("bb_upper", upper)
        .withColumn("bb_lower", lower)
    )
    # crossover_up(level, line) == line crosses down through level
    out = out.withColumn(
        "bbands_buy_signal", crossover_up(F.col("bb_lower"), c, w)
    ).withColumn("bbands_sell_signal", crossover_up(c, F.col("bb_upper"), w))
    return out


def gaussian_kernel(window_size: int = 20, sigma: float | None = None) -> list[float]:
    """Truncated Gaussian weights. sigma defaults to window/6
    (reference smoothers.py:7-16); radius follows the common
    ``int(4*sigma + 0.5)`` truncation."""
    if sigma is None:
        sigma = window_size / 6.0
    radius = int(4.0 * sigma + 0.5)
    return [math.exp(-(i * i) / (2.0 * sigma * sigma)) for i in range(-radius, radius + 1)]


def gaussian_smooth(
    col: str | Column,
    w: WindowSpec,
    window_size: int = 20,
    sigma: float | None = None,
) -> Column:
    """Gaussian kernel smoothing as a weighted lead/lag sum.

    Engine semantics: truncated kernel, renormalized at series edges
    (weights of missing neighbors are dropped from the denominator).
    This is a *defined deviation* from scipy's default reflect
    padding (reference smoothers.py:13): renormalization needs no
    out-of-range reads, so the whole operator stays a single
    codegen'd window stage — no Python, no self-join.
    """
    c = F.col(col) if isinstance(col, str) else col
    weights = gaussian_kernel(window_size, sigma)
    radius = len(weights) // 2
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i, wt in enumerate(weights):
        off = i - radius
        neighbor = F.lag(c, -off).over(w)  # lag(-k) == lead(k)
        num = num + F.coalesce(neighbor * F.lit(wt), F.lit(0.0))
        den = den + F.when(neighbor.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    # try_divide (review r8): when a row and its whole kernel
    # neighborhood are NULL, den is 0.0 and a bare division is a hard
    # DIVIDE_BY_ZERO under ANSI mode (verified) — an all-NULL
    # neighborhood has no defined smoothed value, so yield NULL
    return F.try_divide(num, den)


def tumbling_candles(
    df: DataFrame,
    ts: str = "ts",
    price: str = "close",
    series: str = "series_id",
    bucket: str = "hour",
) -> DataFrame:
    """Materialize OHLCV candles from a tick/event stream (T7).

    Uses ``date_trunc`` as the tumbling-window key — identical to
    ``window(ts, '1 hour')`` for aligned windows but groups by a flat
    timestamp, which keeps the aggregate a plain hash-aggregate with
    map-side partial combine. Open/close are ``min_by``/``max_by`` on
    the (unique) event timestamp.
    """
    return (
        df.groupBy(
            F.col(series).alias(series),
            F.date_trunc(bucket, F.col(ts)).alias("bucket_ts"),
        )
        .agg(
            F.min_by(price, ts).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, ts).alias("close"),
            F.sum(price).alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )
