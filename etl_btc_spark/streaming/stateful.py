"""Custom stateful streaming operator (SURVEY.md §2.6 W11 in its
T2 "keyed state" form).

The reference keeps recurrence state implicitly, by reloading a
299-row warm-up window every hourly run (btc_usdt_etl_dag.py:31,72).
:mod:`etl_btc_spark.streaming.incremental` reproduces that policy;
this module implements the OTHER Spark-native strategy SURVEY §2.6
names for W11: carry the recurrence state itself across micro-batches
with ``applyInPandasWithState`` — no warm-up re-read at all, state is
O(1) per series key.

Scale posture: state is one double per series held in the state
store (checkpointed, recoverable); per-batch work is O(batch rows).
At 100 TB-of-history this is the strictly cheaper shape — the
lookback variant re-reads 299 × n_series rows per run, this one reads
only the new rows. Late/out-of-order data is folded in arrival order,
matching the reference's own policy of never reprocessing the past
(T6, news_etl_dag.py:38's fixed horizon).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_btc_spark._pickle import ensure_serializable


def stream_stateful_ses(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_dir: str,
    alpha: float = 0.2,
    series: str = "series_id",
    ts: str = "ts",
    price: str = "close",
) -> None:
    """W11/T2: exponential smoothing where the level ``s`` itself is
    the streaming state.

    Per micro-batch and series key: sort arrivals by event time, fold
    ``s = alpha*x + (1-alpha)*s`` (seed ``s_0 = x_0``, identical to
    recurrence.ses / pandas ewm(adjust=False)), emit every row with
    its smoothed value, store the final ``s`` for the next batch.
    Because the fold is the same float64 operation sequence as the
    batch kernel, a time-ordered stream reproduces the batch result
    BIT-FOR-BIT — asserted by the q62 oracle, which is the same
    recursive CTE that checks batch SES (q22).
    """
    ensure_serializable()
    out_schema = T.StructType(
        [
            schema[series],
            schema[ts],
            schema[price],
            T.StructField("close_ses", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("level", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        level = state.get[0] if state.exists else None
        # concat-then-sort, NOT per-chunk sort (review r7): one
        # micro-batch can deliver a series as multiple Arrow chunks in
        # arbitrary order — folding chunk 2's older rows after chunk
        # 1's newer rows diverges from the batch kernel. Same shape as
        # stream_stateful_signals / the tws variant.
        pdf = pd.concat(list(pdfs))
        if len(pdf):
            # stable sort + value tie-break (review r8): bare
            # sort_values(ts) is an UNSTABLE quicksort over
            # arbitrarily-ordered Arrow chunks, so tied timestamps
            # fold in a run-dependent order — with the value as the
            # tie key, equal-(ts,value) rows are interchangeable and
            # the fold is deterministic (same policy in the batch
            # kernel and the signals/tws variants)
            pdf = pdf.sort_values([ts, price], kind="mergesort").reset_index(drop=True)
            out = []
            for x in pdf[price]:
                level = float(x) if level is None else alpha * float(x) + (1.0 - alpha) * level
                out.append(level)
            pdf["close_ses"] = out
            yield pdf[[series, ts, price, "close_ses"]]
        if level is not None:
            state.update((level,))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one landing file per micro-batch
        .parquet(landing_dir)
    )
    folded = src.groupBy(series).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    (
        folded.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Full recurrence stack with keyed state (W2/W4/W5/W6/W11 x T2)
# ---------------------------------------------------------------------------

#: streamed output columns appended to (series_id, ts, close)
SIGNAL_FIELDS = [
    ("close_ses", T.DoubleType()),
    ("macd_line", T.DoubleType()),
    ("macd_signal", T.DoubleType()),
    ("ppo_line", T.DoubleType()),
    ("ppo_signal", T.DoubleType()),
    ("rsi", T.DoubleType()),
    ("plus_di", T.DoubleType()),
    ("minus_di", T.DoubleType()),
    ("adx", T.DoubleType()),
    ("macd_buy_signal", T.BooleanType()),
    ("macd_sell_signal", T.BooleanType()),
    ("ppo_buy_signal", T.BooleanType()),
    ("ppo_sell_signal", T.BooleanType()),
    ("rsi_buy_signal", T.BooleanType()),
    ("rsi_sell_signal", T.BooleanType()),
    ("adx_buy_signal", T.BooleanType()),
    ("adx_sell_signal", T.BooleanType()),
]

#: per-series state carried across micro-batches — a flat tuple of 22
#: doubles + a row counter. O(1) per key, checkpointed by the state
#: store; this is the whole "warm-up" that the lookback strategy
#: (incremental.py) re-reads 299 rows to rebuild.
_STATE_FIELDS = [
    "prev_high",
    "prev_low",
    "prev_close",
    "ses",
    "e12",
    "e26",
    "msig",
    "psig",
    "prev_macd_line",
    "prev_ppo_line",
    "gain_sum",
    "loss_sum",
    "ag",
    "al",
    "str_",
    "spdm",
    "smdm",
    "dx_sum",
    "adx",
    "prev_rsi",
    "prev_pdi",
    "prev_mdi",
]

_NAN = float("nan")


def _signals_init() -> dict:
    st = {k: _NAN for k in _STATE_FIELDS}
    st["n"] = 0
    st["gain_sum"] = st["loss_sum"] = 0.0
    st["str_"] = st["spdm"] = st["smdm"] = st["dx_sum"] = 0.0
    return st


def _signals_step(st: dict, h: float, l: float, c: float, alpha: float, period: int = 14):
    """One O(1) state transition mirroring the batch kernels
    (recurrence.ema/macd/ppo/wilder_rsi/wilder_adx) operation-for-
    operation, so a time-ordered stream reproduces the batch feature
    stack (reference ta_signals.py:6-69 semantics). Returns the output
    row values; mutates ``st`` in place."""
    i = st["n"]
    a12, a26, a9 = 2.0 / 13.0, 2.0 / 27.0, 2.0 / 10.0
    # --- EMA family (seed s_0 = x_0, pandas ewm(adjust=False)) ---
    # crossover comparisons need the PREVIOUS signal-line values;
    # capture the entering state before updating
    prev_msig, prev_psig = st["msig"], st["psig"]
    if i == 0:
        st["ses"] = st["e12"] = st["e26"] = c
    else:
        st["ses"] = alpha * c + (1.0 - alpha) * st["ses"]
        st["e12"] = a12 * c + (1.0 - a12) * st["e12"]
        st["e26"] = a26 * c + (1.0 - a26) * st["e26"]
    macd_line = st["e12"] - st["e26"]
    with np.errstate(divide="ignore", invalid="ignore"):
        ppo_line = float(
            np.float64(st["e12"] - st["e26"]) / np.float64(st["e26"]) * 100.0
        )
    st["msig"] = macd_line if i == 0 else a9 * macd_line + (1.0 - a9) * st["msig"]
    st["psig"] = ppo_line if i == 0 else a9 * ppo_line + (1.0 - a9) * st["psig"]
    # --- Wilder RSI(period): talib seeding (mean of first N deltas) ---
    rsi = _NAN
    if i >= 1:
        delta = c - st["prev_close"]
        gain = delta if delta > 0.0 else 0.0
        loss = -delta if delta < 0.0 else 0.0
        if i <= period:
            st["gain_sum"] += gain
            st["loss_sum"] += loss
            if i == period:
                st["ag"] = st["gain_sum"] / period
                st["al"] = st["loss_sum"] / period
                rsi = (
                    100.0 - 100.0 / (1.0 + st["ag"] / st["al"])
                    if st["al"]
                    else (100.0 if st["ag"] else 0.0)  # talib flat-window parity (r7)
                )
        else:
            st["ag"] = (st["ag"] * (period - 1) + gain) / period
            st["al"] = (st["al"] * (period - 1) + loss) / period
            rsi = (
                100.0 - 100.0 / (1.0 + st["ag"] / st["al"])
                if st["al"]
                else (100.0 if st["ag"] else 0.0)  # talib flat-window parity (r7)
            )
    # --- Wilder ADX(period)/+DI/-DI ---
    pdi = mdi = adx = _NAN
    if i >= 1:
        up = h - st["prev_high"]
        dn = st["prev_low"] - l
        pdm = up if (up > dn and up > 0.0) else 0.0
        mdm = dn if (dn > up and dn > 0.0) else 0.0
        tr = max(h - l, abs(h - st["prev_close"]), abs(l - st["prev_close"]))
        seeded = i > period
        if not seeded:
            st["str_"] += tr
            st["spdm"] += pdm
            st["smdm"] += mdm
        else:
            st["str_"] = st["str_"] - st["str_"] / period + tr
            st["spdm"] = st["spdm"] - st["spdm"] / period + pdm
            st["smdm"] = st["smdm"] - st["smdm"] / period + mdm
        if i >= period:
            pdi = 100.0 * st["spdm"] / st["str_"] if st["str_"] else 0.0
            mdi = 100.0 * st["smdm"] / st["str_"] if st["str_"] else 0.0
            s = pdi + mdi
            dx = 100.0 * abs(pdi - mdi) / s if s else 0.0
            if i < 2 * period - 1:
                st["dx_sum"] += dx
            elif i == 2 * period - 1:
                st["adx"] = (st["dx_sum"] + dx) / period
            else:
                st["adx"] = (st["adx"] * (period - 1) + dx) / period
            adx = st["adx"]
    # --- strict crossovers, NaN -> False (recurrence._crossover) ---
    def _x(pl, plvl, line, lvl):
        return bool(pl < plvl) and bool(line > lvl)

    strong = bool(adx > 25.0)
    out = (
        st["ses"],
        macd_line,
        st["msig"],
        ppo_line,
        st["psig"],
        rsi,
        pdi,
        mdi,
        adx,
        _x(st["prev_macd_line"], prev_msig, macd_line, st["msig"]),
        _x(prev_msig, st["prev_macd_line"], st["msig"], macd_line),
        _x(st["prev_ppo_line"], prev_psig, ppo_line, st["psig"]),
        _x(prev_psig, st["prev_ppo_line"], st["psig"], ppo_line),
        _x(st["prev_rsi"], 30.0, rsi, 30.0),
        _x(70.0, st["prev_rsi"], 70.0, rsi),
        _x(st["prev_pdi"], st["prev_mdi"], pdi, mdi) and strong,
        _x(st["prev_mdi"], st["prev_pdi"], mdi, pdi) and strong,
    )
    st["prev_high"], st["prev_low"], st["prev_close"] = h, l, c
    st["prev_macd_line"], st["prev_ppo_line"] = macd_line, ppo_line
    st["prev_rsi"], st["prev_pdi"], st["prev_mdi"] = rsi, pdi, mdi
    st["n"] = i + 1
    return out


def stream_stateful_signals(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_dir: str,
    alpha: float = 0.2,
    series: str = "series_id",
    ts: str = "ts",
) -> None:
    """W2/W4/W5/W6/W11 in TRUE streaming form (VERDICT r3 item 2): the
    entire MACD/PPO/RSI/ADX/SES recurrence stack streams with O(1)
    keyed state — (EMA12, EMA26, EMA9-of-line, PPO signal, Wilder avg
    gain/loss, smoothed TR/±DM, the DX accumulator, ADX, and the
    previous-row line values the crossovers need) carried per series
    across micro-batches via ``applyInPandasWithState``. No 299-row
    lookback re-read (incremental.py's policy): per batch the work and
    reads are O(new rows).

    The fold is the same float64 operation sequence as the batch
    kernels, so a time-ordered stream matches the batch feature stack
    (and its recursive-CTE oracles) to well past the 6-decimal compare
    quantum — asserted by q78's oracle at sf0.01 and
    tests/test_incremental.py against with_series_features."""
    ensure_serializable()
    out_schema = T.StructType(
        [schema[series], schema[ts], schema["close"]]
        + [T.StructField(n, t) for n, t in SIGNAL_FIELDS]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType())]
        + [T.StructField(k, T.DoubleType()) for k in _STATE_FIELDS]
    )
    out_cols = [series, ts, "close"] + [n for n, _ in SIGNAL_FIELDS]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            vals = state.get
            st = {"n": vals[0]}
            st.update(dict(zip(_STATE_FIELDS, vals[1:])))
        else:
            st = _signals_init()
        # concat-then-sort: a series' rows may span Arrow chunks within
        # one micro-batch; the fold must see them in event-time order
        # stable + (close, high, low) tie-break — see stream_stateful_ses
        pdf = (
            pd.concat(list(pdfs), ignore_index=True)
            .sort_values([ts, "close", "high", "low"], kind="mergesort")
            .reset_index(drop=True)
        )
        rows = [
            _signals_step(st, float(h), float(l), float(c), alpha)
            for h, l, c in zip(pdf["high"], pdf["low"], pdf["close"])
        ]
        out = pd.DataFrame(rows, columns=[n for n, _ in SIGNAL_FIELDS])
        out.insert(0, "close", pdf["close"])
        out.insert(0, ts, pdf[ts])
        out.insert(0, series, pdf[series])
        state.update((st["n"], *[st[k] for k in _STATE_FIELDS]))
        yield out[out_cols]

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
    folded = src.groupBy(series).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    (
        folded.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def chunked_landing(df: DataFrame, landing_dir: str, ts: str = "ts", chunks: int = 3) -> None:
    """Split a batch table into ``chunks`` time-ordered landing files
    (oldest first), so an availableNow drain with maxFilesPerTrigger=1
    replays it as a realistic in-order micro-batch sequence."""
    import os
    import time

    # NTZ-safe numeric time axis for the percentile split
    tnum = F.unix_micros(F.col(ts).cast("timestamp"))
    # review r7/r8: a ts that is NULL — or that CASTS to NULL (an
    # unparseable string) — fails every chunk predicate and the row
    # lands in NO file: the replay silently sees fewer rows than the
    # batch table. Guard on the post-cast axis, which covers both.
    df = df.persist()  # review r8: one materialization, not chunks+2 scans
    try:
        if df.filter(tnum.isNull()).limit(1).count() > 0:
            raise ValueError(
                "chunked_landing: NULL/uncastable %s rows cannot be chunked" % ts
            )
        bounds = df.select(
            F.percentile_approx(tnum, [i / chunks for i in range(1, chunks)], 10000).alias("b")
        ).first()["b"]
        if bounds is None:
            # empty input: the no-crash contract must hold END-TO-END
            # (review r8) — the caller's readStream needs an existing
            # dir with a discoverable schema, so write the empty frame
            df.coalesce(1).write.mode("append").parquet(landing_dir)
            return
        # ADVICE r9: the per-chunk stamps below start `chunks` seconds
        # in the past, so two calls to the same landing dir less than
        # ~chunks seconds apart could give the SECOND call's early
        # chunks mtimes older than the first call's late chunks —
        # scrambling exactly the cross-call replay order the stamping
        # guarantees. Floor the whole ladder at (max mtime of
        # pre-existing landing parquet) + 1 so stamps are monotone
        # ACROSS calls, not just within one.
        start = time.time() - chunks
        if os.path.isdir(landing_dir):
            prior = [
                os.path.getmtime(os.path.join(landing_dir, n))
                for n in os.listdir(landing_dir)
                if n.endswith(".parquet")
            ]
            if prior:
                start = max(start, max(prior) + 1.0)
        lo = None
        for i in range(chunks):
            hi = bounds[i] if i < chunks - 1 else None
            part = df
            if lo is not None:
                part = part.filter(tnum > F.lit(lo))
            if hi is not None:
                part = part.filter(tnum <= F.lit(hi))
            before = (
                set(os.listdir(landing_dir))
                if os.path.isdir(landing_dir)
                else set()
            )
            part.coalesce(1).write.mode("append").parquet(landing_dir)
            # review r8: the in-order replay contract rides on file
            # mtime, and back-to-back tiny writes can land inside one
            # mtime-granularity tick — FileStreamSource then breaks
            # the tie by arbitrary path order (random part UUIDs).
            # Stamp each chunk's files with an explicitly increasing
            # mtime so the ordering is never left to the filesystem.
            # Only THIS write's files (ADVICE r8: an mtime-threshold
            # sweep also rewound files landed by a previous
            # chunked_landing call — the writes append — scrambling
            # the cross-call replay order the stamping guarantees).
            stamp = start + i
            for name in os.listdir(landing_dir):
                if name.endswith(".parquet") and name not in before:
                    p = os.path.join(landing_dir, name)
                    os.utime(p, (stamp, stamp))
            lo = hi
    finally:
        df.unpersist(False)


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas variant (the successor API to
# applyInPandasWithState: typed per-key state handles, timers, TTL)
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf wire format for
    its state-server protocol; without the ``protobuf`` package the
    driver worker crashes at init. Gate callers (and the pytest) on
    this instead of failing mid-stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_stateful_ses_tws(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_dir: str,
    alpha: float = 0.2,
    series: str = "series_id",
    ts: str = "ts",
    price: str = "close",
) -> None:
    """W11/T2 on the MODERN stateful API: the same SES fold as
    :func:`stream_stateful_ses`, but the level lives in a typed
    ``ValueState`` handle managed by a ``StatefulProcessor``
    (``transformWithStateInPandas``, Spark 4) — the API the RocksDB
    state-store backend and state TTL/timers target. Both variants
    are kept: applyInPandasWithState is the widely-deployed form and
    the one this sandbox can execute; this is the forward path,
    requiring the ``protobuf`` package (see :func:`tws_available`).
    The pytest asserts bit-identity with the batch kernel when the
    dependency is present and skips (with the reason) when not."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf); use stream_stateful_ses on this runtime"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_serializable()
    out_schema = T.StructType(
        [
            schema[series],
            schema[ts],
            schema[price],
            T.StructField("close_ses", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("level", T.DoubleType())])
    out_cols = [series, ts, price, "close_ses"]

    class SesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._level = handle.getValueState("level", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._level.get()
            level = None if prev is None else float(prev[0])
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                [ts, price], kind="mergesort"
            )
            out = []
            for x in pdf[price]:
                level = (
                    float(x) if level is None else alpha * float(x) + (1.0 - alpha) * level
                )
                out.append(level)
            pdf = pdf.reset_index(drop=True)
            pdf["close_ses"] = out
            self._level.update((level,))
            yield pdf[out_cols]

        def close(self) -> None:
            pass

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
    folded = src.groupBy(series).transformWithStateInPandas(
        statefulProcessor=SesProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
    (
        folded.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
