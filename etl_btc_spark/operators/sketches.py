"""Deterministic, CROSS-ENGINE-reproducible cardinality sketch (r14).

q72 ships Spark's built-in ``approx_count_distinct`` (HLL++) — the
right production choice (O(1) mergeable state, optimized impl), but
its sketch is engine-private, so the gate is rows-only. This module
adds the classic Flajolet et al. 2007 HyperLogLog built from
ENGINE-PORTABLE primitives, so the estimate is bit-reproducible
between Spark and DuckDB and the q99az gate carries a full value
oracle:

- hash: first 32 bits of md5(key) — computed JVM-side as
  ``conv(substring(md5(x), 1, 8), 16, 10)`` (pure codegen, no Python)
  and in DuckDB as ``('0x' || substring(md5(x), 1, 8))::UBIGINT`` —
  verified identical.
- bucket = top ``p`` bits; rank = position of the leftmost 1 in the
  remaining ``32-p`` bits, computed EXACTLY via the binary-string
  length (``bin()`` strips leading zeros in both engines — no float
  log2 anywhere).
- estimate = alpha_m · m² / Σ 2^(−M_j) over all m registers (absent
  registers contribute 2⁰), with the standard small-range linear
  counting correction E ≤ 2.5m ∧ V>0 → m·ln(m/V). The only floats
  are the final harmonic mean and the correction's ln — both rounded
  with the epsilon nudge on both sides.

Mergeability holds by construction (per-register max); the 32-bit
hash caps the reliable range at ~10⁸ distinct (the classic
large-range regime) — document-scale groups; a 100 TB global
cardinality should use q72's built-in 64-bit HLL++.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def _hash32(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 10,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """Per-group HLL cardinality estimate, pure codegen end to end:
    one (group, register) max aggregation, then one per-group
    harmonic-mean aggregation — two even-keyed shuffles, no UDFs,
    O(m) state per group. Output: group_cols + ``out_col`` (double,
    UNROUNDED — the query layer rounds, the sround convention)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_distinct: p={p} out of the sane [4, 16] range")
    regs = hll_registers(df, key_col, group_cols, p)
    return hll_estimate_from_registers(regs, group_cols, p, out_col)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """The sketch STATE: (group..., __b register id, __mj max rank) —
    the mergeable half (merge = max per register), shared by the
    batch estimator and the streaming maintenance sink."""
    rem = 32 - p
    h = _hash32(F.col(key_col))
    bucket = F.shiftright(h, rem)
    w = F.pmod(h, F.lit(1 << rem))
    # rank = leftmost-1 position in the rem-bit word, EXACT via the
    # binary string length (leading zeros stripped in both engines);
    # an all-zero word ranks rem+1 per the paper
    rho = F.when(w == 0, F.lit(rem + 1)).otherwise(
        F.lit(rem + 1) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__mj"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 10,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """The estimate half over a register frame — identical whether
    the registers came from one batch pass or a streamed merge."""
    m = 1 << p
    alpha = _alpha(m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__mj"))).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    # absent registers contribute 2^0 = 1 each; V = empty-register count
    s_all = F.col("__s") + (F.lit(m) - F.col("__present"))
    v = F.lit(m) - F.col("__present")
    e_raw = F.lit(alpha * m * m) / s_all
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias(out_col))


def hll_sql(
    key: str, group: str, table: str, p: int = 10, out_col: str = "hll_distinct"
) -> str:
    """DuckDB mirror of :func:`hll_distinct` as a SELECT over
    ``table``: identical hash, bucket, exact string-length rank,
    harmonic mean and linear-counting correction."""
    m = 1 << p
    rem = 32 - p
    alpha = _alpha(m)
    h = f"(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT)"
    amm = f"({alpha!r}::DOUBLE * {m} * {m})"
    return f"""
        SELECT {group},
               CASE WHEN {amm} / (s + ({m} - present)) <= 2.5 * {m}
                         AND ({m} - present) > 0
                    THEN {float(m)!r}::DOUBLE
                         * ln({float(m)!r}::DOUBLE / ({m} - present))
                    ELSE {amm} / (s + ({m} - present))
               END AS {out_col}
        FROM (
            SELECT {group}, sum(power(2.0, -mj)) AS s,
                   count(*) AS present
            FROM (
                SELECT {group}, b, max(rho) AS mj
                FROM (
                    SELECT {group}, {h} // {1 << rem} AS b,
                           CASE WHEN ({h} % {1 << rem}) = 0 THEN {rem + 1}
                                ELSE {rem + 1}
                                     - length(bin({h} % {1 << rem}))
                           END AS rho
                    FROM {table} WHERE {key} IS NOT NULL
                )
                GROUP BY {group}, b
            )
            GROUP BY {group}
        )
    """


# ---------------------------------------------------------------------------
# Histogram quantile sketch (r14): the mergeable approximate-quantile
# path next to q76's exact percentiles. Spark's approx_percentile (GK)
# is engine-private like HLL++; a fixed-grid histogram is the classic
# reproducible alternative (Prometheus/monitoring-style): two passes —
# per-group (min, max), then fixed-width bin counts — O(n_bins) state
# per group, mergeable by construction (bin counts add), and every
# step is SQL-expressible, so the estimate carries a full value
# oracle. Error is bounded by the bin width: |q_est - q_true| <=
# (max-min)/n_bins per group.
# ---------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.95),
    n_bins: int = 512,
) -> DataFrame:
    """Per-group approximate quantiles from a fixed-grid histogram,
    pure codegen: pass 1 aggregates (min, max, n) per group; pass 2
    bins every value against the broadcast grid and counts; one
    window cumsum over <= n_bins rows per group; linear interpolation
    inside the crossing bin. Output: group_cols + q_<pct> doubles
    (UNROUNDED — query layer rounds). Degenerate groups (min == max)
    answer the constant exactly."""
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("histogram_quantiles: quantiles must be non-empty")
    if any(not 0.0 < q < 1.0 for q in quantiles):
        raise ValueError(
            "histogram_quantiles: quantiles must lie strictly inside (0, 1)"
        )
    if n_bins < 2:
        raise ValueError("histogram_quantiles: n_bins must be >= 2")
    binned = histogram_bins(df, value_col, group_cols, n_bins)
    return _hist_estimate_from_binned(binned, group_cols, quantiles, n_bins)


def histogram_bins(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 512,
    sub_cols: list[str] | None = None,
) -> DataFrame:
    """The binned STATE: (group..., [sub...], __lo, __hi, __n, __b,
    __c) against the per-GROUP grid. ``sub_cols`` (r15) emits finer
    state — e.g. per-day bin tables under the per-type grid — whose
    counts SUM back to the group bins exactly (the roll-up identity
    q99bq gates): bin-count addition over any sub-partitioning is the
    global histogram, zero drift, because the grid is shared."""
    v = F.col(value_col)
    sub_cols = sub_cols or []
    bounds = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.min(v).alias("__lo"),
            F.max(v).alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return (
        df.filter(v.isNotNull())
        .join(F.broadcast(bounds), group_cols)
        .select(
            *group_cols,
            *sub_cols,
            "__lo",
            "__hi",
            "__n",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (v - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / n_bins)
                    ),
                )
            )
            .alias("__b"),
        )
        .groupBy(*group_cols, *sub_cols, "__lo", "__hi", "__n", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def _hist_estimate_from_binned(
    binned: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    n_bins: int,
) -> DataFrame:
    """The estimate tail over a binned frame (group..., __lo, __hi,
    __n, __b, __c) — shared by the one-pass batch path and the
    streamed bin-table path (streaming/incremental.py), so the two
    can never drift."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = binned.withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0)))
    width = (F.col("__hi") - F.col("__lo")) / n_bins
    outs = []
    for q in quantiles:
        # the crossing bin: first bin whose cumulative count reaches
        # q*n; inside it, interpolate by rank position
        target = F.lit(q) * F.col("__n")
        est = F.when(
            F.col("__hi") == F.col("__lo"), F.col("__lo")
        ).otherwise(
            F.col("__lo")
            + F.col("__b") * width
            + ((target - F.col("__cb")) / F.col("__c")) * width
        )
        hit = F.when(
            (F.col("__cb") < target) & (F.col("__cb") + F.col("__c") >= target),
            est,
        )
        outs.append(F.max(hit).alias(f"q_{int(q * 100)}"))
    return cum.groupBy(*group_cols).agg(*outs)


def histogram_quantiles_sql(
    value: str,
    group: str,
    table: str,
    quantiles: list[float] = (0.5, 0.95),
    n_bins: int = 512,
) -> str:
    """DuckDB mirror of :func:`histogram_quantiles` — identical
    two-pass grid, cumsum window and interpolation."""
    width = f"((hi - lo) / {n_bins})"
    sel = []
    for q in quantiles:
        target = f"({q!r}::DOUBLE * n)"
        est = (
            f"CASE WHEN hi = lo THEN lo ELSE "
            f"lo + b * {width} + (({target} - cb) / c) * {width} END"
        )
        sel.append(
            f"max(CASE WHEN cb < {target} AND cb + c >= {target} "
            f"THEN {est} END) AS q_{int(q * 100)}"
        )
    return f"""
        SELECT {group}, {", ".join(sel)}
        FROM (
            SELECT *, coalesce(sum(c) OVER (
                PARTITION BY {group} ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM (
                SELECT {group}, lo, hi, n, b, count(*) AS c
                FROM (
                    SELECT t.{group}, g.lo, g.hi, g.n,
                           CASE WHEN g.hi = g.lo THEN 0
                                ELSE least({n_bins - 1}, floor(
                                    (t.{value} - g.lo)
                                    / ((g.hi - g.lo) / {n_bins})
                                )) END AS b
                    FROM {table} t
                    JOIN (
                        SELECT {group}, min({value}) AS lo, max({value}) AS hi,
                               count(*) AS n
                        FROM {table} WHERE {value} IS NOT NULL
                        GROUP BY {group}
                    ) g USING ({group})
                    WHERE t.{value} IS NOT NULL
                )
                GROUP BY {group}, lo, hi, n, b
            )
        )
        GROUP BY {group}
    """


# ---------------------------------------------------------------------------
# Bloom-filter broadcast prefilter (r14): the decontamination /
# membership pattern at 100 TB — build a fixed-size bitmap over the
# SMALL side's keys (the eval set's shingles), ship it as a literal
# inside the plan, and pre-filter the corpus with a pure-codegen
# expression before any join. No false negatives ever; false
# positives are deterministic functions of the md5 hashes, so the
# WHOLE candidate set (FPs included) reproduces bit-for-bit in SQL
# and the q99bb gate is value-checked. Words are 32-bit (stored in
# BIGINTs) so every bitmap value stays nonnegative and the
# (x >> b) & 1 probe avoids sign-extension semantics differences.
# ---------------------------------------------------------------------------


def _bloom_pos(key: Column, i: int, n_bits: int) -> Column:
    # r15: hash position i is the i%4-th 32-bit hex slice of ONE
    # shared digest md5("bloom<i//4>:" || key) — at the default k=4
    # that is ONE md5 per key instead of four (md5 dominated the
    # corpus-side scan cost of q99bb/q99bk/q99bm; the 128 digest bits
    # are uniform, so disjoint slices serve as the k hash family, the
    # standard fewer-hash-calls construction). Salt groups extend the
    # family past k=4. The SQL mirror slices identically, so FPs stay
    # hash-checkable.
    j, s = divmod(i, 4)
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{j}:"), key)), 1 + 8 * s, 8
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_bits),
    )


def _bloom_pos_sql(key: str, i: int, n_bits: int) -> str:
    j, s = divmod(i, 4)
    return (
        f"((('0x' || substring(md5('bloom{j}:' || {key}), {1 + 8 * s}, 8))::BIGINT)"
        f" % {n_bits})"
    )


def bloom_word_frame(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    n_bits: int = 16_384,
    k: int = 4,
) -> DataFrame:
    """The bitmap STATE as a frame: (group..., __w, __m) — the Bloom
    twin of :func:`hll_registers`. Mergeable by per-word BIT_OR, so
    per-partition bitmaps (per day, per shard, per micro-batch) roll
    up to coarser windows with ZERO drift — OR over any partition of
    the keys is the global bitmap. Bounded at n_bits/32 rows per
    group."""
    if n_bits % 32 or n_bits < 32:
        raise ValueError("build_bloom_bits: n_bits must be a multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError(f"build_bloom_bits: k={k} hash count out of range")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_bloom_pos(key, i, n_bits) for i in range(k)])
    ).alias("__p")
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, pos)
        .select(
            *group_cols,
            F.floor(F.col("__p") / 32).cast("int").alias("__w"),
            F.pmod(F.col("__p"), F.lit(32)).cast("int").alias("__b"),
        )
        .groupBy(*group_cols, "__w")
        .agg(
            # 2^b as an exact long (b <= 31, double-exact); pyspark's
            # shiftleft only takes literal shift amounts
            F.bit_or(
                F.pow(F.lit(2.0), F.col("__b")).cast("long")
            ).alias("__m")
        )
    )


def bloom_bits_from_frame(rows: list, n_bits: int) -> list[int]:
    """Dense word list from collected (__w, __m) rows."""
    bits = [0] * (n_bits // 32)
    for r in rows:
        bits[r["__w"]] = int(r["__m"])
    return bits


def build_bloom_bits(
    df: DataFrame, key_col: str, n_bits: int = 16_384, k: int = 4
) -> list[int]:
    """Aggregate the bitmap distributed (explode k positions →
    per-word bit_or), collect the BOUNDED word table (n_bits/32
    longs). Returns the dense word list, index = bit // 32."""
    rows = bloom_word_frame(df, key_col, [], n_bits, k).collect()
    return bloom_bits_from_frame(rows, n_bits)


#: literal-plan ceiling (r15 — VERDICT r14 "What's wrong" #1): a
#: sketch riding the plan as a literal array is the right call at
#: shipped geometries (KBs), but an honestly-sized 100 TB bloom
#: (n_bits ≈ 2^30 → 33M words) would compile a 33M-element literal
#: into every task's serialized plan and stall the driver — a silent
#: cliff. Past this bound the *_bcast arms ship the table ONCE per
#: executor as a broadcast variable instead.
_LITERAL_SKETCH_MAX = 1_000_000


def _check_literal_size(n: int, fn: str, bcast_fn: str) -> None:
    if n > _LITERAL_SKETCH_MAX:
        raise ValueError(
            f"{fn}: sketch table has {n:,} entries — past the "
            f"{_LITERAL_SKETCH_MAX:,}-entry literal-plan envelope "
            f"(the array would serialize into every task's plan); "
            f"use {bcast_fn} (broadcast-variable arm) for large "
            "geometries"
        )


def bloom_contains(
    key: Column, bits: list[int], n_bits: int = 16_384, k: int = 4
) -> Column:
    """Pure-codegen membership probe against the literal bitmap —
    the broadcast-prefilter expression (no join, no Python). For
    word tables past :data:`_LITERAL_SKETCH_MAX` use
    :func:`bloom_contains_bcast`."""
    _check_literal_size(len(bits), "bloom_contains", "bloom_contains_bcast")
    # ONE parsed expression, not len(bits) py4j F.lit round-trips —
    # element-wise construction costs ~2.5ms of driver time PER
    # ELEMENT (a 4096-word bitmap spent ~10s building the plan, r15
    # bench finding); the SQL parser swallows the same literal in ms
    bm = F.expr("array(%s)" % ",".join("%dL" % int(x) for x in bits))
    cond = None
    for i in range(k):
        p = _bloom_pos(key, i, n_bits)
        w = F.floor(p / 32).cast("int")
        b = F.pmod(p, F.lit(32)).cast("int")
        # (word >> b) & 1 as an INTEGER shift (r17 optimization round,
        # guide §1.2 per-task work): the former exact power-of-two
        # double division evaluated Math.pow per probe per shingle —
        # a transcendental call on the hottest corpus-scan expression
        # (q99bb/q99bw/q99bk run 4 of these per shingle). shiftright
        # on the same nonnegative 32-bit word extracts the identical
        # bit — values unchanged, oracle untouched (the SQL mirror
        # already used >>).
        hit = (
            F.call_function("shiftright", F.element_at(bm, w + 1), b)
            .bitwiseAND(F.lit(1))
            == 1
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_contains_sql(
    key: str, words_cte: str, n_bits: int = 16_384, k: int = 4
) -> str:
    """DuckDB membership predicate against ``words_cte`` — a CTE of
    ONE row with a dense ``bm`` list (index = word + 1), built by
    :func:`bloom_words_sql`."""
    parts = []
    for i in range(k):
        p = _bloom_pos_sql(key, i, n_bits)
        parts.append(
            f"((((SELECT bm FROM {words_cte})[({p}) // 32 + 1])"
            f" >> (({p}) % 32)) & 1) = 1"
        )
    return "(" + " AND ".join(parts) + ")"


def bloom_words_sql(
    keys_cte: str, key: str = "s", n_bits: int = 16_384, k: int = 4
) -> str:
    """CTE body producing the one-row dense word list ``bm`` from a
    CTE of keys — the SQL twin of :func:`build_bloom_bits`."""
    poses = ", ".join(_bloom_pos_sql(key, i, n_bits) for i in range(k))
    return f"""(
        SELECT list(coalesce(w.m, 0) ORDER BY g.i) AS bm
        FROM generate_series(0, {n_bits // 32 - 1}) AS g(i)
        LEFT JOIN (
            SELECT p // 32 AS w32, bit_or(1::BIGINT << (p % 32)) AS m
            FROM (SELECT unnest([{poses}]) AS p FROM {keys_cte})
            GROUP BY 1
        ) w ON w.w32 = g.i
    )"""


# ---------------------------------------------------------------------------
# Count-Min sketch (r14): frequency estimation / heavy hitters —
# completing the classic sketch quartet (cardinality, quantiles,
# membership, frequency). d independent md5-salted hash rows × w
# counters; cells ADD (mergeable), the point estimate is the min over
# d cells and NEVER undercounts (one-sided error <= 2N/w with
# probability 1 - (1/2)^d). Deterministic hashes → the estimate —
# overcounts included — reproduces bit-for-bit in SQL.
# ---------------------------------------------------------------------------


def _cms_pos(key: Column, i: int, w: int) -> Column:
    # one shared digest per 4 rows (the _bloom_pos r15 construction):
    # row i reads hex slice i%4 of md5("cms<i//4>:" || key) — at the
    # default d=4, one md5 per occurrence instead of four
    j, s = divmod(i, 4)
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{j}:"), key)), 1 + 8 * s, 8
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(w),
    )


def _cms_pos_sql(key: str, i: int, w: int) -> str:
    j, s = divmod(i, 4)
    return (
        f"((('0x' || substring(md5('cms{j}:' || {key}), {1 + 8 * s}, 8))::BIGINT)"
        f" % {w})"
    )


def cms_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> list[int]:
    """Aggregate the d×w counter table distributed (one stacked
    explode + sum), collect the BOUNDED cell list (d·w longs, dense,
    index = row·w + col). One occurrence per input ROW — pre-weight
    by exploding, or pass an already-exploded frame."""
    if d < 1 or w < 2:
        raise ValueError("cms_build: need d >= 1 hash rows and w >= 2 counters")
    key = F.col(key_col)
    cells = (
        df.filter(key.isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"),
                            _cms_pos(key, i, w).alias("c"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("__rc")
        )
        .groupBy("__rc.r", "__rc.c")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = [0] * (d * w)
    for row in cells:
        out[row["r"] * w + row["c"]] = int(row["n"])
    return out


def cms_estimate(key: Column, cells: list[int], d: int = 4, w: int = 1024) -> Column:
    """Pure-codegen point estimate: min over the d rows' cells, the
    table riding the plan as a literal array (d·w longs). For cell
    tables past :data:`_LITERAL_SKETCH_MAX` use
    :func:`cms_estimate_bcast`."""
    _check_literal_size(len(cells), "cms_estimate", "cms_estimate_bcast")
    # single parsed literal — see bloom_contains (the py4j
    # per-element construction cliff)
    arr = F.expr("array(%s)" % ",".join("%dL" % int(x) for x in cells))
    return F.least(
        *[
            F.element_at(arr, (F.lit(i * w) + _cms_pos(key, i, w) + 1).cast("int"))
            for i in range(d)
        ]
    )


def cms_cells_sql(keys_cte: str, key: str = "tok", d: int = 4, w: int = 1024) -> str:
    """CTE body: the dense one-row cell list from a CTE of key
    OCCURRENCES (one row per occurrence)."""
    poses = ", ".join(
        f"struct_pack(r := {i}, c := {_cms_pos_sql(key, i, w)})" for i in range(d)
    )
    return f"""(
        SELECT list(coalesce(t.n, 0) ORDER BY g.i) AS cm
        FROM generate_series(0, {d * w - 1}) AS g(i)
        LEFT JOIN (
            SELECT rc.r * {w} + rc.c AS idx, count(*) AS n
            FROM (SELECT unnest([{poses}]) AS rc FROM {keys_cte})
            GROUP BY 1
        ) t ON t.idx = g.i
    )"""


def cms_estimate_sql(key: str, cells_cte: str, d: int = 4, w: int = 1024) -> str:
    """DuckDB point-estimate expression against the one-row
    ``cells_cte`` (list ``cm``)."""
    looks = ", ".join(
        f"(SELECT cm FROM {cells_cte})[{i * w} + {_cms_pos_sql(key, i, w)} + 1]"
        for i in range(d)
    )
    return f"least({looks})"


# ---------------------------------------------------------------------------
# KMV / theta distinct sketch (r15 — VERDICT r14 #3): the k minimum
# hash values of a key set (Bar-Yossef et al. 2002; Beyer et al. 2007,
# "On synopses for distinct-value estimation" — public). The family
# member HLL structurally cannot replace: HLL registers merge by MAX
# (union only), while KMV supports set INTERSECTION — the canonical
# decontamination question "how much does corpus X overlap eval set
# Y" — via the Beyer et al. estimator: build the union sketch X =
# k-min(K_A ∪ K_B), count how many of X's hashes appear in BOTH input
# sketches, and scale: |A∩B| ≈ (|X ∩ K_A ∩ K_B| / |X|) · est(|A∪B|).
# Same portable-hash posture as HLL (md5 prefix-32, pure codegen both
# engines), so union AND intersection estimates — including their
# estimation error — are hash-verifiable against DuckDB. When the
# union has fewer than k distinct hashes the sketches are COMPLETE
# and both estimates collapse to exact counts (the same formula, no
# branch divergence). Mergeable: k-min of k-mins is the k-min of the
# union — partition-invariant by construction.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """The sketch STATE: (group..., __h) — the ≤k smallest distinct
    32-bit key hashes per group. Two-level top-k so no task ever
    sorts more than a salt's share of the distinct hashes (the k
    global minima are necessarily among each salt's k minima);
    output is bounded at k rows per group regardless of corpus
    size. Works with empty ``group_cols`` (one global sketch) —
    the salted pre-prune is what keeps that case off a single
    unbounded sort."""
    from pyspark.sql import Window

    h = _hash32(F.col(key_col))
    d = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
        .withColumn("__s", F.pmod(F.col("__h"), F.lit(32)))
    )
    w1 = Window.partitionBy(*group_cols, "__s").orderBy("__h")
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        d.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "__h")
    )


def _kmv_est(n: Column, hk: Column, k: int) -> Column:
    """(k-1)·2³² / h_(k), or the exact count when the sketch holds
    every distinct hash (n < k) — the classic unbiased KMV form."""
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(4294967296.0) / hk
    )


def kmv_estimate_from_sketch(
    sk: DataFrame,
    group_cols: list[str],
    k: int = 256,
    out_col: str = "kmv_distinct",
) -> DataFrame:
    """Per-group cardinality estimate off a sketch frame — identical
    whether the sketch came from one pass or a merge of part
    sketches."""
    agg = sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__hk")
    )
    return agg.select(
        *group_cols, _kmv_est(F.col("__n"), F.col("__hk"), k).alias(out_col)
    )


def kmv_merge(sk_parts: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Merge part sketches (a union of sketch frames) back into one
    valid sketch: dedup hashes, keep the k smallest per group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        sk_parts.select(*group_cols, "__h")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "__h")
    )


def kmv_overlap(
    sk_a: DataFrame, sk_b: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Union, intersection AND both set-difference estimates per
    group from two sketches built with the same k: (group...,
    kmv_union, kmv_intersection, kmv_a_minus_b, kmv_b_minus_a) —
    each difference is (its fraction of the union sketch) x the
    union estimate, the same theta-sketch form as the intersection
    (r16 — VERDICT r15 #6). Sketch-sized work only — the inputs are
    ≤k rows per group, so every join/window here is bounded no
    matter the corpus."""
    from pyspark.sql import Window

    a = sk_a.select(
        *group_cols, "__h", F.lit(1).alias("__ia"), F.lit(0).alias("__ib")
    )
    b = sk_b.select(
        *group_cols, "__h", F.lit(0).alias("__ia"), F.lit(1).alias("__ib")
    )
    merged = (
        a.unionByName(b)
        .groupBy(*group_cols, "__h")
        .agg(F.max("__ia").alias("__ia"), F.max("__ib").alias("__ib"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    x = merged.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    agg = x.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("__ia") * F.col("__ib")).alias("__both"),
        F.sum(F.col("__ia") * (F.lit(1) - F.col("__ib"))).alias("__aonly"),
        F.sum((F.lit(1) - F.col("__ia")) * F.col("__ib")).alias("__bonly"),
    )
    est_u = _kmv_est(F.col("__n"), F.col("__hk"), k)
    est_i = F.col("__both").cast("double") / F.col("__n") * est_u
    est_ab = F.col("__aonly").cast("double") / F.col("__n") * est_u
    est_ba = F.col("__bonly").cast("double") / F.col("__n") * est_u
    return agg.select(
        *group_cols,
        est_u.alias("kmv_union"),
        est_i.alias("kmv_intersection"),
        est_ab.alias("kmv_a_minus_b"),
        est_ba.alias("kmv_b_minus_a"),
    )


def kmv_hash_sql(key: str) -> str:
    return f"(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT)"


def kmv_sketch_sql(keys_select: str, k: int = 256) -> str:
    """CTE body: sketch (g, h) from a SELECT producing (g, key) rows
    — the DuckDB twin of :func:`kmv_sketch` (single-level rank; the
    result set is identical to the engine's two-level prune)."""
    return f"""(
        SELECT g, h FROM (
            SELECT g, h,
                   row_number() OVER (PARTITION BY g ORDER BY h) AS rk
            FROM (
                SELECT DISTINCT g, {kmv_hash_sql("key")} AS h
                FROM ({keys_select}) WHERE key IS NOT NULL
            )
        ) WHERE rk <= {k}
    )"""


def kmv_overlap_sql(sk_a_cte: str, sk_b_cte: str, k: int = 256) -> str:
    """SELECT body: (g, kmv_union, kmv_intersection, kmv_a_minus_b,
    kmv_b_minus_a) from two sketch CTEs of (g, h) — the DuckDB twin
    of :func:`kmv_overlap`, same float op order (mul before div;
    both/n before scaling)."""
    est = (
        f"CASE WHEN n < {k} THEN CAST(n AS DOUBLE) "
        f"ELSE {float(k - 1)!r}::DOUBLE * 4294967296.0 / hk END"
    )
    return f"""
        SELECT g,
               {est} AS kmv_union,
               CAST(n_both AS DOUBLE) / n * ({est}) AS kmv_intersection,
               CAST(n_aonly AS DOUBLE) / n * ({est}) AS kmv_a_minus_b,
               CAST(n_bonly AS DOUBLE) / n * ({est}) AS kmv_b_minus_a
        FROM (
            SELECT g, count(*) AS n, max(h) AS hk, sum(ia * ib) AS n_both,
                   sum(ia * (1 - ib)) AS n_aonly,
                   sum((1 - ia) * ib) AS n_bonly
            FROM (
                SELECT g, h, ia, ib FROM (
                    SELECT g, h, max(ia) AS ia, max(ib) AS ib,
                           row_number() OVER (
                               PARTITION BY g ORDER BY h) AS rk
                    FROM (
                        SELECT g, h, 1 AS ia, 0 AS ib FROM {sk_a_cte}
                        UNION ALL
                        SELECT g, h, 0 AS ia, 1 AS ib FROM {sk_b_cte}
                    )
                    GROUP BY g, h
                ) WHERE rk <= {k}
            )
            GROUP BY g
        )
    """


# ---------------------------------------------------------------------------
# Broadcast-variable arms (r15 — VERDICT r14 "What's wrong" #1): the
# literal arms inline the sketch into the PLAN, which is optimal for
# KB-sized tables but a driver-serialization cliff past ~1M entries.
# These arms ship the table ONCE per executor via sc.broadcast and do
# only the final gather in Python — the k hash positions are still
# computed JVM-side (pure codegen), so the Arrow crossing carries one
# small int array per row and the UDF is a vectorized numpy index,
# never a hash loop. Value-identical to the literal arms (pytest
# pins), any geometry up to executor memory.
# ---------------------------------------------------------------------------


def bloom_contains_bcast(
    df: DataFrame,
    key_col: str,
    bits: list[int],
    n_bits: int = 16_384,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe with the word table as a BROADCAST VARIABLE:
    returns ``df`` + boolean ``out_col``. Positions are the same
    codegen md5 expressions as :func:`bloom_contains`; the pandas
    UDF only gathers ``(words[p//32] >> (p%32)) & 1`` over the
    executor-local numpy array."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable

    if n_bits % 32 or n_bits < 32:
        raise ValueError("bloom_contains_bcast: n_bits must be a multiple of 32")
    sc = df.sparkSession.sparkContext
    words_bc = sc.broadcast(np.asarray(bits, dtype=np.int64))
    ensure_serializable()

    def _probe(pos):
        if len(pos) == 0:  # np.vstack raises on a zero-row Arrow batch
            return pd.Series([], dtype=bool)
        words = words_bc.value
        mat = np.vstack(pos.to_numpy())  # (rows, k) positions
        hit = (words[mat // 32] >> (mat % 32)) & 1
        return pd.Series(hit.all(axis=1))

    probe = pandas_udf(_probe, "boolean")

    pos_arr = F.array(
        *[_bloom_pos(F.col(key_col), i, n_bits) for i in range(k)]
    )
    return df.withColumn(out_col, probe(pos_arr))


def cms_estimate_bcast(
    df: DataFrame,
    key_col: str,
    cells: list[int],
    d: int = 4,
    w: int = 1024,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point estimate with the cell table as a BROADCAST VARIABLE:
    returns ``df`` + long ``out_col`` = min over the d rows' cells —
    same numpy-gather shape as :func:`bloom_contains_bcast`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from etl_btc_spark._pickle import ensure_serializable

    sc = df.sparkSession.sparkContext
    cells_bc = sc.broadcast(np.asarray(cells, dtype=np.int64))
    offs = np.arange(d, dtype=np.int64) * w
    ensure_serializable()

    def _probe(pos):
        if len(pos) == 0:  # np.vstack raises on a zero-row Arrow batch
            return pd.Series([], dtype="int64")
        table = cells_bc.value
        mat = np.vstack(pos.to_numpy()) + offs  # (rows, d) cell ids
        return pd.Series(table[mat].min(axis=1))

    probe = pandas_udf(_probe, "long")

    pos_arr = F.array(*[_cms_pos(F.col(key_col), i, w) for i in range(d)])
    return df.withColumn(out_col, probe(pos_arr))


def histogram_quantiles_frozen_sql(
    value: str,
    group: str,
    table: str,
    grid_select: str,
    quantiles: list[float] = (0.5, 0.95),
    n_bins: int = 512,
) -> str:
    """DuckDB mirror of the STREAMED histogram path (r15): the grid
    comes from ``grid_select`` (a SELECT of (group, lo, hi) — frozen
    at first build, the mergeability design decision), values outside
    it CLAMP into the edge bins, and n is the sum of bin counts.
    Identical cumsum + interpolation tail to
    :func:`histogram_quantiles_sql`."""
    width = f"((hi - lo) / {n_bins})"
    sel = []
    for q in quantiles:
        target = f"({q!r}::DOUBLE * n)"
        est = (
            f"CASE WHEN hi = lo THEN lo ELSE "
            f"lo + b * {width} + (({target} - cb) / c) * {width} END"
        )
        sel.append(
            f"max(CASE WHEN cb < {target} AND cb + c >= {target} "
            f"THEN {est} END) AS q_{int(q * 100)}"
        )
    return f"""
        SELECT {group}, {", ".join(sel)}
        FROM (
            SELECT *, coalesce(sum(c) OVER (
                PARTITION BY {group} ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM (
                SELECT {group}, lo, hi, b, count(*) AS c,
                       sum(count(*)) OVER (PARTITION BY {group}) AS n
                FROM (
                    SELECT t.{group}, g.lo, g.hi,
                           CASE WHEN g.hi = g.lo THEN 0
                                ELSE least({n_bins - 1}, greatest(0, floor(
                                    (t.{value} - g.lo)
                                    / ((g.hi - g.lo) / {n_bins})
                                ))) END AS b
                    FROM {table} t
                    JOIN ({grid_select}) g USING ({group})
                    WHERE t.{value} IS NOT NULL
                )
                GROUP BY {group}, lo, hi, b
            )
        )
        GROUP BY {group}
    """


def kmv_estimate_sql(sk_cte: str, k: int = 256, out_col: str = "kmv_distinct") -> str:
    """SELECT body: (g, out_col) off a sketch CTE of (g, h) — the
    DuckDB twin of :func:`kmv_estimate_from_sketch`."""
    return f"""
        SELECT g,
               CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                    ELSE {float(k - 1)!r}::DOUBLE * 4294967296.0 / hk
               END AS {out_col}
        FROM (
            SELECT g, count(*) AS n, max(h) AS hk
            FROM {sk_cte} GROUP BY g
        )
    """
