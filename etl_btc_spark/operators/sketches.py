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
    m = 1 << p
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
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__mj"))
    )
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
