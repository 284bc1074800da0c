"""As-of and interval (range-containment) joins — the two time-join
shapes Spark has no native operator for, built as compositions of
equi primitives (SURVEY.md §2.4 note — the reference gets as-of
implicitly from union+time-order; engines like DuckDB give it as
ASOF JOIN and do range joins with an IEJoin).

Spark-first implementation: the union trick. Tag both sides, union,
then one window pass per key ordered by (ts, side) takes
``last(struct(right attrs), ignoreNulls)`` so every left row sees the
latest preceding right row. Cost = ONE shuffle on the key + one sort
— no range join, no per-row probing, and AQE handles key skew. This
beats a broadcast-range-join formulation whenever both sides are
large, which is the 100 TB case.

The carried attributes travel as ONE struct, not per-column
``last()`` calls: a matched right row with a NULL attribute must
contribute that NULL, not let the column fall through to an older
row (per-column backfill tears rows — DuckDB ASOF JOIN semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts``.

    ``right_cols`` are the right-side attributes to carry (default:
    everything except the key and timestamp). Right timestamp is
    always carried as ``{ts}{suffix}``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    carried = [ts] + right_cols
    out_name = {c: f"{c}{suffix}" if c in left.columns or c == ts else c for c in carried}

    struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in carried]
    )
    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(struct_t)
    )
    rhs = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carried]).alias("__r"),
    )
    for c in left.columns:
        if c not in (on, ts):
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    # right rows (side=0) sort before left rows at identical ts, so an
    # exact-tie right row IS visible to the left row (ASOF >= semantics)
    # final xxhash64(__r) term (review r7): with duplicate right rows
    # at the same (key, ts), (ts, __side) alone leaves last() to pick
    # whichever sorted last in shuffle order — run-to-run
    # nondeterminism. The hash is an ARBITRARY but STABLE total order
    # over the carried right values (identical duplicates tie
    # harmlessly: same values either way).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"), F.xxhash64(F.col("__r")))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    for c in carried:
        out = out.withColumn(out_name[c], F.col("__r").getField(c))
    return out.drop("__side", "__r")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Range-containment join: event rows matched to every interval
    with ``start <= ts < end`` on the same key — BINNED, not theta.

    A naive ``e.ts >= i.start AND e.ts < i.end`` predicate compiles to
    BroadcastNestedLoopJoin (O(n·m) probes, broadcast-limited). This
    composition stays in hash-join land at any scale:

    1. each interval explodes into the time bins it overlaps
       (``sequence(floor(start), floor(end), bin)`` — bounded fan-out
       of ceil(interval_len / bin) rows);
    2. events equi-join on (key, bin) — ONE shuffle each side, AQE
       skew-handled like any other hash join;
    3. the exact containment predicate filters the bin collisions.

    Pick ``bin_seconds`` ≈ median interval length: fan-out stays ~2
    and bin collisions stay ~candidates. Same technique as the LSH
    band join: coarse bucket equi-join, exact re-check.
    """

    def to_bin(c):  # epoch-floor bin id (a plain long — cheap join key)
        return F.floor(F.unix_micros(c.cast("timestamp")) / (bin_seconds * 1_000_000))

    binned_i = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(to_bin(F.col(start)), to_bin(F.col(end)))),
    )
    binned_e = events.withColumn("__bin", to_bin(F.col(ts)))
    out = binned_e.join(binned_i, [on, "__bin"]).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return out.drop("__bin")
