"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` per key (SURVEY.md §2.4 note — the reference
gets this implicitly from union+time-order; engines like DuckDB give
it as ASOF JOIN).

Spark-first implementation: the union trick. Tag both sides, union,
then one window pass per key ordered by (ts, side) takes
``last_value(right attrs, ignoreNulls)`` so every left row sees the
latest preceding right row. Cost = ONE shuffle on the key + one sort
— no range join, no per-row probing, and AQE handles key skew. This
beats a broadcast-range-join formulation whenever both sides are
large, which is the 100 TB case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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

    lhs = left.withColumn("__side", F.lit(1))
    for c in carried:
        new = f"{c}{suffix}" if c in left.columns or c == ts else c
        lhs = lhs.withColumn(new, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__side"),
        *[
            F.col(c).alias(f"{c}{suffix}" if c in left.columns or c == ts else c)
            for c in carried
        ],
    )
    for c in left.columns:
        if c not in (on, ts):
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    # right rows (side=0) sort before left rows at identical ts, so an
    # exact-tie right row IS visible to the left row (ASOF >= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in carried:
        name = f"{c}{suffix}" if c in left.columns or c == ts else c
        out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 1).drop("__side")
