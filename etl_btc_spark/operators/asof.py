"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` per key (SURVEY.md §2.4 note — the reference
gets this implicitly from union+time-order; engines like DuckDB give
it as ASOF JOIN).

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
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    for c in carried:
        out = out.withColumn(out_name[c], F.col("__r").getField(c))
    return out.drop("__side", "__r")
