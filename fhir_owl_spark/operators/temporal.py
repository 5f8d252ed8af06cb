"""Temporal operators: backward as-of join.

Spark has no built-in as-of join (joining each left row to the most
recent right row at or before its timestamp). The standard workarounds
are a range join (quadratic blowup between join-key groups) or a
per-key pandas merge_asof (Python in the hot path). This implementation
is the union-and-window formulation:

    tag left rows (marker=1) and right rows (marker=0), union them,
    window over (key ORDER BY event_ts, marker) carrying the LAST
    non-null right payload seen so far, keep left rows.

One shuffle on the join key, no range explosion, no Python — each
partition is a single ordered sweep, which is also how kdb/DuckDB
evaluate ASOF. Ties at equal timestamps: the right row sorts BEFORE the
left row (marker 0 < 1), so a right row at exactly left_ts matches
(inclusive <=, the same rule as DuckDB's ASOF JOIN `l.ts >= r.ts`,
which the contract oracle uses to verify this operator value-for-value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row, plus the payload columns
    of the most recent ``right`` row with ``right_ts <= left_ts`` for the
    same ``on`` key (null when none exists).

    Right payload columns (everything except the key and timestamp) are
    emitted with an ``asof_`` prefix, plus ``asof_ts`` (the matched
    timestamp). Rights MUST be unique per (key, timestamp) — pre-dedupe
    with the caller's tie-break rule, otherwise "most recent" is
    ill-defined. With ``tolerance_us``, matches older than the tolerance
    (in microseconds) are nulled out, matching merge_asof semantics.
    """
    payload = [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("_marker", F.lit(1)).withColumn(
        "_ets", F.col(left_ts)
    )
    rhs_cols = [F.col(on), F.col(right_ts).alias("_ets"), F.lit(0).alias("_marker")]
    rhs_cols += [F.col(c).alias(f"asof_{c}") for c in payload]
    rhs = right.select(*rhs_cols).withColumn("asof_ts", F.col("_ets"))

    combined = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ets", "_marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {
        f"asof_{c}": F.last(f"asof_{c}", ignorenulls=True).over(w) for c in payload
    }
    carried["asof_ts"] = F.last("asof_ts", ignorenulls=True).over(w)
    out = combined.withColumns(carried).filter(F.col("_marker") == 1)

    if tolerance_us is not None:
        stale = F.timestamp_diff("MICROSECOND", F.col("asof_ts"), F.col(left_ts)) > F.lit(
            tolerance_us
        )
        out = out.withColumns(
            {
                **{
                    f"asof_{c}": F.when(~stale, F.col(f"asof_{c}"))
                    for c in payload
                },
                "asof_ts": F.when(~stale, F.col("asof_ts")),
            }
        )
    return out.drop("_marker", "_ets")
