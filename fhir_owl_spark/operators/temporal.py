"""Temporal operators: backward as-of join, bucketed range join,
hypertable-style multi-resolution rollup.

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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 3600,
    max_fanout: int = 100_000,
    on_invalid: str = "error",
) -> DataFrame:
    """Interval containment join: every (point, interval) pair with the
    same key and ``start <= point_ts <= end`` (inclusive both ends).

    Spark compiles a raw inequality join to BroadcastNestedLoopJoin — a
    per-key cartesian. This implementation BUCKETS time instead: each
    interval is exploded to the ``bucket_s``-second buckets it overlaps,
    points map to exactly one bucket, and the join is a plain equi-join
    on (key, bucket) followed by the exact containment filter. Cost is
    |points| + Σ interval_span/bucket_s — linear, shuffle on a uniform
    composite key; pick ``bucket_s`` near the typical interval length
    (p95 of the span distribution is a good adaptive choice) so the
    fan-out stays O(1) per interval.

    Fan-out guard: ONE malformed or open-ended interval (e.g. end_ts
    9999-12-31 with bucket_s=3600) would otherwise build a multi-million
    element array in a single row and kill its executor. Intervals with
    ``end < start`` or spanning more than ``max_fanout`` buckets
    therefore fail loudly (``on_invalid='error'``, default) or are
    dropped (``on_invalid='drop'``) — never silently exploded. Note
    Spark's ``sequence`` itself caps arrays at ~2.5M elements with an
    opaque error; max_fanout must stay well under that, and the guard
    runs BEFORE sequence is evaluated.
    """
    if on_invalid not in ("error", "drop"):
        raise ValueError(f"on_invalid must be 'error' or 'drop', got {on_invalid!r}")
    pb = F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / (bucket_s * 1_000_000))
    p = points.withColumn("_bucket", pb.cast("long"))
    sb = F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / (bucket_s * 1_000_000)).cast("long")
    eb = F.floor(F.unix_micros(F.col(end_col).cast("timestamp")) / (bucket_s * 1_000_000)).cast("long")
    if on_invalid == "drop":
        intervals = intervals.filter(
            (F.col(end_col) >= F.col(start_col)) & ((eb - sb) <= max_fanout)
        )
        sb_checked = sb
    else:
        # the guard is woven into the sequence's lower bound so column
        # pruning can never optimize it away: evaluating the explode
        # forces the check first
        sb_checked = (
            F.when(
                F.col(end_col) < F.col(start_col),
                F.raise_error(
                    F.concat(
                        F.lit(f"range_join: {end_col} < {start_col} ("),
                        F.col(end_col).cast("string"),
                        F.lit(" < "),
                        F.col(start_col).cast("string"),
                        F.lit(") — fix the interval or pass on_invalid='drop'"),
                    )
                ).cast("long"),
            )
            .when(
                (eb - sb) > max_fanout,
                F.raise_error(
                    F.concat(
                        F.lit("range_join: interval spans "),
                        (eb - sb + 1).cast("string"),
                        F.lit(
                            f" buckets > max_fanout={max_fanout} at bucket_s={bucket_s}"
                            " — raise bucket_s (≈ p95 interval span), raise"
                            " max_fanout, or pass on_invalid='drop'"
                        ),
                    )
                ).cast("long"),
            )
            .otherwise(sb)
        )
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(sb_checked, eb))
    )
    # DATAFRAME-QUALIFIED refs in the containment filter: unqualified
    # F.col(point_ts) is AMBIGUOUS_REFERENCE whenever both sides carry a
    # column of that name (e.g. intervals derived from the same table
    # still holding its raw ts)
    joined = p.join(iv, [on, "_bucket"]).filter(
        (p[point_ts] >= iv[start_col]) & (p[point_ts] <= iv[end_col])
    )
    return joined.drop("_bucket")


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

    Name-collision validation: the implementation reserves the internal
    columns ``_marker``/``_ets``/``_asof_row``, stores the matched
    timestamp under struct field ``ts``, and emits ``asof_``-prefixed
    outputs — inputs that collide with any of these are rejected up
    front (a duplicate struct field would make getField('ts') resolve
    ambiguously; a clashing output name would be silently overwritten).
    """
    payload = [c for c in right.columns if c not in (on, right_ts)]

    internal = {"_marker", "_ets", "_asof_row"}
    clash = internal & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join: input column(s) {sorted(clash)} collide with "
            "reserved internal names — rename them before joining"
        )
    if right_ts != "ts" and "ts" in payload:
        raise ValueError(
            "asof_join: right has a payload column literally named 'ts' "
            f"while right_ts={right_ts!r}; the matched-timestamp struct "
            "field is also called 'ts' and would be ambiguous — rename "
            "the payload column"
        )
    out_names = {"asof_ts", *(f"asof_{c}" for c in payload)}
    out_clash = out_names & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof_join: left column(s) {sorted(out_clash)} collide with "
            "the asof_-prefixed output columns and would be overwritten — "
            "rename them before joining"
        )

    lhs = left.withColumn("_marker", F.lit(1)).withColumn(
        "_ets", F.col(left_ts)
    )
    # the ENTIRE right row rides as ONE struct: carrying payload columns
    # independently with last(ignorenulls) would resurrect an older row's
    # value wherever the most recent row holds NULL, stitching fields of
    # different right rows together (and mis-judging tolerance on the
    # wrong timestamp) — the matched row must stay atomic
    row_struct = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in payload]
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ets"),
        F.lit(0).alias("_marker"),
        row_struct.alias("_asof_row"),
    )

    combined = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ets", "_marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = combined.withColumn(
        "_asof_row", F.last("_asof_row", ignorenulls=True).over(w)
    ).filter(F.col("_marker") == 1)

    matched = F.col("_asof_row")
    if tolerance_us is not None:
        fresh = (
            F.timestamp_diff("MICROSECOND", matched.getField("ts"), F.col(left_ts))
            <= F.lit(tolerance_us)
        )
        matched = F.when(fresh, matched)
    out = out.withColumns(
        {
            "asof_ts": matched.getField("ts"),
            **{f"asof_{c}": matched.getField(c) for c in payload},
        }
    )
    return out.drop("_marker", "_ets", "_asof_row")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    resolutions: tuple[str, ...] = ("hour", "day"),
    group_cols: tuple[str, ...] = (),
    aggs: dict | None = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: ONE pass emitting a
    row per (resolution, truncated bucket, group) — the multi-resolution
    materialized view TimescaleDB keeps per hypertable.

    Implemented as explode over the per-row (resolution, date_trunc)
    pairs followed by a single partial-aggregated groupBy — Catalyst sees
    one shuffle regardless of how many resolutions roll up, instead of
    one scan+shuffle per resolution unioned. ``aggs`` maps output name →
    Column aggregate; default counts rows.
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("resolution"),
                F.date_trunc(r, F.col(ts_col)).alias("bucket"),
            )
            for r in resolutions
        ]
    )
    exploded = df.withColumn("_rb", F.explode(pairs))
    return (
        exploded.groupBy(
            F.col("_rb.resolution").alias("resolution"),
            F.col("_rb.bucket").alias("bucket"),
            *group_cols,
        )
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )


def burst_detection(
    df: DataFrame,
    key_cols: "tuple[str, ...] | list[str]" = ("event_type",),
    ts_col: str = "ts",
    resolution: str = "day",
    baseline_buckets: int = 7,
    factor: int = 2,
    min_baseline: int = 3,
) -> DataFrame:
    """Bucketed burst/trend detection per key: flag buckets whose count
    exceeds ``factor`` × the trailing-average of the previous
    ``baseline_buckets`` observed buckets.

    The entity-trending pass of a transcript KG — run over mention
    triples keyed by entity it surfaces "this concept suddenly spiked
    this day", the temporal edge family (entity, bursting-on, bucket).

    Shape: ONE shuffle — the (key, bucket) count agg — then a window
    partitioned BY KEY over the per-key bucket series, which is
    bounded by (observed buckets per key), orders of magnitude smaller
    than the input; no single-partition window anywhere. The burst
    predicate is ALL-INTEGER (cnt · n_prev > factor · sum_prev) so the
    flag is bit-identical across engines; the float ratio is emitted
    rounded for reporting only.

    ROWS-based baseline (previous observed buckets, gaps skipped) —
    identical frame semantics in Spark and ANSI SQL, documented choice.
    """
    keys = list(key_cols)
    counts = (
        df.withColumn("_bucket", F.date_trunc(resolution, F.col(ts_col)))
        .groupBy(*keys, "_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(-baseline_buckets, -1)
    )
    out = counts.withColumn("base_sum", F.coalesce(F.sum("cnt").over(w), F.lit(0))).withColumn(
        "base_n", F.count("cnt").over(w)
    )
    is_burst = (F.col("base_n") >= F.lit(min_baseline)) & (
        F.col("cnt") * F.col("base_n") > F.lit(factor) * F.col("base_sum")
    )
    ratio = F.when(
        F.col("base_sum") > 0,
        F.round(
            (F.col("cnt") * F.col("base_n")).cast("double") / F.col("base_sum").cast("double"),
            6,
        ),
    )
    return out.select(
        *keys,
        F.col("_bucket").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("base_sum").cast("long").alias("base_sum"),
        F.col("base_n").cast("long").alias("base_n"),
        is_burst.alias("is_burst"),
        ratio.alias("burst_ratio"),
    )
