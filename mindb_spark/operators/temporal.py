"""Temporal operators: as-of join (point-in-time lookup).

Not in the reference (it has no time axis at all); standard in analytics
engines and named in large-scale pipeline requirements. Implemented
Spark-first with the union + carry-forward-window plan rather than the
naive inequality join:

naive:   left JOIN right ON key AND r.ts <= l.ts, then max(ts) per left row
         — the inequality join fans out to |left| x |right-per-key| rows
         before the aggregate; at 100 TB a skewed key explodes.

here:    union both sides tagged, one shuffle/sort by (key, ts, side),
         ``last(right_value, ignorenulls) OVER (PARTITION BY key ORDER BY
         ts, side ROWS UNBOUNDED PRECEDING)`` carries the most recent
         right-side row forward onto each left row. One shuffle, output
         exactly |left| rows, no fan-out; skew bounded by per-key row
         count, not the pair product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a session breaks when the gap to the previous
    event of the same key exceeds ``gap_seconds``.

    lag + conditional-cumsum over one (key, ts) window — a single shuffle;
    the streaming analog is ``session_window``. Output: input columns plus
    ``session_id`` (0-based per key).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(F.col(ts_col)).over(w)
    )
    is_break = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        (F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session summary: (key, session_id, start/end epoch, n_events)."""
    s = sessionize(events, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.min(F.unix_timestamp(ts_col)).alias("session_start"),
        F.max(F.unix_timestamp(ts_col)).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Join points to containing intervals: ``lo <= point < hi``.

    The naive plan is an inequality join — BroadcastNestedLoopJoin, O(P*I)
    comparisons. Here each interval is exploded into the integer buckets it
    spans and each point into its one bucket; the join becomes an EQUI-join
    on (key?, bucket) followed by the precise containment filter. Work
    scales with interval span / bucket_width (pick ~ the median interval
    length); skewed long intervals fan out proportionally, never
    quadratically. Columns are numeric (cast timestamps with
    ``unix_timestamp`` first).
    """
    if bucket_width is None:
        bucket_width = 3600
    bw = int(bucket_width)
    p_b = points.withColumn("_bkt", F.floor(F.col(point_col) / bw).cast("long"))
    i_b = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor((F.col(hi_col) - 1) / bw).cast("long"),
            )
        ),
    )
    keys = ["_bkt"] if on is None else [on, "_bkt"]
    return (
        p_b.join(i_b, keys)
        .where((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bkt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: tuple = (),
    suffix: str = "_asof",
    strict: bool = False,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) and equal ``on`` key.

    Right columns arrive as ``{name}{suffix}`` plus
    ``{right_time}{suffix}``. Left rows with no prior right row keep nulls
    (left-outer as-of semantics). Equal-timestamp right rows are resolved
    by ``right_tiebreak`` (largest wins) when given — required for
    deterministic output on data with timestamp collisions.
    """
    rcols = list(right_cols)
    if right_tiebreak is not None and right_tiebreak not in rcols:
        rcols.append(right_tiebreak)
    lcols = [c for c in left.columns]
    # all right payload columns travel as ONE struct so the window carries a
    # whole right ROW forward atomically — carrying each column separately
    # with last(ignorenulls) would mix values from different right rows
    # whenever a right column contains nulls
    fields = [*rcols, right_time]

    # side marker orders right rows before left rows at equal timestamps
    # for non-strict (<=) semantics, after for strict (<)
    r_side, l_side = (0, 1) if not strict else (1, 0)

    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(r_side).alias("_side"),
        F.struct(*[F.col(c).alias(f"f{i}") for i, c in enumerate(fields)]).alias("_rs"),
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(l_side).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c != on],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("_t"), F.col("_side")]
    if right_tiebreak is not None:
        # null struct (left rows) sorts first, so it never displaces a right
        # row in the tiebreak order
        tb = f"f{fields.index(right_tiebreak)}"
        order.append(F.col("_rs").getField(tb).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_cf", F.last(F.col("_rs"), ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == l_side).select(
        F.col(on),
        F.col("_t").alias(left_time),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (on, left_time)],
        *[
            F.col("_cf").getField(f"f{i}").alias(f"{c}{suffix}")
            for i, c in enumerate(fields)
        ],
    )
    return out
