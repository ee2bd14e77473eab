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

    # side marker orders right rows before left rows at equal timestamps
    # for non-strict (<=) semantics, after for strict (<)
    r_side, l_side = (0, 1) if not strict else (1, 0)

    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(r_side).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(right_time).alias(f"_r_{right_time}"),
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
        order.append(F.col(f"_r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_cf_{c}")
            for c in [*rcols, right_time]
        ],
    )
    out = carried.where(F.col("_side") == l_side).select(
        F.col(on),
        F.col("_t").alias(left_time),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (on, left_time)],
        *[F.col(f"_cf_{c}").alias(f"{c}{suffix}") for c in [*rcols, right_time]],
    )
    return out
