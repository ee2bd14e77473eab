"""Event-analytics operators: sequential funnels and retention cohorts.

Standard product-analytics passes over an event stream (the shapes a
warehouse team runs daily at petabyte scale), expressed as declarative
aggregation/join plans so Catalyst handles pushdown and AQE handles skew.

Scale notes
-----------
- ``funnel_counts`` is K-1 user-key equi-joins for a K-step funnel, each
  against a per-user single-row aggregate. Each stage is eagerly
  checkpointed — per-stage state is one (user, ts) row, never the raw
  events — so the event source is scanned once per step (K scans), not
  re-derived per downstream consumer (O(K^2); Spark does not reuse plan
  subtrees across separate count branches).
- ``retention_cohorts`` reduces events to distinct (user, day) first —
  the shuffle is bounded by active user-days, not events — then joins the
  per-user cohort day (a per-user aggregate, broadcastable when the user
  dimension is small relative to activity).
- All day arithmetic is integer epoch-day (``floor(epoch_us / 86.4e9)``),
  deliberately timezone-free and bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    materialize: bool = True,
) -> DataFrame:
    """Strict-order funnel: a user converts step ``i`` when an event of
    ``steps[i]`` occurs STRICTLY AFTER their step ``i-1`` conversion time
    (first qualifying event wins each step).

    Returns one row per step: (step_no, step, n_users) where ``n_users``
    is how many users reached that step — the classic funnel table.

    ``materialize`` (default) eagerly checkpoints each stage so the event
    source is scanned once per step; checkpointed partitions live on
    executor storage (lineage truncated — rerun the funnel on executor
    loss). ``materialize=False`` returns the fully lazy plan — composable
    and fault-tolerant, but each step's count re-derives all prior stages
    (O(K^2) source scans).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        # cast is a no-op for TimestampType (read_events' contract); NTZ
        # wall-clock resolves via the session tz — callers pin UTC
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    # stage 0: first occurrence of the entry event per user
    # stage frames are one (user, ts) row per converted user — tiny next
    # to the events source; see the materialize note in the docstring
    def _stage(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if materialize else df

    reached = _stage(
        ev.where(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_at"))
    )
    counts = [(0, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = _stage(
            ev.where(F.col("_t") == step)
            .join(reached.select("_u", F.col("_at").alias("_prev")), "_u")
            .where(F.col("_us") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_us").alias("_at"))
        )
        counts.append((i, step, nxt))
        reached = nxt
    out = None
    for i, step, df in counts:
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step_no"), F.lit(step).alias("step"), "n_users"
        )
        out = row if out is None else out.unionAll(row)
    return out


def retention_cohorts(
    events: DataFrame,
    max_offset_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort-retention table: users grouped by first-seen epoch day,
    counted on each later activity day.

    Returns (cohort_day, day_offset, n_users): epoch-day of the cohort,
    whole days since first seen (0 = the cohort day itself), and how many
    of that cohort's users were active on that offset.
    """
    days = events.select(
        F.col(user_col).alias("_u"),
        # integer epoch-day: `div` is integer division (all-positive epochs)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    ).select(
        "_u", F.expr(f"_us div {US_PER_DAY}").cast("long").alias("_day")
    ).distinct()
    cohort = days.groupBy("_u").agg(F.min("_day").alias("cohort_day"))
    return (
        days.join(cohort, "_u")
        .withColumn("day_offset", (F.col("_day") - F.col("cohort_day")).cast("int"))
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )
