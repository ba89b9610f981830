"""Funnel and cohort analytics — event-sequence operators over the
append-only event stream (the Spark-native generalization of the
reference's client-side per-symbol stat recomputation, static/main.js
935-988, to user-behavior analytics the engine surface should offer).

Both operators are single-scan, map-side-combinable aggregations:
no self-joins, no windows over the full table, no driver loops — the
shapes that survive a 100 TB event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_first_touch(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch ordered funnel: a user reaches step k iff their
    FIRST occurrence of each step type is strictly later than the
    first occurrence of the previous step (min-ts chain
    m_0 < m_1 < ... < m_k).

    One groupBy(user) computes all per-step min timestamps as
    conditional aggregates (map-side combinable — the shuffle carries
    |users| x |steps| timestamps, nothing else), then a global
    aggregate counts reach per step. Output: (step_idx, step, users),
    one row per funnel step.
    """
    k = len(steps)
    mins = df.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"m{i}")
            for i, s in enumerate(steps)
        ]
    )
    reach = None
    counters = []
    for i in range(k):
        cond = F.col(f"m{i}").isNotNull()
        if i > 0:
            cond = reach & cond & (F.col(f"m{i}") > F.col(f"m{i-1}"))
        reach = cond
        counters.append(F.sum(cond.cast("long")).alias(f"u{i}"))
    totals = mins.agg(*counters)
    # unpivot via explode(array(struct(...))) with lit() columns — step
    # names are data-dependent config and must never be interpolated
    # into an F.expr string (quote injection)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"u{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return totals.select(F.explode(rows).alias("__r")).select(
        "__r.step_idx", "__r.step", "__r.users"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their first event (period index = floor(days since ``epoch`` /
    ``period_days``)); for each (cohort, offset) count the distinct
    users from that cohort active ``offset`` periods later.

    Two shuffles, both on user_id (co-partitioned): the first-event
    aggregate, then the activity join back to events; the final
    count-distinct reduces over the (cohort, offset) pairs. The
    user->cohort side is |users| rows — broadcast-able when small,
    shuffle-join co-located on user_id otherwise (Spark picks via AQE;
    no hint needed).
    """
    period = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit(epoch))) / period_days
    )
    activity = df.select(F.col(user_col).alias("u"), period.alias("p")).distinct()
    first = activity.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        activity.join(first, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("week_offset"))
        .agg(F.count_distinct("u").alias("users"))
    )
