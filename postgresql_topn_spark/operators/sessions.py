"""Gap-based sessionization over event streams — the standard
behavioral-analytics windowing the reference's host engine would supply
via window functions, expressed as one Catalyst window composition.

Shape (100 TB): one shuffle on the user key serves BOTH window passes
(lag detection and the running session counter share the same
partitioning/ordering, so Catalyst plans a single exchange + sort), and
the per-session summary reuses that partitioning for its hash
aggregate. No Python anywhere; state per user is one row's lag. All
time arithmetic is interval/microsecond-exact (the events fixture has
sub-second timestamps), so ANSI-SQL twins hash-match. Sessionizing a
stream instead of a table is the `applyInPandasWithState` pattern in
streaming/topn_stream.py (or Spark's native ``session_window``), with
identical gap semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col


def sessionize(
    df: DataFrame,
    user: Column | str = "user_id",
    ts: Column | str = "ts",
    *,
    gap_minutes: int = 30,
    out_col: str = "session_idx",
) -> DataFrame:
    """Assign each event a per-user session index: a new session starts
    when the gap to the user's previous event exceeds *gap_minutes*
    (a user's first event is session 1). Adds *out_col* to the input
    columns. Tie timestamps cannot open a gap and the running sum's
    default RANGE frame makes peers share a session index, so the
    result is deterministic even when event order within a timestamp
    is not."""
    w = Window.partitionBy(_col(user)).orderBy(_col(ts))
    prev = F.lag(_col(ts)).over(w)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    new_sess = F.when(
        prev.isNull() | ((_col(ts) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(out_col, F.sum(new_sess).over(w).cast("long"))


def session_stats(
    df: DataFrame,
    user: Column | str = "user_id",
    ts: Column | str = "ts",
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary: (user, session_idx, n_events,
    session_start, session_end, duration_us). The summary aggregate
    groups on the same user key the sessionize windows partitioned by,
    so no additional exchange is planned."""
    s = sessionize(df, user, ts, gap_minutes=gap_minutes)
    uname = user if isinstance(user, str) else df.select(_col(user)).columns[0]
    tname = ts if isinstance(ts, str) else df.select(_col(ts)).columns[0]
    return (
        s.groupBy(uname, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(tname).alias("session_start"),
            F.max(tname).alias("session_end"),
        )
        .withColumn(
            "duration_us",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            ).cast("long"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Classic retention matrix: users grouped into COHORTS by the
    period of their FIRST event; for each (cohort, period-offset), how
    many of the cohort's users were active — the activation/churn view
    every event analytics stack ships next to sessionization.

    Two hash aggregations, both map-side combinable: (1) first period
    per user (min over the user's events), (2) distinct active users
    per (cohort, offset) — computed on the already user-deduped
    (user, period) pairs so the count is exact without a count-distinct
    shuffle of raw events. ``period``: "day" | "week" | "month"
    (date_trunc buckets); offsets are calendar-period differences.

    Returns (cohort date, period_offset int, n_users bigint),
    period_offset >= 0, optionally capped at ``max_offset``."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    up = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), p.alias("__p"))
        .distinct()
    )
    firsts = up.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    joined = up.join(firsts, "__u")
    if period == "day":
        off = F.datediff("__p", "__cohort")
    elif period == "week":
        off = (F.datediff("__p", "__cohort") / 7).cast("int")
    else:
        off = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        )
    out = joined.select(
        F.col("__cohort").alias("cohort"),
        off.cast("int").alias("period_offset"),
        "__u",
    )
    if max_offset is not None:
        out = out.where(F.col("period_offset") <= max_offset)
    return out.groupBy("cohort", "period_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
