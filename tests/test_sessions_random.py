"""Seeded randomized differentials for operators/sessions.py against
DuckDB: gap sessionization (including tied timestamps across shuffled
partitions — the docstring's claim that peer rows share a session
index regardless of engine tie order) and week/month retention-cohort
offsets (date_trunc('week'/'month') parity between the engines)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.sessions import (
    retention_cohorts,
    session_stats,
)

BASE_TS = 1_700_000_000  # fixed epoch anchor, far from any DST edge


def _gen_events(rnd, n_users=12, max_events=14, tie_rate=0.25):
    rows = []
    for u in range(n_users):
        t = BASE_TS + rnd.randrange(0, 3600)
        for _ in range(rnd.randrange(0, max_events)):
            if rows and rows[-1][0] == u and rnd.random() < tie_rate:
                rows.append((u, rows[-1][1]))  # exact tie
            else:
                t += rnd.randrange(1, 7200)  # gaps straddle 30 min
                rows.append((u, t))
    rnd.shuffle(rows)
    return rows


def test_sessionize_randomized_vs_duckdb(spark):
    rnd = random.Random(1234)
    rows = _gen_events(rnd)
    df = (
        spark.createDataFrame(rows, "u int, epoch long")
        .select("u", F.timestamp_seconds("epoch").alias("ts"))
        .repartition(7)
    )
    got = sorted(
        (
            r["u"],
            r["session_idx"],
            r["n_events"],
            r["session_start"].isoformat(),
            r["session_end"].isoformat(),
        )
        for r in session_stats(df, "u", "ts", gap_minutes=30).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT u, to_timestamp(epoch)::timestamp AS ts"
        " FROM (VALUES %s) t(u, epoch)"
        % ",".join(f"({u},{t})" for u, t in rows)
    )
    want = sorted(
        (r[0], r[1], r[2], r[3].isoformat(), r[4].isoformat())
        for r in con.execute(
            """
            WITH s AS (
              SELECT u, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY u ORDER BY ts)
            ),
            x AS (SELECT u, ts,
                         SUM(ns) OVER (PARTITION BY u ORDER BY ts) AS sid
                  FROM s)
            SELECT u, sid, count(*) AS n, min(ts), max(ts)
            FROM x GROUP BY u, sid
            """
        ).fetchall()
    )
    assert got == want and len(got) > 20


@pytest.mark.parametrize("period", ["week", "month"])
def test_retention_cohorts_randomized_vs_duckdb(spark, period):
    rnd = random.Random(4321)
    # days spread across ~5 months so week and month offsets both vary
    rows = [
        (u, f"2024-0{rnd.randrange(1, 6)}-{rnd.randrange(1, 29):02d}")
        for u in range(25)
        for _ in range(rnd.randrange(1, 8))
    ]
    ev = spark.createDataFrame(rows, "user_id int, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    got = sorted(
        (r["cohort"].isoformat(), r["period_offset"], r["n_users"])
        for r in retention_cohorts(ev, period=period).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT user_id, d::timestamp AS ts"
        " FROM (VALUES %s) t(user_id, d)"
        % ",".join(f"({u},'{d}')" for u, d in rows)
    )
    off = (
        "CAST(date_diff('day', cohort, p) // 7 AS INT)"
        if period == "week"
        else "CAST((year(p) - year(cohort)) * 12"
        " + (month(p) - month(cohort)) AS INT)"
    )
    want = sorted(
        (r[0].isoformat(), r[1], r[2])
        for r in con.execute(
            f"""
            WITH up AS (
              SELECT DISTINCT user_id AS u,
                     CAST(date_trunc('{period}', ts) AS DATE) AS p
              FROM e
            ),
            f AS (SELECT u, min(p) AS cohort FROM up GROUP BY u)
            SELECT cohort, {off} AS period_offset, count(*) AS n_users
            FROM up JOIN f USING (u) GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 5
