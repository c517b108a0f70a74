"""The declared query suite: every implemented operator from SURVEY.md §2
as a (spark, sf_dir) -> DataFrame callable plus its ANSI-SQL DuckDB oracle.

Correctness contract (BASELINE.md): each Spark query and its oracle must
agree on row count, schema and order-insensitive value hash at sf0.01.
We run Tier-1 (exact) with a large counter budget so the oracle can be
plain COUNT/ROW_NUMBER SQL — the regime where the reference itself is
exact (SURVEY.md §5). Column names are aliased identically on both sides.
Ties are broken (frequency DESC, item ASC) on both sides — our pinned
deterministic deviation from the reference's unstable qsort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.aggregates import (
    topn_add_agg,
    topn_union_agg,
    topn_union_agg_global,
    topn_union_over_window,
)
from postgresql_topn_spark.functions.sketch import (
    explode_topn,
    topn_add,
    topn_union,
)
from postgresql_topn_spark.sources.tables import load_table

# Large budget => no eviction => exact results, hash-matchable vs DuckDB.
C = 1_000_000

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Core topn surface (reference parity; SURVEY.md §2.1)
# ---------------------------------------------------------------------------


@_register(
    "topn_monthly_event_types",
    """
    SELECT yr, mon, item, frequency FROM (
      SELECT CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mon,
             event_type AS item, COUNT(event_type) AS frequency,
             ROW_NUMBER() OVER (PARTITION BY year(ts), month(ts)
                                ORDER BY COUNT(event_type) DESC, event_type ASC) AS rn
      FROM events WHERE event_type IS NOT NULL
      GROUP BY year(ts), month(ts), event_type
    ) t WHERE rn <= 3
    """,
)
def topn_monthly_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topn_add_agg + topn() extraction per month — the README.md:84-96
    rollup/extract pattern on the events stream table."""
    ev = load_table(spark, sf_dir, "events")
    sk = topn_add_agg(
        ev,
        [F.year("ts").alias("yr"), F.month("ts").alias("mon")],
        "event_type",
        counters=C,
    )
    return explode_topn(sk, "topn", 3, keep=["yr", "mon"], counters=C)


@_register(
    "topn_overall_products",
    """
    SELECT item, frequency FROM (
      SELECT CAST(l_partkey AS VARCHAR) AS item, COUNT(*) AS frequency,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, CAST(l_partkey AS VARCHAR) ASC) AS rn
      FROM lineitem GROUP BY CAST(l_partkey AS VARCHAR)
    ) t WHERE rn <= 10
    """,
)
def topn_overall_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline (sql/customer_reviews_query.sql:12-40): build
    per-month sketches, union-merge them all, extract the global top-10.
    Exercises topn_add_agg -> topn_union_agg -> topn."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = topn_add_agg(
        li,
        [F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mon")],
        "l_partkey",
        counters=C,
    )
    overall = topn_union_agg_global(monthly, "topn", counters=C)
    return explode_topn(overall, "topn", 10, counters=C)


@_register(
    "topn_add_scalar",
    """
    WITH base AS (
      SELECT l_returnflag, l_linestatus AS item, COUNT(l_linestatus) AS frequency
      FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY 1, 2
    )
    SELECT l_returnflag, item, frequency FROM base
    UNION ALL
    SELECT DISTINCT l_returnflag, 'NEWITEM' AS item, CAST(1 AS BIGINT) AS frequency
    FROM lineitem
    """,
)
def topn_add_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar topn_add (topn.c:290-356): point-insert a new item into
    aggregate-built sketches, then extract all entries."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = topn_add_agg(li, ["l_returnflag"], "l_linestatus", counters=C)
    added = sk.select(
        "l_returnflag", topn_add("topn", F.lit("NEWITEM"), counters=C).alias("topn")
    )
    return explode_topn(added, "topn", 100, keep=["l_returnflag"], counters=C)


@_register(
    "topn_union_scalar",
    """
    WITH u AS (
      SELECT l_returnflag, l_linestatus AS item FROM lineitem
      WHERE l_linestatus IS NOT NULL
      UNION ALL
      SELECT l_returnflag, CAST(year(l_shipdate) AS VARCHAR) AS item FROM lineitem
      WHERE l_shipdate IS NOT NULL
    )
    SELECT l_returnflag, item, COUNT(*) AS frequency FROM u GROUP BY 1, 2
    """,
)
def topn_union_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar topn_union / the `+` operator (topn.c:363-385): merge two
    sketches with disjoint key domains, saturating sums."""
    li = load_table(spark, sf_dir, "lineitem")
    a = topn_add_agg(li, ["l_returnflag"], "l_linestatus", counters=C, out_col="ta")
    b = topn_add_agg(
        li, ["l_returnflag"], F.year("l_shipdate"), counters=C, out_col="tb"
    )
    j = a.join(b, "l_returnflag").select(
        "l_returnflag", topn_union("ta", "tb", counters=C).alias("t")
    )
    return explode_topn(j, "t", 100, keep=["l_returnflag"], counters=C)


@_register(
    "topn_union_agg_monthly",
    """
    SELECT yr, mon, item, frequency FROM (
      SELECT CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mon,
             event_type AS item, COUNT(event_type) AS frequency,
             ROW_NUMBER() OVER (PARTITION BY year(ts), month(ts)
                                ORDER BY COUNT(event_type) DESC, event_type ASC) AS rn
      FROM events WHERE event_type IS NOT NULL
      GROUP BY year(ts), month(ts), event_type
    ) t WHERE rn <= 5
    """,
)
def topn_union_agg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topn_union_agg (topn.c:457-503): per-day sketches re-merged into
    per-month sketches — the incremental-rollup pattern README.md:100-116."""
    ev = load_table(spark, sf_dir, "events")
    daily = topn_add_agg(
        ev,
        [
            F.year("ts").alias("yr"),
            F.month("ts").alias("mon"),
            F.dayofmonth("ts").alias("dom"),
        ],
        "event_type",
        counters=C,
    )
    monthly = topn_union_agg(daily, ["yr", "mon"], "topn", counters=C)
    return explode_topn(monthly, "topn", 5, keep=["yr", "mon"], counters=C)


@_register(
    "topn_window_7d",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, event_type AS item,
             COUNT(event_type) AS c
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    days AS (
      SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk
      FROM (SELECT DISTINCT day FROM daily)
    ),
    win AS (
      SELECT d2.day, daily.item, SUM(daily.c) AS frequency
      FROM days d2
      JOIN days d1 ON d1.rk BETWEEN d2.rk - 6 AND d2.rk
      JOIN daily ON daily.day = d1.day
      GROUP BY 1, 2
    )
    SELECT day, item, CAST(frequency AS BIGINT) AS frequency FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY frequency DESC, item ASC) AS rn
      FROM win
    ) t WHERE rn <= 2
    """,
)
def topn_window_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding-frame union (sql/customer_reviews_query.sql:59-68,
    ROWS 6 PRECEDING): 7-row trailing merge of daily sketches. The frame
    is over rollup rows (days present), matching the reference's ROWS
    frame semantics."""
    ev = load_table(spark, sf_dir, "events")
    daily = topn_add_agg(
        ev,
        [F.date_trunc("day", F.col("ts")).cast("date").alias("day")],
        "event_type",
        counters=C,
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    merged = daily.select(
        "day", topn_union_over_window("topn", w, counters=C).alias("t")
    )
    return explode_topn(merged, "t", 2, keep=["day"], counters=C)


@_register(
    "topn_join",
    """
    WITH sup AS (
      SELECT l_returnflag, item AS supp_item, frequency AS supp_freq FROM (
        SELECT l_returnflag, CAST(l_suppkey AS VARCHAR) AS item, COUNT(*) AS frequency,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, CAST(l_suppkey AS VARCHAR) ASC) AS rn
        FROM lineitem GROUP BY 1, 2
      ) t WHERE rn <= 3
    ),
    par AS (
      SELECT l_returnflag, item AS part_item, frequency AS part_freq FROM (
        SELECT l_returnflag, CAST(l_partkey AS VARCHAR) AS item, COUNT(*) AS frequency,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, CAST(l_partkey AS VARCHAR) ASC) AS rn
        FROM lineitem GROUP BY 1, 2
      ) t WHERE rn <= 3
    )
    SELECT sup.l_returnflag, supp_item, supp_freq, part_item, part_freq
    FROM sup JOIN par ON sup.l_returnflag = par.l_returnflag
    """,
)
def topn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join of two topn-derived subqueries (sql/join_tests.sql:2-25)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = topn_add_agg(li, ["l_returnflag"], "l_suppkey", counters=C)
    par = topn_add_agg(li, ["l_returnflag"], "l_partkey", counters=C)
    es = (
        explode_topn(sup, "topn", 3, keep=["l_returnflag"], counters=C)
        .withColumnRenamed("item", "supp_item")
        .withColumnRenamed("frequency", "supp_freq")
    )
    ep = (
        explode_topn(par, "topn", 3, keep=["l_returnflag"], counters=C)
        .withColumnRenamed("item", "part_item")
        .withColumnRenamed("frequency", "part_freq")
    )
    return es.join(ep, "l_returnflag")


@_register(
    "topn_json_props",
    """
    SELECT event_type, item, frequency FROM (
      SELECT event_type, json_extract_string(props, '$.k') AS item,
             COUNT(json_extract_string(props, '$.k')) AS frequency,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY COUNT(json_extract_string(props, '$.k')) DESC,
                                         json_extract_string(props, '$.k') ASC) AS rn
      FROM events
      WHERE event_type IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY event_type, json_extract_string(props, '$.k')
    ) t WHERE rn <= 5
    """,
)
def topn_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topn over a JSON field — the jsonb-composition surface
    (sql/union_agg.sql:42 uses jsonb_each; here we aggregate a JSON
    attribute into sketches)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    ev = ev.withColumn("k", F.get_json_object("props", "$.k"))
    sk = topn_add_agg(ev, ["event_type"], "k", counters=C)
    return explode_topn(sk, "topn", 5, keep=["event_type"], counters=C)


def entry_flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: the flagship pipeline at sf0.001."""
    return topn_overall_products(spark, "/root/testdata/sf0.001")
