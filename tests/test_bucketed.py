"""Bucketed tables: co-located joins and aggregations must plan with
ZERO exchanges — the write-once-shuffle-never layout contract."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.plans.audit import hash_shuffles, plan_str
from postgresql_topn_spark.sources.bucketed import (
    read_bucketed_table,
    write_bucketed_table,
)
from postgresql_topn_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "t_orders_b", ["o_orderkey"], n_buckets=8,
        path=str(base / "orders"),
    )
    write_bucketed_table(
        li, "t_lineitem_b", ["l_orderkey"], n_buckets=8,
        path=str(base / "lineitem"),
    )
    yield ("t_orders_b", "t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_colocated_join_zero_exchanges(spark, bucketed):
    ot, lt = bucketed
    o = read_bucketed_table(spark, ot)
    li = read_bucketed_table(spark, lt)
    # force the sort-merge path (the broadcast fallback at test SF would
    # make the zero-exchange assertion vacuous)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            "o_orderkey", "l_partkey", "o_totalprice"
        )
        p = plan_str(j, "simple")
        assert "SortMergeJoin" in p, p
        assert hash_shuffles(j) == 0, p
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_groupby_on_bucket_key_zero_exchanges(spark, bucketed):
    _, lt = bucketed
    li = read_bucketed_table(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert hash_shuffles(agg) == 0
    assert agg.count() > 0


def test_mismatched_side_reshuffles_only_itself(spark, sf_dir, bucketed):
    ot, _ = bucketed
    o = read_bucketed_table(spark, ot)
    li_plain = load_table(spark, sf_dir, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li_plain, o["o_orderkey"] == li_plain["l_orderkey"]).select(
            "o_orderkey", "l_partkey"
        )
        # only the non-bucketed side exchanges
        assert hash_shuffles(j) == 1, plan_str(j, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_join_result_matches_plain(spark, sf_dir, bucketed):
    ot, lt = bucketed
    o = read_bucketed_table(spark, ot)
    li = read_bucketed_table(spark, lt)
    got = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    po = load_table(spark, sf_dir, "orders")
    pl = load_table(spark, sf_dir, "lineitem")
    want = (
        po.join(pl, po["o_orderkey"] == pl["l_orderkey"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    assert got == want


def test_rejects_bad_params(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        write_bucketed_table(li, "t_x", ["l_orderkey"], n_buckets=0)
    with pytest.raises(ValueError):
        write_bucketed_table(li, "t_x", [])
