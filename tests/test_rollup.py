"""Rollup-table pattern: partitioned persistence, partition pruning on
interval reads, append-incremental equivalence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgresql_topn_spark.functions.aggregates import topn_add_agg
from postgresql_topn_spark.sources.rollup import (
    query_topn_rollup,
    read_topn_rollup,
    write_topn_rollup,
)
from postgresql_topn_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
C = 1_000_000


def _expected_week(spark, lo, hi):
    ev = load_table(spark, SF_DIR, "events").where(
        F.to_date("ts").between(F.lit(lo), F.lit(hi))
    )
    sk = topn_add_agg(ev, [F.lit(1).alias("g")], "event_type", counters=C)
    return {k: v for r in sk.collect() for k, v in r["topn"].items()}


def test_rollup_roundtrip_and_interval_query(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "rollup")
    write_topn_rollup(
        ev, path, F.to_date("ts"), "event_type", bucket_name="day", counters=C
    )
    rollup = read_topn_rollup(spark, path, bucket_name="day")
    lo, hi = "2024-01-08", "2024-01-14"
    week = rollup.where(F.col("day").between(F.lit(lo), F.lit(hi)))
    merged = query_topn_rollup(
        week.withColumn("g", F.lit(1)), ["g"], counters=C
    )
    got = {k: v for r in merged.collect() for k, v in r["topn"].items()}
    assert got == _expected_week(spark, lo, hi)
    # the day filter must prune partitions, not scan + filter
    plan = week._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day#" in plan.split("PartitionFilters")[1][:200]


def test_rollup_append_equivalence(spark, tmp_path):
    """Appending per-half sketch rows then merging == aggregating all at
    once (associativity of sketch deltas, no eviction)."""
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "rollup_inc")
    first = ev.where(F.dayofmonth("ts") <= 15)
    second = ev.where(F.dayofmonth("ts") > 15)
    write_topn_rollup(
        first, path, F.to_date("ts"), "event_type", bucket_name="day", counters=C
    )
    write_topn_rollup(
        second, path, F.to_date("ts"), "event_type", bucket_name="day",
        counters=C, mode="append",
    )
    rollup = read_topn_rollup(spark, path, bucket_name="day")
    merged = query_topn_rollup(
        rollup.withColumn("g", F.lit(1)), ["g"], counters=C
    )
    got = {k: v for r in merged.collect() for k, v in r["topn"].items()}
    full = topn_add_agg(ev, [F.lit(1).alias("g")], "event_type", counters=C)
    want = {k: v for r in full.collect() for k, v in r["topn"].items()}
    assert got == want


def test_rollup_custom_bucket_name(spark, tmp_path):
    """bucket_name round-trips: write with a non-default name, read it
    back by the same name; a wrong name fails at load with a clear
    error."""
    import pytest

    from postgresql_topn_spark.sources.rollup import (
        read_topn_rollup,
        write_topn_rollup,
    )

    df = spark.createDataFrame(
        [("2024-01-01", "a"), ("2024-01-01", "b"), ("2024-01-02", "a")],
        "d string, item string",
    )
    path = str(tmp_path / "ru")
    write_topn_rollup(df, path, "d", "item", bucket_name="review_date")
    back = read_topn_rollup(spark, path, bucket_name="review_date")
    assert "review_date" in back.columns
    # partition-column inference types the bucket (date here) — key by str
    got = {str(r["review_date"]): r["topn"] for r in back.collect()}
    assert got["2024-01-01"] == {"a": 1, "b": 1}
    assert got["2024-01-02"] == {"a": 1}
    with pytest.raises(ValueError, match="no bucket column"):
        read_topn_rollup(spark, path, bucket_name="bucket")


def test_generic_sketch_rollup_kmv_pruned_interval_reads(spark, sf_dir, tmp_path):
    """KMV rollup rows written partitioned by month: an interval read
    plans PartitionFilters (only the interval's files are touched) and
    the interval merge equals a direct build over the interval's raw
    rows (the KMV merge law)."""
    from pyspark.sql import functions as F

    from postgresql_topn_spark.functions.kmv import kmv_add_agg, kmv_union_rollup
    from postgresql_topn_spark.sources.rollup import (
        read_sketch_rollup,
        write_sketch_rollup,
    )
    from postgresql_topn_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    monthly = kmv_add_agg(
        ev,
        [F.date_format("ts", "yyyy-MM").alias("mon"), "event_type"],
        F.col("user_id").cast("string"),
        k=32,
    )
    path = str(tmp_path / "kmv_rollup")
    write_sketch_rollup(monthly, path, ["mon"])

    rollup = read_sketch_rollup(spark, path, ["mon"])
    interval = rollup.where(F.col("mon") <= "2024-03")
    plan = interval._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "mon" in plan.split("PartitionFilters", 1)[1][:120]

    merged = kmv_union_rollup(interval, ["event_type"], "kmv", k=32)
    direct = kmv_add_agg(
        ev.where(F.date_format("ts", "yyyy-MM") <= "2024-03"),
        ["event_type"],
        F.col("user_id").cast("string"),
        k=32,
    )
    got = {r["event_type"]: list(r["kmv"]) for r in merged.collect()}
    want = {r["event_type"]: list(r["kmv"]) for r in direct.collect()}
    assert got == want and len(got) > 0


def test_generic_sketch_rollup_validates_grain(spark, tmp_path):
    import pytest as _pytest

    from postgresql_topn_spark.sources.rollup import (
        read_sketch_rollup,
        write_sketch_rollup,
    )

    df = spark.createDataFrame([(1, "a", [1, 2])], "day int, g string, kmv array<bigint>")
    path = str(tmp_path / "r")
    write_sketch_rollup(df, path, ["day"])
    with _pytest.raises(ValueError, match="lacks partition columns"):
        read_sketch_rollup(spark, path, ["week"])
    with _pytest.raises(ValueError):
        write_sketch_rollup(df, path, [])
