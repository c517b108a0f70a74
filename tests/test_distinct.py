"""HLL distinct-count rollup algebra: merge law, accuracy envelope,
re-bucketing equivalence, scalar union."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.distinct import (
    hll_add_agg,
    hll_estimate_col,
    hll_union,
    hll_union_rollup,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 10k rows, 1009 distinct users spread over 12 buckets x 4 groups
    return spark.range(10_000).select(
        (F.col("id") % 12).alias("bucket"),
        (F.col("id") % 4).alias("grp"),
        (F.xxhash64("id") % 1009).alias("user"),
    )


def test_merge_law_union_of_buckets_equals_direct(keyed):
    """Union of per-bucket sketches == one sketch over everything —
    the property that makes rollup tables re-bucketable without raw
    data. HLL union at equal lg_k is lossless, so the estimates are
    EQUAL, not merely close."""
    per_bucket = hll_add_agg(keyed, ["grp", "bucket"], "user")
    merged = hll_union_rollup(per_bucket, ["grp"], "hll")
    direct = hll_add_agg(keyed, ["grp"], "user")

    m = {
        r.grp: r.est
        for r in merged.select(
            "grp", hll_estimate_col("hll").alias("est")
        ).collect()
    }
    d = {
        r.grp: r.est
        for r in direct.select(
            "grp", hll_estimate_col("hll").alias("est")
        ).collect()
    }
    assert m == d


def test_estimate_within_error_envelope(keyed):
    est = hll_add_agg(keyed, [], "user").select(
        hll_estimate_col("hll").alias("est")
    ).first()[0]
    exact = keyed.select("user").distinct().count()
    assert abs(est - exact) <= 0.05 * exact


def test_global_group_and_rebucket_chain(keyed):
    """daily -> monthly -> all-time style chain: two successive rollup
    merges equal the direct global sketch."""
    fine = hll_add_agg(keyed, ["grp", "bucket"], "user")
    mid = hll_union_rollup(fine, ["grp"], "hll")
    top = hll_union_rollup(mid, [], "hll")
    direct = hll_add_agg(keyed, [], "user")
    assert (
        top.select(hll_estimate_col("hll").alias("e")).first()[0]
        == direct.select(hll_estimate_col("hll").alias("e")).first()[0]
    )


def test_scalar_union_matches_rollup(keyed):
    halves = hll_add_agg(keyed, [(F.col("bucket") < 6).alias("half")], "user")
    row = halves.agg(
        F.min_by("hll", "half").alias("a"), F.max_by("hll", "half").alias("b")
    ).select(hll_estimate_col(hll_union("a", "b")).alias("e"))
    direct = hll_add_agg(keyed, [], "user").select(
        hll_estimate_col("hll").alias("e")
    )
    assert row.first()[0] == direct.first()[0]


def test_mixed_lg_k_merges(spark):
    a = spark.range(500).select(F.col("id").alias("u"))
    s1 = hll_add_agg(a, [], "u", lg_k=12).withColumnRenamed("hll", "s")
    s2 = hll_add_agg(a.select((F.col("u") + 250).alias("u")), [], "u", lg_k=14)
    both = s1.crossJoin(s2).select(
        hll_estimate_col(hll_union("s", "hll")).alias("e")
    )
    est = both.first()[0]
    assert abs(est - 750) <= 0.05 * 750
