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


# --- KLL quantile rollups --------------------------------------------------


def test_kll_rollup_preserves_n_and_rank_envelope(spark):
    from postgresql_topn_spark.functions.quantiles import (
        kll_add_agg,
        kll_n,
        kll_quantile,
        kll_union_rollup,
    )

    df = spark.range(50_000).select(
        (F.col("id") % 10).alias("bucket"),
        (F.xxhash64("id") % 100_000).cast("double").alias("v"),
    )
    fine = kll_add_agg(df, ["bucket"], "v")
    merged = kll_union_rollup(fine, [], "kll")
    row = merged.select(
        kll_n("kll").alias("n"),
        kll_quantile("kll", 0.5).alias("med"),
        kll_quantile("kll", 0.99).alias("p99"),
    ).first()
    assert row.n == 50_000  # n is lossless through build AND merge
    exact_med_rank = df.where(F.col("v") <= row.med).count() / 50_000
    exact_p99_rank = df.where(F.col("v") <= row.p99).count() / 50_000
    assert abs(exact_med_rank - 0.5) <= 0.05
    assert abs(exact_p99_rank - 0.99) <= 0.02
    # quantiles are monotone
    assert row.med <= row.p99


def test_kll_scalar_merge_matches_rollup_n(spark):
    from postgresql_topn_spark.functions.quantiles import (
        kll_add_agg,
        kll_merge,
        kll_n,
    )

    df = spark.range(1000).select(
        (F.col("id") < 500).alias("half"), F.col("id").cast("double").alias("v")
    )
    halves = kll_add_agg(df, ["half"], "v")
    row = halves.agg(
        F.min_by("kll", "half").alias("a"), F.max_by("kll", "half").alias("b")
    ).select(kll_n(kll_merge("a", "b")).alias("n")).first()
    assert row.n == 1000


def test_kll_single_bucket_rollup_identity(spark):
    from postgresql_topn_spark.functions.quantiles import (
        kll_add_agg,
        kll_n,
        kll_union_rollup,
    )

    df = spark.range(100).select(F.lit(1).alias("g"), F.col("id").cast("double").alias("v"))
    fine = kll_add_agg(df, ["g"], "v")
    # single sub-sketch: the fold's init IS the result (empty slice)
    merged = kll_union_rollup(fine, [], "kll")
    assert merged.select(kll_n("kll")).first()[0] == 100


# --- native approx_top_k bridge -------------------------------------------


def test_native_topk_exact_regime_and_sketch_bridge(spark):
    from postgresql_topn_spark.functions.native_topk import (
        accumulate,
        combine,
        estimate_entries,
        sketch_from_native,
    )
    from postgresql_topn_spark.functions.sketch import topn_entries

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("item"), (F.col("id") % 7)).alias("it"),
    )
    states = df.groupBy("g", (F.col("g") * 0).alias("sub")).agg(
        accumulate("it", 1000).alias("st")
    )
    merged = states.groupBy("g").agg(combine("st", 1000).alias("cst"))
    est = merged.select("g", estimate_entries("cst", 1000).alias("e"))
    # exact regime: counts equal groupBy().count()
    got = {
        (r.g, x["item"]): x["count"] for r in est.collect() for x in r.e
    }
    exact = {
        (r.g, r.it): r.cnt
        for r in df.groupBy("g", "it").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exact
    # bridge into the repo sketch algebra: map form ranks identically
    sk = est.select("g", sketch_from_native("e").alias("topn"))
    ent = sk.select("g", topn_entries("topn", 2).alias("t")).collect()
    for r in ent:
        freqs = [e["frequency"] for e in r.t]
        assert freqs == sorted(freqs, reverse=True) and len(r.t) == 2


def test_hll_union_null_tolerant(spark):
    """Review pin: a NULL side acts as the empty sketch, like every
    sibling scalar merge (the native hll_union propagates NULL)."""
    from postgresql_topn_spark.functions.distinct import (
        hll_add_agg,
        hll_estimate_col,
        hll_union,
    )

    df = spark.range(100).select(F.col("id").cast("string").alias("x"))
    sk = hll_add_agg(df, [], "x").select(F.col("hll").alias("b"))
    out = sk.select(
        hll_estimate_col(
            hll_union(F.lit(None).cast("binary"), "b")
        ).alias("nb"),
        hll_estimate_col(
            hll_union("b", F.lit(None).cast("binary"))
        ).alias("bn"),
    ).collect()[0]
    assert abs(out["nb"] - 100) <= 5 and abs(out["bn"] - 100) <= 5


def test_kll_merge_null_tolerant(spark):
    """Review pin: kll_merge treats a NULL side as the empty sketch,
    like every sibling scalar merge."""
    from postgresql_topn_spark.functions.quantiles import (
        kll_add_agg,
        kll_merge,
        kll_n,
        kll_quantile,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    sk = kll_add_agg(df, [], "v").select(F.col("kll").alias("b"))
    out = sk.select(
        kll_n(kll_merge(F.lit(None).cast("binary"), "b")).alias("n"),
        kll_quantile(kll_merge("b", F.lit(None).cast("binary")), 0.5).alias(
            "med"
        ),
    ).collect()[0]
    assert out["n"] == 100 and 30 <= out["med"] <= 70
