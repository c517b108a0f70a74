"""KMV distinct-sketch algebra: lossless merge law, exactness below
saturation, estimator accuracy, intersection estimates, skew-path
equivalence."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.kmv import (
    kmv_add_agg,
    kmv_estimate,
    kmv_hash,
    kmv_intersect_estimate,
    kmv_merge,
    kmv_union_rollup,
)

K = 32


@pytest.fixture(scope="module")
def keyed(spark):
    # 10k rows, 997 distinct users spread over 12 buckets x 4 groups
    return spark.range(10_000).select(
        (F.col("id") % 12).alias("bucket"),
        (F.col("id") % 4).alias("grp"),
        ((F.col("id") * 7919) % 997).cast("string").alias("user"),
    )


def test_merge_law_rollup_equals_direct(keyed):
    """Bottom-k is losslessly mergeable: the global k minima are each
    among their bucket's k minima, so the per-bucket rollup equals the
    sketch built directly over the raw union — value-for-value, the
    property the suite oracle leans on."""
    per_bucket = kmv_add_agg(keyed, ["grp", "bucket"], "user", k=K)
    rolled = kmv_union_rollup(per_bucket, ["grp"], "kmv", k=K)
    direct = kmv_add_agg(keyed, ["grp"], "user", k=K)
    r = {row["grp"]: row["kmv"] for row in rolled.collect()}
    d = {row["grp"]: row["kmv"] for row in direct.collect()}
    assert r == d


def test_exact_below_saturation(spark):
    df = spark.range(20).select(
        F.lit(1).alias("g"), F.col("id").cast("string").alias("u")
    )
    sk = kmv_add_agg(df, ["g"], "u", k=K)
    est = sk.select(kmv_estimate("kmv", k=K).alias("e")).collect()[0]["e"]
    assert est == 20.0  # |S| < k => exact


def test_estimator_accuracy_at_saturation(keyed):
    """997 true distincts at k=32: the (k-1)M/h_(k) estimator's RSE is
    ~1/sqrt(k-2) ~= 18%; pin a generous 3-sigma envelope."""
    sk = kmv_add_agg(keyed.select(F.lit(1).alias("g"), "user"), ["g"], "user", k=K)
    est = sk.select(kmv_estimate("kmv", k=K).alias("e")).collect()[0]["e"]
    assert 997 * 0.45 <= est <= 997 * 1.55


def test_intersection_exact_when_unsaturated(spark):
    # A = {0..19}, B = {10..29}: true intersection 10, union 30 < k
    a = spark.range(20).select(F.lit("a").alias("g"), F.col("id").cast("string").alias("u"))
    b = spark.range(10, 30).select(F.lit("b").alias("g"), F.col("id").cast("string").alias("u"))
    sk = kmv_add_agg(a.union(b), ["g"], "u", k=K)
    row = (
        sk.groupBy()
        .pivot("g", ["a", "b"])
        .agg(F.first("kmv"))
        .select(
            kmv_estimate(kmv_merge("a", "b", k=K), k=K).alias("u_est"),
            kmv_intersect_estimate("a", "b", k=K).alias("i_est"),
        )
        .collect()[0]
    )
    assert row["u_est"] == 30.0
    assert row["i_est"] == 10.0


def test_merge_null_tolerant(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("u"))
    sk = kmv_add_agg(df.select(F.lit(1).alias("g"), "u"), ["g"], "u", k=K)
    out = sk.select(
        kmv_estimate(kmv_merge("kmv", F.lit(None).cast("array<bigint>"), k=K), k=K).alias("e")
    ).collect()[0]["e"]
    assert out == 5.0


def test_hash_matches_duckdb_form(spark):
    """The portable md5-60bit hash must equal DuckDB's
    CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) — the oracle
    replay contract."""
    import duckdb

    vals = ["42", "hello", "émoji✓"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", kmv_hash("v").alias("h"))
        .collect()
    }
    for v in vals:
        want = duckdb.sql(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)", params=[v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_rejects_tiny_k(keyed):
    with pytest.raises(ValueError):
        kmv_add_agg(keyed, ["grp"], "user", k=1)


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_merge_law_randomized_all_families(spark, seed):
    """Randomized merge-law sweep shared by the three declarative
    sketch families: for an arbitrary dataset and an arbitrary
    bucketing, per-bucket build + rollup merge must EQUAL the direct
    build (KMV: lossless bottom-k union; CMS: associative addition;
    Bloom: associative OR)."""
    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_union_rollup,
    )
    from postgresql_topn_spark.functions.cms import cms_add_agg, cms_union_rollup

    df = spark.range(3_000).select(
        F.pmod(F.xxhash64(F.col("id") + seed), F.lit(7)).alias("bucket"),
        F.concat(
            F.lit("u"),
            F.pmod(F.xxhash64(F.col("id") * 31 + seed), F.lit(211)),
        ).alias("item"),
    )
    one = df.select(F.lit(1).alias("g"), "item")

    kb = kmv_add_agg(df, ["bucket"], "item", k=24)
    k_roll = kmv_union_rollup(kb, [], "kmv", k=24).collect()[0]["kmv"]
    k_direct = kmv_add_agg(one, ["g"], "item", k=24).collect()[0]["kmv"]
    assert k_roll == k_direct

    cb = cms_add_agg(df, ["bucket"], "item", depth=3, width=32)
    c_roll = cms_union_rollup(cb, [], "cms").collect()[0]["cms"]
    c_direct = cms_add_agg(one, ["g"], "item", depth=3, width=32).collect()[0]["cms"]
    assert c_roll == c_direct

    bb = bloom_add_agg(df, ["bucket"], "item", m_bits=256, depth=3)
    b_roll = bloom_union_rollup(bb, [], "bloom").collect()[0]["bloom"]
    b_direct = bloom_add_agg(one, ["g"], "item", m_bits=256, depth=3).collect()[0]["bloom"]
    assert b_roll == b_direct


def test_window_merge_equals_direct_over_frame(spark):
    """The ROWS-frame fold of daily sketches equals the sketch built
    directly over the frame's raw rows — the lossless merge law under
    a sliding window."""
    from pyspark.sql import Window

    from postgresql_topn_spark.functions.kmv import kmv_union_over_window

    df = spark.range(900).select(
        (F.col("id") % 9).alias("day"),
        ((F.col("id") * 13) % 157).cast("string").alias("u"),
    )
    daily = kmv_add_agg(df, ["day"], "u", k=16)
    w = Window.orderBy("day").rowsBetween(-2, Window.currentRow)
    rolled = {
        r["day"]: list(r["m"])
        for r in daily.select(
            "day", kmv_union_over_window("kmv", w, k=16).alias("m")
        ).collect()
    }
    for d in range(9):
        frame_days = [x for x in range(max(0, d - 2), d + 1)]
        direct = kmv_add_agg(
            df.where(F.col("day").isin(frame_days)).select(
                F.lit(1).alias("g"), "u"
            ),
            ["g"],
            "u",
            k=16,
        ).collect()[0]["kmv"]
        assert rolled[d] == list(direct), d


def test_intersect_estimate_null_side_is_zero(spark):
    """Review pin: a NULL sketch arm is the empty set, so the
    intersection estimate is 0.0, not NULL (left-join rollup shape)."""
    from postgresql_topn_spark.functions.kmv import (
        kmv_add_agg,
        kmv_intersect_estimate,
    )

    df = spark.range(100).select(F.col("id").cast("string").alias("x"))
    sk = kmv_add_agg(df, [], "x", k=16).select(F.col("kmv").alias("b"))
    out = sk.select(
        kmv_intersect_estimate(F.lit(None).cast("array<bigint>"), "b", k=16)
        .alias("ab"),
        kmv_intersect_estimate("b", F.lit(None).cast("array<bigint>"), k=16)
        .alias("ba"),
        kmv_intersect_estimate(
            F.lit(None).cast("array<bigint>"),
            F.lit(None).cast("array<bigint>"),
            k=16,
        ).alias("nn"),
    ).collect()[0]
    assert (out["ab"], out["ba"], out["nn"]) == (0.0, 0.0, 0.0)


def test_estimate_rejects_oversized_sketch(spark):
    """Review pin: reading a sketch with a SMALLER k than it was built
    with silently took the wrong k-th order statistic; it now raises."""
    import pytest

    from postgresql_topn_spark.functions.kmv import kmv_add_agg, kmv_estimate

    df = spark.range(200).select(F.col("id").cast("string").alias("x"))
    sk = kmv_add_agg(df, [], "x", k=64)
    with pytest.raises(Exception, match="larger k"):
        sk.select(kmv_estimate("kmv", k=16)).collect()
