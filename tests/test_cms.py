"""Count-Min sketch algebra: exact merge law, one-sided error
guarantee, forced-collision overcount, NULL discipline."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.cms import (
    cms_add_agg,
    cms_estimate,
    cms_merge,
    cms_union_rollup,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 5000 rows over 50 items with a skewed head, 10 buckets
    return spark.range(5_000).select(
        (F.col("id") % 10).alias("bucket"),
        F.concat(F.lit("item"), (F.col("id") % 50) % ((F.col("id") % 7) + 3))
        .alias("item"),
    )


def test_merge_law_rollup_equals_direct(keyed):
    per_bucket = cms_add_agg(keyed, ["bucket"], "item", depth=4, width=64)
    rolled = cms_union_rollup(per_bucket, [], "cms").collect()[0]["cms"]
    direct = cms_add_agg(
        keyed.select(F.lit(1).alias("g"), "item"), ["g"], "item",
        depth=4, width=64,
    ).collect()[0]["cms"]
    assert rolled == direct  # addition is associative: exact, not approx


def test_estimate_never_undercounts(spark, keyed):
    sk = cms_add_agg(
        keyed.select(F.lit(1).alias("g"), "item"), ["g"], "item",
        depth=4, width=64,
    )
    exact = {
        r["item"]: r["c"]
        for r in keyed.groupBy("item").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    items = spark.createDataFrame([(i,) for i in exact], "item string")
    ests = {
        r["item"]: r["e"]
        for r in items.crossJoin(F.broadcast(sk))
        .select("item", cms_estimate("cms", "item", depth=4, width=64).alias("e"))
        .collect()
    }
    total = sum(exact.values())
    for it, ex in exact.items():
        assert ests[it] >= ex, it
        # e/width envelope with huge slack (3x)
        assert ests[it] <= ex + 3 * (2.72 / 64) * total, it


def test_forced_collisions_overcount(spark):
    # width=2: 20 distinct items over 2 slots per row MUST collide
    df = spark.range(200).select(
        F.lit(1).alias("g"),
        F.concat(F.lit("x"), (F.col("id") % 20)).alias("item"),
    )
    sk = cms_add_agg(df, ["g"], "item", depth=2, width=2)
    est = sk.select(
        cms_estimate("cms", F.lit("x0"), depth=2, width=2).alias("e")
    ).collect()[0]["e"]
    assert est > 10  # true count is 10; collisions inflate it


def test_null_items_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "a")], "g int, item string"
    )
    sk = cms_add_agg(df, ["g"], "item", depth=4, width=8)
    row = sk.select(
        cms_estimate("cms", F.lit("a"), depth=4, width=8).alias("e"),
        F.aggregate("cms", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "mass"
        ),
    ).collect()[0]
    assert row["e"] == 2
    assert row["mass"] == 2 * 4  # only the two non-NULL adds, once per row hash


def test_scalar_merge_null_tolerant(spark):
    df = spark.createDataFrame([(1, "a")], "g int, item string")
    sk = cms_add_agg(df, ["g"], "item", depth=2, width=4)
    out = sk.select(
        cms_estimate(
            cms_merge("cms", F.lit(None).cast("array<bigint>")),
            F.lit("a"),
            depth=2,
            width=4,
        ).alias("e")
    ).collect()[0]["e"]
    assert out == 1


def test_rejects_bad_shape(keyed):
    with pytest.raises(ValueError):
        cms_add_agg(keyed, ["bucket"], "item", depth=0)
    with pytest.raises(ValueError):
        cms_add_agg(keyed, ["bucket"], "item", width=1)


def test_window_merge_equals_direct_over_frame(spark):
    """The ROWS-frame element-wise-add fold of daily sketches equals
    the sketch built directly over the frame's raw rows (addition is
    associative) — the sliding-window form of the merge law."""
    from pyspark.sql import Window

    from postgresql_topn_spark.functions.cms import cms_union_over_window

    df = spark.range(600).select(
        (F.col("id") % 6).alias("day"),
        F.concat(F.lit("x"), (F.col("id") % 23)).alias("item"),
    )
    daily = cms_add_agg(df, ["day"], "item", depth=3, width=16)
    w = Window.orderBy("day").rowsBetween(-2, Window.currentRow)
    rolled = {
        r["day"]: list(r["m"])
        for r in daily.select(
            "day", cms_union_over_window("cms", w).alias("m")
        ).collect()
    }
    for d in range(6):
        frame_days = list(range(max(0, d - 2), d + 1))
        direct = cms_add_agg(
            df.where(F.col("day").isin(frame_days)).select(
                F.lit(1).alias("g"), "item"
            ),
            ["g"],
            "item",
            depth=3,
            width=16,
        ).collect()[0]["cms"]
        assert rolled[d] == list(direct), d


def test_merge_and_estimate_reject_shape_mismatch(spark):
    """Review pin: merging or probing sketches of different depth/width
    silently corrupted counts (zip_with NULL padding / wrong cells,
    which can UNDER-estimate); both now raise."""
    import pytest

    from postgresql_topn_spark.functions.cms import (
        cms_add_agg,
        cms_estimate,
        cms_merge,
    )

    df = spark.range(50).select(F.col("id").cast("string").alias("x"))
    a = cms_add_agg(df, [], "x", depth=2, width=32).select(
        F.col("cms").alias("a")
    )
    b = cms_add_agg(df, [], "x", depth=2, width=64).select(
        F.col("cms").alias("b")
    )
    both = a.crossJoin(b)
    with pytest.raises(Exception, match="shapes differ"):
        both.select(cms_merge("a", "b")).collect()
    with pytest.raises(Exception, match="expected"):
        a.select(cms_estimate("a", F.lit("x"), depth=2, width=64)).collect()


def test_group_column_named_slot(spark):
    """Review pin: bare internal working names collided with
    same-named user group columns at analysis time."""
    from postgresql_topn_spark.functions.cms import cms_add_agg, cms_estimate

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g2", "b")], "slot string, item string"
    )
    out = cms_add_agg(df, ["slot"], "item", depth=2, width=32)
    got = {
        r["slot"]: r["est"]
        for r in out.select(
            "slot", cms_estimate("cms", F.lit("a"), depth=2, width=32).alias("est")
        ).collect()
    }
    assert got["g1"] >= 2 and got["g2"] >= 0
