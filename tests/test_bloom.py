"""Bloom membership algebra: no false negatives, exact OR merge law,
false-positive envelope, NULL discipline, shape validation."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.bloom import (
    bloom_add_agg,
    bloom_merge,
    bloom_might_contain,
    bloom_union_rollup,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 300 distinct keys over 6 buckets
    return spark.range(300).select(
        (F.col("id") % 6).alias("bucket"),
        F.concat(F.lit("key"), F.col("id")).alias("item"),
    )


def test_no_false_negatives(spark, keyed):
    sk = bloom_add_agg(
        keyed.select(F.lit(1).alias("g"), "item"), ["g"], "item",
        m_bits=2048, depth=3,
    )
    probes = keyed.select("item").distinct()
    missing = (
        probes.crossJoin(F.broadcast(sk))
        .where(
            ~bloom_might_contain("bloom", "item", m_bits=2048, depth=3)
        )
        .count()
    )
    assert missing == 0


def test_merge_law_rollup_equals_direct(keyed):
    per_bucket = bloom_add_agg(keyed, ["bucket"], "item", m_bits=1024, depth=3)
    rolled = bloom_union_rollup(per_bucket, [], "bloom").collect()[0]["bloom"]
    direct = bloom_add_agg(
        keyed.select(F.lit(1).alias("g"), "item"), ["g"], "item",
        m_bits=1024, depth=3,
    ).collect()[0]["bloom"]
    assert rolled == direct  # OR is associative: exact


def test_false_positive_rate_in_envelope(spark, keyed):
    # 300 keys * 3 hashes into 4096 bits => ~20% load => fp ~ 0.8%
    sk = bloom_add_agg(
        keyed.select(F.lit(1).alias("g"), "item"), ["g"], "item",
        m_bits=4096, depth=3,
    )
    absent = spark.range(2_000).select(
        F.concat(F.lit("absent"), F.col("id")).alias("item")
    )
    fp = (
        absent.crossJoin(F.broadcast(sk))
        .where(bloom_might_contain("bloom", "item", m_bits=4096, depth=3))
        .count()
    )
    assert fp < 0.05 * 2_000  # generous: expect ~16


def test_null_items_skipped_and_scalar_merge(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None)], "g int, item string"
    )
    sk = bloom_add_agg(df, ["g"], "item", m_bits=64, depth=2)
    bits = sk.select(
        F.aggregate(
            "bloom",
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.bit_count(w).cast("bigint"),
        ).alias("n")
    ).collect()[0]["n"]
    assert bits <= 2  # only 'a' inserted (2 hashes, possibly colliding)
    probed = sk.select(
        bloom_might_contain(
            bloom_merge("bloom", F.lit(None).cast("array<bigint>")),
            F.lit("a"),
            m_bits=64,
            depth=2,
        ).alias("p")
    ).collect()[0]["p"]
    assert probed is True


def test_rejects_bad_shape(keyed):
    with pytest.raises(ValueError):
        bloom_add_agg(keyed, ["bucket"], "item", m_bits=100)
    with pytest.raises(ValueError):
        bloom_add_agg(keyed, ["bucket"], "item", depth=0)


def test_merge_and_probe_reject_shape_mismatch(spark):
    """Review pin: OR-merging filters of different m_bits NULL-padded
    words (a NULL probe reads as 'seen' under NOT), and probing with
    the wrong m_bits loses the no-false-negative guarantee; both now
    raise."""
    import pytest

    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_merge,
        bloom_might_contain,
    )

    df = spark.range(30).select(F.col("id").cast("string").alias("x"))
    a = bloom_add_agg(df, [], "x", m_bits=1 << 10).select(
        F.col("bloom").alias("a")
    )
    b = bloom_add_agg(df, [], "x", m_bits=1 << 11).select(
        F.col("bloom").alias("b")
    )
    both = a.crossJoin(b)
    with pytest.raises(Exception, match="shapes differ"):
        both.select(bloom_merge("a", "b")).collect()
    with pytest.raises(Exception, match="expected"):
        a.select(
            bloom_might_contain("a", F.lit("x"), m_bits=1 << 11)
        ).collect()


def test_group_column_named_word(spark):
    """Review pin: bare internal working names collided with
    same-named user group columns at analysis time."""
    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_might_contain,
    )

    df = spark.createDataFrame(
        [("g1", "a"), ("g2", "b")], "word string, item string"
    )
    out = bloom_add_agg(df, ["word"], "item", m_bits=1 << 10)
    got = {
        r["word"]: r["hit"]
        for r in out.select(
            "word",
            bloom_might_contain("bloom", F.lit("a"), m_bits=1 << 10).alias(
                "hit"
            ),
        ).collect()
    }
    assert got["g1"] is True
