"""Two-pass exact heavy hitters: equality with brute force under skew
and high cardinality, partition invariance, threshold strictness."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.heavy_hitters import exact_heavy_hitters


@pytest.fixture(scope="module")
def skewed(spark):
    # 20k rows: 3 heavy items (5k, 4k, 3k) + 8k rows over 4000 distinct tails
    heavy = (
        [("alpha",)] * 5000 + [("beta",)] * 4000 + [("gamma",)] * 3000
    )
    df_heavy = spark.createDataFrame(
        [(i, v[0]) for i, v in enumerate(heavy)], "i long, item string"
    )
    tail = spark.range(8_000).select(
        (F.col("id") + 100_000).alias("i"),
        F.concat(F.lit("t"), F.col("id") % 4_000).alias("item"),
    )
    return df_heavy.union(tail)


def _brute(df, k):
    total = df.where(F.col("item").isNotNull()).count()
    return {
        (r["item"], r["n"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > total)
        .collect()
    }


@pytest.mark.parametrize("k", [4, 8, 64])
def test_matches_brute_force(skewed, k):
    got = {
        (r["item"], r["frequency"])
        for r in exact_heavy_hitters(skewed, "item", k=k).collect()
    }
    assert got == _brute(skewed, k)


def test_partition_invariance(skewed):
    a = {
        (r["item"], r["frequency"])
        for r in exact_heavy_hitters(skewed, "item", k=8).collect()
    }
    b = {
        (r["item"], r["frequency"])
        for r in exact_heavy_hitters(
            skewed.repartition(23), "item", k=8
        ).collect()
    }
    assert a == b


def test_nulls_skipped_and_threshold_strict(spark):
    df = spark.createDataFrame(
        [(1, "a")] * 5 + [(1, "b")] * 5 + [(1, None)] * 10,
        "i int, item string",
    )
    # total (non-null) = 10; k=2 -> need n*2 > 10, i.e. > 5: neither
    # 'a' nor 'b' qualifies (strict inequality)
    assert exact_heavy_hitters(df, "item", k=2).count() == 0
    # k=3: need n*3 > 10 -> n >= 4: both qualify
    got = {
        (r["item"], r["frequency"])
        for r in exact_heavy_hitters(df, "item", k=3).collect()
    }
    assert got == {("a", 5), ("b", 5)}


def test_rejects_bad_k(skewed):
    with pytest.raises(ValueError):
        exact_heavy_hitters(skewed, "item", k=1)


def test_randomized_exact_boundary(spark):
    """Randomized strictness pin: a random tail plus two engineered
    items — A lands EXACTLY at total/k (count*k == total, must be
    excluded by the strict > rule) and B one count above it (must be
    included with its exact count) — verified against brute force
    across 31 partitions, where pass-1 MG states are tiny and
    decrement pressure is highest."""
    import random

    rng = random.Random(99)
    k, a = 7, 400
    t = a * (k - 2) - 1  # so that count(A)*k == total exactly
    tail = [(f"z{rng.randrange(700)}",) for _ in range(t)]
    rows = [("A",)] * a + [("B",)] * (a + 1) + tail
    rng.shuffle(rows)
    df = spark.createDataFrame(
        [(i, v[0]) for i, v in enumerate(rows)], "i long, item string"
    ).repartition(31)
    total = len(rows)
    assert a * k == total  # the boundary really is exact
    got = {
        (r["item"], r["frequency"])
        for r in exact_heavy_hitters(df.select("item"), "item", k=k).collect()
    }
    assert got == _brute(df, k)
    assert ("A", a) not in got and ("B", a + 1) in got
