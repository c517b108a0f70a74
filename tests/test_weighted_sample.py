"""A-ES weighted sampling: partition invariance, weight
proportionality, weight discipline, rank contract."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.sampling import weighted_sample_k


@pytest.fixture(scope="module")
def pop(spark):
    # two groups; weights 1 for most rows, 100 for every 5th — ids
    # divisible by 5 hit BOTH parities, so each group gets heavy rows
    return spark.range(2_000).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, F.lit(100)).otherwise(F.lit(1)).alias("w"),
    )


def test_partition_invariance(pop):
    a = weighted_sample_k(pop, ["g"], "k", "w", 25, seed=3)
    b = weighted_sample_k(pop.repartition(17, "k"), ["g"], "k", "w", 25, seed=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_heavy_weights_oversampled(pop):
    # heavy rows are 20% of each group with 100x weight (96% of the
    # total weight) => they should dominate the sample
    out = weighted_sample_k(pop, ["g"], "k", "w", 25, seed=1)
    heavy = out.where(F.col("k") % 5 == 0).count()
    assert heavy > 0.6 * out.count()


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1, 5), (1, 2, 0), (1, 3, -4), (1, 4, None)],
        "g int, k int, w int",
    )
    out = weighted_sample_k(df, ["g"], "k", "w", 10).collect()
    assert [r["k"] for r in out] == [1]


def test_rank_is_dense_and_capped(pop):
    out = weighted_sample_k(pop, ["g"], "k", "w", 7, seed=2)
    per_g = out.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("rank")).alias("ranks"),
    )
    for r in per_g.collect():
        assert r["n"] == 7
        assert r["ranks"] == list(range(1, 8))


def test_different_seeds_differ(pop):
    a = {r["k"] for r in weighted_sample_k(pop, ["g"], "k", "w", 25, seed=1).collect()}
    b = {r["k"] for r in weighted_sample_k(pop, ["g"], "k", "w", 25, seed=2).collect()}
    assert a != b


def test_rejects_bad_k(pop):
    with pytest.raises(ValueError):
        weighted_sample_k(pop, ["g"], "k", "w", 0)
