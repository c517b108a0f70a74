"""Salted skew join: result equality with the plain join, salt
discipline, replication shape."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 95% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 20 < 19, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 7))
        .alias("k"),
        F.col("id").alias("payload"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    keys = ["hot"] + [f"k{i}" for i in range(7)] + ["absent"]
    return spark.createDataFrame(
        [(k, len(k)) for k in keys], "k string, attr int"
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_plain_join(skewed, dim, how):
    plain = sorted(
        map(tuple, skewed.join(dim, "k", how).select("k", "payload", "attr").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(skewed, dim, "k", n_salts=8, how=how)
            .select("k", "payload", "attr")
            .collect(),
        )
    )
    assert salted == plain


def test_hot_key_spreads_over_salts_even_for_identical_rows(spark, dim):
    # adversarial shape: the hot key's rows are EXACT duplicates (the
    # post-projection log shape) — a row-hash salt would collapse them
    # all into one salt and silently no-op the mitigation
    dup = spark.createDataFrame(
        [("hot", 1)] * 4_000, "k string, payload int"
    ).repartition(8)
    s = dup.withColumn("__salt", (F.rand(0) * 8).cast("int"))
    per_salt = s.groupBy("__salt").count().collect()
    assert len(per_salt) == 8
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 3 * min(counts)  # roughly uniform
    # and the actual join over duplicates stays correct
    out = salted_join(dup, dim, "k", n_salts=8)
    assert out.count() == 4_000


def test_rejects_bad_params(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", n_salts=0)
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")
