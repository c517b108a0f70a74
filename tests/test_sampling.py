"""Deterministic sampling invariants."""

from pyspark.sql import functions as F

from postgresql_topn_spark.operators.sampling import (
    deterministic_sample,
    hash_uniform,
    stratified_sample,
)


class TestDeterministicSample:
    def test_reproducible_and_partition_invariant(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r["k"] for r in deterministic_sample(df, "k", 0.3, seed=1).collect()}
        b = {
            r["k"]
            for r in deterministic_sample(
                df.repartition(7), "k", 0.3, seed=1
            ).collect()
        }
        assert a == b
        assert 0.25 < len(a) / 2000 < 0.35

    def test_seeds_independent(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r["k"] for r in deterministic_sample(df, "k", 0.3, seed=1).collect()}
        c = {r["k"] for r in deterministic_sample(df, "k", 0.3, seed=2).collect()}
        assert a != c

    def test_nested_fractions_monotone(self, spark):
        """A 0.2 sample must be a subset of the 0.5 sample at the same
        seed (threshold sampling is nested by construction)."""
        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        small = {r["k"] for r in deterministic_sample(df, "k", 0.2, seed=3).collect()}
        big = {r["k"] for r in deterministic_sample(df, "k", 0.5, seed=3).collect()}
        assert small <= big

    def test_uniform_bounds(self, spark):
        df = spark.range(0, 500).select(hash_uniform("id").alias("u"))
        mn, mx = df.agg(F.min("u"), F.max("u")).first()
        assert 0.0 <= mn and mx < 1.0


class TestStratifiedSample:
    def test_rates_respected_and_default_drops(self, spark):
        df = spark.range(0, 3000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, "a")
            .when(F.col("id") % 3 == 1, "b")
            .otherwise("c")
            .alias("s"),
        )
        out = stratified_sample(
            df, "s", {"a": 1.0, "b": 0.25}, "k", seed=5
        ).groupBy("s").count()
        counts = {r["s"]: r["count"] for r in out.collect()}
        assert counts["a"] == 1000
        assert 150 < counts["b"] < 350
        assert "c" not in counts
