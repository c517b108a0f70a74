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


class TestSessionize:
    def test_known_sessions(self, spark):
        """Gaps > 30 min split sessions; ties share a session."""
        from postgresql_topn_spark.operators.sessions import (
            session_stats,
            sessionize,
        )

        rows = [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),  # same session (10 min)
            (1, "2024-01-01 11:00:00"),  # new session (50 min gap)
            (2, "2024-01-01 09:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
        got = {
            (r.user_id, str(r.ts)): r.session_idx
            for r in sessionize(df).collect()
        }
        assert got[(1, "2024-01-01 10:00:00")] == 1
        assert got[(1, "2024-01-01 10:10:00")] == 1
        assert got[(1, "2024-01-01 11:00:00")] == 2
        assert got[(2, "2024-01-01 09:00:00")] == 1
        stats = {
            (r.user_id, r.session_idx): (r.n_events, r.duration_us)
            for r in session_stats(df).collect()
        }
        assert stats[(1, 1)] == (2, 600_000_000)
        assert stats[(1, 2)] == (1, 0)
        assert stats[(2, 1)] == (1, 0)

    def test_single_exchange_plan(self, spark):
        """The lag window, the running counter and the summary
        aggregate must share ONE user-key exchange."""
        from postgresql_topn_spark.operators.sessions import session_stats
        from postgresql_topn_spark.plans.audit import (
            hash_shuffles,
            python_stages,
        )
        from postgresql_topn_spark.sources.tables import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        out = session_stats(ev)
        assert hash_shuffles(out) == 1
        assert python_stages(out) == 0
