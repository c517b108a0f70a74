"""One-pass profiler: stat correctness incl. NULL discipline, approx
mode sanity, single-scan plan shape."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10),
        (2, None, 20),
        (3, "b", None),
        (4, "a", 20),
    ]
    return spark.createDataFrame(rows, "id long, s string, v int")


def test_exact_stats_with_nulls(messy):
    got = {
        r["col_name"]: r
        for r in profile_columns(messy, exact_distinct=True).collect()
    }
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["s"]["n_non_null"], got["s"]["n_distinct"]) == (3, 2)
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("a", "b")
    assert (got["v"]["n_non_null"], got["v"]["n_distinct"]) == (3, 2)
    assert (got["v"]["min_s"], got["v"]["max_s"]) == ("10", "20")


def test_approx_mode_close(spark):
    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") % 997).alias("m")
    )
    got = {
        r["col_name"]: r["n_distinct"] for r in profile_columns(df).collect()
    }
    assert abs(got["m"] - 997) <= 0.1 * 997
    assert abs(got["id"] - 5_000) <= 0.1 * 5_000


def test_single_aggregate_plan(messy):
    from postgresql_topn_spark.plans.audit import hash_shuffles, python_stages

    prof = profile_columns(messy)  # approx mode: one combined agg
    assert python_stages(prof) == 0
    # one SinglePartition exchange fed by map-side partial aggregates
    # (one row per task) — the canonical global-agg shape, no key
    # shuffle of raw rows anywhere
    assert hash_shuffles(prof) == 1
    from postgresql_topn_spark.plans.audit import plan_str

    assert "Exchange SinglePartition" in plan_str(prof, "simple")
    assert "partial" in plan_str(prof, "simple").lower()


def test_column_subset_and_validation(messy):
    out = profile_columns(messy, ["id"]).collect()
    assert [r["col_name"] for r in out] == ["id"]
    with pytest.raises(ValueError):
        profile_columns(messy, [])


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        from postgresql_topn_spark.operators.profile import corpus_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, None)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C!"), (4, None), (5, "e")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["status"]
            for r in corpus_diff(old, new).collect()
        }
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "unchanged",  # NULL == NULL via eqNullSafe
            5: "added",
        }

    def test_null_vs_content_is_changed_and_membership_mode(self, spark):
        from postgresql_topn_spark.operators.profile import corpus_diff

        old = spark.createDataFrame([(1, None)], "doc_id long, text string")
        new = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        assert corpus_diff(old, new).collect()[0]["status"] == "changed"
        assert (
            corpus_diff(old, new, content_col=None).collect()[0]["status"]
            == "unchanged"
        )

    def test_collision_guard(self, spark):
        import pytest

        from postgresql_topn_spark.operators.profile import corpus_diff

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="collide"):
            corpus_diff(df, df, status_col="doc_id")


class TestCorpusDrift:
    def test_identical_corpora_zero_drift(self, spark):
        from postgresql_topn_spark.operators.profile import corpus_drift

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma w{i % 3}") for i in range(30)],
            "doc_id long, text string",
        )
        r = corpus_drift(docs, docs, n_buckets=256).collect()[0]
        assert r["tv_micro"] == 0
        assert r["n_old"] == r["n_new"] > 0

    def test_disjoint_vocab_is_maximal_and_attributed(self, spark):
        from postgresql_topn_spark.operators.profile import corpus_drift

        old = spark.createDataFrame(
            [(i, "aa bb cc") for i in range(10)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(i, "xx yy zz") for i in range(10)], "doc_id long, text string"
        )
        r = corpus_drift(old, new, n_buckets=256).collect()[0]
        # completely disjoint vocabularies: TV = 1 exactly
        assert r["tv_micro"] == 1_000_000
        assert len(r["top_buckets"]) == 10
        assert r["top_buckets"][0]["delta_micro"] >= r["top_buckets"][-1]["delta_micro"]

    def test_partial_shift_is_between_and_partition_invariant(self, spark):
        from postgresql_topn_spark.operators.profile import corpus_drift

        old = spark.createDataFrame(
            [(i, "shared tokens here plus old stuff") for i in range(20)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(i, "shared tokens here plus new material") for i in range(20)],
            "doc_id long, text string",
        )
        a = corpus_drift(old, new, n_buckets=512).collect()[0]
        assert 0 < a["tv_micro"] < 1_000_000
        b = corpus_drift(
            old.repartition(7), new.repartition(5), n_buckets=512
        ).collect()[0]
        assert a["tv_micro"] == b["tv_micro"]
        assert [tuple(x) for x in a["top_buckets"]] == [
            tuple(x) for x in b["top_buckets"]
        ]
