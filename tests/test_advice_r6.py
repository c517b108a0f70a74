"""Regression pins for the round-5 advisor findings: each test
reproduces the pre-fix failure shape.

1. bloom grid-pack lane (nwords > 4096) dropped NULL group keys on the
   null-unsafe grid join -> all-zero filter -> false NEGATIVES.
2. topn_add read a NULL map value as overflow through try_add and
   saturated the entry to INT64_MIN (repo convention: NULL map values
   contribute 0, as on the union/merge path).
3. levenshtein_pairs crashed at plan construction when
   spark.sql.shuffle.partitions holds a non-integer (e.g. 'auto').
"""

import pytest
from pyspark.sql import functions as F


def test_bloom_grid_lane_null_group_key(spark):
    """A NULL group key must get a working filter through the grid-pack
    lane (m_bits > 2^17): every inserted item probes TRUE, and the
    packed words equal the ungrouped build of the same subset."""
    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_might_contain,
    )

    m_bits = 1 << 18  # 8192 words -> grid lane
    df = spark.createDataFrame(
        [(None, f"n{i}") for i in range(40)]
        + [("g1", f"a{i}") for i in range(40)],
        "bucket string, item string",
    )
    sk = bloom_add_agg(df, ["bucket"], "item", m_bits=m_bits)
    rows = {r["bucket"]: r["bloom"] for r in sk.collect()}
    assert None in rows and "g1" in rows
    # pre-fix: the NULL group's filter packed all-zero
    assert any(w != 0 for w in rows[None])
    # no false negatives for the NULL group's own items
    null_items = df.where(F.col("bucket").isNull()).select("item")
    null_sk = sk.where(F.col("bucket").isNull()).select("bloom")
    missing = (
        null_items.crossJoin(F.broadcast(null_sk))
        .where(~bloom_might_contain("bloom", "item", m_bits=m_bits))
        .count()
    )
    assert missing == 0
    # bit-for-bit: grouped grid build == ungrouped build of the subset
    solo = bloom_add_agg(
        df.where(F.col("bucket").isNull()), [], "item", m_bits=m_bits
    ).collect()[0]["bloom"]
    assert list(rows[None]) == list(solo)
    # and the non-NULL group is unchanged by the null-safe join
    solo_g1 = bloom_add_agg(
        df.where(F.col("bucket") == "g1"), [], "item", m_bits=m_bits
    ).collect()[0]["bloom"]
    assert list(rows["g1"]) == list(solo_g1)


def test_topn_add_null_map_value_contributes_zero(spark):
    """topn_add on an entry whose stored frequency is NULL treats it as
    0 (-> 1 after the add), matching the merge path's coalesce; pre-fix
    it came back INT64_MIN (try_add NULL read as overflow)."""
    from postgresql_topn_spark.functions.sketch import topn_add

    df = spark.sql(
        "SELECT map('a', CAST(NULL AS BIGINT), 'b', CAST(5 AS BIGINT))"
        " AS sk"
    )
    got = df.select(
        topn_add("sk", F.lit("a")).alias("out")
    ).collect()[0]["out"]
    assert dict(got) == {"a": 1, "b": 5}


def test_shuffle_partition_count_degrades_gracefully():
    """Non-integer spark.sql.shuffle.partitions (e.g. 'auto' on
    AQE-managed platforms) must not raise at plan construction."""
    from postgresql_topn_spark.operators.dedup import (
        _shuffle_partition_count,
    )

    class _Conf:
        def __init__(self, val):
            self._val = val

        def get(self, key, default=None):
            return self._val if self._val is not None else default

    class _Ctx:
        defaultParallelism = 8

    class _Sess:
        def __init__(self, val, ctx):
            self.conf = _Conf(val)
            self._ctx = ctx

        @property
        def sparkContext(self):
            if self._ctx is None:
                raise RuntimeError("no sparkContext (Connect)")
            return self._ctx

    assert _shuffle_partition_count(_Sess("32", _Ctx())) == 32
    assert _shuffle_partition_count(_Sess("auto", _Ctx())) == 8
    assert _shuffle_partition_count(_Sess("auto", None)) == 200
    assert _shuffle_partition_count(_Sess(None, _Ctx())) == 200


def test_levenshtein_pairs_with_auto_shuffle_partitions(spark):
    """End-to-end: the operator still plans and returns correct pairs
    when the conf read yields a non-integer (simulated via the helper's
    contract being exercised above; here we pin the default path still
    works after the refactor)."""
    from postgresql_topn_spark.operators.dedup import levenshtein_pairs

    df = spark.createDataFrame(
        [(1, "the kitten"), (2, "the sitten"), (3, "unrelated zebra")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in levenshtein_pairs(
            df, "doc_id", "text", max_dist=2
        ).collect()
    }
    assert (1, 2, 1) in got
    assert all(a < b for a, b, _ in got)
