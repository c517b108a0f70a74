"""Port of the reference's char_tests suite (sql/char_tests.sql):
key fidelity for quotes, backslashes, control chars, Cyrillic and CJK
through every surface — aggregate build, JSON round-trip, extraction,
and re-ingestion of extracted items (char_tests.sql:190-199)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_topn_spark.functions.aggregates import topn_add_agg
from postgresql_topn_spark.functions.sketch import (
    explode_topn,
    sketch_from_json,
    sketch_to_json,
)

C = 1000

HOSTILE = [
    'say "hello"',          # double quotes        (char_tests.sql:18)
    "back\\slash",          # backslash            (char_tests.sql:19)
    "tab\tchar",            # tab                  (char_tests.sql:20)
    "bell\bformfeed\f",     # \b \f control chars  (char_tests.sql:180-181)
    "Привет мир",           # Cyrillic             (char_tests.sql:29-89)
    "你好世界",              # CJK                  (char_tests.sql:99-171)
    "émoji 🎉 mix",         # astral-plane emoji
]


def _build_sketch(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "item string")
    sk = topn_add_agg(df, [F.lit(1).alias("g")], "item", counters=C)
    return sk


def test_hostile_keys_survive_aggregation(spark):
    sk = _build_sketch(spark, HOSTILE * 2)
    got = dict(sk.collect()[0]["topn"])
    assert got == {v: 2 for v in HOSTILE}


def test_hostile_keys_round_trip_json(spark):
    """sketch -> JSON text -> sketch preserves every key bytewise
    (escape_json parity, topn.c:914-939)."""
    sk = _build_sketch(spark, HOSTILE)
    rt = sk.select(
        sketch_from_json(sketch_to_json("topn"), strict_keys=True).alias("m")
    )
    got = dict(rt.collect()[0]["m"])
    assert got == {v: 1 for v in HOSTILE}


def test_reingest_extracted_items(spark):
    """char_tests.sql:190-199: topn() output fed back through
    topn_add_agg reproduces the same keys with re-counted frequencies."""
    sk = _build_sketch(spark, HOSTILE * 3)
    extracted = explode_topn(sk, "topn", len(HOSTILE), counters=C)
    again = topn_add_agg(extracted, [F.lit(1).alias("g")], "item", counters=C)
    got = dict(again.collect()[0]["topn"])
    assert got == {v: 1 for v in HOSTILE}


def test_int64_precision_round_trip(spark):
    """Frequencies above 2^53 must survive the JSON round trip exactly —
    the reference parses exact int64 (numeric_normalize + atol,
    topn.c:711-712), not via double. 9007199254740993 == 2^53 + 1 is the
    first integer a double cannot represent."""
    big = {
        "near_max": 9223372036854775806,   # INT64_MAX - 1
        "two53p1": 9007199254740993,       # 2^53 + 1
        "neg_big": -9007199254740995,
        "small": 7,
    }
    import json

    df = spark.createDataFrame([(json.dumps(big),)], "j string")
    got = dict(
        df.select(sketch_from_json("j").alias("m")).collect()[0]["m"]
    )
    assert got == big


def test_int64_overflow_saturates(spark):
    """Integer strings beyond int64 range fall back to the double path
    and saturate rather than erroring (reference saturates at INT64_MAX)."""
    df = spark.createDataFrame(
        [('{"huge": 99999999999999999999999, "dec": 12.9, "exp": 2e3}',)],
        "j string",
    )
    got = dict(df.select(sketch_from_json("j").alias("m")).collect()[0]["m"])
    assert got["huge"] == 9223372036854775807
    assert got["dec"] == 12
    assert got["exp"] == 2000
