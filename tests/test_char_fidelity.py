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


def test_scalar_ops_gate_lanes(spark, sf_dir):
    """The r12 lanes of `topn_scalar_ops` (VERDICT r11 items 3 + 4)
    hold by construction AND are non-vacuous:

    - prune_insert: exactly 4 rows per group (the counters=4 budget),
      '0NEW' evicted — the scalar insert genuinely fired the prune on
      a 7-entry sketch.
    - prune_update: all 7 entries survive an update to an existing key
      under the same budget (insert-only prune, topn.c:350) with '1'
      incremented by exactly one.
    - unicode_order: pins PG-jsonb BYTE-length-first ordering, and the
      corpus genuinely discriminates it from a CHAR-length-first
      impostor (otherwise the lane is vacuous)."""
    from postgresql_topn_spark.suite import _UNI_ROWS, QUERIES, load_table

    rows = QUERIES["topn_scalar_ops"](spark, sf_dir).collect()
    lanes = {}
    for r in rows:
        lanes.setdefault(r["lane"], []).append(r)

    li = load_table(spark, sf_dir, "lineitem")
    counts = {
        (r["l_returnflag"], str(r["ln"])): r["c"]
        for r in li.groupBy(
            F.col("l_returnflag"), F.col("l_linenumber").alias("ln")
        ).agg(F.count("l_linenumber").alias("c")).collect()
    }
    groups = sorted({g for g, _ in counts})
    # prune_insert: top-4 by (c DESC, item ASC), NEW:1 evicted
    for g in groups:
        got = sorted(
            (r["item"], r["frequency"])
            for r in lanes["prune_insert"]
            if r["l_returnflag"] == g
        )
        pool = [(it, c) for (gg, it), c in counts.items() if gg == g]
        pool.append(("0NEW", 1))
        want = sorted(sorted(pool, key=lambda p: (-p[1], p[0]))[:4])
        assert got == want and len(got) == 4
        assert all(it != "0NEW" for it, _ in got)
        # non-vacuity: the sketch HAD more entries than the budget
        assert len(pool) == 8
    # prune_update: all 7 entries survive, '1' incremented
    for g in groups:
        got = {
            r["item"]: r["frequency"]
            for r in lanes["prune_update"]
            if r["l_returnflag"] == g
        }
        want = {
            it: c + (1 if it == "1" else 0)
            for (gg, it), c in counts.items()
            if gg == g
        }
        assert got == want and len(got) == 7
    # unicode: full round-trip fidelity
    want_uni = {(g, it): n for g, it, n in _UNI_ROWS}
    got_uni = {
        (r["l_returnflag"], r["item"]): r["frequency"]
        for r in lanes["unicode"]
    }
    assert got_uni == want_uni
    # unicode_order: byte-length-first != char-length-first on this
    # corpus (the impostor discriminator is real)
    for g in {g for g, _, _ in _UNI_ROWS}:
        items = [it for gg, it, _ in _UNI_ROWS if gg == g]
        byte_order = sorted(items, key=lambda s: (len(s.encode()), s.encode()))
        char_order = sorted(items, key=lambda s: (len(s), s.encode()))
        got_order = [
            r["item"]
            for r in sorted(
                (r for r in lanes["unicode_order"] if r["l_returnflag"] == g),
                key=lambda r: r["frequency"],
            )
        ]
        assert got_order == byte_order
        if g == "г1":
            assert byte_order != char_order
    # truncate255: two 256-byte keys differing after the cap MERGE;
    # the mid-character boundary cuts back to a whole character
    got_tr = {(r["item"], r["frequency"]) for r in lanes["truncate255"]}
    assert got_tr == {("я" * 127 + "A", 11), ("я" * 127, 4)}
    assert all(len(it.encode()) <= 255 for it, _ in got_tr)
    # saturate: two INT64_MAX weights clamp ONCE at egress
    got_sat = {(r["item"], r["frequency"]) for r in lanes["saturate"]}
    assert got_sat == {("big", (1 << 63) - 1), ("small", 7)}


# ---------------------------------------------------------------------------
# Property-based JSON round-trip fidelity (hypothesis): the r12 unicode
# driver lane pins one curated corpus; this fuzzes the same pipeline
# over arbitrary unicode keys and int64 values.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEY = st.text(max_size=40).filter(lambda s: len(s.encode()) <= 255)
_VAL = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(m=st.dictionaries(_KEY, _VAL, max_size=12))
def test_json_round_trip_fuzz(spark, m):
    """sketch_to_json -> sketch_from_json is the identity on ANY map
    with <=255-byte unicode keys (incl. control chars, quotes,
    non-BMP) and full-range int64 values, and the parsed entry order
    is the exporter's PG-jsonb order (byte length, then bytewise)."""
    from postgresql_topn_spark.functions.sketch import (
        sketch_from_json,
        sketch_to_json,
    )

    df = spark.createDataFrame(
        [(list(m.items()),)], "kv array<struct<key:string,value:long>>"
    )
    rows = df.select(
        F.posexplode_outer(
            sketch_from_json(sketch_to_json(F.map_from_entries("kv")))
        )
    ).collect()
    got = {r["key"]: r["value"] for r in rows if r["key"] is not None}
    assert got == m
    order = [
        r["key"]
        for r in sorted(
            (r for r in rows if r["key"] is not None),
            key=lambda r: r["pos"],
        )
    ]
    assert order == sorted(m, key=lambda k: (len(k.encode()), k.encode()))
