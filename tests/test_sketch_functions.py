"""Scalar-surface semantics — ports of the reference's null_tests,
add_union_tests and char_tests pg_regress suites (SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

import postgresql_topn_spark as T

MAX = 9223372036854775807
SKETCH = "map<string,bigint>"


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def lit_sketch(d):
    items = ", ".join(f"'{k}', {v}L" for k, v in d.items())
    return F.expr(f"map({items})").cast(SKETCH) if d else F.expr(f"cast(map() as {SKETCH})")


def NULL_SKETCH():
    return F.lit(None).cast(SKETCH)


def NULL_ITEM():
    return F.lit(None).cast("string")


class TestTopnAddNullMatrix:
    """topn_add is non-STRICT (topn.c:305-322, sql/null_tests.sql)."""

    def test_null_null_gives_empty(self, spark):
        assert one(spark, T.topn_add(NULL_SKETCH(), NULL_ITEM(), counters=10)) == {}

    def test_null_sketch_item_gives_singleton(self, spark):
        assert one(spark, T.topn_add(NULL_SKETCH(), F.lit("SA"), counters=10)) == {"SA": 1}

    def test_sketch_null_item_unchanged(self, spark):
        assert one(spark, T.topn_add(lit_sketch({"a": 2}), NULL_ITEM(), counters=10)) == {"a": 2}

    def test_existing_item_increments(self, spark):
        assert one(spark, T.topn_add(lit_sketch({"a": 2}), F.lit("a"), counters=10)) == {"a": 3}

    def test_new_item_inserted(self, spark):
        assert one(spark, T.topn_add(lit_sketch({"a": 2}), F.lit("b"), counters=10)) == {"a": 2, "b": 1}

    def test_item_cast_to_text(self, spark):
        # TEXT-only intake: ints arrive as their string form (sql/add_agg.sql:63-70)
        assert one(spark, T.topn_add(NULL_SKETCH(), F.lit(42), counters=10)) == {"42": 1}


class TestTopnAddPrune:
    """Prune fires only on insert of a new item, keeps `counters`
    (topn.c:350)."""

    def test_insert_beyond_budget_evicts_minimum(self, spark):
        sk = lit_sketch({"a": 5, "b": 4, "c": 3})
        out = one(spark, T.topn_add(sk, F.lit("d"), counters=3))
        # d enters with 1 and is immediately the smallest -> evicted
        assert out == {"a": 5, "b": 4, "c": 3}

    def test_increment_never_prunes(self, spark):
        sk = lit_sketch({"a": 5, "b": 4, "c": 3, "d": 2})  # already over budget
        out = one(spark, T.topn_add(sk, F.lit("d"), counters=3))
        # existing-item bump does not prune (reference parity)
        assert out == {"a": 5, "b": 4, "c": 3, "d": 3}

    def test_tie_break_item_asc_keeps_smaller(self, spark):
        sk = lit_sketch({"b": 1, "c": 2})
        out = one(spark, T.topn_add(sk, F.lit("a"), counters=2))
        # a and b tie at 1; deterministic tie-break keeps 'a'
        assert out == {"c": 2, "a": 1}


class TestTopnUnion:
    """topn_union is STRICT and prunes to counters (topn.c:363-385)."""

    def test_strict_null_left(self, spark):
        assert one(spark, T.topn_union(NULL_SKETCH(), lit_sketch({"a": 1}), counters=10)) is None

    def test_strict_null_right(self, spark):
        assert one(spark, T.topn_union(lit_sketch({"a": 1}), NULL_SKETCH(), counters=10)) is None

    def test_sums_shared_keys(self, spark):
        out = one(spark, T.topn_union(lit_sketch({"a": 2, "b": 1}), lit_sketch({"a": 3, "c": 7}), counters=10))
        assert out == {"a": 5, "b": 1, "c": 7}

    def test_prunes_to_counters(self, spark):
        out = one(spark, T.topn_union(lit_sketch({"a": 5, "b": 1}), lit_sketch({"c": 4, "d": 3}), counters=2))
        assert out == {"a": 5, "c": 4}

    def test_iterated_self_union_doubles(self, spark):
        # add_union_tests: repeated self-union doubles all counts
        # (expected/add_union_tests.out:83-88)
        sk = lit_sketch({"x": 3, "y": 1})
        expr = T.topn_union(sk, sk, counters=10)
        expr = T.topn_union(expr, expr, counters=10)
        assert one(spark, expr) == {"x": 12, "y": 4}

    def test_saturates_at_int64_max(self, spark):
        out = one(spark, T.topn_union(lit_sketch({"a": MAX}), lit_sketch({"a": MAX}), counters=10))
        assert out == {"a": MAX}


class TestExtraction:
    def test_orders_freq_desc_item_asc(self, spark):
        sk = lit_sketch({"b": 2, "a": 2, "c": 9})
        out = one(spark, T.topn_entries(sk, 3, counters=10))
        assert [(r["item"], r["frequency"]) for r in out] == [("c", 9), ("a", 2), ("b", 2)]

    def test_n_larger_than_size_emits_all(self, spark):
        sk = lit_sketch({"a": 1})
        assert len(one(spark, T.topn_entries(sk, 5, counters=10))) == 1

    def test_n_greater_than_counters_raises(self, spark):
        with pytest.raises(ValueError):
            T.topn_entries(lit_sketch({"a": 1}), 11, counters=10)

    def test_null_sketch_zero_rows(self, spark):
        df = spark.range(1).select(NULL_SKETCH().alias("m"))
        assert T.explode_topn(df, "m", 3, counters=10).count() == 0

    def test_empty_sketch_zero_rows(self, spark):
        df = spark.range(1).select(lit_sketch({}).alias("m"))
        assert T.explode_topn(df, "m", 3, counters=10).count() == 0


class TestJson:
    def test_key_order_length_then_bytes(self, spark):
        j = one(spark, T.sketch_to_json(lit_sketch({"bb": 1, "a": 2, "c": 3, "aa": 4})))
        assert j == '{"a":2,"c":3,"aa":4,"bb":1}'

    def test_from_json_skips_non_numeric(self, spark):
        # reference: only jbvNumeric values accepted (topn.c:709)
        out = one(spark, T.sketch_from_json(F.lit('{"a": 2, "b": "x", "c": true}')))
        assert out == {"a": 2}

    def test_from_json_truncates_toward_zero(self, spark):
        # numeric_normalize + atol semantics (topn.c:711-712)
        out = one(spark, T.sketch_from_json(F.lit('{"a": 2.9, "b": 1e2}')))
        assert out == {"a": 2, "b": 100}

    def test_oversized_key_errors(self, spark):
        big = "k" * 300
        with pytest.raises(Exception, match="longer than the allowed"):
            spark.range(1).select(T.sketch_from_json(F.lit('{"%s": 1}' % big))).collect()

    def test_oversized_key_skipped_when_lenient(self, spark):
        big = "k" * 300
        out = one(spark, T.sketch_from_json(F.lit('{"%s": 1, "a": 2}' % big), strict_keys=False))
        assert out == {"a": 2}


class TestNormalization:
    def test_byte_cap_ascii(self, spark):
        out = one(spark, T.normalize_item(F.lit("x" * 300)))
        assert out == "x" * 255

    def test_byte_cap_multibyte_no_split(self, spark):
        out = one(spark, T.normalize_item(F.lit("я" * 200)))  # 2 bytes each
        assert len(out.encode()) <= 255
        assert set(out) == {"я"}

    def test_short_strings_untouched(self, spark):
        assert one(spark, T.normalize_item(F.lit("héllo"))) == "héllo"


class TestEdgeCases:
    def test_topn_n_zero_emits_no_rows(self, spark):
        """n=0 extraction emits zero rows but doesn't error (reference:
        sql/add_agg.sql exercises topn(..., 0))."""
        df = spark.createDataFrame([({"a": 1},)], "m map<string,bigint>")
        assert T.explode_topn(df, "m", 0, counters=10).count() == 0

    def test_union_of_empty_sketches(self, spark):
        df = spark.createDataFrame(
            [({}, {})], "a map<string,bigint>, b map<string,bigint>"
        )
        out = df.select(T.topn_union("a", "b", counters=10).alias("u")).collect()[0]["u"]
        assert out == {}

    def test_union_empty_with_nonempty(self, spark):
        df = spark.createDataFrame(
            [({}, {"x": 3})], "a map<string,bigint>, b map<string,bigint>"
        )
        out = df.select(T.topn_union("a", "b", counters=10).alias("u")).collect()[0]["u"]
        assert out == {"x": 3}

    def test_explode_empty_sketch_zero_rows(self, spark):
        df = spark.createDataFrame([(1, {}), (2, {"a": 1})], "id int, m map<string,bigint>")
        rows = T.explode_topn(df, "m", 5, keep=["id"], counters=10).collect()
        assert [(r["id"], r["item"]) for r in rows] == [(2, "a")]


class TestSketchDiff:
    def test_union_keys_and_null_tolerance(self, spark):
        from postgresql_topn_spark.functions.sketch import sketch_diff

        df = spark.createDataFrame(
            [({"a": 5, "b": 1}, {"a": 2, "c": 7}), (None, {"x": 1})],
            "x map<string,bigint>, y map<string,bigint>",
        )
        rows = df.select(sketch_diff("x", "y").alias("d")).collect()
        d0 = [(e.item, e.freq_a, e.freq_b, e.delta) for e in rows[0].d]
        assert d0 == [("a", 5, 2, -3), ("b", 1, 0, -1), ("c", 0, 7, 7)]
        d1 = [(e.item, e.freq_a, e.freq_b, e.delta) for e in rows[1].d]
        assert d1 == [("x", 0, 1, 1)]


class TestTopnOthersCount:
    def test_total_minus_head(self, spark):
        from postgresql_topn_spark.functions.sketch import topn_others_count

        df = spark.createDataFrame(
            [({"a": 10, "b": 5, "c": 2, "d": 1},)],
            "sk map<string,bigint>",
        )
        got = df.select(
            topn_others_count("sk", 2, counters=100).alias("o")
        ).collect()[0]["o"]
        assert got == 3  # c + d

    def test_n_covers_all_and_null(self, spark):
        from postgresql_topn_spark.functions.sketch import topn_others_count

        df = spark.createDataFrame(
            [({"a": 7},), (None,)], "sk map<string,bigint>"
        )
        rows = df.select(
            topn_others_count("sk", 5, counters=100).alias("o")
        ).collect()
        assert rows[0]["o"] == 0
        assert rows[1]["o"] is None

    def test_validates_n_vs_counters(self, spark):
        import pytest as _pytest

        from postgresql_topn_spark.functions.sketch import topn_others_count

        with _pytest.raises(ValueError, match="greater than"):
            topn_others_count("sk", 11, counters=10)


class TestParityReviewPins:
    """Round-5 continuation review pins on the reference-parity core."""

    def test_from_json_skips_quoted_numeric_strings(self, spark):
        """topn.c:709 accepts jbvNumeric ONLY: {"a": "5"} is a quoted
        STRING and must be skipped — the old map<string,string> parse
        erased the distinction and a lexical regex admitted it."""
        from postgresql_topn_spark.functions.sketch import sketch_from_json

        out = spark.range(1).select(
            sketch_from_json(
                F.lit('{"a": "5", "b": 2, "c": 2.5, "d": "x", '
                      '"e": true, "f": 9007199254740993}')
            ).alias("sk")
        ).collect()[0]["sk"]
        assert dict(out) == {"b": 2, "c": 2, "f": 9007199254740993}

    def test_scalar_union_negative_saturation(self, spark):
        """_sat_add saturates toward the OPERANDS' shared sign: a
        hugely-negative merged entry lands at INT64_MIN, not at the
        top heavy-hitter slot (+INT64_MAX)."""
        from postgresql_topn_spark.functions.sketch import topn_union

        big_neg = -9_200_000_000_000_000_000
        a = F.create_map(F.lit("x"), F.lit(big_neg).cast("long"))
        out = spark.range(1).select(
            topn_union(a, a, counters=5).alias("sk")
        ).collect()[0]["sk"]
        assert dict(out) == {"x": -(1 << 63)}

    def test_union_agg_negative_and_transient_overflow(self, spark):
        """The union aggregate sums exactly in decimal and clamps once:
        negative overflow saturates DOWN, and a transient mixed-sign
        overflow whose exact total fits int64 stays exact regardless of
        aggregation order (the old try_sum read it as +INT64_MAX)."""
        from postgresql_topn_spark.functions.aggregates import topn_union_agg

        i64 = (1 << 63) - 1
        neg = spark.createDataFrame(
            [("g", {"x": -5_000_000_000_000_000_000})] * 3,
            "g string, sk map<string,bigint>",
        )
        out = {
            r["g"]: dict(r["topn"])
            for r in topn_union_agg(neg, ["g"], "sk", counters=5).collect()
        }
        assert out == {"g": {"x": -(1 << 63)}}
        mixed = spark.createDataFrame(
            [("g", {"x": 9_200_000_000_000_000_000})] * 2
            + [("g", {"x": -9_000_000_000_000_000_000})] * 2,
            "g string, sk map<string,bigint>",
        ).repartition(4)
        out2 = {
            r["g"]: dict(r["topn"])
            for r in topn_union_agg(mixed, ["g"], "sk", counters=5).collect()
        }
        # exact total 2*9.2e18 - 2*9e18 = 4e17 — fits int64 exactly
        assert out2 == {"g": {"x": 400_000_000_000_000_000}}

    def test_others_count_mixed_sign_no_crash(self, spark):
        """Exact decimal folds: the old saturating per-add fold was
        fold-order dependent and the final long subtraction overflowed
        under ANSI on adversarial mixed-sign sketches."""
        from postgresql_topn_spark.functions.sketch import topn_others_count

        i64 = (1 << 63) - 1
        sk = F.create_map(
            F.lit("a"), F.lit(i64).cast("long"),
            F.lit("b"), F.lit(-i64).cast("long"),
            F.lit("c"), F.lit(-i64).cast("long"),
        )
        out = spark.range(1).select(
            topn_others_count(sk, 1, counters=5).alias("o")
        ).collect()[0]["o"]
        # exact others = (-i64) + (-i64) = -2*i64 -> clamps to INT64_MIN
        assert out == -(1 << 63)
        # plain positive sketches stay exact
        sk2 = F.create_map(
            F.lit("a"), F.lit(10).cast("long"),
            F.lit("b"), F.lit(3).cast("long"),
        )
        assert spark.range(1).select(
            topn_others_count(sk2, 1, counters=5).alias("o")
        ).collect()[0]["o"] == 3

    def test_others_count_dotted_and_struct_names(self, spark):
        """Both halves of others_count resolve the sketch argument the
        same way: a struct field reference works."""
        from postgresql_topn_spark.functions.sketch import topn_others_count

        df = spark.range(1).select(
            F.struct(
                F.create_map(
                    F.lit("a"), F.lit(5).cast("long"),
                    F.lit("b"), F.lit(2).cast("long"),
                ).alias("sk")
            ).alias("s")
        )
        assert df.select(
            topn_others_count("s.sk", 1, counters=5).alias("o")
        ).collect()[0]["o"] == 2

    def test_grouping_sets_duplicate_set_rejected(self, spark):
        """A repeated grouping set shares one gid bitmap and crashed
        map_from_entries at runtime with duplicate map keys."""
        import pytest

        from postgresql_topn_spark.functions.aggregates import (
            topn_add_agg_grouping_sets,
        )

        df = spark.createDataFrame(
            [("x", "y", "i")], "a string, b string, item string"
        )
        with pytest.raises(ValueError, match="more than once"):
            topn_add_agg_grouping_sets(
                df, [["a"], ["a"]], "item", counters=5
            )
        with pytest.raises(ValueError, match="more than once"):
            topn_add_agg_grouping_sets(
                df, [["a", "b"], ["b", "a"]], "item", counters=5
            )


def test_from_json_randomized_against_reference_model(spark):
    """Randomized parity: ~300 generated JSON objects with every value
    class (ints, big ints, decimals, exponent floats, QUOTED numeric
    strings, plain strings, booleans, nulls, arrays, objects, unicode
    keys, over-long keys) parsed by sketch_from_json(strict_keys=False)
    in ONE Spark job and compared against a Python model of the
    reference's read path (topn.c:671-722): jbvNumeric-only, truncation
    toward zero, int64 saturation, long keys skipped."""
    import json
    import math
    import random

    from postgresql_topn_spark.functions.sketch import sketch_from_json

    rnd = random.Random(11)
    I64 = (1 << 63) - 1

    def rand_key():
        choice = rnd.randrange(5)
        if choice == 0:
            return "k" + str(rnd.randrange(1000))
        if choice == 1:
            return "ключ" + str(rnd.randrange(100))  # multibyte
        if choice == 2:
            return "x" * rnd.randrange(250, 262)  # straddles the cap
        if choice == 3:
            return 'q"uo\\te' + str(rnd.randrange(50))  # JSON-hostile
        return "k" + str(rnd.randrange(10))

    def rand_value():
        c = rnd.randrange(10)
        if c == 0:
            return rnd.randrange(-1000, 1000)
        if c == 1:
            return rnd.randrange(-(1 << 70), 1 << 70)  # beyond int64
        if c == 2:
            return round(rnd.uniform(-1e6, 1e6), 3)
        if c == 3:
            return rnd.choice([1e19, -1e19, 1.5e18, 123.456e10])
        if c == 4:
            return str(rnd.randrange(-100, 100))  # QUOTED numeric
        if c == 5:
            return rnd.choice(["abc", "", "12abc"])
        if c == 6:
            return rnd.choice([True, False, None])
        if c == 7:
            return [1, 2]
        if c == 8:
            return {"nested": 1}
        return rnd.randrange(0, 5)

    def model(obj):
        out = {}
        for k, v in obj.items():
            if len(k.encode("utf-8")) > 256:
                continue  # strict_keys=False skips
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue  # jbvNumeric only (bool is not numeric)
            if isinstance(v, int):
                iv = v
            else:
                iv = math.trunc(v)  # toward zero
            out[k] = max(min(iv, I64), -I64 - 1)
        return out

    cases = []
    for i in range(300):
        obj = {}
        for _ in range(rnd.randrange(0, 8)):
            obj[rand_key()] = rand_value()
        cases.append((i, json.dumps(obj, ensure_ascii=rnd.random() < 0.5), model(obj)))

    df = spark.createDataFrame(
        [(i, j) for i, j, _ in cases], "i int, j string"
    )
    got = {
        r["i"]: dict(r["sk"])
        for r in df.select(
            "i", sketch_from_json("j", strict_keys=False).alias("sk")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, f"case {i}: {got[i]} != {want}"
