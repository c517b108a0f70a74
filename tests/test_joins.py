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


def test_rejects_reserved_salt_column(spark, skewed, dim):
    # withColumn would silently REPLACE a caller's __salt column and
    # join on the synthetic salt instead — must refuse loudly
    with_salt = skewed.withColumn("__salt", F.lit(7))
    with pytest.raises(ValueError, match="__salt.*reserved"):
        salted_join(with_salt, dim, "k")
    with pytest.raises(ValueError, match="__salt.*reserved"):
        salted_join(skewed, dim.withColumn("__salt", F.lit(7)), "k")


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

from postgresql_topn_spark.operators.joins import asof_join  # noqa: E402


@pytest.fixture(scope="module")
def quotes(spark):
    # (sym, ts, px, src): px deliberately NULL on the ts=20 GOOG row —
    # the matched row's NULL must come back, not an older px
    rows = [
        ("GOOG", 10, 100.0, "a"),
        ("GOOG", 20, None, "b"),
        ("GOOG", 30, 120.0, "c"),
        ("MSFT", 15, 50.0, "a"),
    ]
    return spark.createDataFrame(
        rows, "sym string, ts long, px double, src string"
    )


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("GOOG", 5, 1),   # before any quote -> all-NULL payload
        ("GOOG", 10, 2),  # tie with quote ts=10 (inclusive matches it)
        ("GOOG", 25, 3),  # latest preceding is ts=20 (NULL px, src=b)
        ("GOOG", 99, 4),  # ts=30
        ("MSFT", 16, 5),  # ts=15
        ("AMZN", 50, 6),  # key with no right rows at all
    ]
    return spark.createDataFrame(rows, "sym string, ts long, qty int")


def _by_qty(df):
    return {
        r["qty"]: (r["px"], r["src"])
        for r in df.select("qty", "px", "src").collect()
    }


def test_asof_inclusive_backward(quotes, trades):
    got = _by_qty(asof_join(trades, quotes, "sym", payload=["px", "src"]))
    assert got == {
        1: (None, None),      # nothing precedes
        2: (100.0, "a"),      # equal time matches (inclusive)
        3: (None, "b"),       # matched ROW has NULL px — must NOT
                              # back-fill px=100.0 from the older row
        4: (120.0, "c"),
        5: (50.0, "a"),
        6: (None, None),      # key absent on the right
    }


def test_asof_strict(quotes, trades):
    got = _by_qty(
        asof_join(trades, quotes, "sym", payload=["px", "src"], strict=True)
    )
    # equal time no longer matches: qty=2 at ts=10 gets nothing
    assert got[2] == (None, None)
    assert got[3] == (None, "b")
    assert got[5] == (50.0, "a")


def test_asof_null_payload_row_not_mixed(spark):
    """The ADVICE r4 regression shape in isolation: per-column fill
    would emit (px from row1, src from row2) — a row that never
    existed."""
    right = spark.createDataFrame(
        [("k", 1, 1.0, "old"), ("k", 2, None, "new")],
        "k string, ts long, px double, src string",
    )
    left = spark.createDataFrame([("k", 3)], "k string, ts long")
    row = asof_join(left, right, "k").collect()[0]
    assert (row["px"], row["src"]) == (None, "new")


def test_asof_all_null_payload_row_still_matches(spark):
    """A right row whose EVERY payload field is NULL is still a match
    (the struct is non-NULL) — it must shadow older non-NULL rows."""
    right = spark.createDataFrame(
        [("k", 1, 1.0, "old"), ("k", 2, None, None)],
        "k string, ts long, px double, src string",
    )
    left = spark.createDataFrame([("k", 3)], "k string, ts long")
    row = asof_join(left, right, "k").collect()[0]
    assert (row["px"], row["src"]) == (None, None)


def test_asof_right_tie_deterministic(spark):
    """Two right rows at the same (key, time): the one sorting LAST by
    payload struct wins, repeatably."""
    right = spark.createDataFrame(
        [("k", 1, 5.0, "a"), ("k", 1, 9.0, "z")],
        "k string, ts long, px double, src string",
    )
    left = spark.createDataFrame([("k", 2)], "k string, ts long")
    for _ in range(3):
        row = asof_join(left, right.repartition(4), "k").collect()[0]
        assert (row["px"], row["src"]) == (9.0, "z")


def test_asof_composite_key_and_payload_inference(spark):
    right = spark.createDataFrame(
        [("a", 1, 10, 7.0), ("a", 2, 10, 8.0), ("b", 1, 20, 9.0)],
        "g string, sub long, ts long, v double",
    )
    left = spark.createDataFrame(
        [("a", 1, 50), ("b", 1, 5)], "g string, sub long, ts long"
    )
    # payload inferred = all right columns minus keys minus right_time
    out = asof_join(left, right, ["g", "sub"])
    got = {(r["g"], r["sub"]): r["v"] for r in out.collect()}
    assert got == {("a", 1): 7.0, ("b", 1): None}  # b: ts 5 < 20


def test_asof_collision_and_empty_payload(spark, quotes, trades):
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "qty"), "sym")
    with pytest.raises(ValueError, match="not in right"):
        asof_join(trades, quotes, "sym", payload=["nope"])
    # empty payload: left comes back unchanged
    out = asof_join(trades, quotes, "sym", payload=[])
    assert out.columns == trades.columns and out.count() == trades.count()
    # a join key named like an internal column would otherwise surface
    # as an opaque ambiguous-column error deep in the plan
    with pytest.raises(ValueError, match="internal columns"):
        asof_join(
            trades.withColumnRenamed("sym", "__side"),
            quotes.withColumnRenamed("sym", "__side"),
            "__side",
        )
    # a key named "__l_<left column>" duplicates the union stream's
    # prefixed left column — also refused loudly
    with pytest.raises(ValueError, match="prefixed left columns"):
        asof_join(
            trades.withColumnRenamed("sym", "__l_qty"),
            quotes.withColumnRenamed("sym", "__l_qty"),
            "__l_qty",
        )


def test_asof_matches_duckdb(spark, quotes, trades):
    """Value-level parity with DuckDB's native ASOF LEFT JOIN on the
    same frames (the engine this operator cites as its spec)."""
    import duckdb

    con = duckdb.connect()
    con.register("q", quotes.toPandas())
    con.register("t", trades.toPandas())
    for strict, op in ((False, ">="), (True, ">")):
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT t.qty, q.px, q.src FROM t ASOF LEFT JOIN q "
                f"ON t.sym = q.sym AND t.ts {op} q.ts"
            ).fetchall()
        }
        got = _by_qty(
            asof_join(trades, quotes, "sym", payload=["px", "src"],
                      strict=strict)
        )
        # DuckDB NaN-vs-None normalization for floats
        want = {
            k: (None if v[0] != v[0] else v[0] if v[0] is not None else None,
                v[1])
            for k, v in want.items()
        }
        assert got == want, strict


def test_asof_forward_matches_duckdb(spark, quotes, trades):
    """direction='forward': earliest right row at-or-after the left
    time — DuckDB ASOF LEFT JOIN with <= as the reference."""
    import duckdb

    con = duckdb.connect()
    con.register("q", quotes.toPandas())
    con.register("t", trades.toPandas())
    for strict, op in ((False, "<="), (True, "<")):
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT t.qty, q.px, q.src FROM t ASOF LEFT JOIN q "
                f"ON t.sym = q.sym AND t.ts {op} q.ts"
            ).fetchall()
        }
        want = {
            k: (None if v[0] != v[0] else v[0], v[1])
            for k, v in want.items()
        }
        got = _by_qty(
            asof_join(
                trades, quotes, "sym", payload=["px", "src"],
                direction="forward", strict=strict,
            )
        )
        assert got == want, strict


def test_asof_nearest_matches_pandas(spark, quotes, trades):
    """direction='nearest': pandas merge_asof as the reference
    (equal-distance tie -> backward row)."""
    import pandas as pd

    qp = quotes.toPandas().sort_values("ts")
    tp = trades.toPandas().sort_values("ts")
    want_df = pd.merge_asof(
        tp, qp, on="ts", by="sym", direction="nearest"
    )
    want = {
        int(r.qty): (None if pd.isna(r.px) else r.px,
                     None if (isinstance(r.src, float) and pd.isna(r.src)) or r.src is None else r.src)
        for r in want_df.itertuples()
    }
    got = _by_qty(
        asof_join(
            trades, quotes, "sym", payload=["px", "src"],
            direction="nearest",
        )
    )
    assert got == want


def test_asof_nearest_tie_prefers_backward(spark):
    right = spark.createDataFrame(
        [("k", 10, "early"), ("k", 30, "late")],
        "k string, ts long, tag string",
    )
    left = spark.createDataFrame([("k", 20)], "k string, ts long")
    row = asof_join(left, right, "k", direction="nearest").collect()[0]
    assert row["tag"] == "early"  # dist 10 both ways -> backward


def test_asof_direction_validation(spark, quotes, trades):
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, "sym", direction="sideways")
    with pytest.raises(ValueError, match="nearest"):
        asof_join(trades, quotes, "sym", direction="nearest", strict=True)


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

from postgresql_topn_spark.operators.joins import interval_join  # noqa: E402


class TestIntervalJoin:
    def test_hand_computed_matches(self, spark):
        pts = spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 15.0), (4, 25.0), (5, 100.0)],
            "pid bigint, ts double",
        )
        ivs = spark.createDataFrame(
            [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 12.0, 30.0)],
            "tag string, start double, end double",
        )
        got = sorted(
            (r["pid"], r["tag"])
            for r in interval_join(
                pts, ivs, point_time="ts", bucket_width=8.0
            ).collect()
        )
        # half-open: ts=10 is NOT in [0,10) but IS in [10,20)
        assert got == [(1, "a"), (2, "b"), (3, "b"), (3, "c"), (4, "c")]

    def test_long_interval_broadcast_path(self, spark):
        pts = spark.createDataFrame(
            [(i, float(i)) for i in range(0, 1000, 100)],
            "pid bigint, ts double",
        )
        # one tiny bucket width + a giant interval: the explode path
        # would need 1000 buckets; long_multiple=4 routes it broadcast
        ivs = spark.createDataFrame(
            [("wide", -1.0, 2000.0), ("narrow", 195.0, 205.0)],
            "tag string, start double, end double",
        )
        got = sorted(
            (r["pid"], r["tag"])
            for r in interval_join(
                pts, ivs, point_time="ts", bucket_width=1.0, long_multiple=4
            ).collect()
        )
        assert got.count((200, "narrow")) == 1
        assert sum(1 for _, t in got if t == "wide") == 10
        assert all(t in ("wide", "narrow") for _, t in got)

    def test_keys_restrict_matches(self, spark):
        pts = spark.createDataFrame(
            [("u1", 1, 5.0), ("u2", 2, 5.0)], "u string, pid bigint, ts double"
        )
        ivs = spark.createDataFrame(
            [("u1", "w", 0.0, 10.0)], "u string, tag string, start double, end double"
        )
        got = interval_join(
            pts, ivs, point_time="ts", on="u", bucket_width=10.0
        ).collect()
        assert [(r["u"], r["pid"], r["tag"]) for r in got] == [("u1", 1, "w")]

    def test_matches_duckdb_range_join(self, spark):
        import random

        import duckdb

        rnd = random.Random(7)
        pts = [(i, rnd.uniform(0, 1000)) for i in range(300)]
        ivs = [
            (j, (s := rnd.uniform(0, 950)), s + rnd.uniform(0.1, 80))
            for j in range(40)
        ]
        pdf = spark.createDataFrame(pts, "pid bigint, ts double")
        idf = spark.createDataFrame(ivs, "iid bigint, start double, end double")
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pdf, idf, point_time="ts", bucket_width=50.0, long_multiple=2
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE p AS SELECT * FROM (VALUES %s) t(pid, ts)"
                    % ",".join(f"({i},{t!r})" for i, t in pts))
        con.execute("CREATE TABLE iv AS SELECT * FROM (VALUES %s) t(iid, s, e)"
                    % ",".join(f"({j},{s!r},{e!r})" for j, s, e in ivs))
        want = sorted(
            (r[0], r[1])
            for r in con.execute(
                "SELECT pid, iid FROM p JOIN iv ON ts >= s AND ts < e"
            ).fetchall()
        )
        assert got == want and len(got) > 100

    def test_validation_and_collisions(self, spark):
        pts = spark.createDataFrame([(1, 1.0)], "pid bigint, ts double")
        ivs = spark.createDataFrame(
            [(1, 0.0, 2.0)], "pid bigint, start double, end double"
        )
        with pytest.raises(ValueError, match="both sides"):
            interval_join(pts, ivs, point_time="ts", bucket_width=1.0)
        with pytest.raises(ValueError, match="bucket_width"):
            interval_join(
                pts,
                ivs.withColumnRenamed("pid", "iid"),
                point_time="ts",
                bucket_width=0,
            )
        # empty/inverted intervals match nothing
        inv = spark.createDataFrame(
            [("x", 5.0, 5.0), ("y", 9.0, 3.0)],
            "tag string, start double, end double",
        )
        assert interval_join(
            pts, inv, point_time="ts", bucket_width=1.0
        ).count() == 0


def test_new_joins_are_all_jvm(spark, quotes, trades):
    """asof_join (all directions) and interval_join plan zero Python
    stages — whole-stage-codegen operators end to end."""
    from postgresql_topn_spark.plans.audit import python_stages

    for d in ("backward", "forward", "nearest"):
        df = asof_join(trades, quotes, "sym", payload=["px"], direction=d)
        assert python_stages(df) == 0, d
    pts = spark.createDataFrame([(1, 5.0)], "pid bigint, ts double")
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0)], "tag string, start double, end double"
    )
    out = interval_join(pts, ivs, point_time="ts", bucket_width=4.0)
    assert python_stages(out) == 0


def test_interval_join_auto_bucket_width(spark):
    """bucket_width='auto' sizes the grid from the median interval span
    and returns the same matches as an explicit width."""
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 200, 7)], "pid bigint, ts double"
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 20), float(j * 20 + 15)) for j in range(10)],
        "iid bigint, start double, end double",
    )
    auto = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, point_time="ts", bucket_width="auto"
        ).collect()
    )
    explicit = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, point_time="ts", bucket_width=15.0
        ).collect()
    )
    assert auto == explicit and len(auto) > 10
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, point_time="ts", bucket_width="huge")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, point_time="ts", bucket_width=True)


def test_interval_join_left_keeps_unmatched_points(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "pid bigint, ts double"
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0), ("wide", -10.0, 600.0)],
        "tag string, start double, end double",
    )
    # wide spans many buckets -> broadcast path; a matches pid 1 only
    got = sorted(
        (r["pid"], r["tag"])
        for r in interval_join(
            pts, ivs, point_time="ts", bucket_width=10.0,
            long_multiple=4, how="left",
        ).collect()
    )
    assert got == [(1, "a"), (1, "wide"), (2, "wide"), (3, "wide")]
    # narrow-only intervals: pid 3 survives null-extended
    got2 = sorted(
        (r["pid"], r["tag"])
        for r in interval_join(
            pts,
            ivs.where(F.col("tag") == "a"),
            point_time="ts",
            bucket_width=10.0,
            how="left",
        ).collect()
    )
    assert got2 == [(1, "a"), (2, None), (3, None)]
    import pytest as _p

    with _p.raises(ValueError, match="how"):
        interval_join(pts, ivs, point_time="ts", bucket_width=10.0, how="full")


def test_interval_join_left_null_id_and_time(spark):
    """Review pin: how='left' must not depend on any id column — a
    matched point whose every column is NULL-laden is emitted exactly
    once, and a NULL-time point matches nothing but SURVIVES
    null-extended (SQL LEFT semantics)."""
    pts = spark.createDataFrame(
        [(None, 5.0), (None, None), (7, 50.0)], "pid bigint, ts double"
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0)], "tag string, start double, end double"
    )
    rows = [
        (r["pid"], r["ts"], r["tag"])
        for r in interval_join(
            pts, ivs, point_time="ts", bucket_width=10.0, how="left"
        ).collect()
    ]
    got = sorted(
        rows,
        key=lambda t: (t[0] is not None, t[0] or 0, t[1] is not None, t[1] or 0),
    )
    assert got == [(None, None, None), (None, 5.0, "a"), (7, 50.0, None)]


class TestBloomPrunedJoin:
    def _tables(self, spark):
        large = spark.createDataFrame(
            [(i % 500, f"p{i}", i * 1.5) for i in range(4000)],
            "k bigint, payload string, v double",
        )
        # small side matches only 40 of the 500 large-side keys
        small = spark.createDataFrame(
            [(k * 13, f"s{k}") for k in range(40)], "k bigint, tag string"
        )
        return large, small

    def test_equals_plain_join(self, spark):
        from postgresql_topn_spark.operators.joins import bloom_pruned_join

        large, small = self._tables(spark)
        got = sorted(
            map(tuple, bloom_pruned_join(large, small, "k").collect())
        )
        exp = sorted(map(tuple, large.join(small, "k").collect()))
        assert got == exp and len(exp) > 0

    def test_left_semi_and_null_keys(self, spark):
        from postgresql_topn_spark.operators.joins import bloom_pruned_join

        large, small = self._tables(spark)
        large = large.union(
            spark.createDataFrame(
                [(None, "pnull", 0.0)], "k bigint, payload string, v double"
            )
        )
        got = sorted(
            map(
                tuple,
                bloom_pruned_join(large, small, "k", how="left_semi").collect(),
            )
        )
        exp = sorted(map(tuple, large.join(small, "k", "left_semi").collect()))
        assert got == exp

    def test_composite_key(self, spark):
        from postgresql_topn_spark.operators.joins import bloom_pruned_join

        large = spark.createDataFrame(
            [(i % 20, f"g{i % 7}", i) for i in range(500)],
            "a bigint, b string, v bigint",
        )
        small = spark.createDataFrame(
            [(3, "g1", "x"), (5, "g2", "y"), (19, "g6", "z")],
            "a bigint, b string, tag string",
        )
        got = sorted(
            map(tuple, bloom_pruned_join(large, small, ["a", "b"]).collect())
        )
        exp = sorted(map(tuple, large.join(small, ["a", "b"]).collect()))
        assert got == exp and len(exp) > 0

    def test_prune_filter_in_plan_and_validation(self, spark):
        from postgresql_topn_spark.operators.joins import bloom_pruned_join

        large, small = self._tables(spark)
        out = bloom_pruned_join(large, small, "k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the default fast-hash slot probe sits in a Filter ahead of
        # the equi-join; portable=True swaps in the md5 form
        assert "xxhash64" in plan
        p2 = bloom_pruned_join(large, small, "k", portable=True)
        assert "md5" in p2._jdf.queryExecution().executedPlan().toString()
        # both hash modes produce the identical (exact) join result
        exp = sorted(map(tuple, large.join(small, "k").collect()))
        assert sorted(map(tuple, p2.collect())) == exp
        import pytest as _p

        with _p.raises(ValueError, match="how"):
            bloom_pruned_join(large, small, "k", how="left")
        with _p.raises(ValueError, match="at least one"):
            bloom_pruned_join(large, small, [])


def test_asof_randomized_vs_merge_asof(spark):
    """Seeded randomized differential test: ~40 independent cases ride
    ONE asof_join call per (direction, strict) via a case-id join key,
    and pandas merge_asof (the semantics reference) replays each
    lane with by=[case, sym]. Right (case, sym, ts) triples are unique
    — our documented tie deviation (max-by-payload among right ties) is
    out of scope, per the operator docstring. For nearest, left times
    are odd and right times even, so an exact-distance tie (2*lt =
    rb+rf) is impossible and the pandas tie rule never engages."""
    import random

    import pandas as pd

    rng = random.Random(20260815)

    def gen(parity_split):
        lrows, rrows, lid = [], [], 0
        for case in range(40):
            for sym in ("a", "b"):
                seen = set()
                for _ in range(rng.randint(0, 5)):
                    ts = rng.randrange(0, 60)
                    if parity_split:
                        ts |= 1  # odd left times
                    lrows.append((case, sym, ts, lid))
                    lid += 1
                for _ in range(rng.randint(0, 4)):
                    ts = rng.randrange(0, 60)
                    if parity_split:
                        ts &= ~1  # even right times
                    if (case, sym, ts) in seen:
                        continue
                    seen.add((case, sym, ts))
                    px = None if rng.random() < 0.3 else float(rng.randrange(100))
                    rrows.append((case, sym, ts, px, f"t{rng.randrange(9)}"))
        left = spark.createDataFrame(
            lrows, "case int, sym string, ts long, lid int"
        )
        right = spark.createDataFrame(
            rrows, "case int, sym string, ts long, px double, tag string"
        )
        lp = pd.DataFrame(lrows, columns=["case", "sym", "ts", "lid"])
        rp = pd.DataFrame(rrows, columns=["case", "sym", "ts", "px", "tag"])
        return left, right, lp.sort_values("ts"), rp.sort_values("ts")

    def canon(v):
        return None if v is None or (isinstance(v, float) and v != v) else v

    lanes = [("backward", False), ("backward", True),
             ("forward", False), ("forward", True), ("nearest", False)]
    for direction, strict in lanes:
        left, right, lp, rp = gen(parity_split=direction == "nearest")
        got = {
            r["lid"]: (canon(r["px"]), canon(r["tag"]))
            for r in asof_join(
                left, right, ["case", "sym"],
                payload=["px", "tag"], direction=direction, strict=strict,
            ).collect()
        }
        want_df = pd.merge_asof(
            lp, rp, on="ts", by=["case", "sym"],
            direction=direction, allow_exact_matches=not strict,
        )
        want = {
            int(r.lid): (canon(r.px), canon(r.tag))
            for r in want_df.itertuples()
        }
        assert got == want, (direction, strict)


def test_interval_join_left_randomized_vs_duckdb(spark):
    """Seeded randomized differential for the how='left' lane (the
    double-anti-join unmatched path) against DuckDB's LEFT JOIN with
    the same range predicate: random keys, NULL point times, inverted/
    empty spans, and spans long enough to take the broadcast-long path
    (long_multiple=2)."""
    import random

    import duckdb

    from postgresql_topn_spark.operators.joins import interval_join

    rnd = random.Random(55)
    pts = [
        (
            i,
            rnd.choice(["a", "b", "c"]),
            None if rnd.random() < 0.1 else rnd.uniform(0, 200),
        )
        for i in range(250)
    ]
    ivs = []
    for j in range(30):
        s = rnd.uniform(0, 190)
        span = rnd.choice([0.0, -5.0, rnd.uniform(0.1, 12), rnd.uniform(30, 90)])
        ivs.append((j, rnd.choice(["a", "b", "d"]), s, s + span))
    pdf = spark.createDataFrame(pts, "pid bigint, k string, ts double")
    idf = spark.createDataFrame(
        ivs, "iid bigint, k string, start double, end double"
    )
    out = interval_join(
        pdf, idf, point_time="ts", on="k",
        bucket_width=8.0, long_multiple=2, how="left",
    )
    got = sorted(
        (r["pid"], r["iid"]) for r in out.select("pid", "iid").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES %s) t(pid, k, ts)"
        % ",".join(
            f"({i},'{k}',{('NULL' if t is None else repr(t))})"
            for i, k, t in pts
        )
    )
    con.execute(
        "CREATE TABLE iv AS SELECT * FROM (VALUES %s) t(iid, k, s, e)"
        % ",".join(f"({j},'{k}',{s!r},{e!r})" for j, k, s, e in ivs)
    )
    want = sorted(
        (r[0], r[1])
        for r in con.execute(
            "SELECT p.pid, iv.iid FROM p LEFT JOIN iv"
            " ON p.k = iv.k AND p.ts >= iv.s AND p.ts < iv.e"
        ).fetchall()
    )
    assert got == want
    # sanity: the random data actually exercised both lanes
    assert any(i is None for _, i in got) and sum(
        i is not None for _, i in got
    ) > 50
