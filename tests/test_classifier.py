"""LR quality classifier: exact-integer differential against a
pure-Python replay, separation/convergence behavior, partition
invariance, and the model-tag / reserved-name contracts."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.classifier import (
    lr_features,
    lr_score,
    lr_train,
)

_MICRO = 1_000_000


def _round_half_up(x: float) -> int:
    # Spark's F.round / DuckDB's round: HALF_UP (away from zero), not
    # Python's banker's rounding
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _bucket(feature: str, n_buckets: int) -> int:
    h = int(hashlib.md5(feature.encode()).hexdigest()[:15], 16)
    return h % n_buckets


def _feats(text: str, n_buckets: int) -> dict:
    """(bucket -> micro-mean mass m), mirroring lr_features."""
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    cnt: dict = {}
    for g in grams:
        b = _bucket(g, n_buckets)
        cnt[b] = cnt.get(b, 0) + 1
    nf = len(grams)
    return {b: _round_half_up(c * 1e6 / nf) for b, c in cnt.items()}


def _train_replay(pos, neg, n_buckets, iters, lr):
    """Bit-exact replay of lr_train's integer GD in plain Python."""
    examples = [(f"1:{i}", 1, _feats(t, n_buckets)) for i, t in pos] + [
        (f"0:{i}", 0, _feats(t, n_buckets)) for i, t in neg
    ]
    n = len(examples)
    w: dict = {}
    b = 0
    for _ in range(iters):
        resid = {}
        for tid, y, fs in examples:
            z = b + _round_half_up(
                sum(m * w.get(bk, 0) for bk, m in fs.items()) / 1e6
            )
            zc = max(-30.0, min(30.0, z / 1e6))
            p = 1.0 / (1.0 + math.exp(-zc))
            resid[tid] = _round_half_up((p - y) * 1e6)
        grad: dict = {}
        mass: dict = {}
        for tid, y, fs in examples:
            for bk, m in fs.items():
                grad[bk] = grad.get(bk, 0) + _round_half_up(
                    m * resid[tid] / 1e6
                )
                mass[bk] = mass.get(bk, 0) + m
        for bk, g in grad.items():
            if mass[bk] > 0:
                w[bk] = w.get(bk, 0) - _round_half_up(lr * g / mass[bk] * 1e6)
            else:
                w[bk] = w.get(bk, 0)
        b -= _round_half_up(lr * sum(resid.values()) / n)
    return w, b


@pytest.fixture(scope="module")
def corpora(spark):
    import random

    rng = random.Random(11)
    good_vocab = [f"good{i}" for i in range(20)]
    bad_vocab = [f"junk{i}" for i in range(20)]
    shared = [f"s{i}" for i in range(10)]
    pos = [
        (i, " ".join(rng.choices(good_vocab + shared, k=15)))
        for i in range(40)
    ]
    neg = [
        (i, " ".join(rng.choices(bad_vocab + shared, k=15)))
        for i in range(40)
    ]
    pos_df = spark.createDataFrame(pos, "doc_id long, text string")
    neg_df = spark.createDataFrame(neg, "doc_id long, text string")
    return pos, neg, pos_df, neg_df


class TestLrTrain:
    def test_exact_match_with_python_replay(self, corpora):
        pos, neg, pos_df, neg_df = corpora
        # lr far past the stable bound on purpose: the replay must
        # match bit-for-bit even when the optimization diverges
        model = lr_train(
            pos_df, neg_df, n_buckets=256, iters=3, lr=100.0
        )
        got = {r["bucket"]: r["w_micro"] for r in model.collect()}
        w, b = _train_replay(pos, neg, 256, 3, 100.0)
        assert got.pop(-1) == b
        assert (got.pop(-2), got.pop(-3)) == (256, 1)  # embedded params
        assert got == w

    def test_partition_invariance(self, corpora):
        _, _, pos_df, neg_df = corpora
        a = {
            r["bucket"]: r["w_micro"]
            for r in lr_train(
                pos_df, neg_df, n_buckets=128, iters=2, lr=2.0
            ).collect()
        }
        bq = {
            r["bucket"]: r["w_micro"]
            for r in lr_train(
                pos_df.repartition(7),
                neg_df.repartition(13),
                n_buckets=128,
                iters=2,
                lr=2.0,
            ).collect()
        }
        assert a == bq

    def test_separates_pos_from_neg(self, corpora):
        _, _, pos_df, neg_df = corpora
        model = lr_train(pos_df, neg_df, n_buckets=512, iters=3, lr=2.0)
        sp = lr_score(pos_df, model, n_buckets=512)
        sn = lr_score(neg_df, model, n_buckets=512)
        mp = sp.agg(F.avg("prob")).collect()[0][0]
        mn = sn.agg(F.avg("prob")).collect()[0][0]
        assert mp > 0.7 > 0.3 > mn
        # training accuracy on a separable vocabulary should be high
        acc = (
            sp.where(F.col("prob") > 0.5).count()
            + sn.where(F.col("prob") < 0.5).count()
        ) / 80
        assert acc > 0.9

    def test_zero_token_docs_train_and_score_via_bias(self, spark):
        pos = spark.createDataFrame(
            [(1, "alpha beta"), (2, "   ")], "doc_id long, text string"
        )
        neg = spark.createDataFrame(
            [(3, "gamma delta")], "doc_id long, text string"
        )
        model = lr_train(pos, neg, n_buckets=64, iters=2, lr=1.0)
        scored = {
            r["doc_id"]: r
            for r in lr_score(pos, model, n_buckets=64).collect()
        }
        bias = {r["bucket"]: r["w_micro"] for r in model.collect()}[-1]
        # the empty doc's logit is exactly the bias
        assert scored[2]["z_micro"] == bias

    def test_model_tag_validation(self, corpora):
        _, _, pos_df, neg_df = corpora
        model = lr_train(pos_df, neg_df, n_buckets=128, iters=1)
        with pytest.raises(ValueError, match="feature spaces"):
            lr_score(pos_df, model, n_buckets=256)

    def test_validation_errors(self, corpora, spark):
        _, _, pos_df, neg_df = corpora
        with pytest.raises(ValueError, match="iters"):
            lr_train(pos_df, neg_df, iters=0)
        with pytest.raises(ValueError, match="lr"):
            lr_train(pos_df, neg_df, lr=0.0)
        with pytest.raises(ValueError, match="reserved"):
            lr_features(
                spark.createDataFrame([("a", "t")], "bucket string, text string"),
                "bucket",
                "text",
            )


class TestLrFeatures:
    def test_counts_match_hand_hash(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a")], "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["bucket"]): (r["cnt"], r["m"])
            for r in lr_features(docs, n_buckets=64).collect()
        }
        # grams: a, b, a, "a b", "b a" -> nf=5
        want: dict = {}
        cnts = {}
        for g in ["a", "b", "a", "a b", "b a"]:
            cnts[_bucket(g, 64)] = cnts.get(_bucket(g, 64), 0) + 1
        for k, c in cnts.items():
            want[(1, k)] = (c, _round_half_up(c * 1e6 / 5))
        assert got == want


def test_score_reserved_id_col_rejected(spark):
    from postgresql_topn_spark.operators.classifier import lr_score, lr_train

    pos = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    neg = spark.createDataFrame([(2, "c d")], "doc_id long, text string")
    model = lr_train(pos, neg, n_buckets=16, iters=1)
    bad = spark.createDataFrame([("x", "a")], "prob string, text string")
    with pytest.raises(ValueError, match="reserved"):
        lr_score(bad, model, id_col="prob", n_buckets=16)


# property coverage of the fixed-point GD loop: random corpora of
# random vocab overlap/length (incl. empty and single-token docs),
# random iteration counts and step sizes — Spark must equal the
# pure-Python integer replay EXACTLY on every draw. Few examples
# (each runs a Spark job chain), wide strategy.
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from([f"w{i}" for i in range(12)] + ["the", "of"])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    pos=st.lists(_doc, min_size=1, max_size=6),
    neg=st.lists(_doc, min_size=1, max_size=6),
    iters=st.integers(min_value=1, max_value=3),
    lr=st.sampled_from([0.5, 1.0, 2.0]),
    n_buckets=st.sampled_from([16, 64]),
)
def test_train_replay_property(spark_session_holder, pos, neg, iters, lr, n_buckets):
    spark = spark_session_holder[0]
    pos_rows = list(enumerate(pos))
    neg_rows = list(enumerate(neg))
    pos_df = spark.createDataFrame(pos_rows, "doc_id long, text string")
    neg_df = spark.createDataFrame(neg_rows, "doc_id long, text string")
    model = lr_train(
        pos_df, neg_df, n_buckets=n_buckets, iters=iters, lr=lr
    )
    got = {r["bucket"]: r["w_micro"] for r in model.collect()}
    w, b = _train_replay(pos_rows, neg_rows, n_buckets, iters, lr)
    assert got.pop(-1) == b
    got.pop(-2); got.pop(-3)
    assert got == w


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures inside @given; hand
    # the module-scoped session through a stable holder instead
    return [spark]


def test_model_params_survive_persistence(spark, tmp_path):
    """A model written to parquet and reloaded (Python tag gone) still
    scores identically AND still rejects a feature-space mismatch —
    the embedded -2/-3 parameter rows do what the in-session tag did."""
    pos = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(3, "junk noise"), (4, "noise junk junk")],
        "doc_id long, text string",
    )
    model = lr_train(pos, neg, n_buckets=64, iters=2, lr=1.0)
    path = str(tmp_path / "lr_model")
    model.write.mode("overwrite").parquet(path)
    reloaded = spark.read.parquet(path)
    assert not hasattr(reloaded, "_lr_params")
    want = {
        (r["doc_id"], r["z_micro"], r["prob"])
        for r in lr_score(pos, model, n_buckets=64).collect()
    }
    got = {
        (r["doc_id"], r["z_micro"], r["prob"])
        for r in lr_score(pos, reloaded, n_buckets=64).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="feature spaces"):
        lr_score(pos, reloaded, n_buckets=128)


class TestSharedFeatures:
    """share_features handoff (r13 optimization): the scorer fed the
    training feature table must produce byte-identical scores to the
    self-featurizing form, in both cut flavors."""

    @pytest.fixture(scope="class")
    def disjoint(self, spark):
        # id-DISJOINT pos/neg (the lr_shared_features contract); docs
        # is exactly pos ∪ neg, including a zero-token doc that scores
        # via the bare bias
        pos = spark.createDataFrame(
            [(1, "alpha beta gamma alpha"), (2, "alpha beta"), (3, "")],
            "doc_id long, text string",
        )
        neg = spark.createDataFrame(
            [(101, "junk noise junk"), (102, "noise junk beta")],
            "doc_id long, text string",
        )
        return pos, neg, pos.unionByName(neg)

    def test_scores_identical_local_mode(self, disjoint):
        from postgresql_topn_spark.operators.classifier import (
            lr_shared_features,
        )

        pos, neg, docs = disjoint
        base_model = lr_train(pos, neg, n_buckets=64, iters=2, lr=1.0)
        assert lr_shared_features(base_model) is None  # not shared
        want = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(docs, base_model, n_buckets=64).collect()
        )
        model = lr_train(
            pos, neg, n_buckets=64, iters=2, lr=1.0, share_features=True
        )
        sh = lr_shared_features(model)
        assert set(sh.columns) == {"doc_id", "bucket", "m"}
        got = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(
                docs, model, n_buckets=64, features=sh
            ).collect()
        )
        assert got == want

    def test_scores_identical_reliable_mode(self, disjoint, tmp_path):
        from postgresql_topn_spark.operators.classifier import (
            lr_shared_features,
        )

        pos, neg, docs = disjoint
        want = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(
                docs, lr_train(pos, neg, n_buckets=64, iters=2, lr=1.0),
                n_buckets=64,
            ).collect()
        )
        model = lr_train(
            pos,
            neg,
            n_buckets=64,
            iters=2,
            lr=1.0,
            checkpoint_dir=str(tmp_path),
            share_features=True,
        )
        # the feats cut joins the two model cuts in _lr_cut_paths for
        # caller-side reclamation (it is NOT released by lr_train)
        assert len(model._lr_cut_paths) == 3
        got = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(
                docs,
                model,
                n_buckets=64,
                features=lr_shared_features(model),
            ).collect()
        )
        assert got == want

    def test_shared_with_reloaded_model(self, disjoint, tmp_path):
        # the recipe/roundtrip shape: features are model-independent,
        # so a model reloaded through a store boundary scores the
        # shared table identically
        from postgresql_topn_spark.operators.classifier import (
            lr_shared_features,
        )

        pos, neg, docs = disjoint
        model = lr_train(
            pos, neg, n_buckets=64, iters=2, lr=1.0, share_features=True
        )
        path = str(tmp_path / "m")
        model.write.mode("overwrite").parquet(path)
        want = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(docs, model, n_buckets=64).collect()
        )
        got = sorted(
            (r["doc_id"], r["z_micro"], r["prob"])
            for r in lr_score(
                docs,
                model.sparkSession.read.parquet(path),
                n_buckets=64,
                features=lr_shared_features(model),
            ).collect()
        )
        assert got == want

    def test_features_frame_validated(self, disjoint):
        pos, neg, docs = disjoint
        model = lr_train(pos, neg, n_buckets=64, iters=2, lr=1.0)
        bad = docs.select("doc_id", F.lit(0).alias("bucket"))  # no "m"
        with pytest.raises(ValueError, match="missing required column"):
            lr_score(docs, model, n_buckets=64, features=bad)


def test_train_parts_scales_with_input_bytes(spark, tmp_path):
    """_train_parts: ceil(input file bytes / spark.topn.lr.partitionBytes)
    clamped to [1, spark.sql.shuffle.partitions] — toy corpora stop
    fanning the GD working set into conf-many near-empty partitions,
    real corpora hit the cap and keep the session conf as the scale
    lever; a frame with no scan files (in-memory relation) falls back
    to the cap (never under-parallelize blind)."""
    import glob
    import os

    from postgresql_topn_spark.operators.classifier import _train_parts

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "alpha beta " * 50) for i in range(200)], "doc_id long, text string"
    ).repartition(2).write.parquet(path)
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    df = spark.read.parquet(path)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        # per-part just under half the total -> ceil gives 3 (or the
        # exact ceil for the measured size), under the cap
        per = max(1, total // 3)
        spark.conf.set("spark.topn.lr.partitionBytes", str(per))
        assert _train_parts(df) == min(cap, -(-total // per))
        # 1 byte per partition -> clamped to the session conf
        spark.conf.set("spark.topn.lr.partitionBytes", "1")
        assert _train_parts(df) == cap
        # huge per-partition budget -> single-partition floor
        spark.conf.set("spark.topn.lr.partitionBytes", "1g")
        assert _train_parts(df) == 1
        # no scan files behind the plan: keep configured parallelism
        mem = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        assert _train_parts(mem) == cap
    finally:
        spark.conf.unset("spark.topn.lr.partitionBytes")


def test_weight_lookup_string_literal_exact_int64(spark):
    """_weight_lookup ships the dense weight array as ONE string
    literal (r13 — F.lit(list) maps lit() per element through py4j,
    ~0.35 s per 512-bucket lookup): the string->bigint cast must be
    exact over the full int64 range, and Catalyst must constant-fold
    split+cast to the literal array so execution is identical to the
    old form."""
    from pyspark.sql import functions as F

    from postgresql_topn_spark.operators.classifier import _weight_lookup

    w = {0: -(2**63), 1: 2**63 - 1, 2: None, 4: -1}
    df = spark.range(5).select(F.col("id").cast("long").alias("bucket"))
    out = df.select(_weight_lookup(w, 5).alias("w")).orderBy("w").collect()
    got = sorted(r.w for r in out)
    # None and the absent bucket 3 read as exact 0 (the coalesce rule)
    assert got == sorted([-(2**63), 2**63 - 1, 0, 0, -1])
    q = df.select(_weight_lookup(w, 5).alias("w"))
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    assert "split(" not in opt  # folded to the literal array
