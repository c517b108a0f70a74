"""DSIR importance resampling: definition-level differential vs a
pure-python replica (hashing, model, weights, Gumbel keys, selection),
partition invariance, target-enrichment sanity, empty-doc handling,
and validation."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.dsir import (
    _MICRO,
    dsir_importance,
    dsir_model,
    dsir_resample,
    gumbel_micro,
    hashed_ngrams,
)

B = 64  # small bucket count so collisions actually happen in tests


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str, bigrams=True):
    toks = [t for t in text.split() if t]
    out = list(toks)
    if bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _buckets(text: str, bigrams=True):
    return [_h60(f) % B for f in _feats(text, bigrams)]


RAW = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate my homework"),
    (3, "stocks rallied as markets opened higher today"),
    (4, "quarterly earnings beat analyst expectations again"),
    (5, "the cat and the dog are friends"),
    (6, ""),
    (7, "markets fell on rate fears as stocks slid"),
    (8, "a cat a mat a hat"),
]
TARGET_IDS = {3, 4, 7}  # the "finance" slice


def _replica_model(alpha=1.0):
    from collections import Counter

    cr, ct = Counter(), Counter()
    for i, t in RAW:
        for b in _buckets(t):
            cr[b] += 1
            if i in TARGET_IDS:
                ct[b] += 1
    tr, tt = sum(cr.values()), sum(ct.values())
    lr = {}
    for b in set(cr) | set(ct):
        lr[b] = round(
            (
                (math.log(ct.get(b, 0) + alpha) - math.log(tt + alpha * B))
                - (math.log(cr.get(b, 0) + alpha) - math.log(tr + alpha * B))
            )
            * _MICRO
        )
    return lr


def _replica_weights():
    lr = _replica_model()
    out = {}
    for i, t in RAW:
        bs = _buckets(t)
        out[i] = (len(bs), sum(lr[b] for b in bs))
    return out


def _replica_keys(seed=0, temperature=1.0):
    w = _replica_weights()
    keys = {}
    for i, (nf, lw) in w.items():
        h = _h60(f"{seed}:{i}")
        u = (h + 0.5) / float(1 << 60)
        g = round(-math.log(-math.log(u)) * _MICRO)
        keys[i] = round(lw / temperature) + g
    return keys


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(corpus):
    return corpus.where(F.col("doc_id").isin(*TARGET_IDS))


def test_model_matches_replica(corpus, target):
    got = {
        r["bucket"]: r["lr_micro"]
        for r in dsir_model(corpus, target, n_buckets=B).collect()
    }
    assert got == _replica_model()


def test_weights_match_replica(corpus, target):
    model = dsir_model(corpus, target, n_buckets=B)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_importance(corpus, model, n_buckets=B).collect()
    }
    assert got == _replica_weights()
    # the empty doc is present with identity weight
    assert got[6] == (0, 0)
    # finance docs outscore pet docs toward the finance target
    assert got[3][1] > got[1][1] and got[7][1] > got[5][1]


def test_resample_matches_replica_and_is_partition_invariant(
    spark, corpus, target
):
    keys = _replica_keys()
    want = sorted(keys, key=lambda i: (-keys[i], i))[:4]
    got = [
        r["doc_id"]
        for r in dsir_resample(
            corpus, target, k=4, n_buckets=B
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    got_keys = {
        r["doc_id"]: r["key_micro"]
        for r in dsir_resample(corpus, target, k=8, n_buckets=B).collect()
    }
    assert got_keys == keys
    # same selection under a different partitioning
    re = corpus.repartition(7)
    got2 = [
        r["doc_id"]
        for r in dsir_resample(
            re, target.repartition(3), k=4, n_buckets=B
        ).collect()
    ]
    assert sorted(got2) == sorted(want)


def test_temperature_flattens(corpus, target):
    """T >> 1 divides the weight term away; keys converge to pure
    Gumbel noise (target pull vanishes)."""
    hot = _replica_keys(temperature=1e9)
    got = {
        r["doc_id"]: r["key_micro"]
        for r in dsir_resample(
            corpus, target, k=8, n_buckets=B, temperature=1e9
        ).collect()
    }
    assert got == hot


def test_seed_changes_selection_space(corpus, target):
    a = dsir_resample(corpus, target, k=8, n_buckets=B, seed=0).collect()
    b = dsir_resample(corpus, target, k=8, n_buckets=B, seed=1).collect()
    ka = {r["doc_id"]: r["key_micro"] for r in a}
    kb = {r["doc_id"]: r["key_micro"] for r in b}
    assert ka != kb  # fresh noise
    wa = {r["doc_id"]: r["logw_micro"] for r in a}
    wb = {r["doc_id"]: r["logw_micro"] for r in b}
    assert wa == wb  # weights untouched by the seed


def test_unigram_only_mode(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    got = df.select(hashed_ngrams("text", bigrams=False).alias("f")).collect()[
        0
    ]["f"]
    assert got == ["x", "y", "z"]
    got2 = df.select(hashed_ngrams("text").alias("f")).collect()[0]["f"]
    assert got2 == ["x", "y", "z", "x y", "y z"]


def test_enrichment_on_documents_table(spark):
    """End-to-end statistical sanity on real data: resampling toward
    the English slice must over-represent it vs the base rate."""
    from postgresql_topn_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    en = docs.where(F.col("lang") == "en")
    base = en.count() / docs.count()
    sel = dsir_resample(docs, en, k=100, n_buckets=4096)
    frac = (
        sel.join(docs, "doc_id").where(F.col("lang") == "en").count()
        / sel.count()
    )
    assert frac > base  # pulled toward the target


def test_rollup_merge_law(spark, corpus, target):
    """Bucket counts are additive: the model built from summed
    per-group rollup rows equals the direct model EXACTLY — the
    build-per-bucket / merge-at-read law of every rollup family."""
    from postgresql_topn_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_model_from_counts,
    )

    tagged = corpus.withColumn("src", F.pmod(F.col("doc_id"), F.lit(3)))
    rollup = dsir_bucket_counts(tagged, ["src"], n_buckets=B)
    # raw = all three sources merged; target = the slice law re-derived
    # from a SECOND rollup over the target docs only
    traw = rollup.select("bucket", "cnt")
    ttgt = dsir_bucket_counts(
        tagged.where(F.col("doc_id").isin(*TARGET_IDS)), ["src"], n_buckets=B
    ).select("bucket", "cnt")
    merged = {
        r["bucket"]: (r["ct"], r["cr"], r["lr_micro"])
        for r in dsir_model_from_counts(
            traw, ttgt, n_buckets=B
        ).collect()
    }
    direct = {
        r["bucket"]: (r["ct"], r["cr"], r["lr_micro"])
        for r in dsir_model(corpus, target, n_buckets=B).collect()
    }
    assert merged == direct


def test_validation(corpus, target):
    with pytest.raises(ValueError, match="k must"):
        dsir_resample(corpus, target, k=0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(corpus, target, k=1, temperature=0.0)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_model(corpus, target, n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_model(corpus, target, alpha=0.0)


def test_model_save_load_roundtrip_keeps_coupling(spark, tmp_path):
    """save/load restores the (n_buckets, alpha) tag across the store
    boundary: the reloaded model scores identically AND still rejects
    mismatched scoring parameters — where a bare parquet read would
    have silently skipped the validation."""
    import pytest

    from postgresql_topn_spark.operators.dsir import (
        dsir_model,
        dsir_resample,
        load_dsir_model,
        save_dsir_model,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common tokens w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    target = docs.where(F.col("doc_id") % 2 == 0)
    model = dsir_model(docs, target, n_buckets=128, alpha=1.0)
    path = str(tmp_path / "dsir_model")
    save_dsir_model(model, path)
    back = load_dsir_model(spark, path)
    assert back._dsir_params == (128, 1.0)
    want = {
        tuple(r)
        for r in dsir_resample(
            docs, None, model=model, k=10, n_buckets=128, seed=1
        ).collect()
    }
    got = {
        tuple(r)
        for r in dsir_resample(
            docs, None, model=back, k=10, n_buckets=128, seed=1
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_resample(docs, None, model=back, k=10, n_buckets=64, seed=1)
    # untagged frames are not persistable — no authoritative params
    with pytest.raises(ValueError, match="tag"):
        save_dsir_model(spark.read.parquet(f"{path}/model"), str(tmp_path / "x"))
