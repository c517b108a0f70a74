"""Regression pins for the round-6 advisor findings and the round-7
quadratic-guard-default promotion (VERDICT r6 item 7):

1. dsir: a precomputed model built under (n_buckets, alpha) different
   from the scoring call's silently skewed the unseen-bucket floor —
   now the in-process model carries a parameter tag that is validated.
2. dsir_bucket_counts: a group column literally named 'bucket' (or
   'cnt') collided with the derived output columns -> ambiguous
   reference downstream; now rejected up front, derivation happens
   under a __-prefixed working name (bloom.py convention).
3. semantic_dedup(n_clusters='auto') sized the quantizer from the raw
   corpus count INCLUDING NULL-id rows that assignment then drops;
   now it counts judged rows only.
4/5. tfidf_cosine_pairs / substring_run_pairs now default their df
   caps to 'auto' = max(1000, ceil(0.5% * N)) — the bound must BIND on
   a pathological corpus (a >1000-doc boilerplate gram) and must be
   invisible on a small corpus (floor never reached).
"""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. DSIR model/scoring parameter coupling
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_model_param_tag_validated(spark):
    from postgresql_topn_spark.operators.dsir import (
        dsir_importance,
        dsir_model,
        dsir_resample,
    )

    raw = _docs(spark, [(1, "a b c"), (2, "c d e"), (3, "e f g")])
    tgt = _docs(spark, [(10, "a b"), (11, "a c")])
    model = dsir_model(raw, tgt, n_buckets=64, alpha=1.0)
    # matching params: fine
    dsir_importance(raw, model, n_buckets=64, alpha=1.0).collect()
    # mismatched n_buckets: rejected before any job runs
    with pytest.raises(ValueError, match="n_buckets, alpha"):
        dsir_importance(raw, model, n_buckets=128, alpha=1.0)
    # mismatched alpha: rejected
    with pytest.raises(ValueError, match="n_buckets, alpha"):
        dsir_importance(raw, model, n_buckets=64, alpha=0.5)
    # the resample front door validates too (model= override path)
    with pytest.raises(ValueError, match="n_buckets, alpha"):
        dsir_resample(raw, tgt, k=1, n_buckets=32, model=model)
    # an untagged frame (e.g. re-read from storage) is the caller's
    # responsibility — no tag, no error
    untagged = model.select("bucket", "ct", "cr", "lr_micro")
    dsir_importance(raw, untagged, n_buckets=128, alpha=1.0).collect()


def test_dsir_model_from_counts_tagged(spark):
    from postgresql_topn_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_model_from_counts,
    )

    docs = _docs(spark, [(1, "a b c d"), (2, "b c"), (3, "x y")])
    rc = dsir_bucket_counts(docs, [F.lit("all").alias("g")], n_buckets=32)
    m = dsir_model_from_counts(
        rc.select("bucket", "cnt"),
        rc.select("bucket", "cnt"),
        n_buckets=32,
        alpha=2.0,
    )
    assert m._dsir_params == (32, 2.0)


# ---------------------------------------------------------------------------
# 2. dsir_bucket_counts reserved output names
# ---------------------------------------------------------------------------


def test_dsir_bucket_counts_reserved_names_rejected(spark):
    from postgresql_topn_spark.operators.dsir import dsir_bucket_counts

    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "b c", "s2")],
        "doc_id long, text string, bucket string",
    )
    with pytest.raises(ValueError, match="reserved"):
        dsir_bucket_counts(docs, ["bucket"])
    with pytest.raises(ValueError, match="reserved"):
        dsir_bucket_counts(docs, [F.col("bucket").alias("cnt")])
    # aliasing away the clash works, and output keeps the documented
    # (group..., bucket, cnt) shape
    out = dsir_bucket_counts(
        docs, [F.col("bucket").alias("source")], n_buckets=16
    )
    assert out.columns == ["source", "bucket", "cnt"]
    assert out.where(F.col("cnt") < 1).count() == 0


# ---------------------------------------------------------------------------
# 3. semantic_dedup auto sizing counts judged rows only
# ---------------------------------------------------------------------------


def test_semdedup_auto_sizes_from_non_null_ids(spark):
    from postgresql_topn_spark.operators.semdedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [1.0, 1.0, 0.0]),
        (None, [0.5, 0.5, 0.5]),
        (None, [0.9, 0.1, 0.0]),
        (None, [0.1, 0.9, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(
        corpus, n_clusters="auto", target_cluster_size=1, threshold=0.99
    ).collect()
    # NULL-id rows are dropped entirely (documented), and 'auto' sizes
    # the quantizer from the 4 judged rows, not the 7 raw rows
    assert len(out) == 4
    assert all(r["vec_id"] is not None for r in out)
    assert max(r["cluster"] for r in out) < 4


# ---------------------------------------------------------------------------
# 4/5. auto df caps: bind on pathological corpora, invisible on small
# ---------------------------------------------------------------------------

N_HOT = 1010  # > the 1000 floor


def test_tfidf_auto_max_df_binds(spark):
    from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

    rows = [(i, f"common phrase shared u{i} v{i} w{i}") for i in range(N_HOT)]
    rows += [(N_HOT + i, f"a{i} b{i} c{i}") for i in range(100)]
    docs = _docs(spark, rows)
    # default ('auto'): the boilerplate shingle (df=1010 > cap=1000) is
    # dropped from index AND measure -> no shared terms -> zero pairs
    assert tfidf_cosine_pairs(docs, "doc_id", "text", min_sim=0.0).count() == 0
    # escape hatch (None): the hot posting list survives (idf > 0 since
    # df < N) and the quadratic candidate set appears
    uncapped = tfidf_cosine_pairs(
        docs, "doc_id", "text", min_sim=0.0, max_df=None
    )
    assert uncapped.count() == N_HOT * (N_HOT - 1) // 2


def test_substring_auto_cap_binds(spark):
    from postgresql_topn_spark.operators.dedup import substring_run_pairs

    shared = " ".join(f"t{j}" for j in range(8))
    rows = [(i, f"{shared} x{i} y{i}") for i in range(N_HOT)]
    docs = _docs(spark, rows)
    kw = dict(min_run_tokens=8, shingle_k=8)
    # default ('auto'): the gram shared by 1010 docs exceeds the cap ->
    # dropped -> no candidate matches at all
    assert substring_run_pairs(docs, "doc_id", "text", **kw).count() == 0
    # escape hatch (None): every pair reports the shared 8-token run
    uncapped = substring_run_pairs(
        docs, "doc_id", "text", max_shingle_df=None, **kw
    )
    assert uncapped.count() == N_HOT * (N_HOT - 1) // 2


def test_auto_caps_invisible_on_small_corpus(spark):
    """Below the 1000 floor the auto cap can never bind: default ==
    explicitly-uncapped on a small corpus (this is what keeps every
    existing gate/oracle result byte-identical)."""
    from postgresql_topn_spark.operators.dedup import (
        substring_run_pairs,
        tfidf_cosine_pairs,
    )

    rows = [
        (i, " ".join(f"s{j}" for j in range(20)) + f" tail{i % 3}")
        for i in range(12)
    ]
    docs = _docs(spark, rows)
    a = sorted(
        map(tuple, tfidf_cosine_pairs(docs, "doc_id", "text", min_sim=0.0).collect())
    )
    b = sorted(
        map(
            tuple,
            tfidf_cosine_pairs(
                docs, "doc_id", "text", min_sim=0.0, max_df=None
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
    c = sorted(map(tuple, substring_run_pairs(docs, "doc_id", "text").collect()))
    d = sorted(
        map(
            tuple,
            substring_run_pairs(
                docs, "doc_id", "text", max_shingle_df=None
            ).collect(),
        )
    )
    assert c == d and len(c) > 0
