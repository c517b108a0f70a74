"""BM25 / TF-IDF search operators: hand-computed values on a tiny
corpus, salted-rank losslessness, input validation."""

import math

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.search import bm25_topk, tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark runs fast spark"),
        (2, "window functions in spark"),
        (3, "vector search with vector index vector"),
        (4, "plain text nothing else"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25(tf, df, dl, n, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return round(idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))), 6)


def test_bm25_values_match_hand_computation(corpus):
    out = bm25_topk(corpus, "doc_id", "text", ["spark", "vector"], k=10)
    got = {(r.term, r.doc_id): (r.score, r.rank) for r in out.collect()}
    # corpus: n=4 docs, dl = [4, 4, 6, 4], avgdl = 4.5
    n, avgdl = 4.0, 4.5
    exp = {
        ("spark", 1): _bm25(2, 2, 4, n, avgdl),
        ("spark", 2): _bm25(1, 2, 4, n, avgdl),
        ("vector", 3): _bm25(3, 1, 6, n, avgdl),
    }
    assert set(got) == set(exp)
    for key, score in exp.items():
        assert got[key][0] == pytest.approx(score, abs=1e-6)
    # tf=2 beats tf=1 at equal dl/df
    assert got[("spark", 1)][1] == 1 and got[("spark", 2)][1] == 2


def test_bm25_salted_rank_is_lossless(corpus):
    plain = bm25_topk(corpus, "doc_id", "text", ["spark", "vector"], k=2)
    salted = bm25_topk(
        corpus, "doc_id", "text", ["spark", "vector"], k=2, salt_buckets=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_bm25_rejects_empty_queries(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "doc_id", "text", [])


def test_bm25_no_hits_term_absent(corpus):
    out = bm25_topk(corpus, "doc_id", "text", ["nonexistent"], k=5)
    assert out.count() == 0


def test_tfidf_values_match_hand_computation(corpus):
    out = tfidf_top_terms(corpus, "doc_id", "text", top=2)
    got = {(r.doc_id, r.rank): (r.term, r.score) for r in out.collect()}
    n = 4.0

    def tfidf(tf, dl, df):
        return round((tf / dl) * (math.log((n + 1.0) / (df + 1.0)) + 1.0), 6)

    # doc 3: 'vector' tf=3/6 df=1 dominates; then 'index'/'search'/'with'
    # all tf=1/6 df=1 tie -> 'index' wins alphabetically
    assert got[(3, 1)] == ("vector", pytest.approx(tfidf(3, 6, 1), abs=1e-6))
    assert got[(3, 2)][0] == "index"
    # doc 1: 'spark' tf=2/4 but df=2; 'fast'/'runs' tf=1/4 df=1
    spark_s = tfidf(2, 4, 2)
    fast_s = tfidf(1, 4, 1)
    top_term, top_score = got[(1, 1)]
    if spark_s > fast_s:
        assert top_term == "spark" and top_score == pytest.approx(spark_s, abs=1e-6)
    else:
        assert top_term == "fast" and top_score == pytest.approx(fast_s, abs=1e-6)


def test_tfidf_rank_bounded_per_doc(corpus):
    out = tfidf_top_terms(corpus, "doc_id", "text", top=3)
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    assert all(r.c <= 3 for r in per_doc)
    assert out.where(F.col("rank") > 3).count() == 0


# --- PII detection / scrubbing --------------------------------------------


def test_pii_counts_and_scrub(spark):
    from postgresql_topn_spark.operators.text import pii_counts, scrub_pii

    rows = [
        (1, "reach me at a.b+tag@corp.io or bob@x.co, cell 415-555-1234"),
        (2, "server 192.168.0.1 and 10.0.0.255 serve traffic"),
        (3, "no contact info here at all"),
        (4, "mixed: eve@ex.org from 8.8.8.8 dialed 800-555-0199 twice"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = df.select(
        "id", pii_counts("t").alias("c"), scrub_pii("t").alias("s")
    ).collect()
    got = {r.id: (r.c.email, r.c.phone, r.c.ipv4, r.s) for r in out}
    assert got[1][:3] == (2, 1, 0)
    assert got[2][:3] == (0, 0, 2)
    assert got[3][:3] == (0, 0, 0)
    assert got[4][:3] == (1, 1, 1)
    # scrubbed text keeps no match for any pattern
    assert "@" not in got[1][3] and "415" not in got[1][3]
    assert "192.168" not in got[2][3]
    assert got[3][3] == rows[2][1]  # clean text untouched
    assert got[4][3].count("[PII]") == 3


# --- token-stream packing --------------------------------------------------


def test_pack_token_stream_matches_naive(spark):
    from postgresql_topn_spark.operators.packing import pack_token_stream

    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "nt"])
    out = pack_token_stream(
        df, "doc_id", F.col("nt"), context_len=100, bucket_width=16
    ).collect()
    got = {r.doc_id: (r.start_offset, r.first_bin, r.last_bin) for r in out}
    run = 0
    for i, nt in rows:
        assert got[i][0] == run
        assert got[i][1] == run // 100
        assert got[i][2] == (run + nt - 1) // 100
        run += nt


def test_pack_token_stream_zero_tokens_and_bucket_width_invariance(spark):
    from postgresql_topn_spark.operators.packing import pack_token_stream

    rows = [(1, 5), (2, 0), (3, 7)]
    df = spark.createDataFrame(rows, ["doc_id", "nt"])
    out = {
        r.doc_id: (r.start_offset, r.first_bin, r.last_bin)
        for r in pack_token_stream(
            df, "doc_id", F.col("nt"), context_len=4, bucket_width=1
        ).collect()
    }
    assert out[1] == (0, 0, 1)
    assert out[2] == (5, 1, 1)  # zero-width doc sits at its offset's bin
    assert out[3] == (5, 1, 2)
    # bucket_width must not change results
    for bw in (2, 100):
        alt = {
            r.doc_id: (r.start_offset, r.first_bin, r.last_bin)
            for r in pack_token_stream(
                df, "doc_id", F.col("nt"), context_len=4, bucket_width=bw
            ).collect()
        }
        assert alt == out


def test_pack_token_stream_validates_args(spark):
    from postgresql_topn_spark.operators.packing import pack_token_stream

    df = spark.createDataFrame([(1, 1)], ["doc_id", "nt"])
    with pytest.raises(ValueError):
        pack_token_stream(df, "doc_id", F.col("nt"), context_len=0)
    with pytest.raises(ValueError):
        pack_token_stream(df, "doc_id", F.col("nt"), bucket_width=0)


# --- auto LSH parameterization --------------------------------------------


def test_auto_lsh_params_scaling_behavior():
    from postgresql_topn_spark.operators.similarity import auto_lsh_params

    L1, r1 = auto_lsh_params(2_000, 0.95)
    L2, r2 = auto_lsh_params(20_000, 0.95)
    L3, r3 = auto_lsh_params(2_000_000, 0.95)
    # planes grow ~log2 with the corpus (constant expected occupancy)
    assert r1 < r2 < r3
    assert r2 - r1 == pytest.approx(3.32, abs=1.0)  # log2(10)
    # tables compensate recall, monotonically
    assert L1 <= L2 <= L3
    # degenerate corpora stay minimal; low thresholds hit the cap
    assert auto_lsh_params(1, 0.95) == (1, 1)
    Llow, _ = auto_lsh_params(1_000_000, 0.45)
    assert Llow == 64  # capped: hyperplane LSH is the wrong tool here


def test_embedding_near_auto_matches_explicit(spark, sf_dir):
    from postgresql_topn_spark.operators.similarity import (
        auto_lsh_params,
        embedding_near_dup_pairs,
    )
    from postgresql_topn_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    L, r = auto_lsh_params(emb.count(), 0.45)
    auto = embedding_near_dup_pairs(
        emb, threshold=0.45, n_tables="auto", n_planes="auto"
    )
    explicit = embedding_near_dup_pairs(
        emb, threshold=0.45, n_tables=L, n_planes=r
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


# --- grouping-sets sketch aggregate ---------------------------------------


def test_grouping_sets_matches_per_set_aggregates(spark):
    from postgresql_topn_spark.functions.aggregates import (
        topn_add_agg,
        topn_add_agg_grouping_sets,
    )

    rows = [
        ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"),
        ("a", 2, "y"), ("b", 1, "x"), ("b", 2, "z"), ("b", 2, "z"),
    ]
    df = spark.createDataFrame(rows, ["g1", "g2", "it"])
    gs = topn_add_agg_grouping_sets(
        df, [["g1", "g2"], ["g1"], []], "it", counters=10
    )
    got = {
        (r.gid, r.g1, r.g2): r.topn for r in gs.collect()
    }
    # gid 0 = (g1,g2) grain, 1 = (g1) grain (g2 rolled), 3 = grand total
    fine = {
        (r.g1, r.g2): r.topn
        for r in topn_add_agg(df, ["g1", "g2"], "it", counters=10).collect()
    }
    per_g1 = {
        r.g1: r.topn
        for r in topn_add_agg(df, ["g1"], "it", counters=10).collect()
    }
    total = topn_add_agg(df, [], "it", counters=10).collect()[0].topn
    for (g1, g2), m in fine.items():
        assert got[(0, g1, g2)] == m
    for g1, m in per_g1.items():
        assert got[(1, g1, None)] == m
    assert got[(3, None, None)] == total
    assert len(got) == len(fine) + len(per_g1) + 1


def test_grouping_sets_rejects_duplicate_columns(spark):
    from postgresql_topn_spark.functions.aggregates import (
        topn_add_agg_grouping_sets,
    )

    df = spark.createDataFrame([("a", "x")], ["g", "it"])
    with pytest.raises(ValueError):
        topn_add_agg_grouping_sets(df, [["g", "g"]], "it", counters=5)


# --- temperature mixing ----------------------------------------------------


def test_temperature_mix_flattens_toward_uniform(spark):
    from postgresql_topn_spark.operators.sampling import temperature_mix

    # skewed corpus: source a=8000 rows, b=800, c=80
    rows = (
        [(i, "a") for i in range(8000)]
        + [(10_000 + i, "b") for i in range(800)]
        + [(20_000 + i, "c") for i in range(80)]
    )
    df = spark.createDataFrame(rows, ["k", "src"])
    t1 = temperature_mix(df, "src", "k", temperature=1.0, target_rows=2000)
    t5 = temperature_mix(df, "src", "k", temperature=5.0, target_rows=2000)

    def shares(out):
        c = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        tot = sum(c.values())
        return {s: c.get(s, 0) / tot for s in ("a", "b", "c")}

    s1, s5 = shares(t1), shares(t5)
    # T=1 preserves natural proportions (~90/9/1)
    assert s1["a"] > 0.85
    # higher temperature shifts mass toward small sources
    assert s5["a"] < s1["a"]
    assert s5["c"] > s1["c"]
    # expected total ~ target (Bernoulli, generous tolerance)
    assert 1600 <= t5.count() <= 2400


def test_temperature_mix_cap_and_determinism(spark):
    from postgresql_topn_spark.operators.sampling import temperature_mix

    rows = [(i, "a") for i in range(1000)] + [(5000 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "src"])
    # huge target: every rate caps at 1.0 -> whole corpus survives
    full = temperature_mix(df, "src", "k", temperature=2.0, target_rows=10**6)
    assert full.count() == 1010
    # same seed -> identical rows across repartitionings
    a = temperature_mix(df, "src", "k", temperature=3.0, target_rows=300)
    b = temperature_mix(
        df.repartition(7), "src", "k", temperature=3.0, target_rows=300
    )
    assert sorted(r.k for r in a.collect()) == sorted(r.k for r in b.collect())
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_mix(df, "src", "k", temperature=0.0)


def test_pack_token_stream_keep_columns_no_extra_shuffle(spark):
    """`keep` payload columns ride the bucket-local window: identical
    pack numbers, payload intact, and ZERO additional exchanges vs the
    bare pack (the alternative — a post-pack join back on the id —
    costs a full shuffle join)."""
    from postgresql_topn_spark.operators.packing import pack_token_stream
    from postgresql_topn_spark.plans.audit import hash_shuffles

    df = spark.createDataFrame(
        [(i, (i * 7) % 5 + 1, f"payload-{i}") for i in range(40)],
        "doc_id bigint, nt int, tag string",
    )
    bare = pack_token_stream(df, "doc_id", "nt", context_len=8,
                             bucket_width=10)
    kept = pack_token_stream(df, "doc_id", "nt", context_len=8,
                             bucket_width=10, keep=["tag"])
    b = {r["doc_id"]: r for r in bare.collect()}
    k = {r["doc_id"]: r for r in kept.collect()}
    assert set(b) == set(k)
    for i, row in k.items():
        assert row["tag"] == f"payload-{i}"
        for c in ("n_tokens", "start_offset", "first_bin", "last_bin"):
            assert row[c] == b[i][c]
    assert hash_shuffles(kept) == hash_shuffles(bare)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        pack_token_stream(df, "doc_id", "nt", keep=["n_tokens"])
    # internal working names and duplicates are rejected too, not
    # silently overwritten (review pin)
    with _pytest.raises(ValueError, match="collide"):
        pack_token_stream(df, "doc_id", "nt", keep=["__bkt"])
    with _pytest.raises(ValueError, match="duplicate"):
        pack_token_stream(df, "doc_id", "nt", keep=["tag", "tag"])
