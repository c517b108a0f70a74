"""Similarity-search invariants: brute-force correctness, LSH recall."""

import math

import pytest

from pyspark.sql import functions as F

from postgresql_topn_spark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from postgresql_topn_spark.sources.tables import load_table


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([1.0, 0.0], [-1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    vals = [r["c"] for r in df.select(cosine("a", "b").alias("c")).collect()]
    assert abs(vals[0]) < 1e-12
    assert abs(vals[1] - 1.0) < 1e-12
    assert abs(vals[2] + 1.0) < 1e-12


def test_brute_force_matches_python(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.where(F.col("vec_id") < 50).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}
    sub = spark.createDataFrame(rows)
    out = cosine_topk(sub, sub.where(F.col("vec_id") == 0), k=3)
    got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    expected = sorted(
        ((cos(vecs[0], v), -i) for i, v in vecs.items() if i != 0), reverse=True
    )[:3]
    assert [(-i, r + 1) for r, (_, i) in enumerate(expected)] == got


def test_self_excluded_and_k_respected(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    out = cosine_topk(emb, q, k=5).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())


def test_lsh_recall_floor(spark, sf_dir):
    """LSH@8 planes must keep a sane recall vs brute force on the test
    vectors — it is the documented approximate path, not exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in lsh_topk(emb, q, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"recall {recall} suspiciously low"
    # multi-probe (hamming <= 1) probes a superset of buckets, so its
    # recall must dominate the exact-bucket probe
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, q, k=5, probe_hamming=1).collect()
    }
    m_recall = len(exact & multi) / len(exact)
    assert m_recall >= recall, f"multi-probe recall {m_recall} < {recall}"


def test_near_dup_pairs_finds_planted(spark):
    base = [0.1 * ((i * 7) % 13 - 6) for i in range(64)]
    near = list(base)
    near[0] += 1e-4
    far = [0.1 * ((i * 5) % 11 - 5) for i in range(64)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id bigint, embedding array<float>"
    )
    out = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert (1, 2) in out
    assert (1, 3) not in out


def test_exact_pairs_match_python(spark, sf_dir):
    from postgresql_topn_spark.operators.similarity import cosine_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings")
    sub = emb.where(F.col("vec_id") < 80)
    vecs = {r["vec_id"]: r["embedding"] for r in sub.collect()}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return d / (na * nb)

    thr = 0.35
    expected = {
        (i, j)
        for i in vecs
        for j in vecs
        if i < j and cos(vecs[i], vecs[j]) >= thr
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_exact(sub, threshold=thr).collect()
    }
    assert got == expected and len(expected) > 0


def test_lsh_near_dup_subset_of_exact(spark, sf_dir):
    """The LSH pair generator must be a SUBSET of the exact generator at
    the same threshold (precision 1.0; recall is the approximate part)."""
    from postgresql_topn_spark.operators.similarity import cosine_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_exact(emb, threshold=0.45).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.45, n_tables=16, n_planes=4
        ).collect()
    }
    assert approx <= exact


def test_near_dup_hot_bucket_tiling(spark):
    """Adversarial skew: every vector is near-identical, so ALL of them
    land in one (table, bucket) group in every table. A tiny tile must
    produce exactly the same pairs/sims as the untiled score (tile >=
    bucket size) — tiling bounds memory, never changes results."""
    from postgresql_topn_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    n, dim = 11, 8
    base = [float((d * 7 + 3) % 5 - 2) for d in range(dim)]
    rows = [
        (i, [base[d] + 1e-4 * ((i * 31 + d) % 3) for d in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    kw = dict(threshold=0.9, n_tables=4, n_planes=4, dim=dim)
    tiled = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_near_dup_pairs(df, tile=3, **kw).collect()
    }
    untiled = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_near_dup_pairs(df, tile=1 << 20, **kw).collect()
    }
    assert tiled == untiled
    # a hot bucket of near-identical vectors must pair everything
    assert len(tiled) == n * (n - 1) // 2


def test_ivf_recall_floor(spark, sf_dir):
    """IVF with n_probe/n_lists = 1/4 of the corpus searched must still
    recover a solid fraction of the true top-5."""
    from postgresql_topn_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_lists=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall} suspiciously low"
    # the deterministic seeded-centroid mode (the oracled suite path)
    # must hold the same floor
    seeded = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, q, k=5, n_lists=16, n_probe=4, centroid_mode="seeded"
        ).collect()
    }
    s_recall = len(exact & seeded) / len(exact)
    assert s_recall >= 0.3, f"seeded IVF recall {s_recall} suspiciously low"


def test_ivfpq_recall_and_rerank(spark):
    """IVF-PQ on CLUSTERED data (the regime PQ is built for — the
    fixture's uniform-random vectors have no real neighbor structure
    for a lossy code to preserve): members of the same cluster must be
    recovered through the compressed ADC path in both centroid modes,
    and exact reranking of the ADC shortlist must not lower recall."""
    from postgresql_topn_spark.operators.similarity import ivfpq_topk

    dim, n_clusters, per = 64, 8, 15
    rows = []
    for c in range(n_clusters):
        center = [(((c * 37 + d * 11) % 19) - 9) / 9.0 for d in range(dim)]
        for i in range(per):
            vid = c * per + i
            rows.append(
                (
                    vid,
                    [
                        center[d] + 0.03 * (((vid * 31 + d * 7) % 5) - 2)
                        for d in range(dim)
                    ],
                )
            )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = emb.where(F.col("vec_id") % per == 0)  # one query per cluster
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    kw = dict(k=5, n_lists=8, n_probe=2, m=8, n_codes=16)
    recalls = {}
    for mode in ("train", "seeded"):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(emb, q, centroid_mode=mode, **kw).collect()
        }
        recalls[mode] = len(exact & approx) / len(exact)
        assert recalls[mode] >= 0.5, f"IVF-PQ ({mode}) recall {recalls[mode]}"
    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            emb, q, centroid_mode="train", rerank_depth=30, **kw
        ).collect()
    }
    assert len(exact & rr) / len(exact) >= recalls["train"]


def test_ivfpq_rejects_bad_params(spark, sf_dir):
    from postgresql_topn_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    with pytest.raises(ValueError):
        ivfpq_topk(emb, q, m=7, centroid_mode="seeded").count()  # 64 % 7 != 0
    with pytest.raises(ValueError):
        ivfpq_topk(emb, q, centroid_mode="nope")


def test_auto_lsh_params_validates_recall():
    """Review pin: recall=1.0 used to surface as a bare 'math domain
    error'; it must name the argument."""
    import pytest

    from postgresql_topn_spark.operators.similarity import auto_lsh_params

    with pytest.raises(ValueError, match="recall"):
        auto_lsh_params(1000, 0.95, recall=1.0)
    with pytest.raises(ValueError, match="recall"):
        auto_lsh_params(1000, 0.95, recall=0.0)
    # the valid range still works
    L, r = auto_lsh_params(1000, 0.95, recall=0.99)
    assert L >= 1 and r >= 1


def test_auto_ivf_params_rule():
    """VERDICT r11 item 2 + r13 growth: n_lists = min(4096,
    ceil(sqrt(n))), n_probe = min(n_lists, ceil(scale_eff *
    sqrt(n_lists))) with scale_eff = probe_scale + 0.5 * max(0,
    digits(n) - 4) — pure function of the corpus count, replayed by
    the oracle as a params CTE."""
    import math

    import pytest

    from postgresql_topn_spark.operators.similarity import auto_ivf_params

    assert auto_ivf_params(0) == (1, 1)
    assert auto_ivf_params(1) == (1, 1)
    assert auto_ivf_params(2) == (2, 2)  # n_probe capped at n_lists
    # growth adds 0 up to 9,999 rows — fixture-scale values unchanged
    assert auto_ivf_params(500) == (23, 8)
    assert auto_ivf_params(2000) == (45, 11)
    assert auto_ivf_params(9_999) == auto_ivf_params(9_999, scale_growth=False)
    # +0.5 effective scale per decade above 10^4 (the r13 frontier fix:
    # a FLAT 1.5 slid to recall 0.535 at 200k where grown 2.5 restores
    # the retired fixed config's 0.654/0.666 at 47% of its candidates)
    assert auto_ivf_params(20_000) == (142, math.ceil(2.0 * math.sqrt(142)))
    assert auto_ivf_params(200_000) == (448, 53)  # ceil(2.5 * sqrt(448))
    assert auto_ivf_params(200_000, scale_growth=False) == (448, 32)
    # the cap bounds the centroid collect/closure; growth still applies
    nl, npb = auto_ivf_params(10**12, scale_growth=False)
    assert nl == 4096 and npb == math.ceil(1.5 * math.sqrt(4096))
    nl, npb = auto_ivf_params(10**12)  # 13 digits -> scale 1.5 + 4.5
    assert nl == 4096 and npb == math.ceil(6.0 * math.sqrt(4096))
    assert auto_ivf_params(10**6, max_lists=64, scale_growth=False) == (64, 12)
    with pytest.raises(ValueError, match="probe_scale"):
        auto_ivf_params(1000, probe_scale=0)


def test_ivf_auto_recall_not_below_fixed(spark, sf_dir):
    """The auto sizing must not cost recall vs the retired fixed
    (16, 4) config on the fixture (the STATUS r12 probe table's claim,
    pinned): seeded mode, same query set, mean recall@5 under auto
    params >= fixed params minus a small tolerance."""
    from postgresql_topn_spark.operators.similarity import (
        ann_recall,
        auto_ivf_params,
        cosine_topk,
        ivf_topk,
    )
    from postgresql_topn_spark.suite import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_lists, n_probe = auto_ivf_params(emb.count())
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, q, k=5)

    def mean_recall(nl, npb):
        ivf = ivf_topk(
            emb, q, k=5, n_lists=nl, n_probe=npb, centroid_mode="seeded"
        )
        rows = ann_recall(ivf, exact).collect()
        return sum(r["recall"] for r in rows) / len(rows)

    assert mean_recall(n_lists, n_probe) >= mean_recall(16, 4) - 0.02


def test_near_dup_pairs_string_ids(spark):
    """Review pin: non-numeric id columns must round-trip (the old long
    cast silently NULLed every string id). Planted near-dups with
    md5-style string ids must come back under their own ids."""
    import numpy as np

    from postgresql_topn_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(6, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((f"doc-{i:02d}", [float(x) for x in v]))
        # a near-identical twin of each vector
        rows.append(
            (f"doc-{i:02d}-dup", [float(x) for x in v + rng.randn(16) * 1e-4])
        )
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.99, n_tables=8, n_planes=4, dim=16
        ).collect()
    }
    expected = {(f"doc-{i:02d}", f"doc-{i:02d}-dup") for i in range(6)}
    assert expected <= got  # every planted twin found, ids intact
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_near_dup_pairs_no_self_pairs_on_duplicate_ids(spark):
    """Review pin: distinct rows sharing an id value must not emit an
    (x, x) self-pair — the exact baseline's strict qid < id never
    does. NULL ids are dropped, not emitted."""
    import numpy as np

    from postgresql_topn_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    v = [float(x) for x in np.arange(16) / 10.0]
    df = spark.createDataFrame(
        [(7, v), (7, v), (None, v), (9, v)],
        "vec_id bigint, embedding array<double>",
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.9, n_tables=4, n_planes=3, dim=16
        ).collect()
    )
    assert got == [(7, 9)]  # no (7, 7); no NULL-id rows


def test_ann_null_corpus_ids_dropped_not_corrupting(spark):
    """A NULL corpus id must be dropped at the scan, not ride into the
    Arrow batch where it would float-coerce the id column and corrupt
    ids above 2^53 (the Arrow nullable-int64 coercion class)."""
    from postgresql_topn_spark.operators.similarity import cosine_topk

    big = (1 << 53) + 1  # not representable in float64
    corpus = spark.createDataFrame(
        [(big, [1.0, 0.0]), (None, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    out = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(corpus, queries, k=2).collect()
    }
    assert (100, big) in out            # exact id survives
    assert all(n is not None for _, n in out)


class TestRandomProjection:
    def test_matches_numpy_and_partition_invariant(self, spark):
        import hashlib

        import numpy as np

        from postgresql_topn_spark.operators.similarity import (
            random_projection,
        )

        rng = np.random.default_rng(3)
        X = rng.normal(size=(50, 32)).astype("float32")
        rows = [(i, [float(x) for x in X[i]]) for i in range(50)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {
            r["vec_id"]: r["embedding"]
            for r in random_projection(emb, 8, seed=5).collect()
        }
        # rebuild the matrix the same way
        R = np.zeros((8, 32))
        for j in range(8):
            for d in range(32):
                u = int(hashlib.md5(f"5:{j}:{d}".encode()).hexdigest()[:15], 16) / 2**60
                if u < 1 / 6:
                    R[j, d] = 1.0
                elif u < 2 / 6:
                    R[j, d] = -1.0
        for i in range(50):
            want = R @ X[i].astype("float64")
            got = np.array(out[i])
            assert np.allclose(got, want, rtol=0, atol=1e-9)
        again = {
            r["vec_id"]: r["embedding"]
            for r in random_projection(emb.repartition(7), 8, seed=5).collect()
        }
        assert all(again[i] == out[i] for i in range(50))

    def test_preserves_neighborhood_structure(self, spark):
        import numpy as np

        from postgresql_topn_spark.operators.similarity import (
            cosine_topk,
            random_projection,
        )

        # two tight clusters far apart: after projection, nearest
        # neighbors must stay within-cluster
        rng = np.random.default_rng(9)
        a = rng.normal(loc=0.0, scale=0.05, size=(30, 64)) + np.r_[[1.0] * 32, [0.0] * 32]
        b = rng.normal(loc=0.0, scale=0.05, size=(30, 64)) + np.r_[[0.0] * 32, [1.0] * 32]
        X = np.vstack([a, b]).astype("float32")
        rows = [(i, [float(x) for x in X[i]]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        proj = random_projection(emb, 16, seed=2)
        qs = proj.where(F.col("vec_id").isin([0, 35]))
        nn = cosine_topk(proj, qs, k=5, id_col="vec_id", vec_col="embedding")
        got = [(r["query_id"], r["neighbor_id"]) for r in nn.collect()]
        for q, n in got:
            assert (q < 30) == (n < 30), f"cross-cluster neighbor {q}->{n}"

    def test_validation(self, spark):
        import pytest

        from postgresql_topn_spark.operators.similarity import (
            random_projection,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="out_dim"):
            random_projection(emb, 0)


class TestAnnRecall:
    def test_exact_vs_itself_is_one(self, spark, sf_dir):
        from postgresql_topn_spark.operators.similarity import ann_recall

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") % 50 == 0)
        exact = cosine_topk(emb, q, k=5)
        rows = ann_recall(exact, exact).collect()
        assert rows and all(r["recall"] == 1.0 for r in rows)
        assert all(r["n_exact"] == r["n_hit"] for r in rows)

    def test_missing_query_reports_zero_not_vanishes(self, spark):
        from postgresql_topn_spark.operators.similarity import ann_recall

        exact = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20), (2, 21)],
            "query_id bigint, neighbor_id bigint",
        )
        # query 2 absent from the approx result entirely; query 1 half
        # right, with a duplicate row that must count once
        approx = spark.createDataFrame(
            [(1, 10), (1, 10), (1, 99)],
            "query_id bigint, neighbor_id bigint",
        )
        r = {x["query_id"]: x for x in ann_recall(approx, exact).collect()}
        assert r[1]["n_exact"] == 2 and r[1]["n_hit"] == 1
        assert r[1]["recall"] == 0.5
        assert r[2]["n_hit"] == 0 and r[2]["recall"] == 0.0
        # duplicates on the EXACT side also count once (set formula,
        # review pin): duplicating exact rows must not change anything
        dup = {
            x["query_id"]: x
            for x in ann_recall(approx, exact.unionAll(exact)).collect()
        }
        assert {q: (v["n_exact"], v["n_hit"], v["recall"]) for q, v in r.items()} == {
            q: (v["n_exact"], v["n_hit"], v["recall"]) for q, v in dup.items()
        }

    def test_ivf_and_lsh_recall_measured_against_ground_truth(
        self, spark, sf_dir
    ):
        from postgresql_topn_spark.operators.similarity import (
            ann_recall,
            ivf_topk,
        )
        from pyspark.sql import functions as FF

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") % 50 == 0)
        exact = cosine_topk(emb, q, k=3)
        ivf = ivf_topk(emb, q, k=3, n_lists=8, n_probe=4)
        rec = ann_recall(ivf, exact)
        stats = rec.agg(
            FF.count(FF.lit(1)), FF.min("recall"), FF.avg("recall")
        ).collect()[0]
        assert stats[0] == q.count()  # every query judged
        assert 0.0 <= stats[1] <= 1.0
        assert stats[2] > 0.3  # probing half the lists finds most
        # multi-probe LSH can only add candidates -> mean recall is
        # monotonically non-decreasing in probe radius (deterministic
        # planes)
        from postgresql_topn_spark.operators.similarity import lsh_topk

        mean = {}
        for probe in (0, 1):
            a = lsh_topk(
                emb, q, k=3, n_tables=4, n_planes=8, probe_hamming=probe
            )
            mean[probe] = ann_recall(a, exact).agg(
                FF.avg("recall")
            ).collect()[0][0]
        assert mean[1] >= mean[0]


def test_auto_ivf_params_validates_probe_scale_on_tiny_corpora():
    """r12 ADVICE #4: an invalid probe_scale must fail loudly at every
    corpus size — the n_rows < 2 early return used to bypass the
    validation, so a bad config silently passed exactly when the
    corpus was too small to exercise it."""
    import pytest

    from postgresql_topn_spark.operators.similarity import auto_ivf_params

    for n in (0, 1, 2, 100):
        with pytest.raises(ValueError, match="probe_scale"):
            auto_ivf_params(n, probe_scale=0)
        with pytest.raises(ValueError, match="probe_scale"):
            auto_ivf_params(n, probe_scale=-1.5)
    assert auto_ivf_params(0) == (1, 1)
    assert auto_ivf_params(1) == (1, 1)
