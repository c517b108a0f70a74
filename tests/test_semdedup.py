"""SemDeDup semantic dedup: definition-level differential vs a pure
numpy/python replica, expr==pandas assignment bit-equality, plan shape
(scan-stage assignment), planted-duplicate behavior, the
max_cluster_size guard, and argument validation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
)
from postgresql_topn_spark.operators.similarity import (
    _seq_dots,
    _seq_sqnorm,
)


def _mk_corpus(spark, n=80, dim=8, seed=3, dupes=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, dim)
    for i in range(dupes):
        X[n - 1 - i] = X[i]  # exact copies of the first `dupes` rows
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        X.astype(np.float32).astype(np.float64),
    )


def _replica(X, ids, n_clusters, threshold):
    """Pure-python SemDeDup: seeded centroids (md5-shuffled first k),
    argmin(-2 d + |c|^2) assignment with low-cell ties, rank by
    (centroid_sim, id), greedy drop iff an earlier-ranked member has
    cos >= threshold; dup_of = earliest-ranked witness."""
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cent_ids = order[:n_clusters]
    C = X[[ids.index(i) for i in cent_ids]]
    d = _seq_dots(X, C)
    d2 = -2.0 * d + _seq_sqnorm(C)
    cells = np.argmin(d2, axis=1)
    xn = np.sqrt(_seq_sqnorm(X))
    cn = np.sqrt(_seq_sqnorm(C))
    csim = d[np.arange(len(X)), cells] / (xn * cn[cells])
    out = {}
    for cell in set(cells.tolist()):
        members = [i for i in range(len(ids)) if cells[i] == cell]
        members.sort(key=lambda i: (csim[i], ids[i]))
        for rank, i in enumerate(members, 1):
            dup_of = None
            for j in members[: rank - 1]:
                cos = float(
                    _seq_dots(X[i : i + 1], X[j : j + 1])[0, 0] / (xn[i] * xn[j])
                )
                if cos >= threshold:
                    dup_of = ids[j]
                    break  # members are rank-ordered: first hit = earliest
            out[ids[i]] = (int(cell), round(csim[i], 6), rank, dup_of is None, dup_of)
    return out


def test_matches_python_replica(spark):
    df, X = _mk_corpus(spark, n=80, dim=8, seed=3)
    ids = [int(r["vec_id"]) for r in df.select("vec_id").collect()]
    ids.sort()
    got = {
        r["vec_id"]: (
            r["cluster"],
            r["centroid_sim"],
            r["rank"],
            r["keep"],
            r["dup_of"],
        )
        for r in semantic_dedup(df, n_clusters=8, threshold=0.6).collect()
    }
    want = _replica(X, ids, 8, 0.6)
    assert got == want
    # the threshold actually bites on this fixture
    assert any(not v[3] for v in want.values())


def test_expr_and_pandas_assignment_identical(spark):
    df, X = _mk_corpus(spark, n=60, dim=8, seed=5)
    a = {
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters=8, threshold=0.5, assign_mode="expr"
        ).collect()
    }
    b = {
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters=8, threshold=0.5, assign_mode="pandas"
        ).collect()
    }
    assert a == b


def test_assignment_is_scan_stage(spark):
    """expr-mode assignment adds ZERO exchanges over the scan: the
    centroids ride the plan as literals."""
    from postgresql_topn_spark.plans.audit import (
        hash_shuffles,
        python_stages,
    )

    df, _ = _mk_corpus(spark, n=40, dim=8)
    C = np.asarray(
        [r["embedding"] for r in df.limit(4).collect()], dtype=np.float64
    )
    out = assign_clusters(df, C, assign_mode="expr")
    assert hash_shuffles(out) == 0
    assert python_stages(out) == 0


def test_planted_exact_duplicates_collapse(spark):
    """Exact copies always share a cluster and cosine 1.0 — exactly one
    survivor per copy-group at a high threshold."""
    df, X = _mk_corpus(spark, n=40, dim=8, seed=11, dupes=3)
    out = semantic_dedup(df, n_clusters=4, threshold=0.999999).collect()
    by_id = {r["vec_id"]: r for r in out}
    for orig in (0, 1, 2):
        copy = 39 - orig
        pair = sorted(
            [by_id[orig], by_id[copy]], key=lambda r: r["rank"]
        )
        assert pair[0]["cluster"] == pair[1]["cluster"]
        assert pair[1]["dup_of"] is not None  # later-ranked copy dies
        assert not pair[1]["keep"]


def test_max_cluster_size_guard_keeps_members(spark):
    df, _ = _mk_corpus(spark, n=40, dim=8, seed=7)
    # cap below every cluster size -> no pairs anywhere -> all kept
    out = semantic_dedup(
        df, n_clusters=2, threshold=-1.0, max_cluster_size=1
    )
    rows = out.collect()
    assert len(rows) == 40
    assert all(r["keep"] for r in rows)
    # without the guard the same config kills everything but the
    # rank-1 member of each cluster (threshold -1 matches every pair)
    out2 = semantic_dedup(df, n_clusters=2, threshold=-1.0).collect()
    assert sum(1 for r in out2 if r["keep"]) == 2


def test_trained_mode_runs_and_drops(spark):
    df, _ = _mk_corpus(spark, n=40, dim=8, seed=13, dupes=2)
    out = semantic_dedup(
        df, n_clusters=4, threshold=0.999999, centroid_mode="trained"
    ).collect()
    assert len(out) == 40
    assert sum(1 for r in out if not r["keep"]) >= 2


def test_auto_cluster_sizing(spark):
    """n_clusters='auto' = ceil(n / target_cluster_size), and matches
    the explicit-k run exactly (same seeded centroids)."""
    df, _ = _mk_corpus(spark, n=80, dim=8, seed=3)
    auto = {
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters="auto", target_cluster_size=10, threshold=0.6
        ).collect()
    }
    explicit = {
        tuple(r)
        for r in semantic_dedup(df, n_clusters=8, threshold=0.6).collect()
    }
    assert auto == explicit
    # occupancy stays constant as n grows: k doubles when n doubles
    df2, _ = _mk_corpus(spark, n=160, dim=8, seed=4)
    out = semantic_dedup(
        df2, n_clusters="auto", target_cluster_size=10, threshold=0.6
    )
    assert out.select(F.countDistinct("cluster")).collect()[0][0] <= 16
    assert out.agg(F.max("cluster")).collect()[0][0] == 15  # k = 160/10


def test_validation():
    with pytest.raises(ValueError, match="n_clusters"):
        semantic_dedup(None, n_clusters=0, threshold=0.5)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(None, n_clusters=4, threshold=1.5)
    with pytest.raises(ValueError, match="centroid_mode"):
        semantic_dedup(None, n_clusters=4, threshold=0.5, centroid_mode="x")


def test_null_ids_dropped_before_python_stage(spark):
    df = spark.createDataFrame(
        [(None, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    C = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    for mode in ("expr", "pandas"):
        got = assign_clusters(df, C, assign_mode=mode).collect()
        assert sorted(r["__id"] for r in got) == [1, 2]


def test_trained_mode_dedup_rate_band(spark):
    """Behavioral contract for the oracle-exempt trained lane (VERDICT
    r6 item 6): on planted-duplicate data at an exact-copy threshold,
    the drop SET is clustering-independent — exact copies always share
    a cluster and cosine 1.0 — so trained mode must drop exactly what
    seeded mode drops: the planted copies."""
    df, _ = _mk_corpus(spark, n=60, dim=8, seed=21, dupes=5)
    kw = dict(n_clusters=6, threshold=0.999999)
    seeded_drops = {
        r["vec_id"]
        for r in semantic_dedup(df, centroid_mode="seeded", **kw).collect()
        if not r["keep"]
    }
    trained_drops = {
        r["vec_id"]
        for r in semantic_dedup(df, centroid_mode="trained", **kw).collect()
        if not r["keep"]
    }
    assert len(seeded_drops) == 5
    assert trained_drops == seeded_drops
    # at a moderate threshold the two clusterings may judge borderline
    # pairs differently, but the RATE must stay in a band: every
    # planted copy still dies, and trained never drops more than twice
    # seeded's count (both see the same geometry)
    kw2 = dict(n_clusters=6, threshold=0.95)
    s2 = sum(
        1
        for r in semantic_dedup(df, centroid_mode="seeded", **kw2).collect()
        if not r["keep"]
    )
    t2 = sum(
        1
        for r in semantic_dedup(df, centroid_mode="trained", **kw2).collect()
        if not r["keep"]
    )
    assert s2 >= 5 and t2 >= 5
    assert t2 <= 2 * s2 + 2 and s2 <= 2 * t2 + 2


def test_trained_mode_partition_invariant(spark):
    """The trained lane's keep-set must not depend on how the input
    happens to be partitioned (the k-means sample is lexsorted before
    seeding precisely so collect() order can't leak in)."""
    df, _ = _mk_corpus(spark, n=60, dim=8, seed=22, dupes=3)
    kw = dict(
        n_clusters=5, threshold=0.95, centroid_mode="trained", seed=9
    )
    a = sorted(
        map(tuple, semantic_dedup(df.repartition(1), **kw).collect())
    )
    b = sorted(
        map(tuple, semantic_dedup(df.repartition(13), **kw).collect())
    )
    assert a == b


def test_trained_mode_planted_dupes_die_any_seed(spark):
    """Exact copies collapse under EVERY training seed — the decision
    is geometry, not luck of the initialization."""
    df, _ = _mk_corpus(spark, n=40, dim=8, seed=23, dupes=3)
    for seed in (1, 2, 3):
        out = semantic_dedup(
            df,
            n_clusters=4,
            threshold=0.999999,
            centroid_mode="trained",
            seed=seed,
        ).collect()
        drops = {r["vec_id"] for r in out if not r["keep"]}
        assert drops == {37, 38, 39}


def test_degenerate_cosines_follow_catalyst(spark):
    """r14 (ADVICE r13): the kernel replicates the engine's degenerate
    cosine semantics — NaN-element vectors yield NaN sims that KILL
    (Catalyst sorts NaN above every numeric, so the join form's
    `NaN >= th` was true), and a zero-norm member raises
    DIVIDE_BY_ZERO under ANSI exactly as the join form's Divide
    would, killing via NaN with ANSI off. Ground truth checked
    against Catalyst, not just asserted."""
    from postgresql_topn_spark.operators.semdedup import _cluster_kills

    # Catalyst ground truth: NaN comparison (a non-zero-divisor NaN)
    row = spark.sql(
        "SELECT CAST('NaN' AS DOUBLE)/1.0 >= 0.5 AS nan_cmp"
    ).collect()[0]
    assert row["nan_cmp"] is True

    def kills_of(rows, threshold=0.5):
        src = spark.createDataFrame(
            rows, "cluster int, __id long, __v array<double>, rank int"
        )
        return {
            r["__idb"]: r["dup_of"]
            for r in _cluster_kills(src, threshold).collect()
        }

    # NaN-element member: NaN sim against the earlier clean keeper ->
    # killed by it (the clean orthogonal pair stays below threshold)
    nan_rows = [
        (0, 1, [1.0, 0.0], 1),
        (0, 2, [float("nan"), 1.0], 2),
        (0, 3, [0.0, 1.0], 3),
    ]
    assert kills_of(nan_rows) == {2: 1, 3: 2}
    # (3 is killed by 2: sim(1,3)=0 < th but sim(2,3)=NaN -> kill,
    # earliest NaN witness wins — exactly the join form's min-rank)

    # zero-norm member in a >=2-member group: ANSI (session default
    # in Spark 4) -> the query fails loudly, like the join form's
    # Divide; ANSI off -> 0/0 = NaN -> kill
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    zero_rows = [
        (0, 1, [0.0, 0.0], 1),
        (0, 2, [1.0, 0.0], 2),
    ]
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises((PythonException, Py4JJavaError), match="DIVIDE_BY_ZERO"):
        kills_of(zero_rows)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert kills_of(zero_rows) == {2: 1}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
