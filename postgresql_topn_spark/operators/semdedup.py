"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): coarse-cluster the embedding space, then inside each
cluster drop every example whose cosine similarity to an EARLIER-RANKED
cluster member meets the threshold. The rank order implements the
paper's keeper rule — "keep the example with the lowest cosine
similarity to the cluster centroid" — as a greedy sweep (rank by
centroid-similarity ascending; an example dies iff some earlier-ranked
example is a near-duplicate of it), which is exactly the
upper-triangular max-similarity test the released SemDeDup
implementation runs per cluster.

Relation to the neighboring operators: `dedup_embedding_*` emit PAIRS
above a threshold (candidate generation); this operator emits a
per-example KEEP/DROP decision with a `dup_of` witness — the
document-selection form a curation pipeline consumes directly.
Semantic dedup catches paraphrases/translations that token-level
MinHash/SimHash can't see (the embedding carries the semantics).

Scale shape (100 TB):
- cluster ASSIGNMENT is scan-stage only: the centroid table rides the
  plan as literals (`assign_mode='expr'`, pure Catalyst fold — zero
  exchanges, whole-stage codegen) or the task closure
  (`assign_mode='pandas'`, one Arrow-batched mapInPandas pass for
  centroid counts too big to inline). The corpus never shuffles to be
  assigned.
- the pairwise stage is per-cluster quadratic BY DESIGN (the paper's
  definition); the knob is `n_clusters`, which the caller scales
  ~n/target_cluster_size so in-cluster work stays bounded (the paper
  uses 50k clusters for LAION-scale corpora). `max_cluster_size` is
  the Zipf guard: clusters over the cap skip pair generation entirely
  (their members are all kept — a guard can only under-delete, never
  fabricate a drop), same trade as the dedup family's df caps.
- the rank window partitions by cluster — bounded partitions when
  n_clusters is sized as above, never a global sort.

Determinism: `centroid_mode='seeded'` picks the md5-shuffled first
n_clusters corpus vectors (similarity._seeded_ivf_centroids) and every
float fold accumulates dimension-sequentially, so a DuckDB oracle
replays centroid pick, assignment, ranking, pairwise cosine and the
keep/drop sweep value-for-value. `'trained'` runs Lloyd's k-means on a
bounded sample (better centroids, nothing to replay — pytest scope).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col
from postgresql_topn_spark.operators.similarity import (
    _seeded_ivf_centroids,
    _seq_dots,
    _seq_sqnorm,
    _train_ivf_centroids,
    dot,
    norm,
)


def _centroid_literal(C: "np.ndarray") -> Column:
    """array<struct<cell:int, sq:double, cv:array<double>>> literal.
    `sq` is the dimension-sequential squared norm, so it equals the
    oracle's list_reduce fold bit-for-bit."""
    sq = _seq_sqnorm(C)
    return F.array(
        *[
            F.struct(
                F.lit(int(j)).alias("cell"),
                F.lit(float(sq[j])).alias("sq"),
                F.array(*[F.lit(float(v)) for v in C[j]]).alias("cv"),
            )
            for j in range(len(C))
        ]
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: "np.ndarray",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_mode: str = "expr",
) -> DataFrame:
    """(id, vec, cluster, centroid_sim): nearest-centroid assignment by
    squared L2 (-2*dot + ||c||^2; ||x||^2 is constant per row), ties to
    the lowest cell id, plus the cosine to the assigned centroid.

    'expr': centroids inline as literals; per row, a transform scores
    every centroid and array_sort picks min (d2, cell) — one
    whole-stage-codegen projection, ZERO exchanges, and float folds
    that match DuckDB's list_reduce left fold exactly. Right for
    centroid counts up to a few hundred (plan-size bound).
    'pandas': one mapInPandas pass with the same sequential folds
    (bit-identical to 'expr' — pytest-pinned); right for the 50k-cell
    regime where literals would bloat the plan — AND, measured r13,
    ~5x faster even at 25 cells x 64 dims (0.3 vs 1.55 s over the
    sf0.1 embeddings): the 'expr' transform/array_sort lambdas
    evaluate interpreted per element, so `semantic_dedup` now defaults
    to this lane at every centroid count.
    """
    idc, vc = _col(id_col), _col(vec_col)
    # NULL-id rows are unjoinable garbage AND would float-coerce the
    # Arrow id column in pandas mode (ids > 2^53 corrupt): drop at scan
    base = corpus.select(idc.alias("__id"), vc.alias("__v")).where(
        idc.isNotNull()
    )
    if assign_mode == "expr":
        cent = _centroid_literal(centroids)
        scored = F.transform(
            cent,
            lambda c: F.struct(
                (F.lit(-2.0) * dot(F.col("__v"), c["cv"]) + c["sq"]).alias(
                    "d2"
                ),
                c["cell"].alias("cell"),
            ),
        )
        best = F.element_at(F.array_sort(scored), 1)
        out = base.select(
            "__id",
            "__v",
            best["cell"].alias("cluster"),
            F.element_at(cent, best["cell"] + 1).alias("__c"),
        )
        return out.select(
            "__id",
            "__v",
            "cluster",
            (
                dot(F.col("__v"), F.col("__c.cv"))
                / (norm(F.col("__v")) * F.sqrt(F.col("__c.sq")))
            ).alias("centroid_sim"),
        )
    if assign_mode != "pandas":
        raise ValueError(
            f"assign_mode must be 'expr' or 'pandas': {assign_mode}"
        )
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = _seq_sqnorm(C)
    c_norm = np.sqrt(c_sq)
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("__id", base.schema["__id"].dataType),
            StructField("__v", base.schema["__v"].dataType),
            StructField("cluster", IntegerType()),
            StructField("centroid_sim", DoubleType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
            d = _seq_dots(X, C)
            cells = np.argmin(-2.0 * d + c_sq, axis=1)  # stable: low cell
            sims = d[np.arange(len(X)), cells] / (
                np.sqrt(_seq_sqnorm(X)) * c_norm[cells]
            )
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "__v": pdf["__v"],
                    "cluster": cells.astype("int32"),
                    "centroid_sim": sims,
                }
            )

    return base.mapInPandas(assign, schema)


def _cluster_kills(pair_src: DataFrame, threshold: float) -> DataFrame:
    """(__idb, dup_of): per-cluster greedy-sweep kill decisions —
    every member killed by the EARLIEST-ranked near-duplicate above
    `threshold`, the upper-triangular max-similarity test.

    r13 form: one Arrow-batched applyInPandas kernel per cluster.
    Until r12 this was an a/b self-join whose per-pair cosine ran the
    `dot`/`norm` Catalyst folds — higher-order functions evaluate
    INTERPRETED per element, and the measured cost was ~3 s at sf0.1
    (64-dim vectors, ~500k in-cluster pairs). The kernel computes the
    identical doubles: `_seq_dots`/`_seq_sqnorm` accumulate
    dimension-sequentially (pinned bit-identical to the fold forms),
    and sim = d / (norm_a * norm_b) keeps the expression's exact
    multiply-then-divide order, and degenerate cosines follow the
    engine (r14, ADVICE r13): NaN-element vectors produce NaN sims
    that KILL — Catalyst sorts NaN above every numeric, so the join
    form's `NaN >= th` was true — and a zero-norm member in a
    >=2-member same-length group RAISES under ANSI exactly as the
    join form's Divide would (NaN/kill with ANSI off). So every
    `sim >= threshold` decision matches the join form bit-for-bit,
    degenerate vectors included. The grouping reuses the rank
    window's cluster partitioning (no new exchange), pairwise work is
    column-blocked so memory stays O(members x block) however large a
    cluster gets, and the join form's null semantics are preserved:
    pairs whose vectors differ in length or contain NULL elements have
    NULL cosine there — inert, never a kill — which here means
    same-length groups computed densely and unclean vectors excluded.
    """
    src = pair_src.select("cluster", "__id", "__v", "rank")
    id_t = src.schema["__id"].dataType.simpleString()
    out_schema = f"__idb {id_t}, dup_of {id_t}, __ra int"
    # Engine-faithful degenerate-cosine semantics (r14, ADVICE r13):
    # the join form's `dot / (na * nb) >= threshold` is a Catalyst
    # Divide + comparison, so under ANSI (the Spark 4 default) a
    # ZERO-NORM member in a >=2-member same-length group RAISES
    # DIVIDE_BY_ZERO, and with ANSI off the 0/0 cosine is NaN — which
    # Catalyst comparisons sort ABOVE every numeric, so `NaN >= th`
    # KILLS. The ANSI flag is captured at plan-build time (driver
    # side), exactly when Catalyst would bind it into the expression.
    _ansi = (
        str(
            pair_src.sparkSession.conf.get("spark.sql.ansi.enabled", "true")
        )
        .strip()
        .lower()
        == "true"
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        ids = pdf["__id"].to_list()
        ranks = pdf["rank"].to_list()
        vecs = pdf["__v"].to_list()
        # same-length groups: only equal-length pairs produce non-NULL
        # cosines under zip_with, so cross-length pairs are inert
        by_len: "dict[int, list[int]]" = {}
        for pos, v in enumerate(vecs):
            if v is not None:
                by_len.setdefault(len(v), []).append(pos)
        out_b, out_a, out_r = [], [], []
        for _ln, pos_list in by_len.items():
            sub = [vecs[p] for p in pos_list]
            try:
                V = np.asarray(sub, dtype=np.float64)
            except (TypeError, ValueError):
                # NULL elements: those vectors yield NULL cosines in
                # the join form — drop them from the dense compute
                kept = [
                    (p, v)
                    for p, v in zip(pos_list, sub)
                    if all(e is not None for e in v)
                ]
                if not kept:
                    continue
                pos_list = [p for p, _ in kept]
                V = np.asarray([v for _, v in kept], dtype=np.float64)
            m_sz = len(pos_list)
            if m_sz < 2 or V.ndim != 2 or V.shape[1] == 0:
                continue
            gids = [ids[p] for p in pos_list]
            granks = [ranks[p] for p in pos_list]
            n = np.sqrt(_seq_sqnorm(V))
            if _ansi and bool((n == 0.0).any()):
                # the Catalyst join form evaluates every same-length
                # pair's division, so one zero-norm member fails the
                # query loudly under ANSI — replicate, never silently
                # diverge (the ANSI element_at precedent)
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] zero-norm embedding in a "
                    ">=2-member cluster group: the pairwise cosine "
                    "divides by zero. Drop zero vectors upstream or "
                    "set spark.sql.ansi.enabled=false for the NaN "
                    "(kill) semantics."
                )
            blk = max(1, (1 << 22) // max(m_sz, 1))
            local = np.arange(m_sz)
            for c0 in range(0, m_sz, blk):
                c1 = min(c0 + blk, m_sz)
                # column block of the pair matrix: D[a, b-c0],
                # dimension-sequential accumulation (the _seq_dots
                # discipline, blocked over b)
                D = np.zeros((m_sz, c1 - c0))
                for j in range(V.shape[1]):
                    D += np.outer(V[:, j], V[c0:c1, j])
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = D / np.outer(n, n[c0:c1])
                    # Spark NaN ordering (ADVICE r13): in the join
                    # form the filter was Catalyst's `sim >= th`,
                    # and Spark comparisons place NaN ABOVE every
                    # numeric value — so a NaN cosine (a NaN vector
                    # element surviving the non-NULL screen; also
                    # 0/0 when ANSI is off — the ANSI case raised
                    # above) KILLED. numpy's `>=` is False for NaN,
                    # which silently diverged; replicate the engine
                    # semantics explicitly.
                    ge = (S >= threshold) | np.isnan(S)
                # a must be strictly earlier in rank order than b
                ge &= local[:, None] < local[None, c0:c1]
                hit = ge.any(axis=0)
                first = np.argmax(ge, axis=0)
                for lb in np.nonzero(hit)[0]:
                    out_b.append(gids[c0 + lb])
                    out_a.append(gids[first[lb]])
                    out_r.append(granks[first[lb]])
        return pd.DataFrame(
            {"__idb": out_b, "dup_of": out_a, "__ra": out_r}
        )

    per_cluster = src.groupBy("cluster").applyInPandas(
        kernel, schema=out_schema
    )
    # duplicate corpus ids can land the same __idb in several clusters;
    # the join form resolved those with ONE global min-rank witness —
    # keep that exact reduction (a no-op exchange-wise for well-formed
    # corpora: the final keep-join re-shuffles by id anyway)
    return per_cluster.groupBy("__idb").agg(
        F.min_by("dup_of", "__ra").alias("dup_of")
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | str = 16,
    threshold: float = 0.8,
    centroid_mode: str = "seeded",
    assign_mode: str = "pandas",
    seed: int = 7,
    max_cluster_size: int | None = None,
    target_cluster_size: int = 200,
) -> DataFrame:
    """Per-example semantic keep/drop decisions (SemDeDup).

    Returns (id_col, cluster, centroid_sim, rank, keep, dup_of):
    `rank` is the in-cluster keeper order (centroid_sim ASC, id ASC —
    the paper prefers the example FARTHEST from the centroid); an
    example is dropped (keep=false) iff some earlier-ranked member of
    its cluster has cosine >= threshold with it, and `dup_of` names the
    earliest-ranked such witness. centroid_sim is rounded to 6 decimals
    for cross-engine hash stability; ranking uses the unrounded value
    (bit-exact across engines by the sequential-fold discipline).

    `n_clusters='auto'` sizes the quantizer to the corpus —
    ceil(n / target_cluster_size) — so EXPECTED cluster size (and with
    it the per-cluster quadratic pair work) stays constant as the
    corpus grows: the scale path for production corpora, mirroring
    auto_lsh_params (a fixed cluster count is the same quadratic trap
    as a fixed LSH band config — constant cluster space, occupancy
    grows with n, in-cluster work grows ~n^2). Costs one count() job;
    a FIXED n_clusters keeps the build one-pass and deterministic
    relative to corpus size (the oracle-replay configuration).

    NULL-id rows are dropped entirely (they are unjoinable and would
    corrupt Arrow id transfer in the pandas assignment lane) — they
    appear in NO output row, so a pipeline joining keep decisions back
    must treat absent ids as unjudged, not kept. The 'auto' sizing
    counts only the judged (non-NULL-id) rows."""
    if n_clusters == "auto":
        import math

        judged = corpus.where(_col(id_col).isNotNull()).count()
        n_clusters = max(
            1, math.ceil(judged / max(1, int(target_cluster_size)))
        )
    if not isinstance(n_clusters, int) or n_clusters < 1:
        raise ValueError(
            f"n_clusters must be a positive int or 'auto', got {n_clusters}"
        )
    if not (-1.0 <= threshold <= 1.0):
        raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
    if centroid_mode == "seeded":
        C = _seeded_ivf_centroids(corpus, id_col, vec_col, n_clusters)
    elif centroid_mode == "trained":
        C = _train_ivf_centroids(corpus, vec_col, n_clusters, seed)
    else:
        raise ValueError(
            f"centroid_mode must be 'seeded' or 'trained': {centroid_mode}"
        )
    if assign_mode == "expr" and n_clusters > 256:
        # literal centroid arrays past a few hundred cells bloat the
        # plan; the pandas lane is pinned bit-identical, so the switch
        # is invisible in results
        assign_mode = "pandas"
    assigned = assign_clusters(
        corpus,
        C,
        id_col=id_col,
        vec_col=vec_col,
        assign_mode=assign_mode,
    )
    w = Window.partitionBy("cluster").orderBy(
        F.asc("centroid_sim"), F.asc("__id")
    )
    m = assigned.withColumn("rank", F.row_number().over(w))
    pair_src = m
    if max_cluster_size is not None:
        # Zipf guard: a degenerate cluster (all-alike embeddings, or a
        # centroid that swallowed the corpus) would make |members|^2
        # pairs; capped clusters keep ALL members (under-delete only)
        hot = (
            m.groupBy("cluster")
            .count()
            .where(F.col("count") > max_cluster_size)
            .select("cluster")
        )
        pair_src = m.join(F.broadcast(hot), "cluster", "left_anti")
    kills = _cluster_kills(pair_src, float(threshold))
    return (
        m.join(kills, m["__id"] == kills["__idb"], "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            F.round("centroid_sim", 6).alias("centroid_sim"),
            "rank",
            F.col("__idb").isNull().alias("keep"),
            "dup_of",
        )
    )
