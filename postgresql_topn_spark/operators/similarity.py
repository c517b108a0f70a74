"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: exact brute-force top-k — broadcast the (small) query
  set against the corpus scan; one shuffle for the per-query rank. The
  correctness baseline.
- `lsh_topk`: random-hyperplane LSH bucketing — the scale path: corpus
  and queries are bucketed by sign-pattern; candidates come from the
  query's bucket (+ optional multi-probe neighbors), then exact rerank.
  Recall < 1 by construction, so it carries a rows-only oracle plus a
  pytest recall floor vs brute force.

The dot product / norm are sequential left folds over the array
(`F.aggregate`), evaluated JVM-side; element order is fixed, which makes
the double results bit-reproducible — the DuckDB oracle folds in the
same order (`list_reduce`) so value hashes match exactly.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    `queries` is broadcast (it must be the small side); the corpus scan
    streams once with no shuffle until the per-query rank. Returns
    (query_id, neighbor_id, rank, sim) with sim rounded to 6 decimals
    for cross-engine hash stability (rank is computed on the unrounded
    value, ties broken by neighbor id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine("__qv", "__cv").alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__sim", 6).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (one bit per hyperplane)."""
    v = _col(vec)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_tables(
    vec: Column | str, dim: int, n_tables: int, n_planes: int, seed: int
) -> Column:
    """array<struct<table:int,bucket:long>> — one sign-bucket per table.

    Multi-table (banded) LSH: a single r-plane signature requires ALL r
    signs to agree (collision prob (1 - theta/pi)^r, near zero for the
    moderate-similarity neighbors top-k cares about), so recall comes
    from OR-ing L independent tables: P(candidate) = 1-(1-p^r)^L.
    """
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 7919 * t)
        entries.append(
            F.struct(
                F.lit(t).alias("table"), lsh_bucket(vec, planes).alias("bucket")
            )
        )
    return F.array(*entries)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 12,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 7,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: band corpus + queries into L sign-bucket
    tables, union candidates across tables, rerank exactly. At scale the
    per-table bucket equi-join replaces the full cross product; corpus
    rows are exploded L× but each join is shuffle-free (queries
    broadcast) and candidates dedupe before the expensive rerank."""
    # candidate generation moves only (id, band) rows; vectors join back
    # once per unique (query, neighbor) pair after the dedup
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(lsh_tables(vec_col, dim, n_tables, n_planes, seed)).alias("__t"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(lsh_tables(vec_col, dim, n_tables, n_planes, seed)).alias("__t"),
    )
    joined = c.join(F.broadcast(q), "__t")
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    cand = joined.select("query_id", "neighbor_id").distinct()
    cvecs = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )
    qvecs = queries.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    scored = (
        cand.join(cvecs, cand["neighbor_id"] == cvecs["__cid"])
        .join(F.broadcast(qvecs), F.col("query_id") == qvecs["__qid"])
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__sim", 6).alias("sim"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    include_self: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the
    corpus into `n_lists` cells, search only the `n_probe` cells whose
    centroids are nearest each query.

    Scale shape: training samples the corpus (KMeans on a bounded
    sample), cell assignment is one map-side pass, and the probe join is
    corpus-cell x query-probe equi-join — candidates ~ n_probe/n_lists
    of the corpus instead of all of it. Recall < 1 by construction
    (pytest recall floor, no SQL oracle).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(c.select("__feat"))
    assigned = model.transform(c).select("neighbor_id", "__cv", "__cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

    def _probe_cells(vec: Column) -> Column:
        # distance to each centroid, take the n_probe nearest cell ids
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(x) for x in ctr]),
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, ctr in enumerate(centroids)
            ]
        )
        return F.slice(F.array_sort(dists), 1, n_probe)["cell"]

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_probe_cells(F.col(vec_col))).alias("__cell"),
    )
    joined = assigned.join(F.broadcast(q), "__cell")
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "neighbor_id", cosine("__qv", "__cv").alias("__sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__sim", 6).alias("sim"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded-LSH candidates,
    exact cosine >= threshold. Near-identical vectors share an r-plane
    sign bucket in at least one of the L tables w.h.p.
    (1-(1-(1-theta/pi)^r)^L ~ 0.99 at cos=0.95 with r=8, L=8); at 100 TB
    the per-table bucket equi-join is the only pair generator (never
    O(n^2))."""
    # Three scale rules shape this plan:
    # 1. the banded candidate join carries ONLY (id, band) — never the
    #    vectors — so the biggest shuffle (explode x L tables ->
    #    self-join -> distinct) moves narrow rows;
    # 2. vectors join back once per UNIQUE pair, after the dedup;
    # 3. norms are computed once per vector and carried as a column, so
    #    the per-pair rerank is one dot-product fold + a divide. (A
    #    transform(v, x -> x / norm(v)) pre-normalization is a trap: the
    #    lambda re-evaluates norm(v) per array element.)
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(lsh_tables(vec_col, dim, n_tables, n_planes, seed)).alias("__t"),
    )
    a, c = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.__t") == F.col("b.__t")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        norm(vec_col).alias("__n"),
    )
    pairs = (
        cand.join(vecs, cand["id_a"] == vecs["__vid"])
        .select("id_a", "id_b", F.col("__v").alias("__va"), F.col("__n").alias("__na"))
        .join(vecs, F.col("id_b") == vecs["__vid"])
        .select(
            "id_a",
            "id_b",
            (dot("__va", "__v") / (F.col("__na") * F.col("__n"))).alias("__sim"),
        )
    )
    return pairs.where(F.col("__sim") >= threshold).select(
        "id_a", "id_b", F.round("__sim", 6).alias("sim")
    )
