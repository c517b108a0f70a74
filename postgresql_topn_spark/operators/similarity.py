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

import numpy as np
import pandas as pd

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


def _planes_matrix(dim: int, n_tables: int, n_planes: int, seed: int):
    """(n_tables*n_planes, dim) float64 matrix, same planes (same seeds,
    same order) as the expression-based lsh_tables."""
    import numpy as np

    rows: list[list[float]] = []
    for t in range(n_tables):
        rows.extend(_hyperplanes(dim, n_planes, seed + 7919 * t))
    return np.asarray(rows, dtype=np.float64)


def np_lsh_buckets(
    vec: Column | str, dim: int, n_tables: int, n_planes: int, seed: int
) -> Column:
    """array<long> of per-table sign buckets via ONE Arrow-batched numpy
    matmul per batch.

    The expression form (`lsh_tables`) builds n_tables*n_planes separate
    `aggregate(zip_with(...))` folds; Spark evaluates higher-order
    lambdas interpreted (outside whole-stage codegen), so that is
    ~L*r*dim interpreted evals per row — measured 5s for 2000 rows at
    L=16,r=4,dim=64. The matmul is the same math at memory bandwidth,
    and at cluster scale it's a map-side pass with no shuffle. Bucket
    values match lsh_tables bit-for-bit except when a projection is
    within float rounding of 0."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    P = _planes_matrix(dim, n_tables, n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        signs = (X @ P.T) > 0  # (B, L*r)
        buckets = signs.reshape(len(X), n_tables, n_planes) @ weights
        return pd.Series(list(buckets))

    return _buckets(_col(vec))


def np_cosine(a: Column | str, b: Column | str) -> Column:
    """Batched exact cosine (numpy einsum over Arrow batches) for the
    rerank stage of approximate ops. Differs from the fold-based
    `cosine` only in float summation order (~1 ulp); oracled queries
    that must hash-match DuckDB's sequential list_reduce keep `cosine`."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype=float)
        A = np.asarray(xs.tolist(), dtype=np.float64)
        B = np.asarray(ys.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos(_col(a), _col(b))


def _banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    dim: int,
    n_tables: int,
    n_planes: int,
    seed: int,
) -> DataFrame:
    """(out_id, __tbl, __bkt) — one row per (vector, LSH table)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(np_lsh_buckets(vec_col, dim, n_tables, n_planes, seed)).alias(
            "__tbl", "__bkt"
        ),
    )


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
    c = _banded(corpus, id_col, vec_col, "neighbor_id", dim, n_tables, n_planes, seed)
    q = _banded(queries, id_col, vec_col, "query_id", dim, n_tables, n_planes, seed)
    joined = c.join(F.broadcast(q), ["__tbl", "__bkt"])
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
        .select("query_id", "neighbor_id", np_cosine("__qv", "__cv").alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__sim", 6).alias("sim"))
    )


def _train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_lists: int,
    seed: int,
    max_train: int = 100_000,
    iters: int = 15,
):
    """(n_lists, dim) float64 centroids: Lloyd's k-means on a bounded
    driver-side sample.

    IVF coarse quantizers train on a sample by design (FAISS does the
    same): max_train vectors x 64 dims x 8 B = ~50 MB on the driver
    regardless of corpus size, and training cost is independent of scale.
    Only training is driver-side — cell ASSIGNMENT stays a distributed
    map-side pandas UDF. Replaces pyspark.ml KMeans, whose multi-job fit
    dominated the index build (4.3s of a 4.4s query at sf0.1)."""
    vecs = corpus.select(vec_col)
    n = vecs.count()
    if n > max_train:
        vecs = vecs.sample(False, min(1.0, 1.05 * max_train / n), seed).limit(
            max_train
        )
    X = np.asarray(
        [r[0] for r in vecs.collect()], dtype=np.float64
    )
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        d2 = (
            -2.0 * (X @ C.T)
            + np.einsum("ij,ij->i", C, C)
        )
        assign = d2.argmin(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
            else:  # dead cell: reseed from a random point
                C[j] = X[rng.randint(len(X))]
    return C


def _probe_cells_udf(C, n_probe: int):
    """pandas UDF: vector -> n_probe nearest centroid ids (array<int>)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    c_sq = np.einsum("ij,ij->i", C, C)

    @pandas_udf(ArrayType(IntegerType()))
    def _probe(vs: pd.Series) -> pd.Series:
        # ||x||^2 is constant per row, so -2 x.C + ||c||^2 orders cells
        # identically to true squared distance; stable sort = cell-id
        # tie-break
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        d2 = -2.0 * (X @ C.T) + c_sq
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return _probe


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
    C = _train_ivf_centroids(corpus, vec_col, n_lists, seed)
    _probe_cells = _probe_cells_udf(C, n_probe)
    _assign_cell = _probe_cells_udf(C, 1)

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(_assign_cell(F.col(vec_col)), 1).alias("__cell"),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_probe_cells(F.col(vec_col))).alias("__cell"),
    )
    joined = assigned.join(F.broadcast(q), "__cell")
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "neighbor_id", np_cosine("__qv", "__cv").alias("__sim")
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
    """Embedding-cosine near-duplicate pairs: banded-LSH buckets scored
    in-bucket with one numpy matmul each, exact cosine >= threshold.
    Near-identical vectors share an r-plane sign bucket in at least one
    of the L tables w.h.p. (1-(1-(1-theta/pi)^r)^L ~ 0.99 at cos=0.95
    with r=8, L=8); at 100 TB the per-bucket grouping is the only pair
    generator (never a global O(n^2) join)."""
    # Plan shape, chosen over the pair-materializing alternative
    # (candidate self-join -> distinct -> join vectors back twice):
    # low thresholds force wide bands, where most in-bucket pairs are
    # candidates — materializing them as Spark rows is ~quadratic row
    # machinery (measured: 2M candidate rows, 2.7s of distinct, for 2000
    # vectors). Instead each (table, bucket) group is scored with a
    # single normalized X @ X.T in applyInPandas; sub-threshold pairs
    # die inside numpy and only survivors become rows, so the post-
    # threshold dedup across tables is over the (small) result set.
    # Shuffle cost: L x corpus (vectors ride the explode) — linear, one
    # shuffle. Hot-bucket skew is bounded by n_planes (bucket count
    # 2^r per table); a pathological bucket can be tiled into block
    # pairs, which keeps per-task memory O(tile^2) — not needed at
    # current scales.
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_dtype = dict(df.dtypes)[id_col] if id_col in dict(df.dtypes) else "bigint"
    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("__sim", DoubleType()),
        ]
    )

    banded = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__v"),
        F.posexplode(np_lsh_buckets(vec_col, dim, n_tables, n_planes, seed)).alias(
            "__tbl", "__bkt"
        ),
    )

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "__sim"])
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.asarray(pdf["__v"].to_numpy()[order].tolist(), dtype=np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        iu, ju = np.triu_indices(m, k=1)
        keep = S[iu, ju] >= threshold
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "__sim": S[iu, ju][keep]}
        )

    pairs = banded.groupBy("__tbl", "__bkt").applyInPandas(_bucket_pairs, out_schema)
    # same pair can surface from several tables; the float sims may
    # differ in the last ulp across group layouts, so dedupe by key
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.round(F.max("__sim"), 6).alias("sim"))
        .select(F.col("id_a").cast(id_dtype), F.col("id_b").cast(id_dtype), "sim")
    )
