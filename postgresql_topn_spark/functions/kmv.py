"""Mergeable K-Minimum-Values distinct sketches with SET ALGEBRA —
union AND intersection estimates, which HLL union alone cannot give.

The reference's rollup pattern (README.md: build per-bucket sketches
once, merge at read time, never rescan raw rows) extends to a question
its heavy-hitter sketches and our HLL rollups (functions/distinct.py)
cannot answer: "how many users did event types A and B SHARE last
month?" — a distinct-count INTERSECTION. KMV sketches (Bar-Yossef et
al. 2002; Beyer et al., SIGMOD 2007 "distinct-value synopses") support
it: keep the k smallest values of a uniform hash of each distinct item;
then for hash space [0, M)

    estimate(S)        = |S|                    if |S| < k   (exact)
                       = (k - 1) * M / S[k-1]   otherwise    (unbiased)
    union sketch       = k smallest of (A ∪ B)  (lossless merge)
    intersect estimate = |X ∩ A ∩ B| / |X| * estimate(X),  X = merge(A, B)

Merge law (pytest-pinned, and load-bearing for the suite oracle): the
global k minima are each among their bucket's k minima, so merging
per-bucket sketches yields EXACTLY the sketch built over the raw union
— rollups re-bucket losslessly (daily -> monthly -> all-time), same as
topn_union_agg with an un-evicted budget.

Hashing is the repo's portable md5-60bit form (first 15 hex chars of
md5 as a long, uniform on [0, 16^15)): Spark
`conv(substr(md5(x),1,15),16,10)` == DuckDB
`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`, so a DuckDB oracle
replays the sketch bit-for-bit (same pattern as operators/sampling.py).

100 TB shape: the build is (1) a distinct-combine exchange on
(group, hash) — map-side partial, bounded per-key state — then (2) the
lossless two-level salted bottom-k rank (the topn_salted_skew pattern
from functions/aggregates.py applied to ORDER BY hash ASC): no task
ever sorts more than SALTS*k survivors per group, so a group with 10^9
distinct users costs the same post-distinct memory as one with 10^3.
Merged sketches shuffle <= k longs per sub-bucket — read-path queries
never touch raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

# Hash space size: 15 hex chars of md5 => uniform on [0, 16^15) = [0, 2^60).
KMV_M = 16**15
DEFAULT_K = 64
_SALTS = 16


def kmv_hash(item: Column | str) -> Column:
    """Portable 60-bit uniform hash (md5-derived, DuckDB-replayable)."""
    return F.conv(F.substring(F.md5(_col(item)), 1, 15), 16, 10).cast("long")


def kmv_add_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    k: int = DEFAULT_K,
    out_col: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch (sorted array<long> of the k smallest
    distinct item hashes).

    Plan shape: distinct-combine on (group, hash), then the lossless
    two-level salted bottom-k (tasks never hold more than k rows per
    (group, salt) at level 1 or SALTS*k per group at level 2), then a
    collect_list bounded at k per group.
    """
    if k < 2:
        raise ValueError(f"kmv k must be >= 2, got {k}")
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    h = kmv_hash(item).alias("__h")
    distinct = df.select(*gcols, h).where(F.col("__h").isNotNull()).distinct()
    names = [f.name for f in distinct.schema.fields[:-1]]
    # Two-level bottom-k: salt is hash-derived (deterministic), so the
    # level-1 survivors are a fixed superset of the true bottom-k.
    salted = distinct.withColumn("__salt", F.pmod(F.col("__h"), F.lit(_SALTS)))
    w1 = Window.partitionBy(*names, "__salt").orderBy("__h")
    lvl1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*names).orderBy("__h")
    lvl2 = (
        lvl1.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    return lvl2.groupBy(*names).agg(
        F.array_sort(F.collect_list("__h")).alias(out_col)
    )


def _merge_collected(lst: Column, k: int) -> Column:
    """k smallest distinct values across a collected list of sketches —
    THE merge expression, shared by the grouped rollup and the window
    fold so the lossless-merge law lives in exactly one place."""
    return F.slice(F.array_sort(F.array_distinct(F.flatten(lst))), 1, k)


def kmv_merge(a: Column | str, b: Column | str, *, k: int = DEFAULT_K) -> Column:
    """Scalar two-sketch union — k smallest of the combined value sets
    (the `+` of the KMV algebra, mirroring topn_union / hll_union).
    NULL-tolerant: a NULL side behaves as the empty sketch."""
    ca = F.coalesce(_col(a), F.array().cast("array<bigint>"))
    cb = F.coalesce(_col(b), F.array().cast("array<bigint>"))
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def kmv_union_rollup(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch_col: str = "kmv",
    *,
    k: int = DEFAULT_K,
    out_col: str | None = None,
) -> DataFrame:
    """Merge pre-built sketches to a coarser grain. Rows shuffled are
    <= k longs each; per-group reduce state is (#sub-buckets * k) longs
    — the same bounded fold shape as the KLL rollup. Lossless: equals
    the sketch built over the raw union (merge law above)."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    out = out_col or sketch_col
    merged = _merge_collected(F.collect_list(_col(sketch_col)), k)
    return df.groupBy(*gcols).agg(merged.alias(out))


def kmv_union_over_window(
    sketch: Column | str, window, *, k: int = DEFAULT_K
) -> Column:
    """Merge KMV sketches across a window FRAME (e.g. ROWS 6 PRECEDING
    for a trailing-week distinct count) — the reference's hardest host
    composition (sliding-frame topn_union_agg,
    sql/customer_reviews_query.sql:59-68) carried to the distinct
    algebra. Per-row work is bounded by frame_size * k longs; the
    merge law makes the frame merge EXACTLY the sketch over the
    frame's raw union, so rolling distinct estimates need no raw-data
    rescan."""
    return _merge_collected(F.collect_list(_col(sketch)).over(window), k)


def kmv_estimate(sketch: Column | str, *, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate (double). Exact below saturation
    (|S| < k); the standard unbiased (k-1)*M/h_(k) estimator at k.

    Shape guard: a sketch LONGER than k was built with a larger k —
    reading it here would take the k-th smallest of the wrong set, so
    that mismatch raises instead of silently estimating. The converse
    (built with a SMALLER k, read with a larger one) is structurally
    indistinguishable from an unsaturated sketch — keep the build/read
    k in one place (as the rollup suite queries do) rather than
    relying on a runtime check that cannot exist."""
    s = _col(sketch)
    exact = F.size(s).cast("double")
    kth = F.element_at(s, k).cast("double")  # h_(k), 1-indexed
    est = F.lit(float(k - 1)) * F.lit(float(KMV_M)) / kth
    return (
        F.when(
            F.size(s) > k,
            F.raise_error(
                F.concat(
                    F.lit("kmv_estimate(k="),
                    F.lit(str(k)),
                    F.lit("): sketch has "),
                    F.size(s).cast("string"),
                    F.lit(" values — built with a larger k; read it with that k"),
                )
            ).cast("double"),
        )
        .when(F.size(s) < k, exact)
        .otherwise(est)
    )


def kmv_intersect_estimate(
    a: Column | str, b: Column | str, *, k: int = DEFAULT_K
) -> Column:
    """Estimated |A ∩ B| from two KMV sketches: with X = merge(A, B),
    the fraction of X's values present in both input sketches is an
    estimator of the Jaccard similarity, scaled by the union estimate
    (Beyer et al. 2007, §5). Exact when both sides are unsaturated."""
    ca, cb = _col(a), _col(b)
    # NULL-as-empty on BOTH uses of each side: kmv_merge already
    # coalesces internally, but intersecting x against a raw NULL arm
    # made the whole estimate NULL where empty-set math says 0.0
    # (review pin) — intersect against the coalesced arrays instead
    empty = F.array().cast("array<bigint>")
    ea, eb = F.coalesce(ca, empty), F.coalesce(cb, empty)
    x = kmv_merge(ca, cb, k=k)
    in_both = F.size(F.array_intersect(F.array_intersect(x, ea), eb))
    kx = F.size(x)
    return F.when(kx == 0, F.lit(0.0)).otherwise(
        in_both.cast("double") / kx.cast("double") * kmv_estimate(x, k=k)
    )
