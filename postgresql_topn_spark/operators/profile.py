"""One-pass dataset profiling — the corpus QA report every pipeline
runs before (and after) a training-data build: row counts, null rates,
distinct cardinalities and value ranges per column, from ONE aggregate
over the data.

Shape: a single global groupBy().agg() computing every column's stats
as parallel aggregate expressions — Catalyst partial-aggregates the
whole thing map-side, so the profile costs one scan + one tiny
exchange regardless of column count. The wide 1-row result is then
unpivoted (stack) into the long (column, stat, ...) report format.

``exact_distinct=False`` (the 100 TB default) uses HLL-backed
approx_count_distinct (rsd ~2.3%) — per-column exact distincts would
each keep unbounded agg state; ``True`` switches to exact
count(DISTINCT ...), which is what the DuckDB-oracled suite query
runs (the regime where the two engines must agree value-for-value).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, n_rows, n_non_null, n_distinct, min_s, max_s) — min/max
    rendered as strings so heterogeneous column types share one report
    schema. NULLs are excluded from distinct/min/max (SQL aggregate
    discipline)."""
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        distinct = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot via stack: (col_name, n_non_null, n_distinct, min_s, max_s)
    stack_args = []
    for c in names:
        stack_args += [
            F.lit(c),
            F.col(f"__nn_{c}"),
            F.col(f"__nd_{c}"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
        ]
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(names)),
            *stack_args,
        ).alias("col_name", "n_non_null", "n_distinct", "min_s", "max_s"),
    )
    return stacked.select(
        "col_name", "n_rows", "n_non_null", "n_distinct", "min_s", "max_s"
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: "str | None" = "text",
    *,
    status_col: str = "status",
) -> DataFrame:
    """Snapshot comparison — the "what changed between corpus v7 and
    v8" audit a pipeline runs before re-training on a refreshed build:
    one row per document id present in EITHER snapshot, labeled

        'added'     — id only in `new`
        'removed'   — id only in `old`
        'changed'   — id in both, md5(`content_col`) differs
                      (NULL content compares via eqNullSafe: NULL ==
                      NULL is unchanged, NULL vs non-NULL is changed)
        'unchanged' — id in both, content identical

    With ``content_col=None`` only membership is compared (added /
    removed / unchanged). Returns (id, status) — feed it to
    `profile_columns` or a groupBy for the summary table, or
    anti-join 'removed' ids against downstream rollups to invalidate
    them. Pairs with `train_split`'s refresh-stability contract: a
    refresh-stable pipeline expects the 'unchanged' set's split
    assignments to be identical across versions.

    100 TB shape: one full outer join on the id (a single key
    exchange; ZERO exchanges when both snapshots are bucketed on the
    id — sources/bucketed.py), comparing 128-bit digests instead of
    shipping document bodies through the join."""
    if id_col == status_col:
        raise ValueError(
            f"id_col and status_col collide ({id_col!r})"
        )
    def _side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"__id_{tag}")]
        if content_col is not None:
            cols.append(F.md5(F.col(content_col)).alias(f"__h_{tag}"))
        else:
            cols.append(F.lit(None).cast("string").alias(f"__h_{tag}"))
        return df.select(*cols)

    o, n = _side(old, "o"), _side(new, "n")
    joined = o.join(
        n, o["__id_o"].eqNullSafe(n["__id_n"]), "full_outer"
    )
    same = F.col("__h_o").eqNullSafe(F.col("__h_n"))
    status = (
        F.when(F.col("__id_o").isNull(), F.lit("added"))
        .when(F.col("__id_n").isNull(), F.lit("removed"))
        .when(F.lit(content_col is None) | same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col("__id_o"), F.col("__id_n")).alias(id_col),
        status.alias(status_col),
    )


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """Distributional drift between two corpus snapshots — the
    monitoring twin of `corpus_diff` (which compares MEMBERSHIP, this
    compares CONTENT): both snapshots are reduced to their
    hashed-ngram bucket distributions (`dsir_bucket_counts`' feature
    space, so a persisted rollup can feed either side without
    rescanning text) and compared with total-variation distance

        tv_micro = round(0.5 * sum_b |p_b - q_b| * 1e6)

    plus the l1-heaviest buckets for attribution. TV is in [0, 1]:
    ~0 means a refresh left the token distribution unchanged; a jump
    says the new crawl/filter changed WHAT the corpus says, even if
    row counts look stable — the pretraining-data drift alarm that
    membership diffs can't raise.

    Returns a 1-row frame (tv_micro, n_old, n_new, top_buckets) where
    top_buckets is the 10 buckets with the largest |p - q| (array of
    (bucket, delta_micro) structs, descending) — join back through
    the feature hash offline to name the shifted vocabulary.

    Determinism: per-bucket probabilities are exact-integer counts
    over 1-row broadcast totals; |p - q| folds in bucket order inside
    a sorted array aggregate, so the rounded tv_micro is
    engine-replayable like every fixed-point measure here. Shape: two
    bounded hash-aggs (key space <= n_buckets each) + a <=n_buckets
    row join — nothing scales with corpus size."""
    from postgresql_topn_spark.operators.dsir import dsir_bucket_counts

    def _counts(df: DataFrame) -> DataFrame:
        return dsir_bucket_counts(
            df.select(F.col(id_col), F.col(text_col)),
            [],
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
            bigrams=bigrams,
        )

    oc = _counts(old).withColumnRenamed("cnt", "c_old")
    nc = _counts(new).withColumnRenamed("cnt", "c_new")
    j = oc.join(nc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    tot = j.agg(
        F.sum("c_old").alias("__to"), F.sum("c_new").alias("__tn")
    )
    d = j.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "c_old",
        "c_new",
        (
            F.col("c_old").cast("double") / F.col("__to").cast("double")
            - F.col("c_new").cast("double") / F.col("__tn").cast("double")
        ).alias("__delta"),
        F.col("__to").alias("__to"),
        F.col("__tn").alias("__tn"),
    )
    # sort by bucket before folding so the float sum order is fixed
    rows = d.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("bucket", F.abs(F.col("__delta")).alias("a")))
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["a"],
        ).alias("__l1"),
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.abs(F.col("__delta")).alias("a"),
                        F.col("bucket").alias("bucket"),
                    )
                )
            )
        ).alias("__ranked"),
        F.max("__to").alias("n_old"),
        F.max("__tn").alias("n_new"),
    )
    return rows.select(
        F.round(F.lit(0.5) * F.col("__l1") * F.lit(1e6), 0)
        .cast("long")
        .alias("tv_micro"),
        "n_old",
        "n_new",
        F.transform(
            F.slice("__ranked", 1, 10),
            lambda e: F.struct(
                e["bucket"].alias("bucket"),
                F.round(e["a"] * F.lit(1e6), 0).cast("long").alias("delta_micro"),
            ),
        ).alias("top_buckets"),
    )
