"""Mergeable distinct-count rollups — the topn rollup algebra applied
to COUNT(DISTINCT ...).

The reference's whole point (README.md: build per-bucket sketches once,
merge them at query time instead of rescanning raw data) applies to
distinct counting exactly as it does to heavy hitters, and at 100 TB an
exact COUNT(DISTINCT) per dashboard query is a full shuffle of every
raw key. These helpers wrap Spark's native Apache DataSketches HLL
aggregates (JVM-side, partial-combining, Tungsten-encoded binary state)
in the same rollup API shape as functions/aggregates.py so a user can
maintain (bucket, group, hll) tables next to (bucket, group, topn)
tables and merge both with one groupBy:

    daily = hll_add_agg(events, [F.to_date("ts").alias("day"),
                                 "event_type"], "user_id")
    monthly_est = hll_estimate_col(
        hll_union_rollup(daily, ["event_type"], "hll")["hll"])

Merge law (pytest-pinned in tests/test_distinct.py): unioning any
partition of the input's sub-sketches yields the same estimate as one
sketch over the whole input — HLL union at equal lgConfigK is lossless,
so rollups can be re-bucketed freely (daily -> monthly -> all-time)
without touching raw data.

Accuracy: relative standard error ~= 1.04 / sqrt(2^lg_k) — 1.6% at the
default lg_k=12 with a 4 KB sketch. Raise lg_k for tighter estimates,
never for correctness (estimates are within ~3 RSE with overwhelming
probability; the suite query pins a 5% envelope against exact counts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from postgresql_topn_spark.functions.sketch import _col

DEFAULT_LG_K = 12


def hll_add_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    lg_k: int = DEFAULT_LG_K,
    out_col: str = "hll",
) -> DataFrame:
    """Per-group HLL sketch of distinct `item` values (binary column).
    One key shuffle with map-side partial combine — the same exchange
    shape as topn_add_agg's count stage."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    return df.groupBy(*gcols).agg(
        F.hll_sketch_agg(_col(item), F.lit(lg_k)).alias(out_col)
    )


def hll_union_rollup(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch_col: str = "hll",
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Merge pre-built sketches to a coarser grain: rows shuffled are
    fixed-size binaries (<= 2^lg_k bytes), never raw keys — the rollup
    read path stays sub-second regardless of raw-data volume, matching
    the reference's topn_union_agg usage (README.md rollup examples)."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    out = out_col or sketch_col
    # allowDifferentLgConfigK: sketches built at differing lg_k merge to
    # the smaller precision instead of erroring — rollup tables written
    # before an lg_k bump stay unionable.
    return df.groupBy(*gcols).agg(
        F.hll_union_agg(_col(sketch_col), F.lit(True)).alias(out)
    )


def hll_estimate_col(sketch: Column | str) -> Column:
    """Distinct-count estimate (bigint) from a sketch column."""
    return F.hll_sketch_estimate(_col(sketch))


def hll_union(a: Column | str, b: Column | str) -> Column:
    """Scalar two-sketch union — the `+` of the distinct algebra,
    mirroring topn_union for topn sketches. NULL-tolerant like every
    sibling scalar merge (kmv/cms/bloom): a NULL side acts as the
    empty sketch, so left-join rollup shapes with missing groups
    estimate the non-NULL side instead of NULL (review pin — Spark's
    native hll_union propagates NULL)."""
    ca, cb = _col(a), _col(b)
    return (
        F.when(ca.isNull(), cb)
        .when(cb.isNull(), ca)
        .otherwise(F.hll_union(ca, cb, True))
    )
