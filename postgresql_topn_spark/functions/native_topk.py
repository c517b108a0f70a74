"""Bridge to Spark's native DataSketches frequent-items family
(``approx_top_k`` / ``_accumulate`` / ``_combine`` / ``_estimate``,
Spark 4.0+) — the JVM-built alternative to this repo's Tier-2 sketch
for unbounded-cardinality groups, wired into the same rollup algebra.

Why both exist: our Tier-1 aggregate is exact (the regime every oracle
checks, matching the reference's exact regime) and Tier-2 reproduces
the reference's space-saving prune semantics bit-for-bit. DataSketches
frequent-items gives neither of those contracts, but it is pure JVM,
partial-combining, and ships error bounds — the right tool when a user
wants engine-native sketches and doesn't need reference parity. These
wrappers expose it in the repo's rollup shape (accumulate per fine
bucket -> combine to coarse grain -> estimate), plus a converter into
the repo's ``map<string,bigint>`` sketch type so native states can
join the `topn_union` algebra once estimated.

Exactness note (what the oracled suite query pins): with
``max_items_tracked`` >= the group's distinct-item count the sketch
never evicts, every estimate is the exact count, and results are
deterministic — the same "no eviction => exact" regime the reference's
own regression tests run in (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from postgresql_topn_spark.functions.sketch import _col


def _call(name: str, *cols: Column) -> Column:
    return F.call_function(name, *cols)


def accumulate(item: Column | str, max_items_tracked: int = 10_000) -> Column:
    """``approx_top_k_accumulate(item, max_items_tracked)`` — build a
    native sketch state per group (use inside ``groupBy().agg``)."""
    return _call(
        "approx_top_k_accumulate", _col(item), F.lit(int(max_items_tracked))
    )


def combine(state: Column | str, max_items_tracked: int = 10_000) -> Column:
    """``approx_top_k_combine`` — merge pre-built states to a coarser
    grain without touching raw rows (the rollup-merge step)."""
    return _call(
        "approx_top_k_combine", _col(state), F.lit(int(max_items_tracked))
    )


def estimate_entries(state: Column | str, k: int) -> Column:
    """``approx_top_k_estimate(state, k)`` — array<struct<item,count>>.
    NOTE: the engine's own tie order among equal counts is unspecified;
    for deterministic output request k >= the tracked item count and
    rank the exploded rows yourself (frequency DESC, item ASC) like the
    suite query does."""
    return _call("approx_top_k_estimate", _col(state), F.lit(int(k)))


def sketch_from_native(entries: Column | str) -> Column:
    """Convert an ``approx_top_k_estimate`` array into this repo's
    ``map<string,bigint>`` sketch so native states can enter the
    `topn_union` / `topn` extraction algebra after estimation. Items
    are cast to string (TEXT-only intake, like every sketch entry
    point); entry order is normalized by the map representation."""
    e = _col(entries)
    return F.map_from_entries(
        F.transform(
            e,
            lambda s: F.struct(
                s["item"].cast("string").alias("key"),
                s["count"].cast("long").alias("value"),
            ),
        )
    )
