"""Two-pass EXACT heavy hitters — bounded memory, exact answers.

The reference's sketches (and our Tier-1/Tier-2 aggregates) answer
"top n" approximately once distinct items overflow the counter budget.
The classic complement (Misra & Gries 1982 + the MapReduce two-pass
refinement) answers the threshold form EXACTLY with bounded memory:

  every item with frequency > total/k, with its EXACT count.

Pass 1 runs a k-counter Misra-Gries summary per input partition
(mapInPandas, state <= k entries per task): MG guarantees every item
with global frequency > total/k survives in at least one partition's
summary — decrements charge k distinct items at once, so an item
needs global count > total/k to be wiped everywhere it is frequent.
The candidate union is tiny (<= k * partitions rows, deduped).

Pass 2 joins the candidate set back (broadcast — it is small by
construction) and counts ONLY candidate items exactly, filtering to
count * k > total. No false negatives (MG's guarantee), no false
positives (the exact recount) — the output is exactly SQL's
HAVING count(*) > total/k, which is what the DuckDB oracle runs.

100 TB shape: pass 1 is map-side only (no shuffle; k entries per
task); pass 2 scans once more with a broadcast semi-join filter ahead
of the count agg, so the heavy second exchange only carries candidate
rows. Two scans total — the price of exactness over a sketch.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col


def _mg_partition(k: int):
    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for it in pdf["__item"]:
                if it is None:
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k - 1:
                    counters[it] = 1
                else:
                    # decrement-all: charges k distinct items together
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({"__item": list(counters.keys())})

    return summarize


def exact_heavy_hitters(
    df: DataFrame,
    item: Column | str,
    *,
    k: int = 100,
    out_item: str = "item",
    out_freq: str = "frequency",
) -> DataFrame:
    """All items with frequency strictly greater than total/k, with
    exact counts (sorted by the caller; NULL items are skipped, SQL
    COUNT discipline). Memory per task is bounded at k counters in
    pass 1 regardless of cardinality or skew."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(_col(item).cast("string").alias("__item")).where(
        F.col("__item").isNotNull()
    )
    candidates = (
        src.mapInPandas(_mg_partition(k), "__item string").distinct()
    )
    # Pass 2 counts candidates AND the grand total in ONE scan: rows
    # whose item is not a candidate collapse into a single NULL-keyed
    # group (its count partial-combines to one row per task, so the
    # "everything else" group is never a reducer hot spot), and
    # total = sum over all groups.
    flagged = src.join(
        F.broadcast(candidates.withColumn("__cand", F.lit(True))),
        "__item",
        "left",
    )
    grouped = flagged.groupBy(
        F.when(F.col("__cand"), F.col("__item")).alias("__key")
    ).agg(F.count(F.lit(1)).alias("__n"))
    total = F.sum("__n").over(Window.partitionBy())
    return (
        grouped.withColumn("__total", total)
        .where(
            F.col("__key").isNotNull()
            & (F.col("__n") * k > F.col("__total"))
        )
        .select(F.col("__key").alias(out_item), F.col("__n").alias(out_freq))
    )
