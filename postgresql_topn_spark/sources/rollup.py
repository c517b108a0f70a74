"""Materialized rollup tables — the reference's core usage pattern
(README.md:73-116: ``popular_products(review_date date UNIQUE, agg_data
jsonb)``): pre-aggregate sketches per time bucket, persist them, answer
dashboard top-n by merging only the requested interval's rows.

Spark-first materialization: a parquet table **partitioned by the time
bucket**, sketch stored as JSON text (engine-portable, like the
reference's at-rest JSONB). Interval queries prune to the matching
partitions before any row is read — at 100 TB of history the read cost
is proportional to the interval, not the history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.aggregates import topn_add_agg, topn_union_agg
from postgresql_topn_spark.functions.sketch import sketch_to_json


def write_topn_rollup(
    df: DataFrame,
    path: str,
    bucket: Column | str,
    item: Column | str,
    *,
    bucket_name: str = "bucket",
    extra_group_cols: Sequence[Column | str] = (),
    counters: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Build per-bucket sketches and persist them partitioned by bucket.

    ``mode="append"`` adds new buckets incrementally (sketch deltas are
    associative — merging at read time makes appended same-bucket rows
    equivalent to one big aggregation, the reference's incremental
    rollup contract)."""
    b = bucket if isinstance(bucket, Column) else F.col(bucket)
    sk = topn_add_agg(
        df,
        [b.alias(bucket_name), *extra_group_cols],
        item,
        counters=counters,
    )
    sk.withColumn("topn", sketch_to_json(F.col("topn"))).write.mode(
        mode
    ).partitionBy(bucket_name).parquet(path)


def read_topn_rollup(
    spark: SparkSession,
    path: str,
    *,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Load a rollup table with the sketch column re-typed. Filters on
    the bucket column prune partitions (verify with .explain:
    PartitionFilters).

    ``bucket_name`` must match the name the rollup was written with —
    it is validated against the on-disk partition column so a mismatch
    fails here, at load, instead of as a missing-column error in the
    first downstream interval filter."""
    df = spark.read.parquet(path)
    if bucket_name not in df.columns:
        raise ValueError(
            f"rollup at {path} has no bucket column {bucket_name!r}; "
            f"found columns {df.columns}"
        )
    return df.withColumn("topn", F.from_json("topn", "map<string,bigint>"))


def query_topn_rollup(
    rollup: DataFrame,
    group_cols: Sequence[Column | str],
    *,
    counters: int | None = None,
) -> DataFrame:
    """Merge rollup rows per *group_cols* (e.g. month from daily buckets,
    or a constant for a grand total) — the read-side topn_union_agg."""
    return topn_union_agg(rollup, list(group_cols), "topn", counters=counters)


def write_sketch_rollup(
    df: DataFrame,
    path: str,
    partition_names: Sequence[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Persist ANY mergeable-family rollup (KMV/CMS/Bloom array<bigint>
    rows, HLL/KLL binary rows, topn JSON rows) partitioned by its time/
    shard grain — the same layout contract as write_topn_rollup:
    appends add delta rows (each family's merge law makes them
    equivalent to one big build), interval reads prune partitions, and
    sources/maintenance-style compaction folds deltas back down."""
    if not partition_names:
        raise ValueError("partition_names must be non-empty")
    df.write.mode(mode).partitionBy(*list(partition_names)).parquet(path)


def read_sketch_rollup(
    spark: SparkSession,
    path: str,
    partition_names: Sequence[str],
) -> DataFrame:
    """Load a sketch rollup; validates the partition grain so a
    mismatch fails at load, not in the first downstream filter.
    Filters on the partition columns prune to the interval's files
    (PartitionFilters — asserted in tests/test_rollup.py)."""
    df = spark.read.parquet(path)
    missing = [c for c in partition_names if c not in df.columns]
    if missing:
        raise ValueError(
            f"rollup at {path} lacks partition columns {missing}; "
            f"found {df.columns}"
        )
    return df
