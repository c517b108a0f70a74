"""Bucketed-table materialization — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the exchange of
both sides on the join key. Spark's bucketing (hash-partitioned,
per-bucket-sorted files registered in the catalog) moves that exchange
to WRITE time, once: two tables bucketed by the same key into the same
bucket count sort-merge-join with ZERO Exchange in the plan — every
subsequent join, aggregation, or dedup keyed on the bucket column reads
pre-partitioned data. This is the standard warehouse layout for a fact
table that is joined on the same key by many downstream pipelines
(orders/lineitem on orderkey; documents/fingerprints on doc_id), and it
composes with every operator in this repo: a `topn_add_agg` or
`kmv_add_agg` GROUPed BY the bucket key skips its first exchange too
(Catalyst sees the hashed distribution from the catalog).

Mechanics worth knowing (asserted in tests/test_bucketed.py):
- bucketing requires `saveAsTable` (catalog-registered; a bare
  parquet path carries no bucket metadata);
- both sides must agree on key AND bucket count, or Spark re-shuffles
  the mismatched side only;
- `spark.sql.sources.bucketing.enabled` (default true) must be on, and
  joins read through the catalog table, not the path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Materialize `df` as a catalog table hash-bucketed by
    `bucket_cols` into `n_buckets` files per partition, each bucket
    sorted by `sort_cols` (default: the bucket columns — pre-sorted
    buckets let sort-merge joins skip their Sort too). `path` pins an
    external location; omit it for the session warehouse dir."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    cols = list(bucket_cols)
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    sort = list(sort_cols) if sort_cols is not None else cols
    w = df.write.mode(mode).format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(n_buckets, *cols).sortBy(*sort).saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG (bucket metadata rides
    the table entry; `spark.read.parquet(path)` would lose it and
    re-shuffle on the next join)."""
    return spark.table(table)
