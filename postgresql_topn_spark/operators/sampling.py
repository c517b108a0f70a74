"""Deterministic sampling / data-mixing operators.

Assembling a training mix means sampling each source/language/quality
stratum at its own rate — reproducibly. Spark's ``df.sample`` is
partition-order-dependent (same seed, different partitioning, different
rows), which breaks lineage audits at 100 TB where partitioning is
never stable. These operators decide per ROW from a portable hash of a
stable key: the decision depends only on (key, seed, rate), so resample
runs are identical across engines, cluster sizes, partitionings, and
retries — and the DuckDB oracle can replay them bit-for-bit.

The uniform is the repo's portable md5-long idiom (see
simhash_md5_table): first 15 hex chars of md5 as a 60-bit long,
divided by 2^60 — identical in Spark (`conv(substr(md5(x),1,15),16,10)`)
and ANSI SQL (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`).

Everything is a pure JVM expression evaluated in the scan stage: a
sample is a FILTER, so it pushes ahead of every downstream shuffle and
costs nothing beyond the md5.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

_TWO_POW_60 = float(1 << 60)


def hash_uniform(key: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform double in [0, 1) from a stable key column:
    ``md5(seed ':' key)`` first-15-hex as a 60-bit long / 2^60.
    Independent samples from the same key space = different seeds."""
    s = F.concat(F.lit(f"{seed}:"), _col(key).cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        / F.lit(_TWO_POW_60)
    )


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, *, seed: int = 0
) -> DataFrame:
    """Keep each row iff ``hash_uniform(key, seed) < fraction`` —
    reproducible Bernoulli(fraction) sampling keyed by row identity,
    not partition order."""
    return df.where(hash_uniform(key, seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata: Column | str,
    fractions: Mapping[str, float],
    key: Column | str,
    *,
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the data-mixing primitive): keep a
    row iff its key-uniform falls under its stratum's rate. Strata
    missing from *fractions* get *default* (0.0 = drop)."""
    rate: Column = F.lit(float(default))
    for value, frac in fractions.items():
        rate = F.when(_col(strata) == value, F.lit(float(frac))).otherwise(rate)
    return df.where(hash_uniform(key, seed) < rate)
