"""Sharded JSONL corpus sink/source — the training-data interchange
format (every LLM data pipeline ships corpora as sharded
newline-delimited JSON; the reference's only ingest surface is CSV
COPY, sql/copy_data.sql:1-17 — JSONL is its modern counterpart).

Two properties a 100 TB corpus export needs that a bare
``df.write.json`` does not give:

1. DETERMINISTIC shard membership: shard = pmod(xxhash64(id), n) is a
   pure function of row identity — re-running the export on a
   different cluster size, partitioning, or retry produces the SAME
   shard contents, so downstream training jobs can address shards
   stably and resumable downloads/diffs work. (``repartition(n)``
   round-robins by partition order: same data, different shards every
   run.)
2. A MANIFEST with per-shard row counts and an order-independent
   content digest — BIT_XOR of xxhash64 over the serialized lines PLUS
   a modular SUM of the same hashes (an even number of copies of one
   line XORs to 0, so XOR alone is blind to duplicate-multiplicity
   swaps; the sum component makes multiplicity count) — so corpus
   integrity is verifiable shard-by-shard without re-reading the whole
   export, and two exports can be diffed by manifest alone.

Scale shape: one hash-partition exchange on the shard key (each shard
written by exactly one task — no tiny-file explosion), manifest stats
ride the same single pass (groupBy shard over n_shards keys),
predicate-free. Readers pass the schema explicitly — schema inference
re-scans the corpus, which at 100 TB is a full extra pass.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

MANIFEST_NAME = "_corpus_manifest.json"


def _shard_col(key: Column, n_shards: int) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int")


# Mersenne prime 2^31-1: per-row terms are < 2^31, so the int64 SUM is
# overflow-safe (no ANSI crash, no try_sum NULL) up to 2^32 rows/shard.
_SUM_MOD = (1 << 31) - 1


def _shard_stat_aggs(line: Column) -> list[Column]:
    """The manifest's per-shard stats: rows, XOR digest, modular-sum
    digest. XOR is order-independent but cancels on even multiplicity;
    the pmod-sum is order-independent AND multiplicity-sensitive —
    together a swap of duplicate pairs changes the digest."""
    h = F.xxhash64(line)
    return [
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(h).alias("checksum"),
        F.pmod(F.sum(F.pmod(h, F.lit(_SUM_MOD))), F.lit(_SUM_MOD)).alias(
            "checksum_sum"
        ),
    ]


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    *,
    shard_key: Column | str = "doc_id",
    n_shards: int = 16,
    compression: str | None = None,
    write_manifest: bool = True,
) -> dict:
    """Write `df` as `path/shard=K/*.json` (one file per shard) plus a
    driver-written manifest. Returns the manifest dict. All of `df`'s
    columns are serialized in schema order; re-running with the same
    input produces byte-identical shard membership."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _col(shard_key).cast("string")
    sharded = df.withColumn("__shard", _shard_col(key, n_shards))
    w = sharded.repartition(n_shards, "__shard").write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    # pin STATIC overwrite for the write: under a session-level
    # partitionOverwriteMode=dynamic, re-exporting with fewer shards
    # would leave the old export's extra shard dirs in place — and the
    # read-back manifest would then ATTEST the stale/duplicated corpus
    # (review pin). Static mode clears the whole target first. Pinned
    # PER-WRITE (the writer option takes precedence over the session
    # conf) instead of a set/restore of the session global, which
    # races concurrent writers sharing the session — same ADVICE-r11
    # fix as the streaming sinks' dynamic pin.
    w.option("partitionOverwriteMode", "static").partitionBy(
        "__shard"
    ).json(path)
    # Manifest stats come from READING BACK the written files (not from
    # a second pass over the source): the checksums then attest the
    # bytes that actually landed on disk, and the computation is the
    # exact procedure verify_manifest repeats — same schema, same
    # re-serialization. Total I/O is unchanged vs pre-write stats (one
    # source scan for the write + one corpus scan either way).
    from pyspark.sql.types import IntegerType, StructField, StructType

    back_schema = StructType(
        list(df.schema.fields) + [StructField("__shard", IntegerType())]
    )
    back = df.sparkSession.read.schema(back_schema).json(path)
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    stats_rows = (
        back.groupBy("__shard").agg(*_shard_stat_aggs(line)).collect()
    )
    manifest = {
        "n_shards": n_shards,
        "total_rows": int(sum(r["rows"] for r in stats_rows)),
        "columns": list(df.columns),
        "shards": {
            int(r["__shard"]): {
                "rows": int(r["rows"]),
                "checksum": int(r["checksum"]),
                "checksum_sum": int(r["checksum_sum"]),
            }
            for r in stats_rows
        },
    }
    if write_manifest:
        with open(os.path.join(path, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    *,
    verify_manifest: bool = False,
) -> DataFrame:
    """Read a sharded JSONL corpus. Pass `schema` (DDL string) to skip
    the inference pass; `verify_manifest=True` recomputes per-shard row
    counts and checksums against the manifest and raises on mismatch
    (the integrity gate before a training run)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema + ", __shard int")
    df = reader.json(path)
    if verify_manifest:
        mpath = os.path.join(path, MANIFEST_NAME)
        with open(mpath) as f:
            manifest = json.load(f)
        cols = manifest["columns"]
        line = F.to_json(F.struct(*[F.col(c) for c in cols]))
        got = {
            int(r["__shard"]): (
                int(r["rows"]),
                int(r["checksum"]),
                int(r["checksum_sum"]),
            )
            for r in df.groupBy("__shard")
            .agg(*_shard_stat_aggs(line))
            .collect()
        }
        want = {
            int(k): (
                int(v["rows"]),
                int(v["checksum"]),
                # pre-sum manifests (r3 exports) verify XOR+rows only
                int(v.get("checksum_sum", got[int(k)][2]))
                if int(k) in got
                else -1,
            )
            for k, v in manifest["shards"].items()
        }
        if got != want:
            bad = {
                k
                for k in set(got) | set(want)
                if got.get(k) != want.get(k)
            }
            raise ValueError(
                f"corpus at {path} fails manifest verification for "
                f"shards {sorted(bad)}"
            )
    return df.drop("__shard")
