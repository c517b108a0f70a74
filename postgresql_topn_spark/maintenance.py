"""Fleet maintenance CLI (VERDICT r10 item 8).

The GC/compaction story — orphaned-cut sweeping and small-file parquet
compaction — is runnable from a janitor/cron context without writing
code:

    python -m postgresql_topn_spark.maintenance sweep \
        --dir s3a://bucket/checkpoints --age 86400 [--dry-run]
    python -m postgresql_topn_spark.maintenance compact \
        --dir s3a://bucket/rollups/daily --target-mb 256 \
        [--partition-by day,source]
    python -m postgresql_topn_spark.maintenance compact-rollup \
        --dir s3a://bucket/rollups/daily [--bucket-name day] \
        [--extra-groups region,lang] [--counters 1000]

Both subcommands wrap the library operators (`operators.checkpointing.
sweep_cuts`, `sources.maintenance.compact_parquet`) on a fresh local
SparkSession sized by ``--cpus`` (default: all cores) — on a cluster,
submit this module through spark-submit and the session inherits the
cluster master. Output is one JSON line on stdout (machine-scrapable
by the surrounding cron wrapper); exit code 0 on success.

Analogue: the reference's rollup upkeep is plain SQL run from cron
(README.md:73-116); this is the same operational contract for the
Spark engine's two storage-hygiene tasks.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m postgresql_topn_spark.maintenance",
        description="Storage janitor: sweep orphaned stage cuts, "
        "compact small parquet files.",
    )
    p.add_argument(
        "--cpus",
        type=int,
        default=None,
        help="local[N] cores for the janitor session (default: all)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sw = sub.add_parser(
        "sweep", help="delete orphaned cut-* dirs older than --age"
    )
    sw.add_argument("--dir", required=True, help="checkpoint directory")
    sw.add_argument(
        "--age",
        type=float,
        default=24 * 3600,
        help="minimum age in seconds (default 86400)",
    )
    sw.add_argument(
        "--dry-run",
        action="store_true",
        help="list sweepable cuts without deleting",
    )

    cp = sub.add_parser(
        "compact", help="rewrite a parquet dir into ~target-mb files"
    )
    cp.add_argument("--dir", required=True, help="parquet directory")
    cp.add_argument(
        "--target-mb",
        type=int,
        default=256,
        help="target output file size in MiB (default 256)",
    )
    cp.add_argument(
        "--partition-by",
        default="",
        help="comma-separated partition columns (hive layout)",
    )

    cr = sub.add_parser(
        "compact-rollup",
        help="fold a topn rollup's appended sketch deltas to one row "
        "per (bucket, *extra groups) — readers see identical merged "
        "sketches (union associativity)",
    )
    cr.add_argument("--dir", required=True, help="rollup directory")
    cr.add_argument(
        "--bucket-name",
        default="bucket",
        help="rollup partition column (default 'bucket')",
    )
    cr.add_argument(
        "--extra-groups",
        default="",
        help="comma-separated extra group columns inside each bucket",
    )
    cr.add_argument(
        "--counters",
        type=int,
        default=None,
        help="counter budget for the merged sketches (default: conf)",
    )
    return p


def _session(cpus: "int | None"):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("topn-maintenance")
    # only pin a master when none is configured (spark-submit/cluster
    # launches keep theirs); bare python runs get local[N|*]
    import os

    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.config(
            "spark.master",
            f"local[{cpus}]" if cpus else "local[*]",
        )
    return builder.getOrCreate()


def main(argv: "list[str] | None" = None, spark=None) -> int:
    """CLI entry. `spark`: inject an existing session (tests / notebook
    embedding) — the caller keeps ownership and it is NOT stopped;
    without it a session is created and stopped here."""
    args = _build_parser().parse_args(argv)
    owns_session = spark is None
    if owns_session:
        spark = _session(args.cpus)
    try:
        if args.cmd == "sweep":
            from postgresql_topn_spark.operators.checkpointing import (
                sweep_cuts,
            )

            swept = sweep_cuts(
                spark,
                args.dir,
                older_than_s=args.age,
                dry_run=args.dry_run,
            )
            print(
                json.dumps(
                    {
                        "cmd": "sweep",
                        "dir": args.dir,
                        "dry_run": args.dry_run,
                        "swept": swept,
                        "n_swept": len(swept),
                    }
                )
            )
        elif args.cmd == "compact":
            from postgresql_topn_spark.sources.maintenance import (
                compact_parquet,
            )

            part = tuple(
                c.strip() for c in args.partition_by.split(",") if c.strip()
            )
            n = compact_parquet(
                spark,
                args.dir,
                target_file_mb=args.target_mb,
                partition_by=part,
            )
            print(
                json.dumps(
                    {
                        "cmd": "compact",
                        "dir": args.dir,
                        "target_file_mb": args.target_mb,
                        "partition_by": list(part),
                        "n_files": n,
                    }
                )
            )
        else:
            from postgresql_topn_spark.sources.maintenance import (
                compact_topn_rollup,
            )

            extra = tuple(
                c.strip() for c in args.extra_groups.split(",") if c.strip()
            )
            n = compact_topn_rollup(
                spark,
                args.dir,
                bucket_name=args.bucket_name,
                extra_group_names=extra,
                counters=args.counters,
            )
            print(
                json.dumps(
                    {
                        "cmd": "compact-rollup",
                        "dir": args.dir,
                        "bucket_name": args.bucket_name,
                        "extra_groups": list(extra),
                        "n_rows": n,
                    }
                )
            )
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
