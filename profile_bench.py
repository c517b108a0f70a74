#!/usr/bin/env python
"""Per-query profiling companion to bench.py (optimization rounds).

For each named suite query (default: the slowest families), runs the
same timed action as bench.py (`.count()`) under the same session conf,
and reports per-run wall time split into CONSTRUCTION (Python dataflow
building + any eager work the query function does, e.g. stage_cut
compilation and mid-build collects) and EXECUTION (the count), plus the
Spark job/stage counts the run scheduled — the overhead profile that
dominates at sf0.1 where the data is tiny. Optionally dumps
`.explain("formatted")` to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python profile_bench.py q1 q2 ...        # profile named queries
    python profile_bench.py --plans r13 --suffix before q1 q2 ...
    python profile_bench.py --all            # whole registry
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="plans/<tag>/ dump dir tag")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("topn-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from postgresql_topn_spark.suite import QUERIES

    names = sorted(QUERIES) if args.all else args.queries
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # same warmup as bench.py
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    QUERIES["topn_monthly_event_types"](spark, sf_dir).count()
    for t in ("documents", "embeddings", "lineitem"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    @pandas_udf("long")
    def _incr(s: pd.Series) -> pd.Series:
        return s + 1

    warm = spark.range(256).mapInPandas(lambda it: it, "id long")
    warm.groupBy("id").applyInPandas(lambda p: p, "id long").select(
        _incr(F.col("id"))
    ).count()

    st = spark.sparkContext.statusTracker()

    def _job_count() -> int:
        return len(st.getJobIdsForGroup(None) or [])

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rows = []
        for i in range(args.runs):
            j0 = _job_count()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, _job_count() - j0))
            if args.plans and i == 0:
                tag_dir = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "plans",
                    args.plans,
                )
                os.makedirs(tag_dir, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(tag_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
        best = min(c + e for c, e, _ in rows)
        detail = "  ".join(
            f"[build {c:.2f}s + exec {e:.2f}s, {j} jobs]" for c, e, j in rows
        )
        print(f"{name}: best {best:.2f}s  {detail}", flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
