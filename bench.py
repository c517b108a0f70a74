#!/usr/bin/env python
"""Benchmark harness: runs every suite query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a full collect-to-count so the measured time
includes the complete plan (scan -> shuffle -> result), not just plan
construction. A warmup query amortizes JVM/codegen startup out of the
per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _current_round(here: str) -> int:
    import re

    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return (max(rounds) + 1) if rounds else 0


def _common_subset_diff(
    timings: "dict[str, float]", this_round: int
) -> "dict | None":
    """Round-over-round comparability, as a standing artifact (VERDICT
    r7 item 7): the suite TOTAL moves whenever gates are added/merged,
    so every round also reports the subtotal over the queries shared
    with the previous round's full artifact, plus the median-ratio box
    factor that calibrates out this VM's 1.5-10x timing noise
    (bench_diff.py's method, baked into the per-round artifact). A
    regression hides in the total only if it also hides in
    ``subtotal / box_factor`` vs ``prev_subtotal``."""
    import re
    import statistics

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        r
        for f in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_full_r(\d+)\.json", f))
        and (r := int(m.group(1))) < this_round
    ]
    if not rounds:
        return None
    prev_name = f"BENCH_full_r{max(rounds):02d}.json"
    try:
        with open(os.path.join(here, prev_name)) as fh:
            prev_q = json.load(fh).get("queries", {})
    except (OSError, ValueError):
        return None
    common = sorted(set(prev_q) & set(timings))
    if not common:
        return None
    box = statistics.median(
        timings[n] / max(float(prev_q[n]), 1e-9) for n in common
    )
    subtotal = sum(timings[n] for n in common)
    return {
        "prev": prev_name,
        "common": len(common),
        "box_factor": round(box, 3),
        "prev_subtotal": round(sum(float(prev_q[n]) for n in common), 2),
        "subtotal": round(subtotal, 2),
        "calibrated_subtotal": round(subtotal / max(box, 1e-9), 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("topn-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from postgresql_topn_spark.suite import QUERIES

    # Warmup: JVM classloading + codegen for the common operator shapes,
    # and one scan of each fact table so no query pays first-touch I/O.
    QUERIES["topn_monthly_event_types"](spark, sf_dir).count()
    for t in ("documents", "embeddings", "lineitem"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    # ... and the Arrow lane: spin up Python workers / codegen for the
    # mapInPandas + applyInPandas + scalar-pandas_udf stage shapes the
    # dedup/ANN operators use, so the first such query isn't charged
    # one-time daemon startup.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _incr(s: pd.Series) -> pd.Series:
        return s + 1

    warm = spark.range(256).mapInPandas(lambda it: it, "id long")
    warm.groupBy("id").applyInPandas(lambda p: p, "id long").select(
        _incr(F.col("id"))
    ).count()

    # Adaptive best-of-N per query (N <= 5): single-run numbers on this
    # host swing up to 10x from transient VM CPU steal (measured 1.4s vs
    # 23.7s for the same query minutes apart), and heavy codegen/Arrow
    # kernels show a two-run WARM-UP PLATEAU (measured 28.7 -> 10.3 ->
    # 2.5s for the char-ngram join: two slow runs that agree, then the
    # steady state) — so agreement between two runs is not enough. Stop
    # only once the latest run has stopped improving (>= 0.8x the prior
    # min) AND we have either 3 runs or a cheap (<2s) converged answer.
    # The min is reported — the steady-state plan cost the query has.
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        runs: list[float] = []
        while True:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            n = len(runs)
            converged = n >= 2 and runs[-1] >= 0.8 * min(runs[:-1])
            enough = n >= 3 or (n >= 2 and min(runs) < 2.0)
            if (converged and enough) or n >= 5:
                break
        timings[name] = round(min(runs), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Run provenance (VERDICT r9 item 8): builder-tree runs and the
    # driver's own runs land in the same BENCH_full_r{N}.json name; the
    # stamp makes round-over-round diffs attribute box-factor jumps to
    # the host/run that produced each artifact instead of silently
    # mixing them. bench_diff.py ignores unknown fields by design.
    import getpass
    import socket

    provenance = {
        "hostname": socket.gethostname(),
        "user": getpass.getuser(),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cpus": cpus,
        "os_cpus": os.cpu_count(),
        "sf_dir": sf_dir,
    }
    result = {
        "metric": "suite_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "provenance": provenance,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    this_round = _current_round(here)
    result["common_subset"] = _common_subset_diff(timings, this_round)

    # The grading driver keeps only the LAST 2000 chars of stdout and
    # json-parses the tail; with 80+ queries the full map no longer fits
    # (BENCH_r03/r04 both recorded parsed: null).  So: (a) persist the
    # FULL result to a committed per-round artifact, (b) make the final
    # stdout line a complete JSON that fits the capture window —
    # slowest queries first, map truncated to fit, with a pointer to
    # the full artifact.
    full_name = f"BENCH_full_r{this_round:02d}.json"
    with open(os.path.join(here, full_name), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)

    budget = 1900  # < 2000-char driver tail, with headroom for prefixes
    slowest = sorted(timings, key=timings.get, reverse=True)
    compact = dict(result)
    compact["full"] = full_name
    for keep in range(len(slowest), -1, -1):
        compact["queries"] = {n: timings[n] for n in slowest[:keep]}
        compact["queries_omitted"] = len(timings) - keep
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= budget:
            break
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
