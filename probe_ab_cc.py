#!/usr/bin/env python
"""Paired A/B for the r14 connected_components driver-local fast path.
Arms alternate inside one session via spark.topn.cc.localEdgeThreshold
(200000 = on, 0 = off/distributed). bench.py action (.count()), bench
session conf. Usage: python probe_ab_cc.py [trials]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("topn-ab-cc")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from postgresql_topn_spark.suite import QUERIES

GATES = ["dedup_clusters", "pipeline_curation", "pipeline_select_mix"]
trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4

for g in GATES:
    QUERIES[g](spark, sf_dir).count()  # warm

res = {g: {"on": [], "off": []} for g in GATES}
for t in range(trials):
    for arm in ("on", "off") if t % 2 == 0 else ("off", "on"):
        spark.conf.set(
            "spark.topn.cc.localEdgeThreshold",
            "200000" if arm == "on" else "0",
        )
        for g in GATES:
            t0 = time.perf_counter()
            QUERIES[g](spark, sf_dir).count()
            res[g][arm].append(time.perf_counter() - t0)
spark.conf.unset("spark.topn.cc.localEdgeThreshold")

for g in GATES:
    on, off = sorted(res[g]["on"]), sorted(res[g]["off"])
    med = lambda xs: xs[len(xs) // 2]
    print(
        f"{g}: ON best {on[0]:.2f} med {med(on):.2f} | "
        f"OFF best {off[0]:.2f} med {med(off):.2f}  "
        f"on={['%.2f' % x for x in res[g]['on']]} "
        f"off={['%.2f' % x for x in res[g]['off']]}",
        flush=True,
    )
spark.stop()
