#!/usr/bin/env python
"""cProfile a gate's CONSTRUCTION phase (QUERIES[name](spark, sf_dir),
no count) — splits driver-side Python/py4j time from Spark job waits.
Usage: python probe_build.py <query> [runs]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("topn-buildprof")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from postgresql_topn_spark.suite import QUERIES

name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
QUERIES[name](spark, sf_dir).count()  # warm

for i in range(runs):
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    df = QUERIES[name](spark, sf_dir)
    pr.disable()
    t1 = time.perf_counter()
    df.count()
    t2 = time.perf_counter()
    print(f"run {i}: build {t1-t0:.2f}s exec {t2-t1:.2f}s", flush=True)
    if i == runs - 1:
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(35)
        print(s.getvalue())
spark.stop()
