import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
sf_dir = "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
    .appName("cold").config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from postgresql_topn_spark.suite import QUERIES
# bench.py warmup
QUERIES["topn_monthly_event_types"](spark, sf_dir).count()
for t in ("documents", "embeddings", "lineitem"):
    spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
@pandas_udf("long")
def _incr(s: pd.Series) -> pd.Series: return s + 1
warm = spark.range(256).mapInPandas(lambda it: it, "id long")
warm.groupBy("id").applyInPandas(lambda p: p, "id long").select(_incr(F.col("id"))).count()
for kv in sys.argv[1].split(";"):
    if kv:
        k, v = kv.split("="); spark.conf.set(k, v)
name = sys.argv[2]
runs = []
for i in range(int(sys.argv[3]) if len(sys.argv) > 3 else 3):
    t0 = time.perf_counter(); QUERIES[name](spark, sf_dir).count()
    runs.append(round(time.perf_counter() - t0, 2))
print(f"{name} {sys.argv[1] or 'default'}: min {min(runs)} runs {runs}")
spark.stop()
