import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
sf_dir = "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
    .appName("ab5").config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from postgresql_topn_spark.suite import QUERIES
st = spark.sparkContext.statusTracker()
def jobs(): return len(st.getJobIdsForGroup(None) or [])
KEY = sys.argv[1]
name = sys.argv[2]
trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
for v in ("false", "true"):
    spark.conf.set(KEY, v); QUERIES[name](spark, sf_dir).count()
res = {"old": [], "new": []}
for t in range(trials):
    for label, v in (("old", "false"), ("new", "true")):
        spark.conf.set(KEY, v)
        j0 = jobs(); t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        res[label].append((time.perf_counter() - t0, jobs() - j0))
for label, rows in res.items():
    ts_ = sorted(d for d, _ in rows)
    print(f"{name} {label} best {ts_[0]:.2f} med {ts_[len(ts_)//2]:.2f} all {[round(d,2) for d,_ in rows]} jobs {[j for _,j in rows]}", flush=True)
spark.stop()
