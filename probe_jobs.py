import sys, time, json, urllib.request
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
sf_dir = "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
    .appName("dissect").config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "true").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from postgresql_topn_spark.suite import QUERIES
name = sys.argv[1] if len(sys.argv) > 1 else "pipeline_select_mix"
QUERIES[name](spark, sf_dir).count()  # warm
st = spark.sparkContext.statusTracker()
j0 = len(st.getJobIdsForGroup(None) or [])
t0 = time.perf_counter()
QUERIES[name](spark, sf_dir).count()
wall = time.perf_counter() - t0
base = "http://localhost:4040/api/v1/applications"
apps = json.load(urllib.request.urlopen(base))
appid = apps[0]["id"]
jobs = json.load(urllib.request.urlopen(f"{base}/{appid}/jobs?status=succeeded"))
jobs = sorted(jobs, key=lambda j: j["jobId"])[j0:]
print(f"{name}: wall {wall:.2f}s, {len(jobs)} jobs")
from datetime import datetime
def ts(s): return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
for j in jobs:
    dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
    desc = (j.get("description") or j["name"])[:110]
    print(f"  job {j['jobId']:4d} {dur*1000:7.0f}ms tasks {j['numTasks']:4d} stages {len(j['stageIds']):2d} | {desc}")
spark.stop()
