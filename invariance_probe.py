"""Partitioning-invariance probe: the repo's fixed-point discipline
claims results are independent of partition count/order. Re-run the
most partitioning-sensitive gates on a deliberately odd config
(local[3], 7 shuffle partitions, AQE off) and compare against the
DuckDB oracle.

Usage: python invariance_probe.py [--all]
  default: the 22 most partitioning-sensitive gates (fast)
  --all:   the ENTIRE registry under the hostile config
"""
import importlib.util, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.default.parallelism", "5")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from tests.oracle_harness import compare, duckdb_connection
con = duckdb_connection("/root/testdata/sf0.01")
qs = mod.queries()
oracles = mod.oracle_sql()
# gates whose algorithms touch ordering/sampling/iteration/floats most
NAMES = [
    "pipeline_deliver_dataset", "pipeline_model_roundtrip",
    "pipeline_select_mix", "pipeline_select_recipe",
    "pipeline_quality_classifier", "pipeline_ppl_buckets",
    "pipeline_dsir_resample", "pipeline_dsir_rollup",
    "bpe_train_merges", "bpe_encode_tokens",
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_lsh_topk", "ann_cosine_topk",
    "dedup_clusters", "dedup_minhash_lsh", "multimodal_semantic_dedup",
    "pipeline_pack_contexts", "topn_composite_key", "topn_window_7d",
    "quantile_rollup_kll", "distinct_kmv_modes",
    # r11: the Tier-2 partial+merge lanes and the small-counters
    # eviction regime — partition boundaries decide WHICH partial
    # states exist, so these are exactly the class this probe hunts
    "topn_tier2_modes", "topn_tier2_eviction",
]
if "--all" in sys.argv:
    NAMES = sorted(qs)
bad = 0
for name in NAMES:
    try:
        problems = compare(qs[name](spark, "/root/testdata/sf0.01"), con, oracles[name])
    except Exception as e:
        problems = [f"EXC: {e}"]
    if problems:
        bad += 1
    print(name, "OK" if not problems else problems, flush=True)
print("INVARIANCE DONE failures=", bad)
