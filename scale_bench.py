#!/usr/bin/env python
"""Empirical scaling check: run the dedup/ANN/pipeline suite subset at
sf0.1 and at a derived 10x dataset ("sf1-equivalent") and report the
per-query time ratio.  A query whose plan is scale-safe should grow
~linearly (ratio ~10 for a 10x input with linearly-scaled output);
anything super-linear is a scale bug to chase.

The 10x dataset is DERIVED from /root/testdata/sf0.1 (the brief says use
the driver's data, and there is no sf1 drop), with replicas DECORRELATED
so the duplicate/similarity structure scales linearly instead of
quadratically:

- documents: replica i>0 applies a per-replica AFFINE char map
  (x -> a*x + b mod 26; ``translate`` with a permuted alphabet —
  JVM-side, bijective on chars; 312 distinct maps, so no identity
  collision up to mult 312). A bijective char map preserves EVERY
  equality statistic —
  doc lengths, gram counts, token/shingle/char-gram/minhash/simhash
  similarity structure — exactly within the replica, while replicas
  share essentially no grams with each other.  10x docs => 10x
  duplicate pairs, same per-replica similarity distribution.  (The
  first cut of this harness prefixed a replica tag onto every token
  instead; that pads identical filler into every 16-char window, makes
  same-replica docs far MORE similar, and blew candidate counts up
  2254x — a dataset artifact masquerading as a scale bug.)
- embeddings: replica i's vectors are circularly rolled by ``13*i``
  positions.  A common roll preserves every intra-replica dot product
  exactly (near-dup structure intact) while cross-replica cosines
  decorrelate.  The fixed query set then searches a 10x corpus.
- events: user_id/event_id offset per replica, timestamps kept — 10x
  users with identical per-user session structure.

Other tables are symlinked unscaled; only queries over the three scaled
tables are measured.

Usage: python scale_bench.py [--mult 10] [--out STATUS-fragment]
Prints one JSON line {"base_sec": .., "scaled_sec": .., "mult": 10,
"queries": {name: {"base": s, "scaled": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")

# documents-, embeddings- and events-backed queries only (the scaled
# tables); lineitem/orders queries are covered by bench.py at sf0.1.
SUBSET = [
    "dedup_exact_modes",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_char_ngram",
    "dedup_winnow_pairs",
    "dedup_simhash_md5",
    "dedup_decontaminate",
    "dedup_clusters",
    "pipeline_curation",
    "pipeline_sample_mix",
    "text_token_counts",
    "text_quality",
    "text_fingerprints",
    "topn_tokens_by_lang",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_near",
    "dedup_semantic_clusters",
    "pipeline_dsir_resample",
    # round-7 additions: multimodal semantic dedup (documents), DSIR
    # rollup model (documents), the 4-stage selection composition
    # (documents + embeddings)
    "multimodal_semantic_dedup",
    "pipeline_dsir_rollup",
    "pipeline_select_mix",
    # round-7 continuation: mix-to-budget sampling + CCNet ppl buckets
    "pipeline_token_budget",
    "pipeline_ppl_buckets",
    "pipeline_quality_classifier",
    "pipeline_select_recipe",
    "events_sessionize",
    "topn_monthly_event_types",
    "distinct_rollup_hll",
    "distinct_kmv_modes",
    "cms_rollup_events",
    "ann_ivfpq_topk",
    # round 8: pipeline_chunk_docs folded into pipeline_pack_contexts;
    # deliver-dataset + model-roundtrip compositions (documents-backed)
    "pipeline_pack_contexts",
    "pipeline_deliver_dataset",
    "pipeline_model_roundtrip",
    "pipeline_weighted_sample",
    "dedup_bloom_incremental",
    "search_bm25",
    "search_tfidf",
    "events_rate_anomaly",
    "topn_exact_heavy",
    "topn_with_others",
    "topn_session_pairs",
    "cms_window_7d",
    "text_lm_logprob",
    "pipeline_quality_deciles",
    "pipeline_profile_docs",
    # round-4 additions over scaled tables
    "dedup_substring_runs",
    "bpe_train_merges",
    "stream_kmv_rollup",
    # round-5 additions: substring policy (documents), PNG + audio
    # codecs (documents), asof + warned-UDAF lane (events), CSV COPY
    # round trip (lineitem — scaled as of v3)
    "pipeline_substring_dedup",
    "multimodal_png_pixels",
    "multimodal_audio_energy",
    # (events_asof_latest retired r12 — its lane rides
    # events_asof_modes, already listed below)
    "topn_sql_having",
    "topn_csv_reviews",
    "dedup_tfidf_cosine",
    "dedup_levenshtein_pairs",
    "events_retention_cohorts",
    "pipeline_train_split",
    "multimodal_png_feature_ann",
    "bpe_encode_tokens",
    "stream_session_windows",
    "events_interval_join",
    "events_asof_modes",
    # round-5 continuation: semi-join reduction over scaled lineitem
    # (orders stays unscaled: the prune's selectivity GROWS with the
    # fact table — the designed regime)
    "topn_bloom_pruned_join",
    # round-9: real frame-extraction lane (documents-backed)
    "multimodal_meta_frames",
    # round-10: cross-document line dedup (documents-backed) + the
    # merged scalar-operator gate (lineitem-backed)
    "dedup_corpus_lines",
    "topn_scalar_ops",
    # round-11: the merged Tier-2 modes gate + the small-counters
    # eviction-regime gate (events/lineitem-backed)
    "topn_tier2_modes",
    "topn_tier2_eviction",
]

def _near_auto(spark, sf_dir):
    """embedding near-dup with corpus-sized LSH params (the scale path;
    contrast with the suite's fixed wide-band oracle form) at a
    realistic near-dup threshold."""
    from postgresql_topn_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dup_pairs(
        emb, threshold=0.9, n_tables="auto", n_planes="auto"
    )


def _substring_runs_capped(spark, sf_dir):
    """dedup_substring_runs with the Zipf guard ON (max_shingle_df=50):
    the open question from VERDICT r4 item 4 — how the un-capped gate
    config scales vs the capped production config when boilerplate
    grams exist."""
    from postgresql_topn_spark.operators.dedup import substring_run_pairs
    from postgresql_topn_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return substring_run_pairs(
        docs, "doc_id", "text", min_run_tokens=16, shingle_k=8,
        max_shingle_df=50,
    )


def _struct_probe(builder):
    """Force FULL evaluation of a scan-stage struct under .count():
    count() alone prunes the projection away, and a single-field
    filter lets nested-field pruning skip the other folds; hashing the
    whole struct defeats both."""

    def run(spark, sf_dir):
        from pyspark.sql import functions as F
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        return docs.select("doc_id", builder("text").alias("g")).where(
            F.xxhash64(F.col("g")) != 0
        )

    return run


def _corpus_line_dedup(spark, sf_dir):
    """CCNet-style cross-document line dedup (keep_first) on the RAW
    single-line fixture (whole-doc-as-line path) — contrast with the
    dedup_corpus_lines GATE, which synthesizes a multi-line corpus;
    ratio should track the keyed aggregate/join growth, never
    all-pairs."""
    from postgresql_topn_spark.operators.dedup import corpus_line_dedup
    from postgresql_topn_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return corpus_line_dedup(docs, "doc_id", "text")


def _semdedup_auto(spark, sf_dir):
    """semantic_dedup with n_clusters='auto' (expected cluster size
    held constant) — the production scale path; contrast with the
    oracled gates' FIXED cluster counts, whose in-cluster pair work
    grows ~n^2 (the pipeline_select_mix sf1 ratio). Auto mode should
    restore ~linear growth."""
    from postgresql_topn_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dedup(
        emb, n_clusters="auto", threshold=0.8, target_cluster_size=200
    )


def _sql_struct_filter(spark, sf_dir):
    """The pure-SQL lane of the published filter stack (round-10,
    VERDICT r9 item 6): the three struct UDF twins chained as a
    cheap-rules-then-repetition filter in one spark.sql() query.
    Catalyst inlines the RETURN expressions at analysis time, so this
    should scale exactly like the Column cascade (boring-linear) —
    struct-field references re-derive their expressions after project
    collapse, which is the SQL-lane cost being measured."""
    from postgresql_topn_spark.functions.sql_text import (
        register_text_sql_functions,
    )

    register_text_sql_functions(spark)
    spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).createOrReplaceTempView("docs_sql_probe")
    return spark.sql(
        """
        SELECT doc_id, q.n_words, q.mean_word_len,
               r.top_2gram_char_frac, r.dup_5gram_char_frac, c.n_sentences
        FROM (SELECT doc_id,
                     gopher_quality_signals(text) AS q,
                     gopher_repetition_signals(text) AS r,
                     c4_clean(text) AS c
              FROM docs_sql_probe) t
        WHERE q.n_words BETWEEN 50 AND 100000
          AND q.mean_word_len BETWEEN 3.0 AND 10.0
          AND q.symbol_word_ratio <= 0.1
          AND q.alpha_word_frac >= 0.8
          AND r.passes
        """
    )


def _extra_text_structs():
    from postgresql_topn_spark.operators.text import (
        c4_clean,
        gopher_quality_signals,
        gopher_repetition_signals,
    )

    return {
        "gopher_quality_signals": _struct_probe(gopher_quality_signals),
        "gopher_repetition_signals": _struct_probe(
            gopher_repetition_signals
        ),
        "c4_clean": _struct_probe(c4_clean),
    }


EXTRA = {
    "dedup_embedding_near_auto": _near_auto,
    "dedup_substring_runs_capped": _substring_runs_capped,
    "corpus_line_dedup_raw": _corpus_line_dedup,
    "semdedup_auto_clusters": _semdedup_auto,
    "sql_struct_filter": _sql_struct_filter,
    **_extra_text_structs(),
}

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_scaled(spark, mult: int) -> str:
    # v4: affine char maps (v3 was Caesar-only — identity collisions
    # past mult 26) + long replica offsets (v3 overflowed at mult 22+)
    out = os.path.join(SCALE_ROOT, f"x{mult}v4")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    OFF = 100_000_000  # id offset per replica — far above any base id

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    dim = len(emb.select("embedding").first()[0])

    # replica axis as a column (explode), not a Python loop of unions:
    # one scan of the base table, mult output rows per input row.
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__r")

    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    # bijective per-replica char maps. AFFINE maps (x -> a*x + b mod
    # 26, gcd(a, 26) = 1), not plain Caesar shifts: shifts wrap at 26,
    # so mult > 26 would hand replicas 26/52/78 the IDENTITY map —
    # exact copies of replica 0, correlating the corpus and breaking
    # the linear-duplicate-growth derivation. 12 units x 26 offsets =
    # 312 distinct bijections (minus identity), plenty for mult <= 100.
    coprimes = [3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25, 1]
    affine = [
        (a, b) for a in coprimes for b in range(26) if (a, b) != (1, 0)
    ]
    shifted = F.col("text")
    for i in range(1, mult):
        a, b = affine[(i - 1) % len(affine)]
        rl = "".join(lower[(a * j + b) % 26] for j in range(26))
        ru = rl.upper()
        shifted = F.when(
            F.col("__r") == i,
            F.translate(F.translate("text", lower, rl), upper, ru),
        ).otherwise(shifted)

    d = docs.select("*", rep)
    d = d.select(
        (F.col("doc_id") + F.col("__r").cast("long") * F.lit(OFF)).alias("doc_id"),
        shifted.alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    e = emb.select("*", rep)
    shift = (F.col("__r") * 13) % dim
    e = e.select(
        (F.col("vec_id") + F.col("__r").cast("long") * F.lit(OFF)).alias("vec_id"),
        F.concat(
            F.slice("embedding", shift + 1, F.lit(dim) - shift),
            F.slice("embedding", F.lit(1), shift),
        ).alias("embedding"),
        "label",
    )
    e.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    v = ev.select("*", rep)
    v = v.select(
        (F.col("event_id") + F.col("__r").cast("long") * F.lit(OFF)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__r").cast("long") * F.lit(OFF)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    v.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    l = li.select("*", rep)
    l = l.select(
        (F.col("l_orderkey") + F.col("__r").cast("long") * F.lit(OFF)).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    l.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    for t in ALL_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
    open(marker, "w").close()
    return out


def _run(queries, spark, sf_dir: str, names) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        # same convergence-aware stop rule as bench.py: agreement alone
        # is fooled by warm-up plateaus; require the latest run to have
        # stopped improving and >= 3 runs unless the answer is cheap.
        while True:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            n = len(runs)
            converged = n >= 2 and runs[-1] >= 0.8 * min(runs[:-1])
            enough = n >= 3 or (n >= 2 and min(runs) < 2.0)
            if (converged and enough) or n >= 5:
                break
        timings[name] = round(min(runs), 3)
    return timings


def make_spark():
    """The scale-wave session shape, shared with ivf_recall_probe.py."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("topn-scale-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")  # 100x waves need shuffle headroom; the box has 128 GiB
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mult = 10
    if "--mult" in sys.argv:
        mult = int(sys.argv[sys.argv.index("--mult") + 1])
    spark = make_spark()

    scaled_dir = build_scaled(spark, mult)

    from postgresql_topn_spark.suite import QUERIES

    fns = {n: QUERIES[n] for n in SUBSET if n in QUERIES}
    fns.update(EXTRA)
    names = list(fns)
    if "--only" in sys.argv:
        i = sys.argv.index("--only") + 1
        if i >= len(sys.argv) or sys.argv[i].startswith("--"):
            sys.exit("usage: scale_bench.py --only name1,name2,...")
        names = [n for n in names if n in sys.argv[i].split(",")]
    # warmup both datasets' scans + the Arrow lane
    for d in (BASE, scaled_dir):
        for t in ("documents", "embeddings", "events"):
            spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
    QUERIES["dedup_exact_modes"](spark, BASE).count()

    base_t = _run(fns, spark, BASE, names)
    scaled_t = _run(fns, spark, scaled_dir, names)

    out = {
        "mult": mult,
        "base_sec": round(sum(base_t.values()), 3),
        "scaled_sec": round(sum(scaled_t.values()), 3),
        "queries": {
            n: {
                "base": base_t[n],
                "scaled": scaled_t[n],
                "ratio": round(scaled_t[n] / max(base_t[n], 1e-9), 2),
            }
            for n in names
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
