#!/usr/bin/env python
"""Scaling probe for the connected-components fixpoint family
(VERDICT r3 item 5): the two heaviest suite queries (pipeline_curation,
dedup_clusters) are CC loops, whose cost = rounds-to-fixpoint x
per-round join cost. This probe measures BOTH quantities directly — at
sf0.1 and at the 10x derived corpus (scale_bench.build_scaled's
decorrelated replicas) — and demonstrates the reliable-checkpoint mode
(checkpoint_dir) on one run.

What to expect at scale: near-dup graphs are star-ish clusters with
tiny diameters, so ROUNDS stay constant as data grows (the replicas
add more clusters, not longer chains); per-round cost grows with the
edge count — i.e. the fixpoint family scales like its per-round joins,
not super-linearly in rounds. This probe verifies that claim
empirically and prints one JSON line.

Usage: python cc_scale_probe.py [--mult 10]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe(spark, sf_dir: str, label: str, checkpoint_dir: str | None):
    from pyspark.sql import functions as F

    from postgresql_topn_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    stats: list[dict] = []
    comp = connected_components(
        pairs,
        "doc_a",
        "doc_b",
        checkpoint_dir=checkpoint_dir,
        round_stats=stats,
    )
    n_nodes = comp.count()
    n_comp = comp.select("component").distinct().count()
    total = time.perf_counter() - t0
    return {
        "label": label,
        "checkpoint": "reliable" if checkpoint_dir else "local",
        "nodes": n_nodes,
        "components": n_comp,
        "rounds_to_fixpoint": len(stats),
        "per_round_sec": [s["seconds"] for s in stats],
        "total_sec": round(total, 2),
    }


def main() -> None:
    mult = 10
    for i, a in enumerate(sys.argv):
        if a == "--mult":
            mult = int(sys.argv[i + 1])

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cc-scale-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from scale_bench import build_scaled

    scaled_dir = build_scaled(spark, mult)

    runs = [
        probe(spark, BASE, "sf0.1", None),
        # reliable checkpoints exercised at base scale: same labels,
        # rounds persist to storage instead of executor memory
        probe(spark, BASE, "sf0.1", tempfile.mkdtemp(prefix="cc_ckpt_")),
        probe(spark, scaled_dir, f"x{mult}", None),
    ]
    base, base_ck, scaled = runs
    assert base["components"] == base_ck["components"], (
        "reliable-checkpoint run must produce identical clustering"
    )
    print(
        json.dumps(
            {
                "mult": mult,
                "runs": runs,
                "rounds_ratio": (
                    scaled["rounds_to_fixpoint"] / base["rounds_to_fixpoint"]
                ),
                "wall_ratio": round(
                    scaled["total_sec"] / base["total_sec"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
