#!/usr/bin/env python3
"""Executable 100x recall-vs-cost contract for `auto_ivf_params`
(VERDICT r12 item 1).

The committed STATUS r12 frontier showed the sqrt-sized IVF family
DOMINATES the retired fixed (16, 4) config at 100x scale, but the
DEFAULT `probe_scale` sat at the cheap end of the frontier (recall@5
0.534 vs fixed's 0.659) and nothing executable enforced the frontier's
shape. This probe re-measures the frontier on the derived 100x corpus
(scale_bench.build_scaled — ~200k vectors) with the REAL operators
(`ivf_topk` seeded mode vs the exact `cosine_topk` spine, recall via
`ann_recall`) and, with ``--assert-floor``, enforces:

  1. the auto config the library actually picks (digit-growth default)
     reaches recall@5 >= fixed(16, 4) - 0.02 — the "auto sizing must
     not cost recall" contract, now held at 100x, not just at fixture
     scale (tests/test_similarity.py::test_ivf_auto_recall_not_below_fixed);
  2. the frontier is monotone: each higher probe_scale point reaches
     at least the recall of the point below it (tolerance 0.02) — the
     property that makes probe_scale an honest recall knob.

Candidates/query is reported as the uniform-cell estimate
n * n_probe / n_lists; the r12 measured values matched it to <0.1%.

Usage:
    python ivf_recall_probe.py [--mult 100] [--assert-floor]

Prints one JSON line per config plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--assert-floor", action="store_true")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from scale_bench import build_scaled, make_spark

    spark = make_spark()
    sf_dir = build_scaled(spark, args.mult)

    from pyspark.sql import functions as F

    from postgresql_topn_spark.operators.similarity import (
        ann_recall,
        auto_ivf_params,
        cosine_topk,
        ivf_topk,
    )
    from postgresql_topn_spark.suite import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # sampled query spine — the production recall-tuning discipline
    # (a fixed query sample, never the full corpus)
    q = emb.where(F.col("vec_id") % 1000 == 0)
    exact = cosine_topk(emb, q, k=args.k).persist()
    n_queries = exact.select("query_id").distinct().count()

    def measure(n_lists: int, n_probe: int) -> float:
        ivf = ivf_topk(
            emb,
            q,
            k=args.k,
            n_lists=n_lists,
            n_probe=n_probe,
            centroid_mode="seeded",
        )
        rows = ann_recall(ivf, exact).collect()
        return sum(r["recall"] for r in rows) / len(rows)

    configs: list[tuple[str, int, int]] = [("fixed", 16, 4)]
    for scale in (1.0, 1.5, 2.0, 2.5, 3.0):
        nl, npb = auto_ivf_params(n, probe_scale=scale, scale_growth=False)
        configs.append((f"scale_{scale}", nl, npb))
    nl_d, npb_d = auto_ivf_params(n)  # the library default (with growth)
    configs.append(("default", nl_d, npb_d))

    results: dict[str, dict] = {}
    for name, nl, npb in configs:
        key = (nl, npb)
        dup = next(
            (r for r in results.values() if (r["n_lists"], r["n_probe"]) == key),
            None,
        )
        rec = dup["recall"] if dup else round(measure(nl, npb), 3)
        results[name] = {
            "config": name,
            "n_lists": nl,
            "n_probe": npb,
            "recall": rec,
            "cands_per_query": round(n * npb / nl),
        }
        print(json.dumps(results[name]))

    summary = {
        "n": n,
        "n_queries": n_queries,
        "k": args.k,
        "mult": args.mult,
        "default": results["default"],
        "fixed": results["fixed"],
    }
    print(json.dumps(summary))

    if args.assert_floor:
        fails = []
        if results["default"]["recall"] < results["fixed"]["recall"] - 0.02:
            fails.append(
                f"default auto recall {results['default']['recall']} < "
                f"fixed {results['fixed']['recall']} - 0.02"
            )
        ladder = ["scale_1.0", "scale_1.5", "scale_2.0", "scale_2.5", "scale_3.0"]
        for lo, hi in zip(ladder, ladder[1:]):
            if results[hi]["recall"] < results[lo]["recall"] - 0.02:
                fails.append(
                    f"frontier not monotone: {hi} {results[hi]['recall']} < "
                    f"{lo} {results[lo]['recall']} - 0.02"
                )
        if fails:
            for f in fails:
                print(f"FLOOR VIOLATION: {f}", file=sys.stderr)
            return 1
        print("floors OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
