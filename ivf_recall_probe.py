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


def pq_sensitivity(spark, sf_dir: str, k: int) -> None:
    """PQ codebook (m, n_codes) sensitivity at one corpus size
    (VERDICT r12 item 4): recall@k of `ivfpq_topk` across the codebook
    grid, alongside the plain-IVF recall at the SAME (n_lists,
    n_probe) so the PQ RECALL PENALTY (pq / ivf) is isolated from the
    cell-probing loss. Run at --mult 1 and --mult 100: the penalty
    column holding steady across two orders of magnitude of corpus is
    the claim "codebook size is precision-per-vector, not corpus
    capacity" made executable — each vector is quantized against the
    codebook independently, so distortion depends on (m, n_codes, the
    data distribution), never on how many OTHER vectors share the
    index. Capacity lives in n_lists (auto-sized); precision lives
    here."""
    from pyspark.sql import functions as F

    from postgresql_topn_spark.operators.similarity import (
        ann_recall,
        auto_ivf_params,
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
    )
    from postgresql_topn_spark.suite import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    mod = 1000 if n > 20_000 else 100
    q = emb.where(F.col("vec_id") % mod == 0)
    exact = cosine_topk(emb, q, k=k).persist()
    nl, npb = auto_ivf_params(n)

    def mean_recall(df) -> float:
        rows = ann_recall(df, exact).collect()
        return round(sum(r["recall"] for r in rows) / len(rows), 3)

    ivf_rec = mean_recall(
        ivf_topk(emb, q, k=k, n_lists=nl, n_probe=npb, centroid_mode="seeded")
    )
    print(json.dumps({"config": "ivf_baseline", "n_lists": nl, "n_probe": npb,
                      "n": n, "recall": ivf_rec}))
    grid = [(4, 16), (8, 16), (16, 16), (8, 64), (8, 256), (16, 256)]
    for m, n_codes in grid:
        rec = mean_recall(
            ivfpq_topk(
                emb, q, k=k, n_lists=nl, n_probe=npb, m=m, n_codes=n_codes,
                centroid_mode="seeded",
            )
        )
        print(json.dumps({
            "config": f"pq_m{m}_c{n_codes}", "m": m, "n_codes": n_codes,
            "bits_per_vec": m * max(1, (n_codes - 1).bit_length()),
            "recall": rec,
            "penalty": round(rec / ivf_rec, 3) if ivf_rec else None,
        }))
    # the standard two-stage recovery at the gate's shipped geometry
    rec = mean_recall(
        ivfpq_topk(
            emb, q, k=k, n_lists=nl, n_probe=npb, m=8, n_codes=16,
            centroid_mode="seeded", rerank_depth=10 * k,
        )
    )
    print(json.dumps({"config": "pq_m8_c16_rerank", "rerank_depth": 10 * k,
                      "recall": rec,
                      "penalty": round(rec / ivf_rec, 3) if ivf_rec else None}))
    exact.unpersist()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--assert-floor", action="store_true")
    ap.add_argument("--pq", action="store_true")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from scale_bench import build_scaled, make_spark

    spark = make_spark()
    sf_dir = (
        build_scaled(spark, args.mult)
        if args.mult > 1
        else __import__("os").environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )

    if args.pq:
        pq_sensitivity(spark, sf_dir, args.k)
        return 0

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
