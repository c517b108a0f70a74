#!/usr/bin/env python
"""Noise-calibrated round-over-round bench comparison.

This VM's single-query timings swing 1.5-10x with transient CPU steal
(STATUS round-3/4 calibration), so raw per-query deltas are useless:
two past verdict rounds flagged "regressions" that were the box, not
the code. The robust signal is the RELATIVE shape: the median ratio
across every common query estimates the session speed factor, and only
queries that deviate from that calibrated factor by more than
--flag-ratio (and by an absolute margin) are worth investigating.

Usage: python bench_diff.py OLD.json NEW.json [--flag-ratio 1.6]
Accepts BENCH_full_r*.json (this repo's full artifacts) or the
driver's BENCH_r*.json (parsed map, falling back to scraping the
truncated 2000-char tail). Prints a human table + one JSON line.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("queries"), dict) and d["queries"]:
        return {k: float(v) for k, v in d["queries"].items()}
    if isinstance(d.get("parsed"), dict) and d["parsed"].get("queries"):
        return {k: float(v) for k, v in d["parsed"]["queries"].items()}
    tail = d.get("tail", "")
    # scrape "name": float pairs from the truncated driver tail. The
    # truncation cuts the FRONT only, and a pair cut mid-name loses its
    # opening quote (regex-invisible) while a pair cut mid-value loses
    # its name too — so every matched pair is complete and correct.
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
    return {k: float(v) for k, v in pairs}


def main() -> None:
    argv = sys.argv[1:]
    flag_ratio = 1.6
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--flag-ratio":
            if i + 1 >= len(argv):
                sys.exit("--flag-ratio needs a value")
            flag_ratio = float(argv[i + 1])
            i += 2
            continue
        if a.startswith("--flag-ratio="):
            flag_ratio = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            sys.exit(f"unknown option {a}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load_queries(args[0]), load_queries(args[1])
    # attribute each artifact to the host/run that produced it (round-10
    # provenance stamp; absent in pre-r10 artifacts — tolerated)
    for label, path in (("old", args[0]), ("new", args[1])):
        try:
            with open(path) as fh:
                prov = json.load(fh).get("provenance")
        except (OSError, ValueError):
            prov = None
        if prov:
            print(
                f"{label}: {prov.get('hostname')} by {prov.get('user')}"
                f" at {prov.get('utc')} (cpus={prov.get('cpus')})"
            )
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common queries between the two files")
    ratios = {n: new[n] / max(old[n], 1e-9) for n in common}
    box = statistics.median(ratios.values())
    flagged = []
    for n in common:
        adj = ratios[n] / box  # calibrated: 1.0 == moved with the box
        if (adj >= flag_ratio or adj <= 1 / flag_ratio) and abs(
            new[n] - old[n] * box
        ) > 0.3:
            flagged.append((n, old[n], new[n], round(adj, 2)))
    flagged.sort(
        key=lambda r: -(max(r[3], 1 / r[3]) if r[3] > 0 else float("inf"))
    )
    print(f"common queries: {len(common)}   box factor (median ratio): "
          f"{box:.2f}x   flagged: {len(flagged)}")
    if flagged:
        print(f"{'query':34s} {'old s':>8s} {'new s':>8s} {'adj ratio':>10s}")
        for n, o, v, a in flagged:
            print(f"{n:34s} {o:8.2f} {v:8.2f} {a:10.2f}")
    else:
        print("nothing deviates from the calibrated box factor — "
              "any total delta is the machine, not the code")
    print(json.dumps({
        "common": len(common),
        "box_factor": round(box, 3),
        "old_total": round(sum(old[n] for n in common), 2),
        "new_total": round(sum(new[n] for n in common), 2),
        "flagged": [
            {"query": n, "old": o, "new": v, "adj_ratio": a}
            for n, o, v, a in flagged
        ],
    }))


if __name__ == "__main__":
    main()
