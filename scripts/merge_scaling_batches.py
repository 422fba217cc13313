"""Merge N scaling_report batches (scripts/scaling.py output files)
into a cross-batch-median confirmation section of
BENCH_scaling_2_8.json — the protocol CLAUDE.md mandates: single
batches can carry a contaminated sample; the median across all
batches' samples is the defensible reading.

Usage: python scripts/merge_scaling_batches.py SECTION file1 [file2 ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    section = sys.argv[1]
    files = sys.argv[2:]
    reports = [json.load(open(f)) for f in files]
    jobs = list(reports[0]["samples_n"])
    sn: dict = {j: [] for j in jobs}
    s4: dict = {j: [] for j in jobs}
    for r in reports:
        for j in jobs:
            sn[j].extend(r["samples_n"][j])
            s4[j].extend(r["samples_n4"][j])
    tn = {j: round(statistics.median(sn[j]), 2) for j in jobs}
    t4 = {j: round(statistics.median(s4[j]), 2) for j in jobs}
    n, n4 = reports[0]["n_cores"], reports[0]["n4_cores"]
    eff = {j: round(tn[j] / t4[j] / (n4 / n), 3) for j in jobs}
    rows = reports[0]["pages_rows"]
    out = {
        "protocol": (
            f"{len(files)} batches x {len(reports[0]['samples_n'][jobs[0]])}"
            " alternating fresh-JVM rounds, median per level across all"
            " samples (cross-batch median absorbs contaminated windows)"),
        "pages_rows": rows,
        "n_cores": n, "n4_cores": n4,
        "samples_n": sn, "samples_n4": s4,
        "timings_n": tn, "timings_n4": t4,
        "scaling_efficiency": eff,
        "per_batch_efficiency": {
            f"batch{i + 1}": r["scaling_efficiency"]
            for i, r in enumerate(reports)},
        "docs_per_sec_n": round(rows / tn["validate_fast"]),
        "docs_per_sec_n4": round(rows / t4["validate_fast"]),
    }
    path = os.path.join(ROOT, "BENCH_scaling_2_8.json")
    doc = json.load(open(path))
    doc[section] = out
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps({"section": section, "eff": eff,
                      "t_n": tn, "t_n4": t4}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
