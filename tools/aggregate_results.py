#!/usr/bin/env python
"""Aggregate multi-seed results: mean ± std of A_auc/A_avg/A_last/F_last.

The reference launches 5-seed loops per script (e.g. scripts/mvp_clip.sh)
and reports averages externally; this reads the ``result.jsonl`` JSON
lines written by every run directory (``result.txt`` holds the reference's
human-readable text format) and prints the aggregate.

Usage: python tools/aggregate_results.py results/cifar100/TASK5N50M10/<note>
"""

import json
import os
import sys

import numpy as np


def main(run_dir: str):
    rows = []
    path = f"{run_dir}/result.jsonl"
    if not os.path.exists(path):
        path = f"{run_dir}/result.txt"  # pre-r2 layout
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))
    if not rows:
        print("no results found")
        return
    metrics = [k for k in rows[0] if k != "seed"]
    print(f"{len(rows)} seeds: {[r.get('seed') for r in rows]}")
    for m in metrics:
        vals = np.asarray([r[m] for r in rows], np.float64)
        print(f"{m}: {vals.mean():.4f} ± {vals.std():.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
