#!/usr/bin/env python
"""Regex-filtered metric export: scalars to CSV, array-valued metrics
(per-class IoU, confusion matrices, histograms) to NPZ
(reference: tools/dump_summaries.py exported TB event scalars to CSV
and tensors to NPZ; the rebuild's native log is ``metrics.jsonl``).
"""

import argparse
import csv
import json
import os
import re
from collections import defaultdict

import numpy as np


def dump(jsonl_path, output_dir, pattern=None):
    rx = re.compile(pattern) if pattern else None
    scalars = defaultdict(list)
    arrays = defaultdict(list)
    with open(jsonl_path) as fp:
        for line in fp:
            rec = json.loads(line)
            split = rec.get("split", "default")
            step = rec.get("step", rec.get("epoch", rec.get("round", 0)))
            for key, value in rec.items():
                if key in ("split", "step", "epoch", "round",
                           "wall_time"):
                    continue
                tag = f"{split}/{key}"
                if rx and not rx.search(tag):
                    continue
                if isinstance(value, (int, float)):
                    scalars[tag].append((step, value))
                elif isinstance(value, list):
                    arrays[tag].append((step, np.asarray(value)))

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for tag, rows in sorted(scalars.items()):
        path = os.path.join(output_dir, tag.replace("/", ".") + ".csv")
        with open(path, "w", newline="") as fp:
            w = csv.writer(fp)
            w.writerow(["step", "value"])
            w.writerows(rows)
        written.append(path)
    for tag, rows in sorted(arrays.items()):
        path = os.path.join(output_dir, tag.replace("/", ".") + ".npz")
        steps = np.array([r[0] for r in rows])
        try:
            values = np.stack([r[1] for r in rows])
        except ValueError:  # ragged across steps
            values = np.array([r[1] for r in rows], dtype=object)
        np.savez(path, steps=steps, values=values)
        written.append(path)
    return written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir", type=str)
    parser.add_argument("-o", "--output", type=str, default=None)
    parser.add_argument("-f", "--filter", type=str, default=None,
                        dest="pattern",
                        help="Regex over 'split/metric' tags")
    args = parser.parse_args()
    path = args.logdir
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    output = args.output or os.path.join(os.path.dirname(path), "dump")
    for p in dump(path, output, args.pattern):
        print(p)
    return 0


if __name__ == "__main__":
    main()
