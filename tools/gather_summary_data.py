#!/usr/bin/env python
"""Export training metrics to CSV (reference:
tools/gather_summary_data.py, which walked TensorBoard event files; the
rebuild's native log is ``metrics.jsonl``, so this converts JSONL).

One CSV per (split, scalar tag): columns ``step,wall_time,value``.
"""

import argparse
import csv
import json
import os
from collections import defaultdict


def gather(jsonl_path, output_dir, tags=None):
    series = defaultdict(list)
    with open(jsonl_path) as fp:
        for line in fp:
            rec = json.loads(line)
            split = rec.get("split", "default")
            step = rec.get("step", rec.get("epoch", rec.get("round", 0)))
            wall = rec.get("wall_time", "")
            for key, value in rec.items():
                if key in ("split", "step", "epoch", "round",
                           "wall_time"):
                    continue
                if not isinstance(value, (int, float)):
                    continue
                if tags and key not in tags:
                    continue
                series[(split, key)].append((step, wall, value))

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for (split, key), rows in sorted(series.items()):
        path = os.path.join(output_dir, f"{split}.{key}.csv")
        with open(path, "w", newline="") as fp:
            w = csv.writer(fp)
            w.writerow(["step", "wall_time", "value"])
            w.writerows(rows)
        written.append(path)
    return written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir", type=str,
                        help="Log directory containing metrics.jsonl "
                             "(or a direct path to a .jsonl file)")
    parser.add_argument("-o", "--output", type=str, default=None,
                        help="Output directory (default: <logdir>/csv)")
    parser.add_argument("-t", "--tags", nargs="*", default=None,
                        help="Only export these metric names")
    args = parser.parse_args()

    path = args.logdir
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    output = args.output or os.path.join(os.path.dirname(path), "csv")
    written = gather(path, output, args.tags)
    for p in written:
        print(p)
    return 0


if __name__ == "__main__":
    main()
