#!/usr/bin/env python
"""Regex-filtered metric export: scalars to CSV, array-valued metrics
(per-class IoU, confusion matrices, histograms) to NPZ
(reference: tools/dump_summaries.py exported TB event scalars to CSV
and tensors to NPZ; the rebuild's native log is ``metrics.jsonl``).

Also accepts real TensorBoard ``tfevents`` files — the reference's
input format — via the repo's own event codec, so logs from the TF
reference (or from ``--tensorboard`` runs) export identically.
"""

import argparse
import csv
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def dump_events(event_paths, output_dir, pattern=None):
    """Scalars→CSV / histogram buckets→NPZ from tfevents files
    (reference: tools/dump_summaries.py:16-83)."""
    from semanticsegmentationactivelearning_tpu.utils import tb_events

    rx = re.compile(pattern) if pattern else None
    scalars = defaultdict(list)
    arrays = defaultdict(list)
    for path in event_paths:
        for ev in tb_events.iter_events(path):
            for v in ev["values"]:
                tag = v.get("tag", "")
                if rx and not rx.search(tag):
                    continue
                if "simple_value" in v:
                    scalars[tag].append((ev["step"], v["simple_value"]))
                elif "histo" in v:
                    arrays[tag].append(
                        (ev["step"], np.asarray(v["histo"]["bucket"])))
    return _write_outputs(scalars, arrays, output_dir)


def _write_outputs(scalars, arrays, output_dir):
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
    return _write_outputs(scalars, arrays, output_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir", type=str)
    parser.add_argument("-o", "--output", type=str, default=None)
    parser.add_argument("-f", "--filter", type=str, default=None,
                        dest="pattern",
                        help="Regex over 'split/metric' tags")
    args = parser.parse_args()
    path = args.logdir
    event_paths = []
    if os.path.isfile(path) and "tfevents" in os.path.basename(path):
        event_paths = [path]
    elif os.path.isdir(path):
        jsonl = os.path.join(path, "metrics.jsonl")
        if os.path.exists(jsonl):
            path = jsonl
        else:
            from semanticsegmentationactivelearning_tpu.utils import (
                tb_events)
            event_paths = tb_events.find_event_files(path)
            if not event_paths:
                parser.error(
                    "%s contains neither metrics.jsonl nor tfevents "
                    "files" % path)
    if event_paths:
        output = args.output or os.path.join(
            os.path.dirname(event_paths[0]), "dump")
        written = dump_events(event_paths, output, args.pattern)
    else:
        output = args.output or os.path.join(os.path.dirname(path),
                                             "dump")
        written = dump(path, output, args.pattern)
    for p in written:
        print(p)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # stdout closed early (e.g. piped to head)
        import os
        os._exit(0)
