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
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def gather_events(event_paths, output_dir, tags=None):
    """Per-tag scalar CSVs from real tfevents files (the reference
    tool's input format, tools/gather_summary_data.py:7-34)."""
    from semanticsegmentationactivelearning_tpu.utils import tb_events

    series = defaultdict(list)
    for path in event_paths:
        for ev in tb_events.iter_events(path):
            for v in ev["values"]:
                if "simple_value" not in v:
                    continue
                tag = v.get("tag", "")
                # tb_events.record_to_values lays tags out as
                # <split>/<metric>[/<i>]: split on the FIRST slash so
                # --tags filters on the metric name, and per-index
                # series still match their parent metric
                split, _, key = tag.partition("/")
                if not key:
                    split, key = "default", split
                if tags and not any(
                        key == t or key.startswith(t + "/")
                        for t in tags):
                    continue
                series[(split, key)].append(
                    (ev["step"], ev["wall_time"], v["simple_value"]))
    return _write_csvs(series, output_dir)


def _write_csvs(series, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    written = []
    for (split, key), rows in sorted(series.items()):
        name = f"{split}.{key}.csv".replace("/", ".")
        path = os.path.join(output_dir, name)
        with open(path, "w", newline="") as fp:
            w = csv.writer(fp)
            w.writerow(["step", "wall_time", "value"])
            w.writerows(rows)
        written.append(path)
    return written


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
    return _write_csvs(series, output_dir)


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
            os.path.dirname(event_paths[0]), "csv")
        written = gather_events(event_paths, output, args.tags)
    else:
        output = args.output or os.path.join(os.path.dirname(path),
                                             "csv")
        written = gather(path, output, args.tags)
    for p in written:
        print(p)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # stdout closed early (e.g. piped to head)
        import os
        os._exit(0)
