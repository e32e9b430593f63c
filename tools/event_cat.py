#!/usr/bin/env python
"""Concatenate metrics.jsonl logs from multiple runs/rounds in step
order (reference: tools/event_cat.py concatenated TB event files)."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+",
                        help="metrics.jsonl files, in order")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()

    records = []
    for path in args.inputs:
        with open(path) as fp:
            for line in fp:
                records.append(json.loads(line))
    records.sort(key=lambda r: r.get("wall_time", 0))
    with open(args.output, "w") as fp:
        for rec in records:
            fp.write(json.dumps(rec) + "\n")
    print("%s: %d records" % (args.output, len(records)))
    return 0


if __name__ == "__main__":
    main()
