#!/usr/bin/env python
"""Concatenate metrics logs from multiple runs/rounds in time order
(reference: tools/event_cat.py concatenated TB event files).

Accepts either the rebuild's native ``metrics.jsonl`` files or real
TensorBoard ``tfevents`` files (the reference's format); the mode is
chosen per the first input's name, and the output matches it.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def cat_jsonl(inputs, output):
    records = []
    for path in inputs:
        with open(path) as fp:
            for line in fp:
                records.append(json.loads(line))
    records.sort(key=lambda r: r.get("wall_time", 0))
    with open(output, "w") as fp:
        for rec in records:
            fp.write(json.dumps(rec) + "\n")
    return len(records)


def cat_events(inputs, output):
    """Merge tfevents files into one, time-ordered, with a single fresh
    file-version header (reference: tools/event_cat.py:19-32)."""
    from semanticsegmentationactivelearning_tpu.data.tfrecord import (
        read_records, write_record)
    from semanticsegmentationactivelearning_tpu.utils import tb_events

    events = []
    for path in inputs:
        for raw in read_records(path):
            ev = tb_events.decode_event(raw)
            if "file_version" in ev:
                continue
            events.append((ev["wall_time"], raw))
    events.sort(key=lambda e: e[0])
    first_time = events[0][0] if events else 0.0
    with open(output, "wb") as fp:
        write_record(fp, tb_events.encode_event(
            first_time, file_version="brain.Event:2"))
        for _, raw in events:
            write_record(fp, raw)
    return len(events)


def _sniff(path):
    """'jsonl' or 'events', decided by content (a JSONL line starts
    with '{'; a TFRecord event file starts with a binary length
    header) — filenames aren't trustworthy: this tool's own -o output
    can have any name."""
    with open(path, "rb") as fp:
        head = fp.read(1)
    return "jsonl" if head in (b"{", b"") else "events"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+",
                        help="metrics.jsonl or tfevents files, in order")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()

    modes = {path: _sniff(path) for path in args.inputs}
    if len(set(modes.values())) > 1:
        parser.error("mixed input formats: " + ", ".join(
            "%s (%s)" % kv for kv in modes.items()))
    if modes[args.inputs[0]] == "events":
        count = cat_events(args.inputs, args.output)
    else:
        count = cat_jsonl(args.inputs, args.output)
    print("%s: %d records" % (args.output, count))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # stdout closed early (e.g. piped to head)
        import os
        os._exit(0)
