#!/usr/bin/env python
"""Convert a run's ``metrics.jsonl`` into a real TensorBoard event file.

The live path is the ``--tensorboard`` flag on the train/AL CLIs; this
tool back-fills runs logged without it so they can be viewed in
TensorBoard exactly like the reference's logs (reference summaries:
train.py:154-206, active_learning.py:425-427).
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from semanticsegmentationactivelearning_tpu.utils import tb_events  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir", type=str,
                        help="Log directory containing metrics.jsonl "
                             "(or a direct path to a .jsonl file)")
    parser.add_argument("-o", "--output", type=str, default=None,
                        help="Output directory for the event file "
                             "(default: the log dir itself)")
    args = parser.parse_args()

    path = args.logdir
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    out_dir = args.output or os.path.dirname(path) or "."
    print(tb_events.jsonl_to_events(path, out_dir))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # stdout closed early (e.g. piped to head)
        import os
        os._exit(0)
