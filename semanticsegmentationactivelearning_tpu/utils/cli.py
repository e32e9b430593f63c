"""Shared CLI plumbing for the four entry scripts.

Reproduces the reference's argparse hierarchy — dataset subcommands
{cityscapes, vistas, freiburg} inheriting required ``-d/-l/-p`` and
optional ``-c`` arguments (reference: train.py:387-479,
active_learning.py:863-973) — plus logging setup and a JSONL metrics
writer (the rebuild's native observability; TensorBoard event export
lives in tools/).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import logging
import logging.config
import os
import sys
import time
from typing import Optional

from .. import datasets


def setup_logging(config_path: str = "util/logging.json") -> None:
    """dictConfig logging like every reference CLI (train.py:483-487)."""
    if os.path.exists(config_path):
        with open(config_path) as fp:
            logging.config.dictConfig(json.load(fp))
    else:
        logging.basicConfig(
            level=logging.INFO,
            format="[%(levelname)s] %(asctime)s --- %(name)s//%(module)s"
                   " : %(message)s")


class HelpfulParser(argparse.ArgumentParser):
    """Prints help instead of the usage string on error
    (reference: train.py:381-385)."""

    def error(self, message):
        self.print_help()
        self.exit(2, "error: %s\n" % message)


def build_dataset_parser(prog: str, extra_optional=None,
                         params_required: bool = True):
    """The shared subcommand parser tree.

    :param extra_optional: callback(parser) adding script-specific flags
    """
    req_parser = argparse.ArgumentParser(add_help=False)
    req_group = req_parser.add_argument_group(title="Required arguments")
    req_group.add_argument("-d", "--data-dir", type=str, dest="data_dir",
                           required=True,
                           help="Path to dataset root directory")
    req_group.add_argument("-l", "--log-dir", type=str, dest="log_dir",
                           required=True, metavar="LOGDIR",
                           help="Logdirectory for the session.")
    req_group.add_argument("-p", "--parameters", type=str, dest="params",
                           required=params_required,
                           default="conf/default_params.json",
                           metavar="PARAMS",
                           help="Path to parameter configuration file, "
                                "see conf subdirectory.")

    opt_parser = argparse.ArgumentParser(add_help=False)
    opt_parser.add_argument("-c", "--checkpoint", type=str,
                            dest="checkpoint", required=False,
                            metavar="CHECKPOINT",
                            help="Path to pretrained checkpoint "
                                 "directory or model.")
    opt_parser.add_argument("--seed", type=int, dest="seed", default=0,
                            required=False,
                            help="PRNG seed for init/augmentation.")
    opt_parser.add_argument("--trace", type=str, dest="trace",
                            default=None, required=False,
                            metavar="TRACE_DIR",
                            help="Write a jax.profiler trace of the "
                                 "hot loop to this directory "
                                 "(view with tensorboard/xprof).")
    opt_parser.add_argument("--tensorboard", action="store_true",
                            dest="tensorboard", default=False,
                            help="Also mirror metrics into a real "
                                 "tfevents file under the log dir "
                                 "(the reference's native format, "
                                 "train.py:154-206).")
    if extra_optional is not None:
        extra_optional(opt_parser)

    top_parser = argparse.ArgumentParser(
        usage="%s {cityscapes,freiburg,vistas} [-h/--help]" % prog)
    sub = top_parser.add_subparsers(parser_class=HelpfulParser)

    cityscapes = sub.add_parser(
        "cityscapes", parents=[req_parser, opt_parser],
        conflict_handler="resolve", help="The Cityscapes dataset.")
    cityscapes.set_defaults(dataset="cityscapes")
    cityscapes.add_argument("--use-coarse", action="store_true",
                            required=False, dest="coarse")

    vistas = sub.add_parser(
        "vistas", parents=[req_parser, opt_parser],
        conflict_handler="resolve", help="The Mapillary Vistas dataset.")
    vistas.set_defaults(dataset="vistas")

    freiburg = sub.add_parser(
        "freiburg", parents=[req_parser, opt_parser],
        conflict_handler="resolve", help="The Freiburg Forest dataset.")
    freiburg.set_defaults(dataset="freiburg")
    freiburg.add_argument("-m", "--modalities", type=str, nargs="+",
                          required=False, default=[],
                          help="Dataset modalities to load.")
    return top_parser


def parse_dataset_args(prog: str, argv=None, extra_optional=None):
    parser = build_dataset_parser(prog, extra_optional)
    argv = sys.argv[1:] if argv is None else argv
    if not any(ds in argv for ds in ("cityscapes", "freiburg", "vistas")):
        parser.print_help()
        sys.exit(0)
    args = parser.parse_args(argv)
    return args


def make_dataset(args):
    """Dataset object from parsed args (train.py:27-34)."""
    if args.dataset == "cityscapes":
        return datasets.Cityscapes(coarse=getattr(args, "coarse", False))
    if args.dataset == "freiburg":
        return datasets.Freiburg(
            modalities=getattr(args, "modalities", None) or None)
    if args.dataset == "vistas":
        return datasets.Vistas()
    raise NotImplementedError(
        "Dataset \"%s\" not supported" % args.dataset)


def respect_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative.

    This container's sitecustomize registers the remote "axon" TPU
    backend at interpreter start and forces ``jax_platforms=axon,cpu``
    via config — silently overriding the environment variable. Tests
    and CI set ``JAX_PLATFORMS=cpu`` expecting local execution; honor
    it here (config updates after import do take effect)."""
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass


def enable_compilation_cache(log_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: a full-model remote compile
    takes minutes through the TPU relay, so cache across processes."""
    import jax

    respect_platform_env()

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ssal_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: non-fatal
        pass


class StepScalarBuffer:
    """Device-side per-step scalar buffer for iteration-cadence metrics
    (the reference's per-iteration loss/cost/LR scalar summaries,
    reference train.py:167-176, 339-341).

    ``append`` keeps the jit-returned device scalars un-fetched;
    ``flush`` stacks them in fixed-size chunks (one compiled shape,
    independent of epoch length) and fetches each chunk as ONE array.
    Fetching every step scalar individually pays the TPU relay's ~26 ms
    round-trip per value — seconds per epoch; this costs a handful of
    round-trips per epoch total."""

    _CHUNK = 64  # rows per stacked fetch; one compiled shape per key set

    def __init__(self, keys):
        self.keys = tuple(keys)
        self._rows = []

    def append(self, metrics) -> None:
        self._rows.append([metrics[k] for k in self.keys])

    def extend_group(self, metrics) -> None:
        """Append a grouped step's K rows at once: ``metrics`` leaves
        carry a leading ``[K]`` axis. ONE tiny stack dispatch per
        group instead of per-element device slicing (3K gathers)."""
        import jax.numpy as jnp

        self._rows.append(jnp.stack(
            [jnp.asarray(metrics[k], jnp.float32)
             for k in self.keys], axis=1))          # [K, nkeys]

    def __len__(self) -> int:
        return sum(r.shape[0] if hasattr(r, "shape") else 1
                   for r in self._rows)

    def flush(self):
        """Return ``[n_steps, len(keys)]`` float32 host array."""
        import numpy as np

        rows, self._rows = self._rows, []
        k = len(self.keys)
        if not rows:
            return np.zeros((0, k), np.float32)
        import jax.numpy as jnp

        # scalar rows: chunk-stacked (fixed compiled shape regardless
        # of epoch length); group rows ([K, k] arrays, K constant — the
        # tail takes the per-step path): chunk-stacked the same way.
        # Fetch each stream once, then merge back in append order.
        scalar_idx, scalar_rows = [], []
        group_idx, group_rows = [], []
        for i, r in enumerate(rows):
            if hasattr(r, "shape"):
                group_idx.append(i)
                group_rows.append(r)
            else:
                scalar_idx.append(i)
                scalar_rows.append(r)

        def chunked(items, chunk):
            pad = (-len(items)) % chunk
            items = items + items[-1:] * pad
            parts = [np.asarray(jnp.stack(items[i:i + chunk]))
                     for i in range(0, len(items), chunk)]
            return np.concatenate(parts)

        fetched = {}
        if scalar_rows:
            flat = [jnp.asarray(x, jnp.float32)
                    for row in scalar_rows for x in row]
            arr = chunked(flat, self._CHUNK * k)[:len(scalar_rows) * k]
            arr = arr.reshape(len(scalar_rows), k)
            for i, v in zip(scalar_idx, arr):
                fetched[i] = v[None]
        if group_rows:
            arr = chunked(group_rows, 8)[:len(group_rows)]
            for i, v in zip(group_idx, arr):
                fetched[i] = np.asarray(v)
        return np.concatenate([fetched[i] for i in range(len(rows))])


def dispatch_grouped_train(pending, state, grouped_step, iter_buf,
                           acc, extra_row_fn=None, multihost=False,
                           aot_box=None, barrier=None):
    """Dispatch buffered ``(batch, key)`` pairs as ONE grouped train
    call (``train.steps.make_grouped_train_step``), shared by the
    train and AL CLIs: stacks the loader batches (uint8 stacks on
    device — ``jnp.stack`` is one dispatch, no re-upload), records the
    per-step scalars and device-summed confusion, and returns the new
    state. ``extra_row_fn(batch) -> [B] bool`` supplies the
    pseudo-labeling ``labelled`` rows when present.

    ``multihost=True`` pairs with ``make_grouped_train_step(...,
    stacked_inputs=False)``: the loader batches arrive as
    globally-sharded arrays that host code cannot stack, so they are
    passed through as a TUPLE and stacked inside jit. ``aot_box`` (a
    caller-owned list) with ``barrier`` implements the multi-host
    compile-then-rendezvous pattern: the first dispatch AOT-compiles
    the step, calls ``barrier()`` so slow-compiling hosts don't blow
    the collective rendezvous window, and every later dispatch reuses
    the stored executable."""
    import jax.numpy as jnp
    import numpy as np

    if multihost:
        gb = tuple(
            dict({k: b[k] for k in ("stack", "heights", "widths")},
                 valid=b["valid"].astype(jnp.float32),
                 **({"labelled": extra_row_fn(b)}
                    if extra_row_fn is not None else {}))
            for b, _ in pending)
    else:
        gb = {
            "stack": jnp.stack([b["stack"] for b, _ in pending]),
            "heights": np.stack([b["heights"] for b, _ in pending]),
            "widths": np.stack([b["widths"] for b, _ in pending]),
            "valid": np.stack([b["valid"].astype(np.float32)
                               for b, _ in pending]),
        }
        if extra_row_fn is not None:
            gb["labelled"] = np.stack([extra_row_fn(b)
                                       for b, _ in pending])
    keys = jnp.stack([key for _, key in pending])
    fn = grouped_step
    if aot_box is not None:
        if not aot_box:
            aot_box.append(grouped_step.lower(state, gb, keys).compile())
            if barrier is not None:
                barrier()
        fn = aot_box[0]
    state, gm = fn(state, gb, keys)
    iter_buf.extend_group(gm)
    acc.update(gm["confusion"])
    return state


class MetricsWriter:
    """Append-only JSONL metrics log under the log dir — the rebuild's
    native equivalent of the reference's TensorBoard scalar summaries
    (train.py:154-206). tools/ can convert to CSV/TB formats."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 enabled: bool = True, tensorboard: bool = False):
        # enabled=False on non-zero hosts of a multi-host run: metrics
        # are replicated, so only process 0 writes
        self.enabled = enabled
        if enabled:
            os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._tb = None
        if enabled and tensorboard:
            from . import tb_events
            self._tb = tb_events.EventWriter(log_dir)

    @property
    def tb(self):
        """The live ``tb_events.EventWriter`` (None unless
        ``tensorboard=True``) — callers mirror image summaries into
        it (utils/images.dump_summaries)."""
        return self._tb

    def write(self, record: dict) -> None:
        if not self.enabled:
            return
        record = dict(record)
        record.setdefault("wall_time", time.time())
        line = json.dumps(record, default=_json_default)
        with open(self.path, "a") as fp:
            fp.write(line + "\n")
        if self._tb is not None:
            from . import tb_events
            # Re-parse the already-serialized line: one decode both
            # normalizes numpy scalars/arrays and reuses the encode
            # the file write paid for.
            plain = json.loads(line)
            values = tb_events.record_to_values(plain)
            if values:
                self._tb.add_event(tb_events.encode_event(
                    plain["wall_time"], tb_events.record_step(plain),
                    values))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _json_default(obj):
    try:
        import numpy as np
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
    except ImportError:
        pass
    return str(obj)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace around the hot loop when ``--trace`` is given
    (the reference only had commented-out FULL_TRACE hooks,
    train.py:293-294, 333-342 — this is the working TPU equivalent)."""
    if not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def progress(iterable, desc: str, enabled: bool = True, **kwargs):
    """tqdm when available, like the reference's optional import
    (train.py:12-18)."""
    if not enabled:
        return iterable
    try:
        import tqdm
        return tqdm.tqdm(iterable, desc=desc, ascii=True,
                         dynamic_ncols=True, **kwargs)
    except ImportError:
        return iterable
