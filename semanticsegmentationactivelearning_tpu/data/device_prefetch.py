"""Host->device transfer overlap for the training/scoring hot loops.

The reference overlapped input transfer with compute via tf.data's
``prefetch`` after batching (tensortools/input.py:193-195) — the TF
runtime double-buffered CPU->GPU copies implicitly. In JAX the jitted
step only *starts* its H2D copy when dispatched, so feeding fresh host
numpy serializes upload behind the previous step's compute (measured
~1.1s/step extra through the TPU relay at 8x512x1024 uint8; see
CLAUDE.md / .claude/skills/verify/SKILL.md).

``device_prefetch`` wraps a host batch iterator and eagerly
``jax.device_put``-s the *next* batch's large arrays while the current
batch computes — ``device_put`` is asynchronous, so the copy rides
along with the in-flight step. With a sharding (a ``("data",)`` mesh),
batches land pre-sharded so the jitted step needs no resharding copy.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional, Sequence


def device_prefetch(batches: Iterable[dict],
                    keys: Sequence[str] = ("stack",),
                    depth: int = 2,
                    sharding=None) -> Iterator[dict]:
    """Yield batches with ``keys`` already on device, ``depth`` ahead.

    :param batches:  iterator of dict batches (host numpy)
    :param keys:     dict entries to transfer (the large arrays; small
                     metadata stays host-side)
    :param depth:    how many transfers to keep in flight ahead of the
                     batch being consumed — up to depth+1 stacks are
                     device-resident at steady state (the measured
                     default 2 overlaps upload with compute; see the
                     module docstring)
    :param sharding: optional ``jax.sharding.Sharding`` for the
                     transferred arrays (e.g. batch-sharded over a
                     ``("data",)`` mesh)
    """
    import jax

    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def _put(b: dict) -> dict:
        out = dict(b)
        for k in keys:
            if k in out:
                if sharding is not None:
                    out[k] = jax.device_put(out[k], sharding)
                else:
                    out[k] = jax.device_put(out[k])
        return out

    it = iter(batches)
    queue: "collections.deque" = collections.deque()
    try:
        try:
            for _ in range(depth):
                queue.append(_put(next(it)))
        except StopIteration:
            pass
        while queue:
            batch = queue.popleft()
            try:
                queue.append(_put(next(it)))
            except StopIteration:
                pass
            yield batch
    finally:
        # deterministic shutdown of a wrapped generator (e.g.
        # RecordLoader.batches, whose close() stops its producer
        # thread) when the consumer abandons this iterator early —
        # don't leave that to GC finalization
        close = getattr(it, "close", None)
        if close is not None:
            close()
