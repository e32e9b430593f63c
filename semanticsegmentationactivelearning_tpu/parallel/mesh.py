"""Device mesh and sharding policy.

The reference had no data parallelism at all — its only multi-device
trick was pinning a second network to GPU:1 for validation with an
explicit per-variable weight copy (train.py:97-105, 259-265; SURVEY.md
parallelism inventory). The TPU-native design is standard SPMD:

- 1-D ``("data",)`` mesh: batch sharded over devices, parameters
  replicated; XLA inserts gradient/metric ``psum`` over ICI.
- Step functions (train/steps.py) take an optional mesh and annotate
  in/out shardings on their jit; passing host numpy batches to the
  jitted step shards them automatically.
- A 2-D ``("data", "space")`` mesh is reserved for spatial partitioning
  of very-high-resolution inputs (parallel/spatial.py).

Multi-host would extend this via ``jax.distributed.initialize`` over
DCN; single-process multi-chip needs no extra code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh over the first ``num_devices`` devices.

    :param axis_names: 1-D ``("data",)`` (default) or 2-D
                       ``("data", "space")``
    :param shape:      explicit mesh shape; defaults to all devices on
                       one axis
    """
    devices = jax.devices()
    n = num_devices if num_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(
            f"Requested {n} devices but only {len(devices)} available")
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else \
            (n // _largest_pow2_leq(n, n), _largest_pow2_leq(n, n))
    mesh_devices = np.array(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def _largest_pow2_leq(n: int, cap: int) -> int:
    p = 1
    while p * 2 <= min(n, cap):
        p *= 2
    return p


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    n = mesh.shape["data"]
    if batch_size % n != 0:
        raise ValueError(
            f"Global batch size {batch_size} must be divisible by the "
            f"data-parallel degree {n}")
