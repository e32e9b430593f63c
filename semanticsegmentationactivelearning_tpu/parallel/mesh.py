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

Multi-host extends this over DCN: ``initialize_distributed`` wires the
per-host processes together (``jax.distributed.initialize``), meshes
then span every host's devices, ``process_shard`` gives each host its
slice of the example list, and ``make_global_batch`` assembles each
host's local batch rows into one globally-sharded array
(``jax.make_array_from_process_local_data``) so the same jitted steps
run unchanged — XLA routes gradient/metric psums over ICI within a
slice and DCN across hosts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host setup; call once per host before any jax operation.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on TPU pods with launcher-provided metadata
    ``jax.distributed.initialize()`` auto-detects everything. The
    reference had no distributed story at all (its only multi-device
    trick was the GPU:0/GPU:1 split, SURVEY.md §5 comm inventory).
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    n = num_processes if num_processes is not None else \
        os.environ.get("JAX_NUM_PROCESSES")
    if n is not None:
        kwargs["num_processes"] = int(n)
    pid = process_id if process_id is not None else \
        os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    # Absorb import/startup skew here so per-host compiles begin
    # together: the CPU Gloo backend's first collective rendezvous has a
    # hard ~30s window, far shorter than a cold compile.
    sync_processes("ssal-startup")


def sync_processes(tag: str, timeout_s: int = 600) -> None:
    """Barrier across all processes via the coordination service.

    Unlike the collective runtime's rendezvous (Gloo on CPU enforces a
    hard ~30s key-exchange deadline), this barrier tolerates minutes of
    skew — use it between compilation and the first collective
    execution so a host that compiles slowly (cold cache, loaded
    machine) does not blow its peers' rendezvous window. No-op when
    single-process."""
    if jax.process_count() <= 1:
        return
    try:
        # Private module: the coordination-service client has no public
        # accessor in the pinned jax. Degrade to a no-op on a jax
        # upgrade rather than taking down multi-host startup — the
        # barrier is a skew-absorber, not a correctness requirement.
        from jax._src import distributed
        client = getattr(distributed.global_state, "client", None)
    except (ImportError, AttributeError):
        client = None
    if client is None:
        return
    client.wait_at_barrier(tag, timeout_in_ms=timeout_s * 1000)


def process_shard(count: int,
                  process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> slice:
    """This host's contiguous slice of ``count`` examples (per-process
    sharded loading: each host decodes only its rows of the global
    batch)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = -(-count // n)
    return slice(pid * per, min(count, (pid + 1) * per))


def make_global_batch(mesh: Mesh, local_batch: Dict[str, np.ndarray],
                      batch_keys: Sequence[str] = ("stack",)) -> Dict:
    """Assemble per-host local batch rows into globally-sharded arrays.

    Keys in ``batch_keys`` become jax Arrays sharded ``P("data")`` over
    the full (multi-host) mesh, built from each process's local rows
    without any cross-host copy of the data itself
    (``jax.make_array_from_process_local_data``). Other keys pass
    through host-local. Single-process meshes work too (the arrays just
    land sharded on the local devices).
    """
    sharding = NamedSharding(mesh, P("data"))
    out = dict(local_batch)
    for k in batch_keys:
        if k in out:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(out[k]))
    return out


def batch_stream(loader_, order, global_batch_size: int, mesh,
                 sharding=None, extra_keys: Sequence[str] = (),
                 extra_fn=None):
    """Per-host batch stream shared by the train and AL CLIs.

    Single-process: the loader's batches through a double-buffered
    ``device_put`` (``sharding`` pre-shards the stacks over the mesh).
    Multi-host: each host decodes only its slice of every global chunk
    (``RecordLoader.global_batches``) and the slices are stitched into
    globally-sharded arrays (``make_global_batch``). ``extra_fn(b)``
    may derive additional per-row keys from the local batch (e.g. the
    AL labelled flags) which are then sharded under ``extra_keys``.
    """
    import numpy as np  # noqa: F811 (module alias for closures)
    order = np.asarray(order)
    if jax.process_count() > 1:
        def gen():
            keys = ("stack", "heights", "widths",
                    "valid") + tuple(extra_keys)
            for b in loader_.global_batches(order, global_batch_size,
                                            jax.process_index(),
                                            jax.process_count()):
                if extra_fn is not None:
                    b = dict(b, **extra_fn(b))
                yield make_global_batch(mesh, b, batch_keys=keys)
        return gen()
    from ..data import device_prefetch
    return device_prefetch.device_prefetch(loader_.batches(order),
                                           sharding=sharding)


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh over the first ``num_devices`` devices.

    :param axis_names: 1-D ``("data",)`` (default) or 2-D
                       ``("data", "space")``
    :param shape:      explicit mesh shape; defaults to all devices on
                       one axis (1-D) or a balanced split whose space
                       degree is the largest power-of-2 divisor of
                       ``n`` not exceeding sqrt(n) (2-D)
    """
    devices = jax.devices()
    n = num_devices if num_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(
            f"Requested {n} devices but only {len(devices)} available")
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            space = _largest_pow2_divisor(n, int(np.sqrt(n)))
            shape = (n // space, space)
    mesh_devices = np.array(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


# Measured on v5e (15.75G usable HBM): the fused ENet scoring forward
# at 1024x2048 fp32 fits batch 4/chip and OOMs at 8 — ~420 bytes of
# peak activation per pixel per dtype byte (low-channel NHWC stages pad
# the minor dim to 128 lanes; see CLAUDE.md).
_ACT_BYTES_PER_PIXEL_PER_DTYPE_BYTE = 420.0
_DEFAULT_HBM_BYTES = 15.75e9


def estimate_score_hbm(batch_per_chip: float, input_hw: Sequence[int],
                       dtype_bytes: int = 2) -> float:
    """Rough peak-activation HBM for one scoring forward per chip."""
    return (batch_per_chip * input_hw[0] * input_hw[1]
            * _ACT_BYTES_PER_PIXEL_PER_DTYPE_BYTE * dtype_bytes)


def make_mesh_auto(batch_size: int, input_hw: Sequence[int],
                   dtype_bytes: int = 2,
                   num_devices: Optional[int] = None,
                   hbm_bytes: float = _DEFAULT_HBM_BYTES) -> Mesh:
    """Pick a mesh for the scoring pass from an HBM estimate.

    Pure data parallelism when the per-chip batch slice fits; otherwise
    trade data-parallel degree for a ``space`` axis — width-sharding
    the activations divides the per-chip footprint by the space degree
    (XLA GSPMD inserts the conv halo exchanges; see
    train/steps.make_score_step). The spatial design the reference
    lacked entirely (it downscaled/cropped instead, SURVEY.md §5).
    """
    n = num_devices if num_devices is not None else len(jax.devices())
    budget = 0.8 * hbm_bytes

    def fits(d, s):
        if d > 1 and batch_size % d != 0:
            return False
        per_chip = batch_size / d
        return estimate_score_hbm(per_chip, input_hw,
                                  dtype_bytes) / s <= budget

    # prefer the largest data axis (pure DP beats halo traffic)
    d = n
    while d >= 1:
        if n % d == 0 and (d == 1 or batch_size % d == 0):
            s = n // d
            if fits(d, s):
                return make_mesh(n, ("data",)) if s == 1 else \
                    make_mesh(n, ("data", "space"), shape=(d, s))
        d -= 1
    # nothing fits even fully spatial: return the most-spatial layout
    # and let the caller's chunking/batching deal with it
    return make_mesh(n, ("data", "space"), shape=(1, n)) if n > 1 \
        else make_mesh(1)


def _largest_pow2_divisor(n: int, cap: int) -> int:
    """Largest power of 2 that divides ``n`` and is <= ``cap``."""
    p = 1
    while p * 2 <= cap and n % (p * 2) == 0:
        p *= 2
    return p


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def image_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image tensors: batch over ``data``, plus W
    over ``space`` when the mesh has a spatial axis."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "space"))
    return data_sharded(mesh)


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    n = mesh.shape["data"]
    if batch_size % n != 0:
        raise ValueError(
            f"Global batch size {batch_size} must be divisible by the "
            f"data-parallel degree {n}")
