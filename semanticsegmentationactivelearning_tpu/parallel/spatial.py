"""Spatial partitioning: width-sharded convolution with halo exchange.

The reference has no sequence/context parallelism (fully convolutional,
no attention); its "long context" is high-resolution imagery, handled by
downscaling and cropping (SURVEY.md §5). The TPU-native analogue is
sharding the spatial W axis across a mesh axis so full-resolution
(1024x2048+) inference fits per-chip HBM: each device holds a width
slice, exchanges ``halo`` boundary columns with its neighbors over ICI
(``lax.ppermute`` inside ``shard_map``), then convolves locally — the
result is bit-identical to the unsharded convolution.

These are the building blocks (exchange + conv + pool); composing a
fully spatially-sharded model additionally needs per-stage halo sizing,
which is model-specific.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange_width(x: jnp.ndarray, axis_name: str,
                        halo: int) -> jnp.ndarray:
    """Pad a width-sharded block with ``halo`` columns from each
    neighbor (zeros at the global edges).

    Runs inside ``shard_map``; ``x`` is the per-device block
    ``[N, H, W_local, C]``; returns ``[N, H, W_local + 2*halo, C]``.
    """
    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)

    left_edge = x[:, :, :halo]        # columns this device sends right
    right_edge = x[:, :, -halo:]      # columns this device sends left

    # receive the right edge of the left neighbor / left edge of the
    # right neighbor; ppermute fills unmatched targets with zeros,
    # which is exactly SAME-padding behavior at the global boundary
    from_left = jax.lax.ppermute(
        right_edge, axis_name,
        [(i, i + 1) for i in range(n_dev - 1)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name,
        [(i + 1, i) for i in range(n_dev - 1)])
    del idx
    return jnp.concatenate([from_left, x, from_right], axis=2)


def make_sharded_conv(mesh: Mesh, kernel_w: int, axis_name: str = "space",
                      strides: Tuple[int, int] = (1, 1)):
    """Build a width-sharded SAME conv: halo exchange + local conv.

    The local convolution runs VALID over the halo-extended block in W
    (and SAME in H), which reproduces the global SAME result exactly
    when ``W_local`` is divisible by the stride.
    """
    halo = (kernel_w - 1) // 2
    shard_map = jax.shard_map

    def _local(x, kernel):
        padded = halo_exchange_width(x, axis_name, halo) if halo else x
        return jax.lax.conv_general_dilated(
            padded, kernel, window_strides=strides,
            padding=((kernel.shape[0] // 2,) * 2, (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    in_specs = (P(None, None, axis_name, None), P())
    out_specs = P(None, None, axis_name, None)
    return shard_map(_local, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs)


def shard_width(x: jnp.ndarray, mesh: Mesh,
                axis_name: str = "space") -> jnp.ndarray:
    """Place an array with its W axis sharded over ``axis_name``."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, None, axis_name, None)))
