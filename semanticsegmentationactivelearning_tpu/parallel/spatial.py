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
                        halo: int, halo_right: int | None = None
                        ) -> jnp.ndarray:
    """Pad a width-sharded block with neighbor columns (zeros at the
    global edges): ``halo`` columns from the left neighbor and
    ``halo_right`` (default: ``halo``) from the right neighbor.

    Runs inside ``shard_map``; ``x`` is the per-device block
    ``[N, H, W_local, C]``; returns
    ``[N, H, halo + W_local + halo_right, C]``.
    """
    if halo_right is None:
        halo_right = halo
    n_dev = jax.lax.axis_size(axis_name)

    # receive the right edge of the left neighbor / left edge of the
    # right neighbor; ppermute fills unmatched targets with zeros,
    # which is exactly SAME-padding behavior at the global boundary
    parts = []
    if halo:
        parts.append(jax.lax.ppermute(
            x[:, :, -halo:], axis_name,
            [(i, i + 1) for i in range(n_dev - 1)]))
    parts.append(x)
    if halo_right:
        parts.append(jax.lax.ppermute(
            x[:, :, :halo_right], axis_name,
            [(i + 1, i) for i in range(n_dev - 1)]))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """XLA's SAME padding pair for one dimension."""
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    lo = pad // 2
    return lo, pad - lo


def make_sharded_conv(mesh: Mesh, kernel_w: int, axis_name: str = "space",
                      strides: Tuple[int, int] = (1, 1)):
    """Build a width-sharded SAME conv: halo exchange + local conv.

    The local convolution runs VALID over the halo-extended block in W
    (with XLA's asymmetric SAME padding split across the halos) and
    explicit SAME padding in H, which reproduces the global SAME result
    exactly provided each device's ``W_local`` is divisible by the W
    stride and ``kernel_w >= stride``.
    """
    s_h, s_w = strides
    if kernel_w < s_w:
        raise ValueError(
            f"kernel_w ({kernel_w}) must be >= the W stride ({s_w})")
    # With W_local (hence global W) divisible by s_w, the global SAME
    # W padding is exactly (kernel_w - s_w) total, split lo/hi like
    # XLA: lo = total // 2. The left shard's ppermute zero-fill
    # provides pad_lo, the right shard's provides pad_hi, and interior
    # windows align because pad_lo columns of halo shift every local
    # VALID window to the global grid.
    halo_l = (kernel_w - s_w) // 2
    halo_r = (kernel_w - s_w) - halo_l
    shard_map = jax.shard_map

    def _local(x, kernel):
        if x.shape[2] % s_w:
            raise ValueError(
                f"W_local ({x.shape[2]}) must be divisible by the W "
                f"stride ({s_w}) for a width-sharded conv")
        padded = halo_exchange_width(x, axis_name, halo_l, halo_r) \
            if (halo_l or halo_r) else x
        return jax.lax.conv_general_dilated(
            padded, kernel, window_strides=strides,
            padding=(_same_pads(x.shape[1], kernel.shape[0], s_h),
                     (0, 0)),
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
