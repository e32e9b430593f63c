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


def edge_aligned_window(x: jnp.ndarray, axis_name: str, halo: int):
    """Per-shard width window of ``W_local + 2*halo`` REAL columns whose
    boundary coincides with the global array edge on the edge shards.

    ``halo_exchange_width`` zero-fills at the global edges — exactly
    SAME-conv padding, which is why the ENet front kernel composes with
    it bit-exactly. Kernels with *clamped-edge* semantics (ICNet's
    in-kernel bilinear half-res downsample renormalizes its taps at the
    image boundary) would instead see the clamp applied at the zero
    halo rather than at the true image edge. This variant fixes that by
    SHIFTING the window on the edge shards: every shard exchanges
    ``2*halo`` columns with each neighbor, then slices a uniform-width
    window that starts at its own first column on the first shard (so
    the kernel's own edge handling lands on the true global edge) and
    ends at its own last column on the last shard; interior shards take
    the centered window. Works for any kernel whose edge behavior is a
    function of its input's boundary — zero-pad or clamp alike.

    Runs inside ``shard_map``. Returns ``(window, own_off)`` where
    ``window`` is ``[N, H, W_local + 2*halo, C]`` and ``own_off`` (a
    traced per-shard scalar: 0 / halo / 2*halo) is the column offset of
    this shard's own first column within the window — divide by the
    model's output stride to crop the kernel output back to the shard's
    own columns. Requires ``W_local >= 2*halo`` and at least 2 shards.
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    wl = x.shape[2]
    if wl < 2 * halo:
        raise ValueError(
            f"W_local ({wl}) must be >= 2*halo ({2 * halo}) for the "
            "edge-aligned window exchange")
    ext = halo_exchange_width(x, axis_name, 2 * halo)
    own_off = jnp.where(idx == 0, 0,
                        jnp.where(idx == n_dev - 1, 2 * halo, halo))
    start = 2 * halo - own_off
    window = jax.lax.dynamic_slice_in_dim(ext, start, wl + 2 * halo,
                                          axis=2)
    return window, own_off


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
