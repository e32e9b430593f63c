"""Convolutions as shifted matmuls — the TPU training-path conv.

XLA lowers low-channel NHWC convolutions through relayout temporaries
whose minor dim pads to 128 lanes (up to 8x HBM/VPU tax at the 3/13/16
channel widths that dominate ENet's full/half-resolution segments).
tools/probe_packed_bottleneck.py measured the alternatives on a v5e for
the stage-1 bottleneck chain, fwd+bwd at training semantics:

    flax lax.conv          49.7 ms
    unpacked shifted matmul 39.9 ms   (~1.8x faster net of the ~28 ms
                                       relay fetch floor)
    W-packed shifted matmul 79.4 ms   (block-banded lifted kernels make
                                       the MXU multiply zero bands)

so this module implements the winning middle form: every conv is a
small static sum of (row shift, col shift) matmuls in the tensor's
NATURAL layout. Shifts are zero-padded slices (exactly SAME-padding
semantics), matmuls contract the true channel count and accumulate in
fp32, and jax.grad derives the backward — which is again shifted
matmuls, so the win carries to training. Strided and transposed convs
ride space-to-depth/depth-to-space phase decompositions instead of
strided windows, keeping every matmul dense and stride-free.

Numerical contract: identical math to ``lax.conv_general_dilated`` /
``lax.conv_transpose`` with SAME padding up to fp32 reassociation of
the tap sum (XLA accumulates convs in fp32 on TPU too); exactness is
asserted against the lax ops in tests/test_shiftconv.py.

Reference parity: these compute the reference's conv layers
(models/enet/enet_modules.py:45-1381) — only the schedule differs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["conv_same", "conv_down2", "conv_transpose_up2",
           "conv_transpose_up2_phase"]


def _shift2d(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """``z[r, c] = x[r + sy, c + sx]`` with zero fill out of bounds
    (dims 1, 2 of an NHWC tensor)."""
    if sy:
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, sy) if sy > 0 else (-sy, 0)
        x = jnp.pad(x, pad)
        x = x[:, sy:] if sy > 0 else x[:, :sy]
    if sx:
        pad = [(0, 0)] * x.ndim
        pad[2] = (0, sx) if sx > 0 else (-sx, 0)
        x = jnp.pad(x, pad)
        x = x[:, :, sx:] if sx > 0 else x[:, :, :sx]
    return x


def _dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``[N,H,W,ci] @ [ci,co]`` with fp32 accumulation."""
    n, h, wd, ci = x.shape
    y = jnp.dot(x.reshape(-1, ci), w,
                preferred_element_type=jnp.float32)
    return y.reshape(n, h, wd, -1)


def conv_same(x: jnp.ndarray, kernel: jnp.ndarray,
              dilation: int = 1) -> jnp.ndarray:
    """Stride-1 SAME conv, odd kernel dims (3x3 plain/dilated, 5x1,
    1x5): one shifted matmul per spatial tap.

    :param x: ``[N, H, W, ci]``
    :param kernel: ``[kh, kw, ci, co]``, ``kh``/``kw`` odd
    :returns: ``[N, H, W, co]`` in ``x.dtype`` (fp32-accumulated)
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    rh, rw = kh // 2, kw // 2
    acc = None
    for ty in range(kh):
        for tx in range(kw):
            xs = _shift2d(x, (ty - rh) * dilation, (tx - rw) * dilation)
            t = _dot(xs, kernel[ty, tx])
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def _s2d(x: jnp.ndarray) -> jnp.ndarray:
    """``[N, H, W, C] -> [N, H/2, W/2, 4C]``, channel order (row phase,
    col phase, channel)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def conv_down2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 SAME conv, 2x2 or 3x3 kernel, even input dims (the
    Initial 3x3/s2 and the downsample bottlenecks' 2x2/s2 projection).

    Space-to-depth once, then matmuls over the phase-stacked channels:
    a 2x2 kernel is exactly one ``[4ci, co]`` matmul; a 3x3 kernel adds
    the three taps that cross into the next phase block as shifted
    matmuls (XLA SAME for even H, k=3, s=2 pads 0 low / 1 high, so
    output row r reads input rows 2r..2r+2).

    :param x: ``[N, H, W, ci]``, ``H``/``W`` even
    :param kernel: ``[k, k, ci, co]`` with k in (2, 3)
    :returns: ``[N, H/2, W/2, co]``
    """
    k = kernel.shape[0]
    ci = kernel.shape[2]
    xs = _s2d(x)
    if k == 2:
        # K[(a, b, ci), co] = kernel[a, b]
        w = kernel.reshape(4 * ci, -1)
        return _dot(xs, w).astype(x.dtype)
    assert k == 3, f"conv_down2 supports 2x2/3x3 kernels, got {k}"
    zero = jnp.zeros_like(kernel[0, 0])
    acc = None
    for sy in (0, 1):
        for sx in (0, 1):
            # phase (a, b) contributes tap (2*sy + a, 2*sx + b) when
            # that tap exists (ty, tx <= 2)
            blk = jnp.stack([
                jnp.stack([kernel[2 * sy + a, 2 * sx + b]
                           if 2 * sy + a <= 2 and 2 * sx + b <= 2
                           else zero for b in (0, 1)])
                for a in (0, 1)])                     # [2, 2, ci, co]
            t = _dot(_shift2d(xs, sy, sx), blk.reshape(4 * ci, -1))
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


# Polyphase decomposition of a 3x3/s2 SAME conv_transpose: output
# phase (a, b) at coarse position (r, c) sums x[r + sy, c + sx] *
# k[ky, kx] over its tap list {(sy, sx): (ky, kx)} (verified against
# flax nn.ConvTranspose in tests/test_shiftconv.py).
_DECONV_PHASE_TAPS = (
    ((0, 0), {(0, 0): (2, 2), (-1, 0): (0, 2),
              (0, -1): (2, 0), (-1, -1): (0, 0)}),
    ((0, 1), {(0, 0): (2, 1), (-1, 0): (0, 1)}),
    ((1, 0), {(0, 0): (1, 2), (0, -1): (1, 0)}),
    ((1, 1), {(0, 0): (1, 1)}),
)


def conv_transpose_up2_phase(x: jnp.ndarray, kernel: jnp.ndarray
                             ) -> jnp.ndarray:
    """:func:`conv_transpose_up2` WITHOUT the final depth-to-space:
    returns the four output phases stacked along a widened W axis,
    ``[N, H, 4W, co]`` where flat column ``4c + 2a + b`` holds full-res
    pixel ``(2r + a, 2c + b)`` (the :func:`ops.nn.s2d_plane` order).

    The d2s transpose is exactly the strided relayout XLA lowers at
    ~12 GB/s on low-channel planes (measured +58 ms on the batch-8
    512x1024 train step when the full-res fp32 logits materialize);
    per-pixel consumers (cross-entropy, argmax, confusion counts) are
    permutation-invariant, so the train/eval steps consume this form
    directly and the full-resolution plane never exists.
    """
    phases = []
    for _, taps in _DECONV_PHASE_TAPS:
        acc = None
        for (sy, sx), (ky, kx) in sorted(taps.items()):
            t = _dot(_shift2d(x, sy, sx), kernel[ky, kx])
            acc = t if acc is None else acc + t
        phases.append(acc)
    n, h, w, co = phases[0].shape
    # stack order (0,0),(0,1),(1,0),(1,1) == a*2 + b; merging (w,
    # phase) is a free row-major reshape
    out = jnp.stack(phases, axis=3).reshape(n, h, 4 * w, co)
    return out.astype(x.dtype)


def conv_transpose_up2(x: jnp.ndarray, kernel: jnp.ndarray
                       ) -> jnp.ndarray:
    """3x3 stride-2 SAME transposed conv (the upsample bottlenecks'
    deconv and the Final classifier), as four per-phase tap sums +
    depth-to-space.

    :param x: ``[N, H, W, ci]``
    :param kernel: ``[3, 3, ci, co]`` (flax ``nn.ConvTranspose``
                   orientation, not flipped)
    :returns: ``[N, 2H, 2W, co]``
    """
    n, h, w, ci = x.shape
    out = conv_transpose_up2_phase(x, kernel)
    co = out.shape[-1]
    out = out.reshape(n, h, w, 2, 2, co)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    return out
