"""Pallas TPU kernels for the acquisition hot path.

``fused_deconv_entropy_score`` is the north-star kernel (BASELINE.json):
the ENet ``Final`` 3x3/stride-2 transpose convolution, softmax,
normalized entropy, and the per-image reduction — computed tile-by-tile
entirely in VMEM, so the full-resolution class logits never exist in
HBM at all. (Context: on TPU a ``[B,H,W,19]`` logits buffer pads its
19-lane minor dim to 128 — a 6.7x HBM blowup that dominated the XLA
scoring graph; see ops/acquisition.py and bench.py history.)

The transpose conv is decomposed into its four stride-2 polyphases,
each a sum of 1x1 taps over (optionally shifted) input features —
verified against ``lax.conv_transpose`` (see tests):

    out[2i  , 2j  ] = K[2,2]x[i,j] + K[0,2]x[i-1,j]
                    + K[2,0]x[i,j-1] + K[0,0]x[i-1,j-1]
    out[2i  , 2j+1] = K[2,1]x[i,j] + K[0,1]x[i-1,j]
    out[2i+1, 2j  ] = K[1,2]x[i,j] + K[1,0]x[i,j-1]
    out[2i+1, 2j+1] = K[1,1]x[i,j]

Each tap is an MXU matmul ``[tile*W, cin] @ [cin, C]``. Row shifts
(``x[i-1]``) are provided as a second, one-row-shifted input array so
all Pallas blocks stay aligned (no halo DMA); column shifts happen
in-register inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .acquisition import EPSILON


def _score_kernel(x_ref, xu_ref, k_ref, out_ref, *, num_classes: int):
    x = x_ref[0].astype(jnp.float32)      # [TH, W2, CIN]
    i, j = pl.program_id(0), pl.program_id(1)
    xu = xu_ref[0].astype(jnp.float32)    # x shifted down: row i-1
    kernel = k_ref[...].astype(jnp.float32)

    zeros_col = jnp.zeros_like(x[:, :1])
    xl = jnp.concatenate([zeros_col, x[:, :-1]], axis=1)     # x[i, j-1]
    xul = jnp.concatenate([jnp.zeros_like(xu[:, :1]), xu[:, :-1]],
                          axis=1)                            # x[i-1, j-1]

    th, w2, cin = x.shape
    flat = lambda a: a.reshape(th * w2, cin)

    def tap(a, ky, kx):
        return jnp.dot(flat(a), kernel[ky, kx],
                       preferred_element_type=jnp.float32)

    def phase_taps():
        # generate each polyphase lazily so only one [th*w2, C] logits
        # buffer is live at a time (VMEM budget)
        yield tap(x, 2, 2) + tap(xu, 0, 2) + tap(xl, 2, 0) + \
            tap(xul, 0, 0)
        yield tap(x, 2, 1) + tap(xu, 0, 1)
        yield tap(x, 1, 2) + tap(xl, 1, 0)
        yield tap(x, 1, 1)

    # Accumulate the raw entropy mass and apply the affine
    # ``conf = 1 - H/log(C)`` on scalars only: Mosaic rejects the
    # broadcasted scalar-minus-reduced-vector relayout.
    log_c = jnp.log(jnp.float32(num_classes))
    neg_entropy_sum = jnp.float32(0.0)
    for logits in phase_taps():
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        prob = e / jnp.sum(e, axis=-1, keepdims=True)
        neg_entropy_sum = neg_entropy_sum + jnp.sum(
            prob * jnp.log(prob + EPSILON))
    pixels = jnp.float32(4 * th * w2)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


def _upsample_kernel(x_ref, xu_ref, xd_ref, out_ref, *, num_classes: int):
    """Bilinear 4x upsample (16 polyphases) + softmax + entropy of a
    low-res logits tile, accumulated as one scalar per grid cell.

    Polyphase weights (tent, positions (j+0.5)/4-0.5): output row
    4i+r draws on rows (i-1, i) for r in {0,1} with weights
    (3/8, 5/8), (1/8, 7/8), and on rows (i, i+1) for r in {2,3} with
    (7/8, 1/8), (5/8, 3/8); columns identically. Edge clamping is
    provided by the caller's edge-replicated shifted copies (rows) and
    in-register clamped shifts (columns), reproducing
    ``jax.image.resize`` exactly.
    """
    x = x_ref[0].astype(jnp.float32)      # [TH, Wl, C]
    xu = xu_ref[0].astype(jnp.float32)    # row i-1 (edge-clamped)
    xd = xd_ref[0].astype(jnp.float32)    # row i+1 (edge-clamped)
    i, j = pl.program_id(0), pl.program_id(1)

    rows = (0.375 * xu + 0.625 * x, 0.125 * xu + 0.875 * x,
            0.875 * x + 0.125 * xd, 0.625 * x + 0.375 * xd)

    log_c = jnp.log(jnp.float32(num_classes))
    neg_entropy_sum = jnp.float32(0.0)
    for y in rows:
        yl = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)   # col j-1
        yr = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)   # col j+1
        for logits in (0.375 * yl + 0.625 * y, 0.125 * yl + 0.875 * y,
                       0.875 * y + 0.125 * yr, 0.625 * y + 0.375 * yr):
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            prob = e / jnp.sum(e, axis=-1, keepdims=True)
            neg_entropy_sum = neg_entropy_sum + jnp.sum(
                prob * jnp.log(prob + EPSILON))
    th, wl, _c = x.shape
    pixels = jnp.float32(16 * th * wl)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


@functools.partial(jax.jit,
                   static_argnames=("scale", "num_classes", "tile_h",
                                    "interpret"))
def fused_upsample_entropy_score(logits_low: jnp.ndarray, scale: int,
                                 num_classes: int, tile_h: int = 4,
                                 interpret: bool = False) -> jnp.ndarray:
    """Per-image mean entropy-confidence of bilinearly upsampled low-res
    logits — the ICNet scoring tail (models/icnet.py classifies at 1/4
    resolution; the reference scored full-res logits,
    active_learning.py:240-263). Full-res lane-padded logits never exist
    in HBM.

    :param logits_low: ``[N, Hl, Wl, C]`` low-resolution logits
    :param scale:      must be 4 (the polyphase decomposition)
    :returns: ``[N]`` float32 — identical math to
              ``acquisition.mean_confidence(resize(logits_low, 4x),
              "entropy", C)``
    """
    if scale != 4:
        raise NotImplementedError("fused upsample kernel is 4x only")
    n, hl, wl, c = logits_low.shape
    if hl % tile_h != 0:
        tile_h = hl
    grid_h = hl // tile_h

    # edge-clamped row-shifted copies: xu[i] = x[i-1], xd[i] = x[i+1]
    xu = jnp.concatenate([logits_low[:, :1], logits_low[:, :-1]], axis=1)
    xd = jnp.concatenate([logits_low[:, 1:], logits_low[:, -1:]], axis=1)

    spec = pl.BlockSpec((1, tile_h, wl, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    partial_sums = pl.pallas_call(
        functools.partial(_upsample_kernel, num_classes=num_classes),
        grid=(n, grid_h),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        interpret=interpret,
    )(logits_low, xu, xd)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(16 * hl * wl)


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_h", "interpret"))
def fused_deconv_entropy_score(features: jnp.ndarray, kernel: jnp.ndarray,
                               num_classes: int, tile_h: int = 4,
                               interpret: bool = False) -> jnp.ndarray:
    """Per-image mean entropy-confidence of the upsampled classifier.

    :param features: ``[N, H2, W2, CIN]`` pre-Final features
    :param kernel:   ``[3, 3, CIN, C]`` transpose-conv kernel
    :param interpret: run the Pallas interpreter (CPU tests)
    :returns: ``[N]`` float32 — identical math to
              ``acquisition.mean_confidence(conv_transpose(...),
              "entropy", C)``
    """
    n, h2, w2, cin = features.shape
    if h2 % tile_h != 0:
        tile_h = h2
    grid_h = h2 // tile_h

    # row-shifted copy: xu[i] = features[i-1] (zero row 0)
    xu = jnp.pad(features, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]

    partial_sums = pl.pallas_call(
        functools.partial(_score_kernel, num_classes=num_classes),
        grid=(n, grid_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, w2, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w2, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, kernel.shape[-1]),
                         lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # one shared SMEM block; each grid cell writes its own element
        # (per-cell (1,1) blocks fail Mosaic's (8,128)-divisibility rule)
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        interpret=interpret,
    )(features, xu, kernel)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(4 * h2 * w2)
