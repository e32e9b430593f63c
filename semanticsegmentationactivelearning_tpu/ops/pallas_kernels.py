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


def _score_kernel(x_ref, halo_ref, kx_ref, kxu_ref, kxl_ref, kxul_ref,
                  seg_ref, out_ref, *, num_classes: int):
    """Phase-PACKED deconv + entropy tile kernel.

    All four stride-2 polyphases land side-by-side in one
    ``[TH*W2, 4*C]`` tensor: each shift's contribution is one MXU
    matmul against a ``[CIN, 4*C]`` kernel whose per-phase column
    blocks hold that shift's tap (zeros where the phase has no such
    tap). The VPU then runs ONE exp pass at 4C/128 lane utilization
    instead of four passes at C/128 — the dominant cost of the v1
    kernel (measured VPU-bound on 19->128 padded lanes).

    Per-phase softmax statistics come from segment-sum MXU matmuls
    against a ``[4*C, 4]`` phase-indicator: with m = row max over all
    phases (>= each phase max, so exp stays safe),

        Z_p = sum_c e^(l-m),  S_p = sum_c e^(l-m) (l-m)
        sum_c p log p = S_p / Z_p - log Z_p
    """
    x = x_ref[0].astype(jnp.float32)      # [TH, W2, CIN]
    i, j = pl.program_id(0), pl.program_id(1)
    # one-row halo: the row above this block (the previous block's last
    # row, DMA'd via a single-row BlockSpec — no shifted copy of the
    # whole feature map in HBM); zeros at the global top edge (SAME pad)
    halo = halo_ref[0].astype(jnp.float32)          # [1, W2, CIN]
    halo = jnp.where(j == 0, jnp.zeros_like(halo), halo)
    xu = jnp.concatenate([halo, x[:-1]], axis=0)    # x[i-1, j]

    zeros_col = jnp.zeros_like(x[:, :1])
    xl = jnp.concatenate([zeros_col, x[:, :-1]], axis=1)     # x[i, j-1]
    xul = jnp.concatenate([jnp.zeros_like(xu[:, :1]), xu[:, :-1]],
                          axis=1)                            # x[i-1, j-1]

    th, w2, cin = x.shape
    flat = lambda a: a.reshape(th * w2, cin)

    def tap(a, k_ref_):
        return jnp.dot(flat(a), k_ref_[...].astype(jnp.float32),
                       preferred_element_type=jnp.float32)

    lp = (tap(x, kx_ref) + tap(xu, kxu_ref) + tap(xl, kxl_ref)
          + tap(xul, kxul_ref))                     # [TH*W2, 4*C]

    m = jnp.max(lp, axis=-1, keepdims=True)
    lshift = lp - m
    e = jnp.exp(lshift)
    seg = seg_ref[...].astype(jnp.float32)          # [4*C, 4]
    z = jnp.dot(e, seg, preferred_element_type=jnp.float32)
    s = jnp.dot(e * lshift, seg, preferred_element_type=jnp.float32)
    neg_entropy_sum = jnp.sum(s / z - jnp.log(z))

    # ``conf = 1 - H/log(C)`` applied as scalars only: Mosaic rejects
    # the broadcasted scalar-minus-reduced-vector relayout.
    log_c = jnp.log(jnp.float32(num_classes))
    pixels = jnp.float32(4 * th * w2)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


def _upsample_kernel(x_ref, xu_ref, xd_ref, ml_ref, m0_ref, mr_ref,
                     seg_ref, out_ref, *, num_classes: int):
    """Bilinear 4x upsample (16 polyphases) + softmax + entropy of a
    low-res logits tile, accumulated as one scalar per grid cell.

    Polyphase weights (tent, positions (j+0.5)/4-0.5): output row
    4i+r draws on rows (i-1, i) for r in {0,1} with weights
    (3/8, 5/8), (1/8, 7/8), and on rows (i, i+1) for r in {2,3} with
    (7/8, 1/8), (5/8, 3/8); columns identically. Edge clamping is
    provided by the caller's edge-replicated shifted copies (rows) and
    in-register clamped shifts (columns), reproducing
    ``jax.image.resize`` exactly.

    The four COLUMN phases of each row-phase tensor are packed into
    one ``[TH*Wl, 4*C]`` tensor by MXU matmuls against scaled
    block-identity matrices, and per-phase softmax statistics come
    from segment-sum matmuls — one exp pass per row-phase at 4C/128
    lane utilization instead of four at C/128 (see _score_kernel)."""
    x = x_ref[0].astype(jnp.float32)      # [TH, Wl, C]
    xu = xu_ref[0].astype(jnp.float32)    # row i-1 (edge-clamped)
    xd = xd_ref[0].astype(jnp.float32)    # row i+1 (edge-clamped)
    i, j = pl.program_id(0), pl.program_id(1)

    rows = (0.375 * xu + 0.625 * x, 0.125 * xu + 0.875 * x,
            0.875 * x + 0.125 * xd, 0.625 * x + 0.375 * xd)

    th, wl, c = x.shape
    flat = lambda a: a.reshape(th * wl, c)
    ml = ml_ref[...].astype(jnp.float32)   # [C, 4*C]
    m0 = m0_ref[...].astype(jnp.float32)
    mr = mr_ref[...].astype(jnp.float32)
    seg = seg_ref[...].astype(jnp.float32)  # [4*C, 4]

    log_c = jnp.log(jnp.float32(num_classes))
    neg_entropy_sum = jnp.float32(0.0)
    for y in rows:
        yl = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)   # col j-1
        yr = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)   # col j+1
        lp = (jnp.dot(flat(yl), ml, preferred_element_type=jnp.float32)
              + jnp.dot(flat(y), m0, preferred_element_type=jnp.float32)
              + jnp.dot(flat(yr), mr,
                        preferred_element_type=jnp.float32))
        m = jnp.max(lp, axis=-1, keepdims=True)
        lshift = lp - m
        e = jnp.exp(lshift)
        z = jnp.dot(e, seg, preferred_element_type=jnp.float32)
        s = jnp.dot(e * lshift, seg, preferred_element_type=jnp.float32)
        neg_entropy_sum = neg_entropy_sum + jnp.sum(s / z - jnp.log(z))
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

    # Column-phase packing matrices [C, 4*C]: scaled identity blocks
    # per phase; phase weights (yl, y, yr) = (3/8,5/8,0), (1/8,7/8,0),
    # (0,7/8,1/8), (0,5/8,3/8).
    eye = jnp.eye(c, dtype=jnp.float32)
    zero = jnp.zeros((c, c), jnp.float32)
    ml = jnp.concatenate([0.375 * eye, 0.125 * eye, zero, zero], axis=-1)
    m0 = jnp.concatenate([0.625 * eye, 0.875 * eye, 0.875 * eye,
                          0.625 * eye], axis=-1)
    mr = jnp.concatenate([zero, zero, 0.125 * eye, 0.375 * eye], axis=-1)
    seg = jnp.repeat(jnp.eye(4, dtype=jnp.float32), c, axis=0)

    spec = pl.BlockSpec((1, tile_h, wl, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((c, 4 * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    partial_sums = pl.pallas_call(
        functools.partial(_upsample_kernel, num_classes=num_classes),
        grid=(n, grid_h),
        in_specs=[spec, spec, spec, mspec, mspec, mspec,
                  pl.BlockSpec((4 * c, 4), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        interpret=interpret,
    )(logits_low, xu, xd, ml, m0, mr, seg)

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
    c = kernel.shape[-1]
    if h2 % tile_h != 0:
        tile_h = h2
    grid_h = h2 // tile_h

    # Per-shift PACKED kernels [CIN, 4*C]: column block p holds this
    # shift's tap for polyphase p (see _score_kernel docstring). Phase
    # order: (even,even), (even,odd), (odd,even), (odd,odd).
    zero = jnp.zeros((cin, c), jnp.float32)
    k = kernel.astype(jnp.float32)
    kx = jnp.concatenate([k[2, 2], k[2, 1], k[1, 2], k[1, 1]], axis=-1)
    kxu = jnp.concatenate([k[0, 2], k[0, 1], zero, zero], axis=-1)
    kxl = jnp.concatenate([k[2, 0], zero, k[1, 0], zero], axis=-1)
    kxul = jnp.concatenate([k[0, 0], zero, zero, zero], axis=-1)
    # phase-indicator for segment sums over the packed class blocks
    seg = jnp.repeat(jnp.eye(4, dtype=jnp.float32), c, axis=0)

    kspec = pl.BlockSpec((cin, 4 * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    partial_sums = pl.pallas_call(
        functools.partial(_score_kernel, num_classes=num_classes),
        grid=(n, grid_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, w2, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # one-row halo block: the row just above this tile (clamped
            # at the top edge; the kernel zeroes it for j == 0)
            pl.BlockSpec((1, 1, w2, cin),
                         lambda i, j: (i, jnp.maximum(j * tile_h - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            kspec, kspec, kspec, kspec,
            pl.BlockSpec((4 * c, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # one shared SMEM block; each grid cell writes its own element
        # (per-cell (1,1) blocks fail Mosaic's (8,128)-divisibility rule)
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        interpret=interpret,
    )(features, features, kx, kxu, kxl, kxul, seg)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(4 * h2 * w2)
