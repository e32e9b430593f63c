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

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



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


# Composed resize2x -> resize4x polyphase row weights: output row
# 8i+t draws on 1/8-res rows (i-1, i, i+1) with these tent weights —
# the exact composition of jax.image.resize's half-pixel-center
# bilinear stages, a[2i] = (y[i-1] + 3 y[i])/4, a[2i+1] =
# (3 y[i] + y[i+1])/4 followed by the 4x tent phases b[4j+r] drawing
# on (a[j-1], a[j]) with (3/8, 5/8), (1/8, 7/8) for r in {0, 1} and on
# (a[j], a[j+1]) with (7/8, 1/8), (5/8, 3/8) for r in {2, 3}.
# Columns use the same triples.
_HEAD8_W = np.array(
    [[14, 18, 0], [10, 22, 0], [7, 24, 1], [5, 24, 3],
     [3, 24, 5], [1, 24, 7], [0, 22, 10], [0, 18, 14]],
    np.float32) / 32.0


def _head8_kernel(x_ref, ru_ref, rd_ref, wcls_ref, bcls_ref,
                  ml_ref, m0_ref, mr_ref, seg_ref, out_ref,
                  *, num_classes: int, mode: str = "entropy"):
    """ICNet head, fully fused: 1x1 classifier (moved in front of the
    resizes — a 1x1 conv commutes with bilinear upsampling, bias
    included since tent weights sum to 1) + composed 8x polyphase
    upsample + softmax + normalized entropy of a 1/8-res feature tile,
    accumulated as one scalar per grid cell. Reads 128-channel bf16
    FEATURES rather than logits, so the lane-padded 1/4-res fp32
    logits never exist in HBM; the row-shifted neighbours come from
    single-row halo BlockSpecs (``ru``/``rd``) whose clipped index
    maps reproduce the resizes' edge clamping, so no shifted copy of
    the feature map exists in HBM either. Column phases are packed
    into one ``[TH*Wl, 8*C]`` tensor by MXU matmuls against scaled
    block-identity matrices, and per-phase softmax statistics come
    from segment-sum matmuls."""
    x = x_ref[0]                           # [TH, Wl, Cf] (bf16)
    ru = ru_ref[0]                         # [1, Wl, Cf] row above tile
    rd = rd_ref[0]                         # [1, Wl, Cf] row below tile
    xu = jnp.concatenate([ru, x[:-1]], axis=0)   # rows i-1 (clamped)
    xd = jnp.concatenate([x[1:], rd], axis=0)    # rows i+1 (clamped)
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32

    th, wl, cf = x.shape
    wcls = wcls_ref[...].astype(x.dtype)   # [Cf, C]
    bcls = bcls_ref[...].astype(f32)       # [1, C]
    cls = lambda a: (jnp.dot(a.reshape(th * wl, cf), wcls,
                             preferred_element_type=f32)
                     + bcls).reshape(th, wl, -1)
    y, yu, yd = cls(x), cls(xu), cls(xd)   # [TH, Wl, C] fp32 logits

    c = y.shape[-1]
    flat = lambda a: a.reshape(th * wl, c)
    ml = ml_ref[...].astype(f32)           # [C, 8*C]
    m0 = m0_ref[...].astype(f32)
    mr = mr_ref[...].astype(f32)
    seg = seg_ref[...].astype(f32)         # [8*C, 8]

    if mode == "predict":
        # ml/m0/mr arrive CLASS-major (column c*8 + col_phase, see
        # ``fused_head8_predict``): each class's 8 column-phase logits
        # are one contiguous lane slice, so the first-max running
        # argmax matches XLA's lowest-index tie-breaking. Row phase t
        # -> full-res row 8r+t; lane layout t*8+p unpacks host-side.
        labs = []
        for t in range(8):
            w = _HEAD8_W[t]
            r = w[0] * yu + w[1] * y + w[2] * yd
            rl = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
            rr = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
            lp = (jnp.dot(flat(rl), ml, preferred_element_type=f32)
                  + jnp.dot(flat(r), m0, preferred_element_type=f32)
                  + jnp.dot(flat(rr), mr, preferred_element_type=f32))
            best = lp[:, 0:8]
            idx = jnp.zeros_like(best, dtype=jnp.int32)
            for cc in range(1, num_classes):
                v = lp[:, 8 * cc:8 * (cc + 1)]
                idx = jnp.where(v > best, cc, idx)
                best = jnp.maximum(v, best)
            labs.append(idx.reshape(th, wl, 8))
        out_ref[0] = jnp.concatenate(labs, axis=-1).astype(jnp.int8)
        return

    log_c = jnp.log(jnp.float32(num_classes))
    neg_entropy_sum = jnp.float32(0.0)
    for t in range(8):
        w = _HEAD8_W[t]
        r = w[0] * yu + w[1] * y + w[2] * yd
        rl = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)   # col j-1
        rr = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)   # col j+1
        lp = (jnp.dot(flat(rl), ml, preferred_element_type=f32)
              + jnp.dot(flat(r), m0, preferred_element_type=f32)
              + jnp.dot(flat(rr), mr, preferred_element_type=f32))
        m = jnp.max(lp, axis=-1, keepdims=True)
        lshift = lp - m
        e = jnp.exp(lshift)
        z = jnp.dot(e, seg, preferred_element_type=f32)
        s = jnp.dot(e * lshift, seg, preferred_element_type=f32)
        neg_entropy_sum = neg_entropy_sum + jnp.sum(s / z - jnp.log(z))
    pixels = jnp.float32(64 * th * wl)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_h", "interpret"))
def fused_head8_entropy_score(features8: jnp.ndarray, wcls: jnp.ndarray,
                              bcls: jnp.ndarray, num_classes: int,
                              tile_h: int = 4,
                              interpret: bool = False) -> jnp.ndarray:
    """Per-image mean entropy-confidence of the full ICNet head —
    ``classifier(resize2x(features8))`` upsampled 4x to full
    resolution, softmaxed and reduced — in one Pallas pass over the
    1/8-resolution 128-channel features (models/icnet.py head; the
    reference scored materialized full-res logits,
    active_learning.py:240-263).

    Exactness: a 1x1 conv commutes with bilinear resizing, and the
    composed 2x-then-4x upsample is the fixed 8-phase tent filter
    ``_HEAD8_W`` over rows/columns (i-1, i, i+1) — including at image
    edges, where the clipped halo-row index maps reproduce both
    resize stages' clamping (verified against the two-stage oracle in
    tests/test_icnet.py).

    :param features8: ``[N, H8, W8, Cf]`` 1/8-res fused features
    :param wcls:      ``[Cf, C]`` classifier kernel (1x1, squeezed)
    :param bcls:      ``[C]`` classifier bias
    :returns: ``[N]`` float32 — identical math to scoring
              ``resize4x(classifier(resize2x(features8)))``
    """
    n, h8, w8, cf = features8.shape
    if h8 % tile_h != 0:
        tile_h = h8
    grid_h = h8 // tile_h
    c = num_classes

    eye = jnp.eye(c, dtype=jnp.float32)
    ml = jnp.concatenate([w[0] * eye for w in _HEAD8_W], axis=-1)
    m0 = jnp.concatenate([w[1] * eye for w in _HEAD8_W], axis=-1)
    mr = jnp.concatenate([w[2] * eye for w in _HEAD8_W], axis=-1)
    seg = jnp.repeat(jnp.eye(8, dtype=jnp.float32), c, axis=0)

    spec = pl.BlockSpec((1, tile_h, w8, cf), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    # single-row halos: the rows just above/below this tile; clipping
    # at the image edges replicates the boundary row, exactly the
    # bilinear resizes' edge clamp
    up_spec = pl.BlockSpec(
        (1, 1, w8, cf),
        lambda i, j: (i, jnp.clip(j * tile_h - 1, 0, h8 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    dn_spec = pl.BlockSpec(
        (1, 1, w8, cf),
        lambda i, j: (i, jnp.clip(j * tile_h + tile_h, 0, h8 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    wcls2 = wcls.reshape(cf, c)
    bcls2 = bcls.reshape(1, c)
    partial_sums = pl.pallas_call(
        functools.partial(_head8_kernel, num_classes=num_classes),
        grid=(n, grid_h),
        in_specs=[spec, up_spec, dn_spec, const(wcls2), const(bcls2),
                  const(ml), const(m0), const(mr), const(seg)],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        interpret=interpret,
    )(features8, features8, features8, wcls2, bcls2, ml, m0, mr, seg)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(64 * h8 * w8)


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_h", "interpret"))
def fused_head8_predict(features8: jnp.ndarray, wcls: jnp.ndarray,
                        bcls: jnp.ndarray, num_classes: int,
                        tile_h: int = 4,
                        interpret: bool = False) -> jnp.ndarray:
    """Per-pixel argmax labels of the full ICNet head — the same
    classifier + composed 8x polyphase upsample as
    :func:`fused_head8_entropy_score` with an in-kernel argmax instead
    of the entropy reduction, so neither the 1/4-res fp32 logits nor
    the full-res lane-padded logits ever exist in HBM (the inference
    CLI's forward; reference inference.py:90-98 materialized full-res
    logits).

    Same inputs as the score variant; returns int8 ``[N, H, W]``
    full-resolution class labels (H = 8*H8). The kernel emits
    ``(row_phase, col_phase)`` lane tiles; a free-for-int8 host-side
    reshape/transpose unpacks them.
    """
    n, h8, w8, cf = features8.shape
    # predict mode keeps the int8 output tile plus the class-major
    # phase-logit sweep live in VREG/vmem stack, so the footprint
    # scales with tile_h*w8: at w8=256 (2048-wide input) tile_h=4
    # measured a 17.4M scoped-vmem stack against the 16M limit and
    # fails to compile — clamp the row tile on wide inputs
    while tile_h > 1 and tile_h * w8 > 512:
        tile_h //= 2
    if h8 % tile_h != 0:
        tile_h = h8
    grid_h = h8 // tile_h
    c = num_classes

    eye = jnp.eye(c, dtype=jnp.float32)
    ml = jnp.concatenate([w[0] * eye for w in _HEAD8_W], axis=-1)
    m0 = jnp.concatenate([w[1] * eye for w in _HEAD8_W], axis=-1)
    mr = jnp.concatenate([w[2] * eye for w in _HEAD8_W], axis=-1)
    # class-major permutation: column c*8+p <- p*C+c, so each class's
    # 8 column-phase logits are one contiguous lane slice for the
    # in-kernel argmax sweep
    perm = (np.arange(8)[None, :] * c
            + np.arange(c)[:, None]).reshape(-1)
    ml, m0, mr = ml[:, perm], m0[:, perm], mr[:, perm]
    seg = jnp.repeat(jnp.eye(8, dtype=jnp.float32), c, axis=0)

    spec = pl.BlockSpec((1, tile_h, w8, cf), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    up_spec = pl.BlockSpec(
        (1, 1, w8, cf),
        lambda i, j: (i, jnp.clip(j * tile_h - 1, 0, h8 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    dn_spec = pl.BlockSpec(
        (1, 1, w8, cf),
        lambda i, j: (i, jnp.clip(j * tile_h + tile_h, 0, h8 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    wcls2 = wcls.reshape(cf, c)
    bcls2 = bcls.reshape(1, c)
    labels8 = pl.pallas_call(
        functools.partial(_head8_kernel, num_classes=num_classes,
                          mode="predict"),
        grid=(n, grid_h),
        in_specs=[spec, up_spec, dn_spec, const(wcls2), const(bcls2),
                  const(ml), const(m0), const(mr), const(seg)],
        out_specs=pl.BlockSpec((1, tile_h, w8, 64),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h8, w8, 64), jnp.int8),
        interpret=interpret,
    )(features8, features8, features8, wcls2, bcls2, ml, m0, mr, seg)

    # lane layout t*8+p -> spatial: labels[., 8r+t, 8q+p]
    return (labels8.reshape(n, h8, w8, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h8 * 8, w8 * 8))


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


# ---------------------------------------------------------------------------
# Fused ENet decoder: Bottleneck5_0 + Bottleneck5_1 + Final + entropy
# ---------------------------------------------------------------------------
#
# The ENet decoder's half-resolution tensors have 4/8/16 channels; on TPU
# their minor dim pads to 128 lanes, so stage 5 + the Final tail were the
# two dominant HBM-traffic items of the scoring forward (measured: ~47 ms
# + ~44 ms of a ~200 ms batch-16 forward at 1024x2048). This kernel keeps
# the ENTIRE decoder below stage 4 in VMEM by computing in a
# space-to-depth ("phase-packed") domain over the quarter-resolution
# grid: a half-res tensor [H2, W2, C] is represented as
# [Hq, Wq, 4*C] with channel p*C + c holding half pixel
# (2i + p//2, 2j + p%2); full-res logits become [Hq, Wq, 16*C]. Every
# convolution is then a small set of shifted MXU matmuls against packed
# block-structured kernels (built in pack_enet_decoder), and no half- or
# full-resolution buffer ever exists in HBM.
#
# Reference semantics reproduced (inference mode, BN folded to affine):
#   Bottleneck5_0 (enet_modules.py:940-1292 / models/blocks.py:169-214):
#     proj 1x1 64->16 +BN+PReLU; deconv 3x3/s2 16->8 +BN+PReLU;
#     exp 1x1 8->16 +BN; residual = unpool(res_conv 1x1 64->16, switches);
#     PReLU(exp + residual).
#   Bottleneck5_1 (blocks.py:66-120): proj 1x1 16->4, conv 3x3 4->4,
#     exp 1x1 4->16 (+BN/PReLU as above), PReLU(exp + input).
#   Final (blocks.py:217-232): deconv 3x3/s2 16->C.
#   Entropy confidence mean (active_learning.py:240-263).
#
# Phase conventions (must stay consistent everywhere):
#   half-over-quarter phase p = 2a + b places at (2i+a, 2j+b) — the same
#   row-major order as ops/nn.py pooling switches;
#   full-over-quarter phase pf = (2a+u)*4 + (2b+v) where (a, b) is the
#   half-res phase and (u, v) the Final deconv polyphase.
#
# Transpose-conv polyphase taps (same decomposition as _score_kernel,
# verified against lax.conv_transpose):
#   out[2i  ,2j  ] = K[2,2]x[i,j] + K[0,2]x[i-1,j]
#                  + K[2,0]x[i,j-1] + K[0,0]x[i-1,j-1]
#   out[2i  ,2j+1] = K[2,1]x[i,j] + K[0,1]x[i-1,j]
#   out[2i+1,2j  ] = K[1,2]x[i,j] + K[1,0]x[i,j-1]
#   out[2i+1,2j+1] = K[1,1]x[i,j]


def _fold_bn(kernel, bn_params, bn_stats, eps=1e-3):
    """Fold inference BatchNorm (momentum-tracked stats, eps 1e-3 like
    blocks._batch_norm) into the preceding conv: returns (kernel*s, t)
    with s = gamma/sqrt(var+eps), t = beta - mean*s."""
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return kernel * s, bn_params["bias"] - bn_stats["mean"] * s


def pack_enet_decoder(variables, num_classes: int):
    """Fold BN and build the phase-packed matmul kernels for
    :func:`fused_decoder_entropy_score` from an ENet variables pytree.

    All outputs are float32; shapes for ENet's fixed decoder widths
    (64 -> 16 -> 8 -> 16 -> 4 -> 16 -> C)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    b50, s50 = p["Bottleneck5_0"], bs["Bottleneck5_0"]
    b51, s51 = p["Bottleneck5_1"], bs["Bottleneck5_1"]

    f32 = lambda a: a.astype(jnp.float32)

    # --- Bottleneck5_0 ---
    wp, bp = _fold_bn(f32(b50["proj_conv"]["kernel"][0, 0]),
                      b50["proj_bn"], s50["proj_bn"])      # [64,16],[16]
    ap = f32(b50["proj_prelu"]["alpha"])
    kd, bd8 = _fold_bn(f32(b50["deconv"]["kernel"]),
                       b50["conv_bn"], s50["conv_bn"])     # [3,3,16,8]
    ad8 = f32(b50["conv_prelu"]["alpha"])
    we8, be16 = _fold_bn(f32(b50["exp_conv"]["kernel"][0, 0]),
                         b50["exp_bn"], s50["exp_bn"])     # [8,16],[16]
    wr = f32(b50["res_conv"]["kernel"][0, 0])              # [64,16]
    ar16 = f32(b50["res_prelu"]["alpha"])

    zero8 = jnp.zeros_like(kd[0, 0])
    # packed deconv kernels, phase order (0,0),(0,1),(1,0),(1,1);
    # stack order: [x, x_up, x_left, x_upleft]
    kd_stack = jnp.stack([
        jnp.concatenate([kd[2, 2], kd[2, 1], kd[1, 2], kd[1, 1]], -1),
        jnp.concatenate([kd[0, 2], kd[0, 1], zero8, zero8], -1),
        jnp.concatenate([kd[2, 0], zero8, kd[1, 0], zero8], -1),
        jnp.concatenate([kd[0, 0], zero8, zero8, zero8], -1)])
    tile4 = lambda v: jnp.concatenate([v] * 4)
    eye4 = np.eye(4, dtype=np.float32)
    blkdiag4 = lambda w: jnp.kron(eye4, w)

    # --- Bottleneck5_1 ---
    wq1, bq1_4 = _fold_bn(f32(b51["proj_conv"]["kernel"][0, 0]),
                          b51["proj_bn"], s51["proj_bn"])  # [16,4],[4]
    aq1_4 = f32(b51["proj_prelu"]["alpha"])
    w1, bc1_4 = _fold_bn(f32(b51["conv"]["kernel"]),
                         b51["conv_bn"], s51["conv_bn"])   # [3,3,4,4]
    ac1_4 = f32(b51["conv_prelu"]["alpha"])
    we1_4, be1_16 = _fold_bn(f32(b51["exp_conv"]["kernel"][0, 0]),
                             b51["exp_bn"], s51["exp_bn"])  # [4,16],[16]
    a51_16 = f32(b51["res_prelu"]["alpha"])

    # 5_1 conv 3x3 at half-res as 9 quarter-shift packed kernels: output
    # phase (a,b) at quarter (i,j) draws input phase (pa,pb) at quarter
    # (i+di, j+dj) with tap W[1+dy,1+dx] iff dy = 2di+pa-a in {-1,0,1}
    # (and likewise dx).
    m_stack = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            m = jnp.zeros((16, 16), jnp.float32)
            for a in (0, 1):
                for pa in (0, 1):
                    dy = 2 * di + pa - a
                    if dy not in (-1, 0, 1):
                        continue
                    for b in (0, 1):
                        for pb in (0, 1):
                            dx = 2 * dj + pb - b
                            if dx not in (-1, 0, 1):
                                continue
                            sel = np.zeros((4, 4), np.float32)
                            sel[2 * pa + pb, 2 * a + b] = 1.0
                            m = m + jnp.kron(sel, w1[1 + dy, 1 + dx])
            m_stack.append(m)
    m_stack = jnp.stack(m_stack)                           # [9,16,16]

    # --- Final: half->full deconv into 16 full phases ---
    kf = f32(p["Final"]["deconv"]["kernel"])               # [3,3,16,C]
    c = num_classes

    def row_taps(u, a, di, pa):
        """Kernel row indices tapped by full row phase (a,u) from input
        half phase-row pa at quarter shift di (empty if none)."""
        taps = []
        if u == 0:
            if di == 0 and pa == a:
                taps.append(2)                   # h[y] tap K[2,*]
            if (a == 0 and di == -1 and pa == 1) or \
               (a == 1 and di == 0 and pa == 0):
                taps.append(0)                   # h[y-1] tap K[0,*]
        else:
            if di == 0 and pa == a:
                taps.append(1)                   # h[y] tap K[1,*]
        return taps

    f_stack = []
    for di in (0, -1):
        for dj in (0, -1):
            fm = jnp.zeros((64, 16 * c), jnp.float32)
            for a in (0, 1):
                for u in (0, 1):
                    for pa in (0, 1):
                        rks = row_taps(u, a, di, pa)
                        for b in (0, 1):
                            for v in (0, 1):
                                for pb in (0, 1):
                                    cks = row_taps(v, b, dj, pb)
                                    for rk in rks:
                                        for ck in cks:
                                            sel = np.zeros((4, 16),
                                                           np.float32)
                                            pf = (2 * a + u) * 4 \
                                                + (2 * b + v)
                                            sel[2 * pa + pb, pf] = 1.0
                                            fm = fm + jnp.kron(
                                                sel, kf[rk, ck])
            f_stack.append(fm)
    f_stack = jnp.stack(f_stack)                 # [4,64,16C] [x,l,u,ul]
    seg = jnp.kron(jnp.eye(16, dtype=jnp.float32),
                   jnp.ones((c, 1), jnp.float32))          # [16C,16]

    row = lambda v: v[None, :]
    return dict(
        wp=wp, bp=row(bp), ap=row(ap),
        kd=kd_stack, bd=row(tile4(bd8)), ad=row(tile4(ad8)),
        we=blkdiag4(we8), be=row(tile4(be16)),
        wr=wr, ar=row(tile4(ar16)),
        wq1=blkdiag4(wq1), bq1=row(tile4(bq1_4)), aq1=row(tile4(aq1_4)),
        m=m_stack, bc1=row(tile4(bc1_4)), ac1=row(tile4(ac1_4)),
        we1=blkdiag4(we1_4), be1=row(tile4(be1_16)), a51=row(tile4(a51_16)),
        f=f_stack, seg=seg)


def _decoder_kernel(f_ref, fu2_ref, fu1_ref, fd1_ref,
                    m_ref, mu1_ref, md1_ref,
                    wp_ref, bp_ref, ap_ref, kd_ref, bd_ref, ad_ref,
                    we_ref, be_ref, wr_ref, ar_ref,
                    wq1_ref, bq1_ref, aq1_ref, m9_ref, bc1_ref, ac1_ref,
                    we1_ref, be1_ref, a51_ref, f4_ref, seg_ref,
                    out_ref, *, num_classes: int, tile_q: int, hq: int):
    """See module comment above for the math; all compute is fp32 in
    VMEM on phase-packed tensors over the quarter grid."""
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32
    i0 = j * tile_q

    def prelu(x, a_ref):
        a = a_ref[...].astype(f32)
        return jnp.where(x >= 0, x, a * x)

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(f32),
                       preferred_element_type=f32)

    # quarter rows [i0-2 .. i1+1]; halo refs carry clamped row indices,
    # out-of-range rows are re-zeroed by validity masks below
    f = jnp.concatenate([fu2_ref[0], fu1_ref[0], f_ref[0], fd1_ref[0]],
                        axis=0).astype(f32)          # [TQ+3, Wq, 64]
    tq3, wq, _ = f.shape
    flat = lambda a: a.reshape(a.shape[0] * wq, a.shape[2])
    unflat = lambda a, r: a.reshape(r, wq, a.shape[-1])

    def valid_rows(x3d, first_q):
        rows = jax.lax.broadcasted_iota(jnp.int32,
                                        (x3d.shape[0], 1, 1), 0) + \
            (i0 + first_q)
        return jnp.where((rows >= 0) & (rows < hq), x3d, 0.0)

    def shift_l(a):  # value at col j-1, zeros shifted in
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]],
                               axis=1)

    def shift_r(a):  # value at col j+1
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])],
                               axis=1)

    # Bottleneck5_0 proj (the deconv's SAME padding drops taps whose
    # input row is out of range == zeroing proj at invalid rows)
    p_all = prelu(mm(flat(f), wp_ref[...]) + bp_ref[...], ap_ref)
    p_all = valid_rows(unflat(p_all, tq3), -2)       # [TQ+3, Wq, 16]

    # deconv -> phase-packed half-res, rows [i0-1 .. i1+1]
    x, xu = p_all[1:], p_all[:-1]
    kd = kd_ref
    d = (mm(flat(x), kd[0]) + mm(flat(xu), kd[1])
         + mm(flat(shift_l(x)), kd[2]) + mm(flat(shift_l(xu)), kd[3]))
    d = prelu(d + bd_ref[...], ad_ref)               # [R0*Wq, 32]
    e = mm(d, we_ref[...]) + be_ref[...]             # [R0*Wq, 64]

    # unpool residual: res_conv broadcast over phases * one-hot switches
    r4 = mm(flat(f[1:]), wr_ref[...])                # [R0*Wq, 16]
    msk = jnp.concatenate([mu1_ref[0], m_ref[0], md1_ref[0]],
                          axis=0).astype(f32)        # [R0, Wq, 64]
    r = jnp.concatenate([r4] * 4, axis=-1) * flat(msk)
    r0 = tq3 - 1
    h50 = prelu(e + r, ar_ref)
    h50 = valid_rows(unflat(h50, r0), -1)            # [R0, Wq, 64]

    # Bottleneck5_1: proj, then 3x3-at-half-res as 9 packed matmuls over
    # quarter shifts; output rows [i0-1 .. i1]
    q1 = prelu(mm(flat(h50), wq1_ref[...]) + bq1_ref[...], aq1_ref)
    q1 = valid_rows(unflat(q1, r0), -1)
    q1x = q1[:-1]                                    # rows i0-1 .. i1
    q1u = jnp.concatenate([jnp.zeros_like(q1[:1]), q1[:-2]], axis=0)
    q1d = q1[1:]
    m9 = m9_ref
    acc = None
    for ri, rv in enumerate((q1u, q1x, q1d)):        # di = -1, 0, +1
        for ci, cv in enumerate((shift_l(rv), rv, shift_r(rv))):
            t = mm(flat(cv), m9[ri * 3 + ci])
            acc = t if acc is None else acc + t
    cmid = prelu(acc + bc1_ref[...], ac1_ref)        # [R1*Wq, 16]
    e1 = mm(cmid, we1_ref[...]) + be1_ref[...]       # [R1*Wq, 64]
    h51 = prelu(e1 + flat(h50[:-1]), a51_ref)
    h51 = valid_rows(unflat(h51, r0 - 1), -1)        # [R1, Wq, 64]

    # Final deconv into 16 full phases + entropy; output quarter rows
    # [i0 .. i1]. Packed f4_ref order: [x, left, up, upleft].
    hx, hu = h51[1:], h51[:-1]
    f4k = f4_ref
    lp = (mm(flat(hx), f4k[0]) + mm(flat(shift_l(hx)), f4k[1])
          + mm(flat(hu), f4k[2]) + mm(flat(shift_l(hu)), f4k[3]))

    mrow = jnp.max(lp, axis=-1, keepdims=True)
    lshift = lp - mrow
    ex = jnp.exp(lshift)
    seg = seg_ref[...].astype(f32)
    z = jnp.dot(ex, seg, preferred_element_type=f32)
    s = jnp.dot(ex * lshift, seg, preferred_element_type=f32)
    neg_entropy_sum = jnp.sum(s / z - jnp.log(z))

    log_c = jnp.log(jnp.float32(num_classes))
    pixels = jnp.float32(16 * tile_q * wq)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_q", "interpret"))
def fused_decoder_entropy_score(f4: jnp.ndarray, switches, packed: dict,
                                num_classes: int, tile_q: int = 16,
                                interpret: bool = False,
                                mask=None) -> jnp.ndarray:
    """Per-image mean entropy-confidence from stage-4 features: the whole
    ENet decoder (Bottleneck5_0 + 5_1 + Final) fused with the entropy
    reduction in one Pallas kernel (see module comment).

    :param f4:       ``[N, Hq, Wq, 64]`` stage-4 output (quarter res)
    :param switches: ``[N, Hq, Wq*C2]`` int8 pool switches from
                     Bottleneck1_0 (ops/nn.py storage layout), or None
                     when ``mask`` is given
    :param packed:   :func:`pack_enet_decoder` output
    :param mask:     optional pre-expanded one-hot switch mask
                     ``[N,Hq,Wq,4*C2]`` in phase-packed layout (e.g.
                     from :func:`fused_front_stage1`) — skips the
                     switch expansion pass
    :returns: ``[N]`` float32 — same math as running Bottleneck5_0/5_1 +
              Final then ``acquisition.mean_confidence(..., "entropy")``
    """
    n, hq, wq, _cin = f4.shape
    if tile_q < 2 or hq % tile_q != 0:
        tile_q = hq
    grid_h = hq // tile_q

    if mask is not None:
        msk = mask
        c2 = msk.shape[-1] // 4
    else:
        # one-hot switches in phase-packed layout [N,Hq,Wq,4*C2]
        c2 = switches.shape[-1] // wq
        sw = switches.reshape(n, hq, wq, c2)
        msk = jax.nn.one_hot(sw, 4, axis=3, dtype=f4.dtype)
        msk = msk.reshape(n, hq, wq, 4 * c2)

    tile_spec = pl.BlockSpec((1, tile_q, wq, f4.shape[-1]),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)

    def row_spec(ch, offs):
        return pl.BlockSpec(
            (1, 1, wq, ch),
            lambda i, j, offs=offs: (
                i, jnp.clip(j * tile_q + offs, 0, hq - 1), 0, 0),
            memory_space=pltpu.VMEM)

    msk_tile_spec = pl.BlockSpec((1, tile_q, wq, 4 * c2),
                                 lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    consts = [packed[k] for k in
              ("wp", "bp", "ap", "kd", "bd", "ad", "we", "be", "wr",
               "ar", "wq1", "bq1", "aq1", "m", "bc1", "ac1", "we1",
               "be1", "a51", "f", "seg")]

    partial_sums = pl.pallas_call(
        functools.partial(_decoder_kernel, num_classes=num_classes,
                          tile_q=tile_q, hq=hq),
        grid=(n, grid_h),
        in_specs=[
            tile_spec,
            row_spec(f4.shape[-1], -2), row_spec(f4.shape[-1], -1),
            row_spec(f4.shape[-1], tile_q),
            msk_tile_spec,
            row_spec(4 * c2, -1), row_spec(4 * c2, tile_q),
        ] + [const_spec(a) for a in consts],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        # fp32 working set exceeds the 16M default scoped-vmem budget
        # for tile_q > 4
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(f4, f4, f4, f4, msk, msk, msk, *consts)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(16 * hq * wq)


# ---------------------------------------------------------------------------
# Fused ENet front end: Initial + Bottleneck1_0 + stage-1 bottlenecks
# ---------------------------------------------------------------------------
#
# The counterpart of the fused decoder for the top of the scoring
# forward (measured: Initial ~33 ms + stage 1 ~36 ms of a ~153 ms
# batch-16 compute at 1024x2048, dominated by conv-layout round trips of
# the 3/8/13/16-channel full/half-res tensors). The image is packed
# space-to-depth(4) once in XLA ([N,H,W,3] -> [N,Hq,Wq,48] + the 2x2
# maxpool phases [N,Hq,Wq,12]); the kernel then computes, per
# quarter-row tile entirely in VMEM:
#
#   Initial   conv 3x3/s2 3->13 as 4 shifted matmuls against packed
#             [60,64] kernels (half-res output phase-packed over the
#             quarter grid, pool phases placed by the same matmul),
#             + BN + PReLU                     (blocks.py:46-63)
#   B1_0      2x2/s2 proj == pure phase-mixing 1x1 matmul [64->8];
#             3x3 conv (9 taps); 1x1 expand; residual = phase-max pool
#             with FIRST-max one-hot switches (via selector matmuls);
#             channel zero-pad                  (blocks.py:123-166)
#   1_1..1_4  four plain bottlenecks (1x1 proj, 3x3 conv, 1x1 expand,
#             residual add), 3x3s as 9-tap matmuls  (blocks.py:66-120)
#
# Outputs: the stage-1 features [N,Hq,Wq,64] (normal channel layout —
# stage 2 onward runs unchanged in XLA) and the pool-switch one-hot mask
# [N,Hq,Wq,4*16] in the decoder kernel's phase-packed layout, so the
# whole scoring path needs no switch storage at all.
#
# Halo strategy: neighbouring row-tiles are DMA'd whole (3x read
# amplification of the compact packed image, ~0.6 GB/batch-16) and the
# kernel slices the 11 halo rows it needs; each conv stage shrinks the
# valid row extent by one until exactly the tile's rows remain.
# Out-of-range rows are re-zeroed after every affine+PReLU so SAME
# zero-padding semantics hold at the image edges.
#
# NB the strided SAME convs are asymmetric: for kernel 3 stride 2 XLA
# pads (0,1), so output y taps input rows 2y..2y+2 — shifts go DOWN /
# RIGHT (unlike the stride-1 convs' symmetric -1..1 taps).


def pack_enet_front(variables):
    """Fold BN and build packed kernels for
    :func:`fused_front_stage1` from an ENet variables pytree."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda v: v[None, :]

    # --- Initial: BN spans concat(conv13, pool3) ---
    ini, sini = p["Initial"], bs["Initial"]
    s16 = f32(ini["bn"]["scale"]) / jnp.sqrt(f32(sini["bn"]["var"]) + 1e-3)
    t16 = f32(ini["bn"]["bias"]) - f32(sini["bn"]["mean"]) * s16
    a16 = f32(ini["prelu"]["alpha"])
    w3 = f32(ini["conv"]["kernel"]) * s16[:13]             # [3,3,3,13]

    k4 = [jnp.zeros((60, 64), jnp.float32) for _ in range(4)]
    for a in (0, 1):
        for b in (0, 1):
            col0 = (2 * a + b) * 16
            for dy in range(3):
                di, ry = divmod(2 * a + dy, 4)
                for dx in range(3):
                    dj, rx = divmod(2 * b + dx, 4)
                    idx = di * 2 + dj       # [x, right, down, downright]
                    r0 = ry * 12 + rx * 3
                    k4[idx] = k4[idx].at[r0:r0 + 3,
                                         col0:col0 + 13].add(w3[dy, dx])
    # pool phases: placed (and BN-scaled) by the unshifted matmul
    for ph in range(4):
        for c in range(3):
            k4[0] = k4[0].at[48 + ph * 3 + c,
                             ph * 16 + 13 + c].add(s16[13 + c])
    k4 = jnp.stack(k4)                                     # [4,60,64]
    tile4 = lambda v: jnp.concatenate([v] * 4)

    # --- Bottleneck1_0 ---
    b10, s10 = p["Bottleneck1_0"], bs["Bottleneck1_0"]
    wp2, bp8 = _fold_bn(f32(b10["proj_conv"]["kernel"]),
                        b10["proj_bn"], s10["proj_bn"])    # [2,2,16,8]
    # 2x2/s2 conv on the half grid == phase-mixing 1x1 on packed layout
    wp10 = jnp.concatenate(
        [wp2[a, b] for a in (0, 1) for b in (0, 1)], axis=0)  # [64,8]
    ap10 = f32(b10["proj_prelu"]["alpha"])
    wc3, bc8 = _fold_bn(f32(b10["conv"]["kernel"]),
                        b10["conv_bn"], s10["conv_bn"])    # [3,3,8,8]
    wc10 = jnp.stack([wc3[r, c] for r in range(3) for c in range(3)])
    ac10 = f32(b10["conv_prelu"]["alpha"])
    we10, be64 = _fold_bn(f32(b10["exp_conv"]["kernel"][0, 0]),
                          b10["exp_bn"], s10["exp_bn"])    # [8,64]
    ar10 = f32(b10["res_prelu"]["alpha"])

    # --- stage-1 bottlenecks ---
    wp_s, bp_s, ap_s = [], [], []
    wc_s, bc_s, ac_s = [], [], []
    we_s, be_s, ar_s = [], [], []
    for k in range(1, 5):
        blk, sblk = p[f"Bottleneck1_{k}"], bs[f"Bottleneck1_{k}"]
        wp, bp = _fold_bn(f32(blk["proj_conv"]["kernel"][0, 0]),
                          blk["proj_bn"], sblk["proj_bn"])
        wc, bc = _fold_bn(f32(blk["conv"]["kernel"]),
                          blk["conv_bn"], sblk["conv_bn"])
        we, be = _fold_bn(f32(blk["exp_conv"]["kernel"][0, 0]),
                          blk["exp_bn"], sblk["exp_bn"])
        wp_s.append(wp)
        bp_s.append(row(bp))
        ap_s.append(row(f32(blk["proj_prelu"]["alpha"])))
        wc_s.extend(wc[r, c] for r in range(3) for c in range(3))
        bc_s.append(row(bc))
        ac_s.append(row(f32(blk["conv_prelu"]["alpha"])))
        we_s.append(we)
        be_s.append(row(be))
        ar_s.append(row(f32(blk["res_prelu"]["alpha"])))

    # phase selectors (constants): sel[p] extracts phase p's 16 channels,
    # selt[p] places 16 channels back into phase p's block
    sel = np.zeros((4, 64, 16), np.float32)
    for ph in range(4):
        for c in range(16):
            sel[ph, ph * 16 + c, c] = 1.0
    selt = np.transpose(sel, (0, 2, 1)).copy()

    return dict(
        k4=k4, bin=row(tile4(t16)), ain=row(tile4(a16)),
        wp10=wp10, bp10=row(bp8), ap10=row(ap10),
        wc10=wc10, bc10=row(bc8), ac10=row(ac10),
        we10=we10, be10=row(be64), ar10=row(ar10),
        wp_s=jnp.stack(wp_s), bp_s=jnp.stack(bp_s),
        ap_s=jnp.stack(ap_s), wc_s=jnp.stack(wc_s),
        bc_s=jnp.stack(bc_s), ac_s=jnp.stack(ac_s),
        we_s=jnp.stack(we_s), be_s=jnp.stack(be_s),
        ar_s=jnp.stack(ar_s),
        sel=jnp.asarray(sel), selt=jnp.asarray(selt))


def _front_kernel(prev_ref, cur_ref, next_ref,
                  k4_ref, bin_ref, ain_ref,
                  wp10_ref, bp10_ref, ap10_ref, wc10_ref, bc10_ref,
                  ac10_ref, we10_ref, be10_ref, ar10_ref,
                  wp_s_ref, bp_s_ref, ap_s_ref, wc_s_ref, bc_s_ref,
                  ac_s_ref, we_s_ref, be_s_ref, ar_s_ref,
                  sel_ref, selt_ref,
                  out_x1_ref, out_mask_ref, scr_h, scr_a, scr_b,
                  *, tile_q: int, hq: int):
    """Row-segment front-end kernel. Each stage's result round-trips
    through a VMEM scratch plane so only ONE stage's temporaries are
    ever live in vector registers (a value-chained fp32 formulation
    measured ~54ms — spill-bound; see the mid-section kernels for the
    idiom), and matmuls run in the input dtype (bf16 on TPU). Stage
    extents shrink by one row per 3x3 conv from the initial
    [-5 .. seg+5) packed-image halo down to exactly the segment."""
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32
    seg = tile_q
    i0 = j * seg
    dt = scr_h.dtype

    def prelu(v, a):
        zero = jnp.zeros((), v.dtype)
        return (jnp.maximum(v, zero)
                + a.astype(v.dtype) * jnp.minimum(v, zero))

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    wq = cur_ref.shape[2]
    flat = lambda a: a.reshape(a.shape[0] * wq, a.shape[2])
    unflat = lambda a, r: a.reshape(r, wq, a.shape[-1])

    def vrows(x3d, first):
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (x3d.shape[0], 1, 1), 0) + (i0 + first)
        return jnp.where((rows >= 0) & (rows < hq), x3d,
                         jnp.zeros((), x3d.dtype))

    def shift_l(a):
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]],
                               axis=1)

    def shift_r(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])],
                               axis=1)

    # --- Initial ---  packed rows rel [-5..seg+5]; out-of-range rows
    # zeroed (clamped neighbour blocks hold copies, but the strided SAME
    # conv's down-taps at the true bottom edge must read zero padding)
    cat = jnp.concatenate([prev_ref[0], cur_ref[0], next_ref[0]],
                          axis=0)                # rows rel [-seg..2seg)
    img = vrows(cat[seg - 5:2 * seg + 6], -5).astype(dt)
    x0, xd = img[:-1], img[1:]               # rel [-5..seg+4] / +1 down
    h0 = (mm(flat(x0), k4_ref[0]) + mm(flat(shift_r(x0)), k4_ref[1])
          + mm(flat(xd), k4_ref[2]) + mm(flat(shift_r(xd)), k4_ref[3]))
    h0 = prelu(h0 + bin_ref[...].astype(f32), ain_ref[...])
    n_h = seg + 10
    scr_h[0:n_h] = vrows(unflat(h0.astype(dt), n_h), -5)

    # --- Bottleneck1_0 ---  output rows rel [-4..seg+3]
    hh = scr_h[0:n_h]
    p10 = prelu(mm(flat(hh), wp10_ref[...]) + bp10_ref[...].astype(f32),
                ap10_ref[...])
    p10 = vrows(unflat(p10.astype(dt), n_h), -5)
    acc = None
    for ri, rv in enumerate((p10[:-2], p10[1:-1], p10[2:])):
        for ci, cv in enumerate((shift_l(rv), rv, shift_r(rv))):
            t = mm(flat(cv), wc10_ref[ri * 3 + ci])
            acc = t if acc is None else acc + t
    c10 = prelu(acc + bc10_ref[...].astype(f32), ac10_ref[...])
    e10 = mm(c10.astype(dt), we10_ref[...]) + be10_ref[...].astype(f32)

    # phase-max pool, then first-max one-hot switches: phase ph claims
    # a pixel iff it hits the max and no earlier phase did (tf.argmax
    # tie-break). Selector matmuls are recomputed per pass so at most
    # two phase planes are ever live (vreg-pressure, see mid kernels).
    hh1 = flat(scr_h[1:n_h - 1])             # rel [-4..seg+3]
    pooled = mm(hh1, sel_ref[0])
    for ph in range(1, 4):
        pooled = jnp.maximum(mm(hh1, sel_ref[ph]), pooled)
    claimed = None
    msk = None
    for ph in range(4):
        xpp = mm(hh1, sel_ref[ph])
        eq = jnp.where(xpp >= pooled, 1.0, 0.0)
        own = eq if claimed is None else eq * (1.0 - claimed)
        claimed = eq if claimed is None else claimed + own
        t = mm(own.astype(dt), selt_ref[ph])
        msk = t if msk is None else msk + t
    n_a = seg + 8
    res64 = mm(pooled.astype(dt), selt_ref[0])
    x1 = prelu(e10 + res64, ar10_ref[...])
    scr_a[0:n_a] = vrows(unflat(x1.astype(dt), n_a), -4)
    out_mask_ref[0] = unflat(msk.astype(dt), n_a)[4:4 + seg] \
        .astype(out_mask_ref.dtype)

    # --- stage-1 bottlenecks ---  extent shrinks by 1 row per block
    src, other = scr_a, scr_b
    for k in range(4):
        n_in = n_a - 2 * k
        cur = src[0:n_in]
        pj = prelu(mm(flat(cur), wp_s_ref[k])
                   + bp_s_ref[k].astype(f32), ap_s_ref[k])
        pj = vrows(unflat(pj.astype(dt), n_in), -4 + k)
        acc = None
        for ri, rv in enumerate((pj[:-2], pj[1:-1], pj[2:])):
            for ci, cv in enumerate((shift_l(rv), rv, shift_r(rv))):
                t = mm(flat(cv), wc_s_ref[k * 9 + ri * 3 + ci])
                acc = t if acc is None else acc + t
        ck = prelu(acc + bc_s_ref[k].astype(f32), ac_s_ref[k])
        ek = mm(ck.astype(dt), we_s_ref[k]) + be_s_ref[k].astype(f32)
        nxt = prelu(flat(cur[1:-1]).astype(f32) + ek, ar_s_ref[k])
        nxt = vrows(unflat(nxt.astype(dt), n_in - 2), -3 + k)
        if k == 3:
            out_x1_ref[0] = nxt.astype(out_x1_ref.dtype)
        else:
            other[0:n_in - 2] = nxt
            src, other = other, src


@functools.partial(jax.jit,
                   static_argnames=("tile_q", "interpret", "out_dtype"))
def fused_front_stage1(image: jnp.ndarray, packed: dict,
                       tile_q: int = 16, interpret: bool = False,
                       out_dtype=jnp.bfloat16):
    """Image -> (stage-1 features, pool-switch one-hot mask), fused.

    :param image: ``[N, H, W, 3]`` (H, W divisible by 8)
    :param packed: :func:`pack_enet_front` output
    :param tile_q: quarter-res rows per grid segment
    :returns: ``(x1 [N,Hq,Wq,64] out_dtype, mask [N,Hq,Wq,64]
              out_dtype)`` — x1 in normal channel layout for stage 2+,
              mask in the decoder kernel's phase-packed layout
    """
    n, h, w, _ = image.shape
    hq, wq = h // 4, w // 4
    if tile_q < 6 or hq % tile_q != 0:
        tile_q = hq
    grid_h = hq // tile_q

    x = image.astype(out_dtype)
    r = x.reshape(n, hq, 4, wq, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    img48 = r.reshape(n, hq, wq, 48)
    pl12 = r.reshape(n, hq, wq, 2, 2, 2, 2, 3).max(axis=(4, 6))
    packed60 = jnp.concatenate([img48, pl12.reshape(n, hq, wq, 12)],
                               axis=-1)

    def tile_at(offs):
        return pl.BlockSpec(
            (1, tile_q, wq, 60),
            lambda i, j, offs=offs: (
                i, jnp.clip(j + offs, 0, grid_h - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    consts = [packed[k] for k in
              ("k4", "bin", "ain", "wp10", "bp10", "ap10", "wc10",
               "bc10", "ac10", "we10", "be10", "ar10", "wp_s", "bp_s",
               "ap_s", "wc_s", "bc_s", "ac_s", "we_s", "be_s", "ar_s",
               "sel", "selt")]

    out_spec = pl.BlockSpec((1, tile_q, wq, 64), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    x1, mask = pl.pallas_call(
        functools.partial(_front_kernel, tile_q=tile_q, hq=hq),
        grid=(n, grid_h),
        in_specs=[tile_at(-1), tile_at(0), tile_at(1)]
        + [const_spec(a) for a in consts],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, hq, wq, 64), out_dtype),
                   jax.ShapeDtypeStruct((n, hq, wq, 64), out_dtype)],
        scratch_shapes=[pltpu.VMEM((tile_q + 11, wq, 64), out_dtype),
                        pltpu.VMEM((tile_q + 8, wq, 64), out_dtype),
                        pltpu.VMEM((tile_q + 8, wq, 64), out_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(packed60, packed60, packed60, *consts)
    return x1, mask


# ---------------------------------------------------------------------------
# W-packed ENet front end (v2): Initial + Bottleneck1_0 + stage 1
# ---------------------------------------------------------------------------
#
# The v1 front kernel above is VPU-bound, not MXU- or HBM-bound
# (measured ~53 ms of a ~79 ms batch-16 scoring step): its 8/16-channel
# working planes occupy only 8/16 of the 128 vector lanes, so every
# column-shift copy, PReLU, residual add and scratch round-trip pays an
# 8x lane-padding tax, and its matmuls run at K=8..64.
#
# This version additionally packs WPACK (default 8) quarter-resolution
# COLUMNS into the lane dimension — space-to-depth along W only — with
# channel layout (col_phase, channel). Consequences:
#   * 16-channel planes become 128-lane planes: lane-full VPU ops;
#   * matmul K/N dims multiply by WPACK (16 -> 128): MXU-shaped;
#   * a conv's column taps become phase-mixing INSIDE the packed
#     matmul kernels; only the packed-column +-1 shifts remain as
#     in-register copies (2 per conv, hoisted over the 3 row taps,
#     on lane-full data);
#   * because the layout is (col_phase major, channel minor), packing
#     and unpacking are free row-major reshapes in XLA:
#     [N,Hq,Wq,C] == [N,Hq,Wq/P,P*C].
#
# The tap lifting: a conv tap at column shift dx maps output packed
# column J, phase b to input (J + dj, pb) with  b + dx = P*dj + pb, so
# each per-shift tap matrix [cin, cout] lands in block (pb, b) of the
# lifted kernel L_dj [P*cin, P*cout] (``_wpack_taps``).
#
# Stage structure, extents and pool-switch semantics are identical to
# the v1 kernel (same reference blocks, blocks.py:46-166 and 66-120);
# compute walks row chunks (``rc`` quarter-rows) like the mid-section
# kernels so vector-register pressure stays bounded.


def _wpack_taps(taps_by_dx, wpack: int):
    """Lift per-column-shift taps ``{dx: [cin, cout]}`` to W-packed
    matmul kernels ``{dj: [P*cin, P*cout]}`` (see section comment)."""
    out = {}
    for dx, w in taps_by_dx.items():
        sels = {}
        for b in range(wpack):
            dj, pb = divmod(b + dx, wpack)
            sels.setdefault(dj, np.zeros((wpack, wpack),
                                         np.float32))[pb, b] = 1.0
        for dj, s in sels.items():
            t = jnp.kron(jnp.asarray(s), w)
            out[dj] = out[dj] + t if dj in out else t
    return out


def _wpack_conv3(kernel, wpack: int):
    """3x3 (stride 1, SAME) conv -> stacked lifted kernels
    ``[9, P*cin, P*cout]`` ordered (dy, dj) row-major, dj in
    (-1, 0, 1) reading the (shift_l, unshifted, shift_r) operand."""
    ks = []
    for dy in range(3):
        lifted = _wpack_taps({-1: kernel[dy, 0], 0: kernel[dy, 1],
                              1: kernel[dy, 2]}, wpack)
        zero = jnp.zeros_like(lifted[0])
        ks.extend(lifted.get(dj, zero) for dj in (-1, 0, 1))
    return jnp.stack(ks)


def _wpack_blkdiag(w, wpack: int):
    """1x1 conv lifted to the packed layout: block-diagonal."""
    return jnp.kron(np.eye(wpack, dtype=np.float32), w)


def _wpack_tile(v, wpack: int):
    """Per-channel bias/alpha vector tiled across the column phases."""
    return jnp.concatenate([v] * wpack)


def pack_enet_front_w(variables, wpack: int = 8):
    """Fold BN and build the W-packed matmul kernels for
    :func:`fused_front_stage1_w` from an ENet variables pytree."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)
    P = wpack
    row = lambda v: v[None, :]
    tile = lambda v: row(_wpack_tile(v, P))

    # --- Initial: identical base taps to pack_enet_front, then lifted.
    # BN spans concat(conv13, pool3) (blocks.py:46-63). ---
    ini, sini = p["Initial"], bs["Initial"]
    s16 = f32(ini["bn"]["scale"]) / jnp.sqrt(f32(sini["bn"]["var"])
                                             + 1e-3)
    t16 = f32(ini["bn"]["bias"]) - f32(sini["bn"]["mean"]) * s16
    a16 = f32(ini["prelu"]["alpha"])
    w3 = f32(ini["conv"]["kernel"]) * s16[:13]             # [3,3,3,13]

    k4 = [jnp.zeros((60, 64), jnp.float32) for _ in range(4)]
    for a in (0, 1):
        for b in (0, 1):
            col0 = (2 * a + b) * 16
            for dy in range(3):
                di, ry = divmod(2 * a + dy, 4)
                for dx in range(3):
                    dj, rx = divmod(2 * b + dx, 4)
                    idx = di * 2 + dj       # [x, right, down, downright]
                    r0 = ry * 12 + rx * 3
                    k4[idx] = k4[idx].at[r0:r0 + 3,
                                         col0:col0 + 13].add(w3[dy, dx])
    for ph in range(4):
        for c in range(3):
            k4[0] = k4[0].at[48 + ph * 3 + c,
                             ph * 16 + 13 + c].add(s16[13 + c])
    # lift the quarter-grid shifts (dx, dy in {0, 1}) to packed columns
    zero60 = jnp.zeros((P * 60, P * 64), jnp.float32)
    kini = []
    for base_x, base_r in ((k4[0], k4[1]), (k4[2], k4[3])):
        lifted = _wpack_taps({0: base_x, 1: base_r}, P)
        kini.extend(lifted.get(dj, zero60) for dj in (0, 1))
    kini = jnp.stack(kini)          # [4, P*60, P*64]: (dy, dj) order

    # --- Bottleneck1_0 (blocks.py:123-166) ---
    b10, s10 = p["Bottleneck1_0"], bs["Bottleneck1_0"]
    wp2, bp8 = _fold_bn(f32(b10["proj_conv"]["kernel"]),
                        b10["proj_bn"], s10["proj_bn"])    # [2,2,16,8]
    # 2x2/s2 conv on the half grid == phase-mixing 1x1 on the
    # (half_phase, c16) packed layout
    wmix = jnp.concatenate(
        [wp2[a, b] for a in (0, 1) for b in (0, 1)], axis=0)  # [64,8]
    wc3, bc8 = _fold_bn(f32(b10["conv"]["kernel"]),
                        b10["conv_bn"], s10["conv_bn"])    # [3,3,8,8]
    we10, be64 = _fold_bn(f32(b10["exp_conv"]["kernel"][0, 0]),
                          b10["exp_bn"], s10["exp_bn"])    # [8,64]

    # phase extraction/placement selectors on the packed layout
    sel_e = np.zeros((4, 64, 16), np.float32)
    for ph in range(4):
        for c in range(16):
            sel_e[ph, ph * 16 + c, c] = 1.0
    sel = jnp.stack([_wpack_blkdiag(jnp.asarray(sel_e[ph]), P)
                     for ph in range(4)])       # [4, P*64, P*16]
    selt = jnp.stack([_wpack_blkdiag(jnp.asarray(sel_e[ph].T), P)
                      for ph in range(4)])      # [4, P*16, P*64]
    pad64 = _wpack_blkdiag(jnp.asarray(sel_e[0]).T, P)  # 16ch -> 64ch

    # --- stage-1 bottlenecks (blocks.py:66-120) ---
    wp_s, bp_s, ap_s = [], [], []
    wc_s, bc_s, ac_s = [], [], []
    we_s, be_s, ar_s = [], [], []
    for k in range(1, 5):
        blk, sblk = p[f"Bottleneck1_{k}"], bs[f"Bottleneck1_{k}"]
        wp, bp = _fold_bn(f32(blk["proj_conv"]["kernel"][0, 0]),
                          blk["proj_bn"], sblk["proj_bn"])
        wc, bc = _fold_bn(f32(blk["conv"]["kernel"]),
                          blk["conv_bn"], sblk["conv_bn"])
        we, be = _fold_bn(f32(blk["exp_conv"]["kernel"][0, 0]),
                          blk["exp_bn"], sblk["exp_bn"])
        wp_s.append(_wpack_blkdiag(wp, P))
        bp_s.append(tile(bp))
        ap_s.append(tile(f32(blk["proj_prelu"]["alpha"])))
        wc_s.append(_wpack_conv3(wc, P))
        bc_s.append(tile(bc))
        ac_s.append(tile(f32(blk["conv_prelu"]["alpha"])))
        we_s.append(_wpack_blkdiag(we, P))
        be_s.append(tile(be))
        ar_s.append(tile(f32(blk["res_prelu"]["alpha"])))

    # --- raw-image unpack (per-base-row-phase routing) ---
    # The image reaches the kernel as RAW rows [., wq8, 12*wpack]
    # (free minor-dim reshape of [N,H,W,3]); these matrices route one
    # base-row-phase slice into the packed (qc, 48-img + 12-pool) lane
    # layout. Image lanes: exactly one source each (sum over phases);
    # pool lanes: per-phase/per-dx candidates combined by max (values
    # are >= 0). Replaces the XLA s2d transpose that materialized
    # ~126 MB strided at the custom-call boundary.
    lanes_in = 12 * P
    ua = np.zeros((4, lanes_in, 60 * P), np.float32)
    ub = np.zeros((4, lanes_in, 60 * P), np.float32)
    for ph in range(4):
        for bc in range(4 * P):          # base col within block
            qc, cp = bc >> 2, bc & 3
            for ch in range(3):
                src = bc * 3 + ch
                ua[ph, src, qc * 60 + ph * 12 + cp * 3 + ch] = 1.0
                a, b, dx = ph >> 1, cp >> 1, cp & 1
                pool = qc * 60 + 48 + a * 6 + b * 3 + ch
                (ua if dx == 0 else ub)[ph, src, pool] = 1.0
    imgmask = np.zeros((1, 60 * P), np.float32)
    for qc in range(P):
        imgmask[0, qc * 60:qc * 60 + 48] = 1.0

    # h0 lane layout is (col_phase, half_phase, c16): tile the Initial
    # bias/alpha over the 4 half phases BEFORE the column-phase tile
    tile4 = lambda v: jnp.concatenate([v] * 4)
    return dict(
        unpack_a=jnp.asarray(ua), unpack_b=jnp.asarray(ub),
        imgmask=jnp.asarray(imgmask),
        kini=kini, bin=tile(tile4(t16)), ain=tile(tile4(a16)),
        wmix=_wpack_blkdiag(wmix, P), bp10=tile(bp8),
        ap10=tile(f32(b10["proj_prelu"]["alpha"])),
        wc10=_wpack_conv3(wc3, P), bc10=tile(bc8),
        ac10=tile(f32(b10["conv_prelu"]["alpha"])),
        we10=_wpack_blkdiag(we10, P), be10=tile(be64),
        ar10=tile(f32(b10["res_prelu"]["alpha"])),
        sel=sel, selt=selt, pad64=pad64,
        wp_s=jnp.stack(wp_s), bp_s=jnp.stack(bp_s),
        ap_s=jnp.stack(ap_s),
        # flat [4*9, P*16, P*16]: the kernel indexes taps as k*9 + ...
        wc_s=jnp.concatenate(wc_s, axis=0),
        bc_s=jnp.stack(bc_s), ac_s=jnp.stack(ac_s),
        we_s=jnp.stack(we_s), be_s=jnp.stack(be_s),
        ar_s=jnp.stack(ar_s))


def _front_w_kernel(rawp_ref, rawc_ref, rawn_ref,
                    ua_ref, ub_ref, imask_ref,
                    kini_ref, bin_ref, ain_ref,
                    wmix_ref, bp10_ref, ap10_ref, wc10_ref, bc10_ref,
                    ac10_ref, we10_ref, be10_ref, ar10_ref,
                    sel_ref, selt_ref, pad64_ref,
                    wp_s_ref, bp_s_ref, ap_s_ref, wc_s_ref, bc_s_ref,
                    ac_s_ref, we_s_ref, be_s_ref, ar_s_ref,
                    out_x1_ref, out_mask_ref, scr_h, scr_a, scr_b,
                    *, tile_q: int, hq: int, rc: int):
    """W-packed front-end kernel; see the section comment. All planes
    are lane-full; compute walks ``rc``-row chunks; each stage
    round-trips VMEM scratch (extents shrink as in the v1 kernel).
    Inputs are RAW image rows ``[1, 4*tile_q, wq8, 12*wpack]`` (a free
    reshape of NHWC); the s2d(4) + pool-plane packing happens here via
    per-row-phase routing matmuls (``ua``/``ub``/``imask``)."""
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32
    seg = tile_q
    i0 = j * seg
    dt = scr_h.dtype
    wq8 = rawc_ref.shape[2]

    def prelu(v, a):
        zero = jnp.zeros((), v.dtype)
        return (jnp.maximum(v, zero)
                + a.astype(v.dtype) * jnp.minimum(v, zero))

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    flat = lambda a: a.reshape(a.shape[0] * wq8, a.shape[2])
    unflat = lambda a, r: a.reshape(r, wq8, a.shape[-1])

    def vrows(x3d, first):
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (x3d.shape[0], 1, 1), 0) + (i0 + first)
        return jnp.where((rows >= 0) & (rows < hq), x3d,
                         jnp.zeros((), x3d.dtype))

    def shift_l(a):   # packed column J-1 (zeros in: SAME left edge)
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]],
                               axis=1)

    def shift_r(a):   # packed column J+1 (zeros in: SAME right edge)
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])],
                               axis=1)

    def read_img(lo, hi):
        """Packed-image rows rel [lo, hi) (static bounds;
        -seg <= lo < hi <= 2*seg), unpacked on the fly from the raw
        base rows of the 3-tile halo window: one routing matmul pair
        per base-row phase, image lanes summed (disjoint sources),
        pool lanes max-combined (inputs are >= 0)."""
        raw_rows = 4 * seg
        blo, bhi = 4 * lo, 4 * hi
        parts = []
        for ref, base in ((rawp_ref, -raw_rows), (rawc_ref, 0),
                          (rawn_ref, raw_rows)):
            s, e = max(blo, base), min(bhi, base + raw_rows)
            if s < e:
                parts.append(ref[0, s - base:e - base])
        raw = (jnp.concatenate(parts, axis=0) if len(parts) > 1
               else parts[0])
        r = hi - lo
        q = raw.reshape(r, 4, wq8, raw.shape[-1]).astype(dt)
        s_acc = m_acc = None
        for ph in range(4):
            rp = flat(q[:, ph])
            ta = mm(rp, ua_ref[ph])
            tb = mm(rp, ub_ref[ph])
            s_acc = ta if s_acc is None else s_acc + ta
            m_acc = ta if m_acc is None else jnp.maximum(m_acc, ta)
            m_acc = jnp.maximum(m_acc, tb)
        return unflat(jnp.where(imask_ref[...] != 0, s_acc, m_acc), r)

    def conv9(pj3, k_ref, base, rows):
        """3x3 conv on a W-packed [rows+2, wq8, P*C] chunk: column
        shifts hoisted once, 9 MXU matmuls."""
        pjl, pjr = shift_l(pj3), shift_r(pj3)
        acc = None
        for r in range(3):
            for ci, src in enumerate((pjl, pj3, pjr)):
                t = mm(flat(src[r:r + rows]), k_ref[base + r * 3 + ci])
                acc = t if acc is None else acc + t
        return acc

    # --- Initial ---  h0 rows rel [-5 .. seg+5), chunked
    n_h = seg + 10
    for r0 in range(0, n_h, rc):
        rows = min(rc, n_h - r0)
        lo = -5 + r0
        win = vrows(read_img(lo, lo + rows + 1), lo).astype(dt)
        x0, xd = win[:-1], win[1:]
        h0 = (mm(flat(x0), kini_ref[0])
              + mm(flat(shift_r(x0)), kini_ref[1])
              + mm(flat(xd), kini_ref[2])
              + mm(flat(shift_r(xd)), kini_ref[3]))
        h0 = prelu(h0 + bin_ref[...].astype(f32), ain_ref[...])
        scr_h[r0:r0 + rows] = vrows(unflat(h0.astype(dt), rows), lo)

    # --- Bottleneck1_0 ---  output rows rel [-4 .. seg+4), extent seg+8
    n_a = seg + 8
    for r0 in range(0, n_a, rc):
        rows = min(rc, n_a - r0)
        first = -4 + r0
        seg_in = scr_h[r0:r0 + rows + 2]
        pj = prelu(mm(flat(seg_in), wmix_ref[...])
                   + bp10_ref[...].astype(f32), ap10_ref[...])
        pj = vrows(unflat(pj.astype(dt), rows + 2), first - 1)
        c10 = prelu(conv9(pj, wc10_ref, 0, rows)
                    + bc10_ref[...].astype(f32), ac10_ref[...])
        e10 = mm(c10.astype(dt), we10_ref[...]) \
            + be10_ref[...].astype(f32)

        # phase-max pool + first-max one-hot switches (tf.argmax
        # tie-break), on the aligned h0 rows
        hh = flat(scr_h[r0 + 1:r0 + 1 + rows])
        pooled = mm(hh, sel_ref[0])
        for ph in range(1, 4):
            pooled = jnp.maximum(mm(hh, sel_ref[ph]), pooled)
        claimed = None
        msk = None
        for ph in range(4):
            xpp = mm(hh, sel_ref[ph])
            eq = jnp.where(xpp >= pooled, 1.0, 0.0)
            own = eq if claimed is None else eq * (1.0 - claimed)
            claimed = eq if claimed is None else claimed + own
            t = mm(own.astype(dt), selt_ref[ph])
            msk = t if msk is None else msk + t
        res64 = mm(pooled.astype(dt), pad64_ref[...])
        x1 = prelu(e10 + res64, ar10_ref[...])
        scr_a[r0:r0 + rows] = vrows(unflat(x1.astype(dt), rows), first)
        # mask rows overlapping the tile's [0, seg) output window
        ov_lo, ov_hi = max(first, 0), min(first + rows, seg)
        if ov_lo < ov_hi:
            out_mask_ref[0, ov_lo:ov_hi] = unflat(
                msk.astype(dt), rows)[ov_lo - first:ov_hi - first] \
                .astype(out_mask_ref.dtype)

    # --- stage-1 bottlenecks ---  extent shrinks by 1 row per block
    src, other = scr_a, scr_b
    for k in range(4):
        n_in = n_a - 2 * k
        first_in = -4 + k
        n_out = n_in - 2
        for r0 in range(0, n_out, rc):
            rows = min(rc, n_out - r0)
            first = first_in + 1 + r0
            cur = src[r0:r0 + rows + 2]
            pj = prelu(mm(flat(cur), wp_s_ref[k])
                       + bp_s_ref[k].astype(f32), ap_s_ref[k])
            pj = vrows(unflat(pj.astype(dt), rows + 2), first - 1)
            ck = prelu(conv9(pj, wc_s_ref, k * 9, rows)
                       + bc_s_ref[k].astype(f32), ac_s_ref[k])
            ek = mm(ck.astype(dt), we_s_ref[k]) \
                + be_s_ref[k].astype(f32)
            nxt = prelu(flat(cur[1:-1]).astype(f32) + ek, ar_s_ref[k])
            nxt = vrows(unflat(nxt.astype(dt), rows), first)
            if k == 3:
                out_x1_ref[0, r0:r0 + rows] = \
                    nxt.astype(out_x1_ref.dtype)
            else:
                other[r0:r0 + rows] = nxt
        if k < 3:
            src, other = other, src


@functools.partial(jax.jit,
                   static_argnames=("tile_q", "rc", "wpack", "interpret",
                                    "out_dtype"))
def fused_front_stage1_w(image: jnp.ndarray, packed: dict,
                         tile_q: int = 64, rc: int = 24,
                         wpack: int = 8, interpret: bool = False,
                         out_dtype=jnp.bfloat16):
    """Image -> (stage-1 features, pool-switch one-hot mask), fused —
    the W-packed v2 of :func:`fused_front_stage1` (same contract).

    :param image: ``[N, H, W, 3]`` (H, W divisible by 8)
    :param packed: :func:`pack_enet_front_w` output (same ``wpack``)
    :param tile_q: quarter-res rows per grid segment
    :param rc:     rows per in-kernel chunk (vreg-pressure knob)
    :param wpack:  quarter columns packed into lanes (must divide W/4)
    :returns: ``(x1 [N,Hq,Wq,64] out_dtype, mask [N,Hq,Wq,64]
              out_dtype)`` — identical layouts to the v1 kernel
    """
    n, h, w, _ = image.shape
    hq, wq = h // 4, w // 4
    if wq % wpack:
        raise ValueError(f"W/4={wq} not divisible by wpack={wpack}")
    if tile_q < 6 or hq % tile_q != 0:
        tile_q = hq
    grid_h = hq // tile_q
    wq8 = wq // wpack

    # RAW rows: free minor-dim reshape only; the s2d(4) + pool packing
    # runs inside the kernel (see _front_w_kernel.read_img)
    raw = image.astype(out_dtype).reshape(n, h, wq8, 12 * wpack)

    def tile_at(offs):
        return pl.BlockSpec(
            (1, 4 * tile_q, wq8, 12 * wpack),
            lambda i, j, offs=offs: (
                i, jnp.clip(j + offs, 0, grid_h - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    consts = [packed[k] for k in
              ("unpack_a", "unpack_b", "imgmask",
               "kini", "bin", "ain", "wmix", "bp10", "ap10", "wc10",
               "bc10", "ac10", "we10", "be10", "ar10", "sel", "selt",
               "pad64", "wp_s", "bp_s", "ap_s", "wc_s", "bc_s", "ac_s",
               "we_s", "be_s", "ar_s")]

    out_spec = pl.BlockSpec((1, tile_q, wq8, wpack * 64),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    x1, mask = pl.pallas_call(
        functools.partial(_front_w_kernel, tile_q=tile_q, hq=hq, rc=rc),
        grid=(n, grid_h),
        in_specs=[tile_at(-1), tile_at(0), tile_at(1)]
        + [const_spec(a) for a in consts],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, hq, wq8, wpack * 64), out_dtype),
            jax.ShapeDtypeStruct((n, hq, wq8, wpack * 64), out_dtype)],
        scratch_shapes=[
            pltpu.VMEM((tile_q + 10, wq8, wpack * 64), out_dtype),
            pltpu.VMEM((tile_q + 8, wq8, wpack * 64), out_dtype),
            pltpu.VMEM((tile_q + 8, wq8, wpack * 64), out_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )(raw, raw, raw, *consts)
    # free reshapes back to the v1 contract layouts
    return (x1.reshape(n, hq, wq, 64), mask.reshape(n, hq, wq, 64))


# ---------------------------------------------------------------------------
# Fused ENet mid section: Bottleneck2_0 + stages 2 and 3 (16 bottlenecks)
# ---------------------------------------------------------------------------
#
# Completes the Pallas coverage of the scoring forward between the
# front-end and decoder kernels. Stage 2/3 blocks carry dilations up to
# 16 at eighth resolution, so row-tiling would need ~73 halo rows of a
# 128-row feature map — instead the grid is one cell per image and the
# ENTIRE eighth-res spatial extent lives in VMEM (bf16 working set
# ~80 MB on v5e at 1024x2048). Every conv is shifted matmuls:
#
#   B2_0      2x2/s2 proj == phase-mixing matmul on the s2d(2)-packed
#             quarter features [256->32]; 3x3 conv; 1x1 expand;
#             residual = phase-max pool + first-max switches + channel
#             zero-pad                       (blocks.py:123-166)
#   2_1..3_8  1x1 proj [128->32]; 3x3 conv (dilation d via d-offset
#             shifts) or 5x1+1x5 asymmetric pair; 1x1 expand; residual
#             add                            (blocks.py:66-120, spec
#             models/enet.py:91-102)
#
# Outputs: stage-3 features [N,H8,W8,128] and the pool switches in the
# model's compact int8 value format (0..3) for the XLA stage-4
# (Bottleneck4_0 consumes them via forward_stage4).


def pack_enet_mid(variables):
    """Fold BN and pack matmul kernels for :func:`fused_mid_stage23`.

    Returns (packed dict, block metadata tuple) — the metadata is a
    static per-block (kind, dilation, tap_offset) table baked into the
    kernel closure."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda v: v[None, :]

    b20, s20 = p["Bottleneck2_0"], bs["Bottleneck2_0"]
    wp2, bp32 = _fold_bn(f32(b20["proj_conv"]["kernel"]),
                         b20["proj_bn"], s20["proj_bn"])   # [2,2,64,32]
    wp20 = jnp.concatenate(
        [wp2[a, b] for a in (0, 1) for b in (0, 1)], axis=0)  # [256,32]
    ap20 = f32(b20["proj_prelu"]["alpha"])
    wc3, bc32 = _fold_bn(f32(b20["conv"]["kernel"]),
                         b20["conv_bn"], s20["conv_bn"])   # [3,3,32,32]
    ac20 = f32(b20["conv_prelu"]["alpha"])
    we20, be128 = _fold_bn(f32(b20["exp_conv"]["kernel"][0, 0]),
                           b20["exp_bn"], s20["exp_bn"])   # [32,128]
    ar20 = f32(b20["res_prelu"]["alpha"])

    taps = [wc3[r, c] for r in range(3) for c in range(3)]

    spec = [(1, False), (2, False), (1, True), (4, False),
            (1, False), (8, False), (1, True), (16, False)]
    meta = [("b20", 1, 0)]
    wp_s, bp_s, ap_s = [], [], []
    bc_s, ac_s = [], []
    we_s, be_s, ar_s = [], [], []
    for stage in (2, 3):
        for idx, (dil, asym) in enumerate(spec, start=1):
            blk = p[f"Bottleneck{stage}_{idx}"]
            sblk = bs[f"Bottleneck{stage}_{idx}"]
            wp, bp = _fold_bn(f32(blk["proj_conv"]["kernel"][0, 0]),
                              blk["proj_bn"], sblk["proj_bn"])
            off = len(taps)
            if asym:
                # (k,1) col conv (no BN) then (1,k) row conv (BN folded
                # into the second, matching the single conv_bn after the
                # pair, blocks.py:95-109)
                wcol = f32(blk["conv_col"]["kernel"])      # [5,1,32,32]
                wrow, bc = _fold_bn(f32(blk["conv_row"]["kernel"]),
                                    blk["conv_bn"], sblk["conv_bn"])
                taps.extend(wcol[r, 0] for r in range(5))
                taps.extend(wrow[0, c] for c in range(5))
                meta.append(("asym", 1, off))
            else:
                wc, bc = _fold_bn(f32(blk["conv"]["kernel"]),
                                  blk["conv_bn"], sblk["conv_bn"])
                taps.extend(wc[r, c] for r in range(3) for c in range(3))
                meta.append(("conv", dil, off))
            we, be = _fold_bn(f32(blk["exp_conv"]["kernel"][0, 0]),
                              blk["exp_bn"], sblk["exp_bn"])
            wp_s.append(wp)
            bp_s.append(row(bp))
            ap_s.append(row(f32(blk["proj_prelu"]["alpha"])))
            bc_s.append(row(bc))
            ac_s.append(row(f32(blk["conv_prelu"]["alpha"])))
            we_s.append(we)
            be_s.append(row(be))
            ar_s.append(row(f32(blk["res_prelu"]["alpha"])))

    sel8 = np.zeros((4, 256, 64), np.float32)
    for ph in range(4):
        for c in range(64):
            sel8[ph, ph * 64 + c, c] = 1.0
    pad128 = np.zeros((64, 128), np.float32)
    for c in range(64):
        pad128[c, c] = 1.0

    packed = dict(
        wp20=wp20, bp20=row(bp32), ap20=row(ap20),
        bc20=row(bc32), ac20=row(ac20),
        we20=we20, be20=row(be128), ar20=row(ar20),
        taps=jnp.stack(taps),                      # [157,32,32]
        wp_s=jnp.stack(wp_s), bp_s=jnp.stack(bp_s),
        ap_s=jnp.stack(ap_s), bc_s=jnp.stack(bc_s),
        ac_s=jnp.stack(ac_s), we_s=jnp.stack(we_s),
        be_s=jnp.stack(be_s), ar_s=jnp.stack(ar_s),
        sel8=jnp.asarray(sel8), pad128=jnp.asarray(pad128))
    return packed, tuple(meta)


def _make_mid_ops(h8, w8, taps_ref):
    """Shared row-chunked building blocks for the mid-section kernels.
    All compute walks row chunks so vector-register pressure stays
    bounded (full-plane jnp values live in vregs and spilled ~124M);
    projections are recomputed over each chunk's conv halo."""
    f32 = jnp.float32

    def flat(a):
        return a.reshape(a.shape[0] * w8, a.shape[-1])

    def unflat(a, r):
        return a.reshape(r, w8, a.shape[-1])

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    def prelu(v, a):
        # max/min form: exact, no compare (no bf16 vector compare on
        # v5e), no fp32 temporaries of the operand
        zero = jnp.zeros((), v.dtype)
        return (jnp.maximum(v, zero)
                + a.astype(v.dtype) * jnp.minimum(v, zero))

    def sh_col(a, d):
        if d == 0:
            return a
        z = jnp.zeros_like(a[:, :abs(d)])
        return (jnp.concatenate([a[:, d:], z], axis=1) if d > 0
                else jnp.concatenate([z, a[:, :d]], axis=1))

    def proj_halo(read, r0, r1, d, w_arr, b_arr, a_arr):
        """Project rows [r0-d, r1+d) with SAME zero padding: compute on
        the valid rows only, concat zero rows at the edges."""
        lo, hi = max(r0 - d, 0), min(r1 + d, h8)
        seg = read(lo, hi)
        pj = prelu(mm(flat(seg), w_arr) + b_arr.astype(f32), a_arr)
        pj = unflat(pj, hi - lo)
        parts = []
        if lo - (r0 - d):
            parts.append(jnp.zeros((lo - (r0 - d), w8, pj.shape[-1]),
                                   pj.dtype))
        parts.append(pj)
        if (r1 + d) - hi:
            parts.append(jnp.zeros(((r1 + d) - hi, w8, pj.shape[-1]),
                                   pj.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else pj

    def conv9(pj, off, dil, rows):
        acc = None
        for ri, dy in enumerate((-dil, 0, dil)):
            rv = pj[dil + dy:dil + dy + rows]
            for ci, dx in enumerate((-dil, 0, dil)):
                t = mm(flat(sh_col(rv, dx)), taps_ref[off + ri * 3 + ci])
                acc = t if acc is None else acc + t
        return acc

    def conv_asym(pj, off, rows):
        acc = None
        for i, dy in enumerate((-2, -1, 0, 1, 2)):
            t = mm(flat(pj[2 + dy:2 + dy + rows]), taps_ref[off + i])
            acc = t if acc is None else acc + t
        t3 = unflat(acc.astype(pj.dtype), rows)
        acc = None
        for i, dx in enumerate((-2, -1, 0, 1, 2)):
            t = mm(flat(sh_col(t3, dx)), taps_ref[off + 5 + i])
            acc = t if acc is None else acc + t
        return acc

    return flat, unflat, mm, prelu, proj_halo, conv9, conv_asym


def _mid_b20_kernel(x_ref, wp20_ref, bp20_ref, ap20_ref, bc20_ref,
                    ac20_ref, we20_ref, be20_ref, ar20_ref, taps_ref,
                    sel8_ref, pad128_ref, y_ref, sw_ref, *, rc: int):
    """Bottleneck2_0, one image per cell, row-chunked."""
    f32 = jnp.float32
    _, h8, w8, _ = x_ref.shape
    dt = y_ref.dtype
    (flat, unflat, mm, prelu, proj_halo, conv9,
     _conv_asym) = _make_mid_ops(h8, w8, taps_ref)
    read_x = lambda lo, hi: x_ref[0, lo:hi]

    for r0 in range(0, h8, rc):
        r1 = min(r0 + rc, h8)
        rows = r1 - r0
        pj = proj_halo(read_x, r0, r1, 1, wp20_ref[...], bp20_ref[...],
                       ap20_ref[...])
        c = prelu(conv9(pj, 0, 1, rows) + bc20_ref[...].astype(f32),
                  ac20_ref[...]).astype(dt)
        e = mm(c, we20_ref[...]) + be20_ref[...].astype(f32)

        # incremental phase max + first-max switch values (strictly-
        # greater update == tf.argmax first-max tie-breaking)
        xf = flat(x_ref[0, r0:r1])
        pooled = mm(xf, sel8_ref[0])
        swf = jnp.zeros_like(pooled)
        for ph in range(1, 4):
            xpp = mm(xf, sel8_ref[ph])
            swf = jnp.where(xpp > pooled, jnp.float32(ph), swf)
            pooled = jnp.maximum(xpp, pooled)
        res = mm(pooled.astype(dt), pad128_ref[...])
        out = prelu(e + res, ar20_ref[...])
        y_ref[0, r0:r1] = unflat(out.astype(dt), rows)
        sw_ref[0, r0:r1] = unflat(swf, rows).astype(jnp.int8)


def _mid_blocks_kernel(x_ref, taps_ref, wp_s_ref, bp_s_ref, ap_s_ref,
                       bc_s_ref, ac_s_ref, we_s_ref, be_s_ref,
                       ar_s_ref, y_ref, scr_a, scr_b,
                       *, metas, rc: int):
    """A chunk of stage-2/3 bottlenecks, row-chunked, ping-ponging two
    VMEM scratch planes; the last block writes the output window."""
    f32 = jnp.float32
    _, h8, w8, _ = x_ref.shape
    dt = scr_a.dtype
    (flat, unflat, mm, prelu, proj_halo, conv9,
     conv_asym) = _make_mid_ops(h8, w8, taps_ref)

    n_blocks = len(metas)
    src = None
    for k, (kind, dil, off) in enumerate(metas):
        if src is None:
            read_s = lambda lo, hi: x_ref[0, lo:hi]
            res_of = lambda r0, r1: x_ref[0, r0:r1]
        else:
            read_s = lambda lo, hi, src=src: src[lo:hi]
            res_of = lambda r0, r1, src=src: src[r0:r1]
        dst = y_ref if k == n_blocks - 1 else             (scr_a if src is not scr_a else scr_b)
        d = 2 if kind == "asym" else dil
        for r0 in range(0, h8, rc):
            r1 = min(r0 + rc, h8)
            rows = r1 - r0
            pj = proj_halo(read_s, r0, r1, d, wp_s_ref[k], bp_s_ref[k],
                           ap_s_ref[k])
            cv = conv_asym(pj, off, rows) if kind == "asym" \
                else conv9(pj, off, dil, rows)
            c = prelu(cv + bc_s_ref[k].astype(f32),
                      ac_s_ref[k]).astype(dt)
            e = (mm(c, we_s_ref[k]) + be_s_ref[k].astype(f32)).astype(dt)
            out = prelu(flat(res_of(r0, r1)).astype(dt) + e,
                        ar_s_ref[k])
            if dst is y_ref:
                y_ref[0, r0:r1] = unflat(out.astype(y_ref.dtype), rows)
            else:
                dst[r0:r1] = unflat(out.astype(dt), rows)
        src = dst if dst is not y_ref else src


@functools.partial(jax.jit,
                   static_argnames=("meta", "chunk", "rc", "interpret",
                                    "out_dtype"))
def fused_mid_stage23(x1: jnp.ndarray, packed: dict, meta,
                      chunk: int = 4, rc: int = 32,
                      interpret: bool = False,
                      out_dtype=jnp.bfloat16):
    """Stage-1 features -> (stage-3 features, stage-2 pool switches).

    :param x1:   ``[N, Hq, Wq, 64]`` stage-1 output
    :param packed, meta: :func:`pack_enet_mid` output
    :param chunk: bottlenecks per pallas_call (Mosaic compile-size knob)
    :param rc:    rows per in-kernel chunk (vreg-pressure knob)
    :returns: ``(y [N,H8,W8,128] out_dtype,
              switches2 int8 [N,H8,W8,64])`` — switch values 0..3;
              reshape to the model's ``[N,H8,W8*64]`` for
              ``forward_stage4``
    """
    n, hq, wq, _ = x1.shape
    h8, w8 = hq // 2, wq // 2
    rc = min(rc, h8)
    x = x1.astype(out_dtype)
    x_s2d = (x.reshape(n, h8, 2, w8, 2, 64)
             .transpose(0, 1, 3, 2, 4, 5).reshape(n, h8, w8, 256))

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def block_spec(ch):
        return pl.BlockSpec((1, h8, w8, ch), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    b20_consts = [packed[k] for k in
                  ("wp20", "bp20", "ap20", "bc20", "ac20", "we20",
                   "be20", "ar20")] + [packed["taps"][:9],
                                       packed["sel8"], packed["pad128"]]
    cur, sw = pl.pallas_call(
        functools.partial(_mid_b20_kernel, rc=rc),
        grid=(n,),
        in_specs=[block_spec(256)] + [const_spec(a) for a in b20_consts],
        out_specs=[block_spec(128), block_spec(64)],
        out_shape=[jax.ShapeDtypeStruct((n, h8, w8, 128), out_dtype),
                   jax.ShapeDtypeStruct((n, h8, w8, 64), jnp.int8)],
        compiler_params=params, interpret=interpret,
    )(x_s2d, *b20_consts)

    blocks = list(meta[1:])
    n_taps = lambda m: 10 if m[0] == "asym" else 9
    for k0 in range(0, len(blocks), chunk):
        ms = blocks[k0:k0 + chunk]
        base = ms[0][2]
        endt = ms[-1][2] + n_taps(ms[-1])
        rel = tuple((kind, dil, off - base) for kind, dil, off in ms)
        k1 = k0 + len(ms)
        consts = ([packed["taps"][base:endt]]
                  + [packed[k][k0:k1] for k in
                     ("wp_s", "bp_s", "ap_s", "bc_s", "ac_s", "we_s",
                      "be_s", "ar_s")])
        cur = pl.pallas_call(
            functools.partial(_mid_blocks_kernel, metas=rel, rc=rc),
            grid=(n,),
            in_specs=[block_spec(128)] + [const_spec(a) for a in consts],
            out_specs=block_spec(128),
            out_shape=jax.ShapeDtypeStruct((n, h8, w8, 128), out_dtype),
            scratch_shapes=[pltpu.VMEM((h8, w8, 128), out_dtype),
                            pltpu.VMEM((h8, w8, 128), out_dtype)],
            compiler_params=params, interpret=interpret,
        )(cur, *consts)
    return cur, sw


# ---------------------------------------------------------------------------
# W-packed ENet mid section (v2): Bottleneck2_0 + stages 2 and 3
# ---------------------------------------------------------------------------
#
# The v1 mid kernels above measure ~even with XLA because their matmuls
# are MXU-shape-starved (K=32 projections/convs). This version applies
# the same W-packing as the v2 front end — 4 eighth-res columns into
# lanes, channel layout (col_phase, channel) — so the 32-channel
# proj/conv planes become 128-lane planes and every matmul runs at
# K,N >= 128. Dilated column taps lift to packed-column shifts of
# d/4 (or phase-mixing for d < 4) via the same ``_wpack_taps`` math;
# dilated row taps stay row slices with a d-row halo.
#
# Layouts (all free XLA reshapes at the boundary):
#   input  x1 s2d(2)+wpack4: [N, H8, W8/4, 1024]
#   trunk  y:                [N, H8, W8/4, 512]  -> [N, H8, W8, 128]
#   switches (values 0..3):  [N, H8, W8/4, 256]  -> [N, H8, W8, 64]


def pack_enet_mid_w(variables):
    """Fold BN and pack W-packed matmul kernels for
    :func:`fused_mid_stage23_w`. Returns (packed dict, meta tuple of
    per-block (kind, dilation, tap_offset))."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)
    P = 4
    row = lambda v: v[None, :]
    tile = lambda v: row(_wpack_tile(v, P))
    blk4 = lambda w: _wpack_blkdiag(w, P)

    def conv_taps(wc, dil):
        """Lifted dilated-3x3 taps, order (dy, dj) with dj ascending;
        always 3 dj slots per dy."""
        djs = sorted({divmod(b + dx, P)[0]
                      for dx in (-dil, 0, dil) for b in range(P)})
        out = []
        for dy in range(3):
            lifted = _wpack_taps({-dil: wc[dy, 0], 0: wc[dy, 1],
                                  dil: wc[dy, 2]}, P)
            zero = jnp.zeros((P * wc.shape[2], P * wc.shape[3]),
                             jnp.float32)
            out.extend(lifted.get(dj, zero) for dj in djs)
        return out, tuple(djs)

    b20, s20 = p["Bottleneck2_0"], bs["Bottleneck2_0"]
    wp2, bp32 = _fold_bn(f32(b20["proj_conv"]["kernel"]),
                         b20["proj_bn"], s20["proj_bn"])   # [2,2,64,32]
    wp20 = jnp.concatenate(
        [wp2[a, b] for a in (0, 1) for b in (0, 1)], axis=0)  # [256,32]
    wc3, bc32 = _fold_bn(f32(b20["conv"]["kernel"]),
                         b20["conv_bn"], s20["conv_bn"])   # [3,3,32,32]
    we20, be128 = _fold_bn(f32(b20["exp_conv"]["kernel"][0, 0]),
                           b20["exp_bn"], s20["exp_bn"])   # [32,128]

    taps, _ = conv_taps(wc3, 1)
    meta = [("b20", 1, 0, (-1, 0, 1))]

    # pool-phase extraction on the s2d(2)+wpack4 layout
    sel_e = np.zeros((4, 256, 64), np.float32)
    for ph in range(4):
        for c in range(64):
            sel_e[ph, ph * 64 + c, c] = 1.0
    sel8 = jnp.stack([blk4(jnp.asarray(sel_e[ph])) for ph in range(4)])
    pad_e = np.zeros((64, 128), np.float32)
    for c in range(64):
        pad_e[c, c] = 1.0
    pad128 = blk4(jnp.asarray(pad_e))

    spec = [(1, False), (2, False), (1, True), (4, False),
            (1, False), (8, False), (1, True), (16, False)]
    wp_s, bp_s, ap_s = [], [], []
    bc_s, ac_s = [], []
    we_s, be_s, ar_s = [], [], []
    for stage in (2, 3):
        for idx, (dil, asym) in enumerate(spec, start=1):
            blk = p[f"Bottleneck{stage}_{idx}"]
            sblk = bs[f"Bottleneck{stage}_{idx}"]
            wp, bp = _fold_bn(f32(blk["proj_conv"]["kernel"][0, 0]),
                              blk["proj_bn"], sblk["proj_bn"])
            off = len(taps)
            if asym:
                # (5,1) col conv (pure row taps) then (1,5) row conv
                # (pure column taps, BN folded into the second)
                wcol = f32(blk["conv_col"]["kernel"])      # [5,1,32,32]
                wrow, bc = _fold_bn(f32(blk["conv_row"]["kernel"]),
                                    blk["conv_bn"], sblk["conv_bn"])
                taps.extend(blk4(wcol[r, 0]) for r in range(5))
                lifted = _wpack_taps(
                    {dx: wrow[0, 2 + dx] for dx in range(-2, 3)}, P)
                zero = jnp.zeros_like(lifted[0])
                taps.extend(lifted.get(dj, zero) for dj in (-1, 0, 1))
                meta.append(("asym", 1, off, (-1, 0, 1)))
            else:
                wc, bc = _fold_bn(f32(blk["conv"]["kernel"]),
                                  blk["conv_bn"], sblk["conv_bn"])
                ts, djs = conv_taps(wc, dil)
                taps.extend(ts)
                meta.append(("conv", dil, off, djs))
            we, be = _fold_bn(f32(blk["exp_conv"]["kernel"][0, 0]),
                              blk["exp_bn"], sblk["exp_bn"])
            wp_s.append(blk4(wp))
            bp_s.append(tile(bp))
            ap_s.append(tile(f32(blk["proj_prelu"]["alpha"])))
            bc_s.append(tile(bc))
            ac_s.append(tile(f32(blk["conv_prelu"]["alpha"])))
            we_s.append(blk4(we))
            be_s.append(tile(be))
            ar_s.append(tile(f32(blk["res_prelu"]["alpha"])))

    # quarter-row-pair merge matrices: fold the RAW stage-1 layout
    # ([.,Wq,64] -> free [.,w4,512]) into the s2d(2)+wpack4 lane
    # layout IN-kernel — the XLA-side transpose materialized ~134 MB
    # at the custom-call boundary (same pathology as the tail's mask)
    xm = np.zeros((2, 512, 1024), np.float32)
    for hr in (0, 1):
        for qc in range(8):
            for c in range(64):
                xm[hr, qc * 64 + c,
                   (qc >> 1) * 256 + hr * 128 + (qc & 1) * 64 + c] = 1.0

    packed = dict(
        xmerge=jnp.asarray(xm),
        wp20=blk4(wp20), bp20=tile(bp32),
        ap20=tile(f32(b20["proj_prelu"]["alpha"])),
        bc20=tile(bc32), ac20=tile(f32(b20["conv_prelu"]["alpha"])),
        we20=blk4(we20), be20=tile(be128),
        ar20=tile(f32(b20["res_prelu"]["alpha"])),
        taps=jnp.stack(taps),                      # [T, 128, 128]
        sel8=sel8, pad128=pad128,
        wp_s=jnp.stack(wp_s), bp_s=jnp.stack(bp_s),
        ap_s=jnp.stack(ap_s), bc_s=jnp.stack(bc_s),
        ac_s=jnp.stack(ac_s), we_s=jnp.stack(we_s),
        be_s=jnp.stack(be_s), ar_s=jnp.stack(ar_s))
    return packed, tuple(meta)


def _make_mid_ops_w(h8, w4, taps_ref):
    """Row-chunked building blocks on the W-packed layout: column
    shifts move whole packed columns (hoisted per dj), row taps stay
    slices, every matmul is [., 128+] @ [128, 128]."""
    f32 = jnp.float32

    def flat(a):
        return a.reshape(a.shape[0] * w4, a.shape[-1])

    def unflat(a, r):
        return a.reshape(r, w4, a.shape[-1])

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    def prelu(v, a):
        zero = jnp.zeros((), v.dtype)
        return (jnp.maximum(v, zero)
                + a.astype(v.dtype) * jnp.minimum(v, zero))

    def sh_col(a, d):
        if d == 0:
            return a
        z = jnp.zeros_like(a[:, :abs(d)])
        return (jnp.concatenate([a[:, d:], z], axis=1) if d > 0
                else jnp.concatenate([z, a[:, :d]], axis=1))

    def proj_halo(read, r0, r1, d, w_arr, b_arr, a_arr):
        lo, hi = max(r0 - d, 0), min(r1 + d, h8)
        seg = read(lo, hi)
        pj = prelu(mm(flat(seg), w_arr) + b_arr.astype(f32), a_arr)
        pj = unflat(pj, hi - lo)
        parts = []
        if lo - (r0 - d):
            parts.append(jnp.zeros((lo - (r0 - d), w4, pj.shape[-1]),
                                   pj.dtype))
        parts.append(pj)
        if (r1 + d) - hi:
            parts.append(jnp.zeros(((r1 + d) - hi, w4, pj.shape[-1]),
                                   pj.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else pj

    def conv9(pj, off, dil, djs, rows):
        """Dilated 3x3: 3 row taps x len(djs) lifted column kernels;
        column shifts hoisted across the row taps."""
        shifted = {dj: sh_col(pj, dj) for dj in djs}
        acc = None
        t = 0
        for dy in (-dil, 0, dil):
            for dj in djs:
                rv = shifted[dj][dil + dy:dil + dy + rows]
                tm = mm(flat(rv), taps_ref[off + t])
                acc = tm if acc is None else acc + tm
                t += 1
        return acc

    def conv_asym(pj, off, rows):
        acc = None
        for i, dy in enumerate((-2, -1, 0, 1, 2)):
            t = mm(flat(pj[2 + dy:2 + dy + rows]), taps_ref[off + i])
            acc = t if acc is None else acc + t
        t3 = unflat(acc.astype(pj.dtype), rows)
        acc = None
        for i, dj in enumerate((-1, 0, 1)):
            t = mm(flat(sh_col(t3, dj)), taps_ref[off + 5 + i])
            acc = t if acc is None else acc + t
        return acc

    return flat, unflat, mm, prelu, sh_col, proj_halo, conv9, conv_asym


def _mid_w_b20_kernel(x_ref, xm_ref, wp20_ref, bp20_ref, ap20_ref,
                      bc20_ref, ac20_ref, we20_ref, be20_ref, ar20_ref,
                      taps_ref, sel8_ref, pad128_ref, y_ref, sw_ref,
                      *, rc: int):
    """Bottleneck2_0 on the W-packed layout, one image per cell.

    ``x_ref`` holds the RAW stage-1 layout ``[1, Hq, w4, 512]``; the
    s2d(2) row-pair lane merge runs here (two placement matmuls
    against ``xm_ref``) instead of as an XLA transpose at the
    custom-call boundary."""
    f32 = jnp.float32
    _, hq, w4, _ = x_ref.shape
    h8 = hq // 2
    dt = y_ref.dtype
    (flat, unflat, mm, prelu, _sh, proj_halo, conv9,
     _ca) = _make_mid_ops_w(h8, w4, taps_ref)

    def read_merged(lo, hi):
        seg = x_ref[0, 2 * lo:2 * hi]
        q = seg.reshape(hi - lo, 2, w4, 512).astype(dt)
        m = (mm(flat(q[:, 0]), xm_ref[0])
             + mm(flat(q[:, 1]), xm_ref[1]))
        return unflat(m.astype(dt), hi - lo)

    for r0 in range(0, h8, rc):
        r1 = min(r0 + rc, h8)
        rows = r1 - r0
        # merge the chunk + 1-row halo once; slice for proj and pool
        lo, hi = max(r0 - 1, 0), min(r1 + 1, h8)
        xm = read_merged(lo, hi)
        read_x = lambda a, b: xm[a - lo:b - lo]
        pj = proj_halo(read_x, r0, r1, 1, wp20_ref[...], bp20_ref[...],
                       ap20_ref[...])
        c = prelu(conv9(pj, 0, 1, (-1, 0, 1), rows)
                  + bc20_ref[...].astype(f32), ac20_ref[...]).astype(dt)
        e = mm(c, we20_ref[...]) + be20_ref[...].astype(f32)

        xf = flat(read_x(r0, r1))
        pooled = mm(xf, sel8_ref[0])
        swf = jnp.zeros_like(pooled)
        for ph in range(1, 4):
            xpp = mm(xf, sel8_ref[ph])
            swf = jnp.where(xpp > pooled, jnp.float32(ph), swf)
            pooled = jnp.maximum(xpp, pooled)
        res = mm(pooled.astype(dt), pad128_ref[...])
        out = prelu(e + res, ar20_ref[...])
        y_ref[0, r0:r1] = unflat(out.astype(dt), rows)
        sw_ref[0, r0:r1] = unflat(swf, rows).astype(sw_ref.dtype)


def _mid_w_blocks_kernel(x_ref, taps_ref, wp_s_ref, bp_s_ref, ap_s_ref,
                         bc_s_ref, ac_s_ref, we_s_ref, be_s_ref,
                         ar_s_ref, y_ref, scr_a, scr_b,
                         *, metas, rc: int):
    """A chunk of stage-2/3 bottlenecks on the W-packed layout."""
    f32 = jnp.float32
    _, h8, w4, _ = x_ref.shape
    dt = scr_a.dtype
    (flat, unflat, mm, prelu, _sh, proj_halo, conv9,
     conv_asym) = _make_mid_ops_w(h8, w4, taps_ref)

    n_blocks = len(metas)
    src = None
    for k, (kind, dil, off, djs) in enumerate(metas):
        if src is None:
            read_s = lambda lo, hi: x_ref[0, lo:hi]
            res_of = lambda r0, r1: x_ref[0, r0:r1]
        else:
            read_s = lambda lo, hi, src=src: src[lo:hi]
            res_of = lambda r0, r1, src=src: src[r0:r1]
        dst = y_ref if k == n_blocks - 1 else \
            (scr_a if src is not scr_a else scr_b)
        d = 2 if kind == "asym" else dil
        for r0 in range(0, h8, rc):
            r1 = min(r0 + rc, h8)
            rows = r1 - r0
            pj = proj_halo(read_s, r0, r1, d, wp_s_ref[k], bp_s_ref[k],
                           ap_s_ref[k])
            cv = conv_asym(pj, off, rows) if kind == "asym" \
                else conv9(pj, off, dil, djs, rows)
            c = prelu(cv + bc_s_ref[k].astype(f32),
                      ac_s_ref[k]).astype(dt)
            e = (mm(c, we_s_ref[k]) + be_s_ref[k].astype(f32)).astype(dt)
            out = prelu(flat(res_of(r0, r1)).astype(dt) + e,
                        ar_s_ref[k])
            if dst is y_ref:
                y_ref[0, r0:r1] = unflat(out.astype(y_ref.dtype), rows)
            else:
                dst[r0:r1] = unflat(out.astype(dt), rows)
        src = dst if dst is not y_ref else src


@functools.partial(jax.jit,
                   static_argnames=("meta", "chunk", "rc", "interpret",
                                    "out_dtype"))
def fused_mid_stage23_w(x1: jnp.ndarray, packed: dict, meta,
                        chunk: int = 4, rc: int = 32,
                        interpret: bool = False,
                        out_dtype=jnp.bfloat16):
    """Stage-1 features -> (stage-3 features, stage-2 pool switches):
    the W-packed v2 of :func:`fused_mid_stage23` (same contract).

    :param x1: ``[N, Hq, Wq, 64]`` stage-1 output; Wq must divide 8
    :param packed, meta: :func:`pack_enet_mid_w` output
    :returns: ``(y [N,H8,W8,128] out_dtype, switches2 int8
              [N,H8,W8,64])``
    """
    n, hq, wq, _ = x1.shape
    h8, w8 = hq // 2, wq // 2
    if w8 % 4:
        raise ValueError(f"W/8={w8} not divisible by wpack=4")
    w4 = w8 // 4
    rc = min(rc, h8)
    # RAW stage-1 features: only the free minor-dim merge happens in
    # XLA; the s2d(2) row-pair lane merge runs inside the B2_0 kernel
    # (see pack_enet_mid_w's xmerge)
    x_raw = x1.astype(out_dtype).reshape(n, hq, w4, 512)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def block_spec(ch, rows=h8):
        return pl.BlockSpec((1, rows, w4, ch), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    b20_consts = [packed["xmerge"]] + [packed[k] for k in
                  ("wp20", "bp20", "ap20", "bc20", "ac20", "we20",
                   "be20", "ar20")] + [packed["taps"][:9],
                                       packed["sel8"], packed["pad128"]]
    cur, sw = pl.pallas_call(
        functools.partial(_mid_w_b20_kernel, rc=rc),
        grid=(n,),
        in_specs=[block_spec(512, rows=hq)]
        + [const_spec(a) for a in b20_consts],
        out_specs=[block_spec(512), block_spec(256)],
        out_shape=[jax.ShapeDtypeStruct((n, h8, w4, 512), out_dtype),
                   jax.ShapeDtypeStruct((n, h8, w4, 256), jnp.int8)],
        compiler_params=params, interpret=interpret,
    )(x_raw, *b20_consts)

    n_taps = lambda m: 8 if m[0] == "asym" else 3 * len(m[3])
    blocks = list(meta[1:])
    for k0 in range(0, len(blocks), chunk):
        ms = blocks[k0:k0 + chunk]
        base = ms[0][2]
        endt = ms[-1][2] + n_taps(ms[-1])
        rel = tuple((kind, dil, off - base, djs)
                    for kind, dil, off, djs in ms)
        k1 = k0 + len(ms)
        consts = ([packed["taps"][base:endt]]
                  + [packed[k][k0:k1] for k in
                     ("wp_s", "bp_s", "ap_s", "bc_s", "ac_s", "we_s",
                      "be_s", "ar_s")])
        cur = pl.pallas_call(
            functools.partial(_mid_w_blocks_kernel, metas=rel, rc=rc),
            grid=(n,),
            in_specs=[block_spec(512)] + [const_spec(a) for a in consts],
            out_specs=block_spec(512),
            out_shape=jax.ShapeDtypeStruct((n, h8, w4, 512), out_dtype),
            scratch_shapes=[pltpu.VMEM((h8, w4, 512), out_dtype),
                            pltpu.VMEM((h8, w4, 512), out_dtype)],
            compiler_params=params, interpret=interpret,
        )(cur, *consts)
    return (cur.reshape(n, h8, w8, 128),
            sw.reshape(n, h8, w8, 64))


# ---------------------------------------------------------------------------
# Fused ENet tail: stage 4 + stage 5 + Final + entropy (eighth-res grid)
# ---------------------------------------------------------------------------
#
# Extends the decoder kernel upward to absorb stage 4 (measured ~23ms
# in XLA): everything below stage 3 runs in ONE Pallas kernel over the
# eighth-resolution grid. Representations (channel layout
# (row_phase * P + col_phase) * C + c, matching s2d reshapes):
#
#   eighth tensors     plain [., W8, C]
#   quarter tensors    s2d(2)  [., W8, 4C]
#   half tensors       s2d(4)  [., W8, 16C]
#   full-res logits    s2d(8)  [., W8, 64C]   (never leave VMEM)
#
# Every conv/deconv is shifted MXU matmuls against packed matrices
# built by the generic phase-map builders below; the same polyphase
# decompositions as the decoder kernel, one s2d level deeper.
# Consumes: stage-3 features, B2_0's pool switches (one-hot, for
# B4_0's unpool), and the front kernel's stage-1 switch mask re-packed
# to s2d(4) (for B5_0's unpool).


def _deconv_rowmap(p):
    """Row phase map of a kernel-3 stride-2 transpose conv whose input
    rows sit at s2d level ``p`` over the base grid (out level 2p):
    {cell shift di: [(in_phase, out_phase, kernel_row)]}. Decomposition
    (verified against lax.conv_transpose): out[2y] = K2 h[y] + K0
    h[y-1]; out[2y+1] = K1 h[y]."""
    rm = {}
    for alpha in range(2 * p):
        u, y_rel = alpha & 1, alpha >> 1
        taps = [(2, y_rel), (0, y_rel - 1)] if u == 0 else [(1, y_rel)]
        for kr, yr in taps:
            di, pa = divmod(yr, p)
            rm.setdefault(di, []).append((pa, alpha, kr))
    return rm


def _conv_rowmap(p, ks=3):
    """Row phase map of a stride-1 SAME conv (kernel ``ks``, odd) at
    s2d level ``p``: {di: [(in_phase, out_phase, kernel_row)]}."""
    rm = {}
    half = ks // 2
    for a in range(p):
        for t, dy in enumerate(range(-half, half + 1)):
            di, pa = divmod(a + dy, p)
            rm.setdefault(di, []).append((pa, a, t))
    return rm


def _phase_pack(kernel, rowmap, colmap, p_in, q_out):
    """Packed matrices {(di, dj): [p_in^2*cin, q_out^2*cout]} from a
    spatial ``kernel[kr, kc, cin, cout]`` and row/col phase maps."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    out = {}
    for di, rlist in rowmap.items():
        for dj, clist in colmap.items():
            m = jnp.zeros((p_in * p_in * cin, q_out * q_out * cout),
                          jnp.float32)
            for pa, a, kr in rlist:
                for pb, b, kc in clist:
                    sel = np.zeros((p_in * p_in, q_out * q_out),
                                   np.float32)
                    sel[pa * p_in + pb, a * q_out + b] = 1.0
                    m = m + jnp.kron(sel, kernel[kr, kc])
            out[(di, dj)] = m
    return out


def _blockdiag_p(w, p):
    """1x1 conv at s2d level p: block-diagonal [p*p*cin, p*p*cout]."""
    return jnp.kron(np.eye(p * p, dtype=np.float32), w)


def _tile_p(v, p):
    """Per-channel vector tiled across p*p phases."""
    return jnp.concatenate([v] * (p * p))


def _m1_merge_mats():
    """[128, 256] placement pair folding the front kernel's
    quarter-grid mask into the tail's s2d(4)-over-eighth lane layout
    IN-KERNEL. The XLA-side equivalent (reshape/transpose of the
    [N,Hq,Wq,64] one-hot into [N,H8,W8,256]) must materialize ~268 MB
    in a strided layout right at the custom-call boundary — measured
    ~14 ms per batch-16 dispatch; two matmuls against these matrices
    inside VMEM cost ~0.5 GFLOP/tile instead.

    Source lanes (after the free [.,2W8,64]->[.,W8,128] reshape):
    (wq, a, b, c) = quarter-col parity, pool-row, pool-col, channel.
    Target lanes: (hq, a, wq, b, c); `top` routes quarter-row parity
    hq=0, `bot` hq=1."""
    mats = []
    for hq in (0, 1):
        m = np.zeros((128, 256), np.float32)
        for wq in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for c in range(16):
                        src = wq * 64 + a * 32 + b * 16 + c
                        dst = (hq * 128 + a * 64 + wq * 32
                               + b * 16 + c)
                        m[src, dst] = 1.0
        mats.append(jnp.asarray(m))
    return mats


def _unpool_expand_s2d():
    """[64, 256] placement: quarter-s2d2 channel (2a+b)*16+c into each
    of its four half-s2d4 phase blocks ((2a+u)*4 + (2b+v))*16+c — the
    broadcast half of the B5_0 unpool (the mask multiply selects the
    switch position)."""
    x = np.zeros((64, 256), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for u in (0, 1):
                for v in (0, 1):
                    for c in range(16):
                        x[(a * 2 + b) * 16 + c,
                          ((2 * a + u) * 4 + (2 * b + v)) * 16 + c] = 1.0
    return jnp.asarray(x)


def pack_enet_tail(variables, num_classes: int):
    """Fold BN and build the packed kernels for
    :func:`fused_tail_entropy_score` (stage4 + stage5 + Final)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)
    row = lambda v: v[None, :]

    def fold(name):
        blk, sblk = p[name], bs[name]
        return blk, sblk

    def stack_shifts(packed, shifts):
        return jnp.stack([packed[sh] for sh in shifts])

    D2 = tuple((di, dj) for di in (0, -1) for dj in (0, -1))
    C3 = tuple((di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1))

    # --- Bottleneck4_0 (128 -> 64, eighth -> quarter) ---
    b40, s40 = fold("Bottleneck4_0")
    wp4, bp4 = _fold_bn(f32(b40["proj_conv"]["kernel"][0, 0]),
                        b40["proj_bn"], s40["proj_bn"])    # [128,32]
    ap4 = f32(b40["proj_prelu"]["alpha"])
    kd4, bd4 = _fold_bn(f32(b40["deconv"]["kernel"]),
                        b40["conv_bn"], s40["conv_bn"])    # [3,3,32,16]
    ad4 = f32(b40["conv_prelu"]["alpha"])
    we4, be4 = _fold_bn(f32(b40["exp_conv"]["kernel"][0, 0]),
                        b40["exp_bn"], s40["exp_bn"])      # [16,64]
    wr4 = f32(b40["res_conv"]["kernel"][0, 0])             # [128,64]
    ar4 = f32(b40["res_prelu"]["alpha"])

    rm = _deconv_rowmap(1)
    kd4_p = _phase_pack(kd4, rm, rm, 1, 2)                 # [32, 4*16]
    kd4_s = stack_shifts(kd4_p, D2)

    # --- Bottleneck4_1 / 4_2 (quarter, 64ch, s2d2) ---
    def pack_plain(name):
        blk, sblk = fold(name)
        wp, bp = _fold_bn(f32(blk["proj_conv"]["kernel"][0, 0]),
                          blk["proj_bn"], sblk["proj_bn"])
        wc, bc = _fold_bn(f32(blk["conv"]["kernel"]),
                          blk["conv_bn"], sblk["conv_bn"])
        we, be = _fold_bn(f32(blk["exp_conv"]["kernel"][0, 0]),
                          blk["exp_bn"], sblk["exp_bn"])
        return (wp, bp, f32(blk["proj_prelu"]["alpha"]), wc, bc,
                f32(blk["conv_prelu"]["alpha"]), we, be,
                f32(blk["res_prelu"]["alpha"]))

    cm2 = _conv_rowmap(2)
    blocks4 = []
    for name in ("Bottleneck4_1", "Bottleneck4_2"):
        wp, bp, ap, wc, bc, ac, we, be, ar = pack_plain(name)
        cv = _phase_pack(wc, cm2, cm2, 2, 2)               # 9x[64,64]
        blocks4.append(dict(
            wp=_blockdiag_p(wp, 2), bp=row(_tile_p(bp, 2)),
            ap=row(_tile_p(ap, 2)),
            cv=stack_shifts(cv, C3),
            bc=row(_tile_p(bc, 2)), ac=row(_tile_p(ac, 2)),
            we=_blockdiag_p(we, 2), be=row(_tile_p(be, 2)),
            ar=row(_tile_p(ar, 2))))

    # --- Bottleneck5_0 (64 -> 16, quarter -> half) ---
    b50, s50 = fold("Bottleneck5_0")
    wp5, bp5 = _fold_bn(f32(b50["proj_conv"]["kernel"][0, 0]),
                        b50["proj_bn"], s50["proj_bn"])    # [64,16]
    ap5 = f32(b50["proj_prelu"]["alpha"])
    kd5, bd5 = _fold_bn(f32(b50["deconv"]["kernel"]),
                        b50["conv_bn"], s50["conv_bn"])    # [3,3,16,8]
    ad5 = f32(b50["conv_prelu"]["alpha"])
    we5, be5 = _fold_bn(f32(b50["exp_conv"]["kernel"][0, 0]),
                        b50["exp_bn"], s50["exp_bn"])      # [8,16]
    wr5 = f32(b50["res_conv"]["kernel"][0, 0])             # [64,16]
    ar5 = f32(b50["res_prelu"]["alpha"])

    rm5 = _deconv_rowmap(2)
    kd5_s = stack_shifts(_phase_pack(kd5, rm5, rm5, 2, 4), D2)

    # --- Bottleneck5_1 (half, 16ch, s2d4) ---
    wp51, bp51, ap51, wc51, bc51, ac51, we51, be51, ar51 = \
        pack_plain("Bottleneck5_1")
    cm4 = _conv_rowmap(4)
    cv51 = stack_shifts(_phase_pack(wc51, cm4, cm4, 4, 4), C3)

    # --- Final (16 -> C, half -> full) ---
    kf = f32(p["Final"]["deconv"]["kernel"])               # [3,3,16,C]
    rmf = _deconv_rowmap(4)
    kf_s = stack_shifts(_phase_pack(kf, rmf, rmf, 4, 8), D2)
    c = num_classes
    seg = jnp.kron(jnp.eye(64, dtype=jnp.float32),
                   jnp.ones((c, 1), jnp.float32))          # [64C, 64]

    return dict(
        wp4=wp4, bp4=row(bp4), ap4=row(ap4),
        kd4=kd4_s, bd4=row(_tile_p(bd4, 2)), ad4=row(_tile_p(ad4, 2)),
        we4=_blockdiag_p(we4, 2), be4=row(_tile_p(be4, 2)),
        wr4=wr4, ar4=row(_tile_p(ar4, 2)),
        b41=blocks4[0], b42=blocks4[1],
        wp5=_blockdiag_p(wp5, 2), bp5=row(_tile_p(bp5, 2)),
        ap5=row(_tile_p(ap5, 2)),
        kd5=kd5_s, bd5=row(_tile_p(bd5, 4)), ad5=row(_tile_p(ad5, 4)),
        we5=_blockdiag_p(we5, 4), be5=row(_tile_p(be5, 4)),
        wr5=_blockdiag_p(wr5, 2), x5=_unpool_expand_s2d(),
        ar5=row(_tile_p(ar5, 4)),
        wp51=_blockdiag_p(wp51, 4), bp51=row(_tile_p(bp51, 4)),
        ap51=row(_tile_p(ap51, 4)),
        cv51=cv51, bc51=row(_tile_p(bc51, 4)),
        ac51=row(_tile_p(ac51, 4)),
        we51=_blockdiag_p(we51, 4), be51=row(_tile_p(be51, 4)),
        ar51=row(_tile_p(ar51, 4)),
        kf=kf_s, seg=seg, m1merge=jnp.stack(_m1_merge_mats()))


def _tail_kernel(yp_ref, yc_ref, yn_ref, swp_ref, swc_ref, swn_ref,
                 m1p_ref, m1c_ref, m1n_ref,
                 wp4_ref, bp4_ref, ap4_ref, kd4_ref, bd4_ref, ad4_ref,
                 we4_ref, be4_ref, wr4_ref, ar4_ref,
                 wpq_ref, bpq_ref, apq_ref, cvq_ref, bcq_ref, acq_ref,
                 weq_ref, beq_ref, arq_ref,
                 wp5_ref, bp5_ref, ap5_ref, kd5_ref, bd5_ref, ad5_ref,
                 we5_ref, be5_ref, wr5_ref, x5_ref, ar5_ref,
                 wp51_ref, bp51_ref, ap51_ref, cv51_ref, bc51_ref,
                 ac51_ref, we51_ref, be51_ref, ar51_ref,
                 kf_ref, seg_ref, m1m_ref, out_ref, scr_a, scr_b,
                 *, num_classes: int, te: int, h8: int, fc: int,
                 upto: str = "full", mode: str = "entropy"):
    """See the section comment; eighth-grid row segments, per-stage
    scratch round-trips, input-dtype matmuls.

    ``mode="predict"`` swaps the entropy reduction for a per-pixel
    argmax: ``out_ref`` is then an int8 ``(1, te, w8, 64)`` label tile
    (s2d(8) phase layout) and ``kf_ref`` must be class-major (see
    ``fused_tail_predict``). The ``upto`` probe truncations are
    entropy-mode only."""
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32
    e0 = j * te
    dt = scr_a.dtype
    w8 = yc_ref.shape[2]

    def prelu(v, a):
        zero = jnp.zeros((), v.dtype)
        return (jnp.maximum(v, zero)
                + a.astype(v.dtype) * jnp.minimum(v, zero))

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    flat = lambda a: a.reshape(a.shape[0] * w8, a.shape[2])
    unflat = lambda a, r: a.reshape(r, w8, a.shape[-1])

    def vrows(x3d, first):
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (x3d.shape[0], 1, 1), 0) + (e0 + first)
        return jnp.where((rows >= 0) & (rows < h8), x3d,
                         jnp.zeros((), x3d.dtype))

    def shift_l(a):
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]],
                               axis=1)

    def shift_r(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])],
                               axis=1)

    def cat3(p, c, n, lo, hi):
        """rows rel [lo..hi) of the 3-tile window, validity-zeroed."""
        cat = jnp.concatenate([p[0], c[0], n[0]], axis=0)
        return vrows(cat[te + lo:te + hi], lo).astype(dt)

    def deconv4(x3d, k_ref, first):
        """4-shift packed transpose conv: input rows [first..], output
        rows [first+1..] (one fewer row at the top)."""
        x, xu = x3d[1:], x3d[:-1]
        return (mm(flat(x), k_ref[0]) + mm(flat(shift_l(x)), k_ref[1])
                + mm(flat(xu), k_ref[2])
                + mm(flat(shift_l(xu)), k_ref[3]))

    def conv9(p3, k_ref, base, rows):
        acc = None
        for ri in range(3):                      # di = -1, 0, 1
            rv = p3[ri:ri + rows]
            for ci, cv in enumerate((shift_l(rv), rv, shift_r(rv))):
                t = mm(flat(cv), k_ref[base + ri * 3 + ci])
                acc = t if acc is None else acc + t
        return acc

    # --- Bottleneck4_0 ---  y rows rel [-6..TE+2]
    ys = cat3(yp_ref, yc_ref, yn_ref, -6, te + 3)
    if upto == "ys":
        out_ref[i, j] = jnp.sum(flat(ys).astype(f32))
        return
    p4 = prelu(mm(flat(ys), wp4_ref[...]) + bp4_ref[...].astype(f32),
               ap4_ref[...])
    p4 = vrows(unflat(p4.astype(dt), te + 9), -6)
    if upto == "p4":
        out_ref[i, j] = jnp.sum(flat(p4).astype(f32))
        return
    d4 = deconv4(p4, kd4_ref, -6)                # cells [-5..TE+2]
    d4 = prelu(d4 + bd4_ref[...].astype(f32), ad4_ref[...]).astype(dt)
    e4 = mm(d4, we4_ref[...]) + be4_ref[...].astype(f32)
    if upto == "e4":
        out_ref[i, j] = jnp.sum(e4)
        return
    r4 = mm(flat(ys[1:]), wr4_ref[...]).astype(dt)
    if upto == "r4":
        out_ref[i, j] = jnp.sum(r4.astype(f32))
        return
    # B2_0 switch one-hot built IN-kernel from the compact values
    # (0..3): the [.,256] mask tensor never exists in HBM (the XLA
    # one-hot + its 3x halo reads measured ~1 GB of traffic per
    # batch-16 dispatch). f32 compare: no bf16 vector compare on v5e.
    swf = flat(cat3(swp_ref, swc_ref, swn_ref, -5, te + 3)).astype(f32)
    m2 = jnp.concatenate(
        [jnp.where(swf == jnp.float32(p), 1.0, 0.0) for p in range(4)],
        axis=-1)
    h40 = prelu(e4 + jnp.concatenate([r4] * 4, axis=-1).astype(f32)
                * m2, ar4_ref[...])
    n40 = te + 8
    scr_a[0:n40] = vrows(unflat(h40.astype(dt), n40), -5)
    if upto == "b40":                  # probe-only truncation points
        out_ref[i, j] = jnp.sum(h40)
        return

    # --- Bottleneck4_1 / 4_2 ---
    src, other = scr_a, scr_b
    for k in range(2):
        n_in = n40 - 2 * k
        first = -5 + k
        cur = src[0:n_in]
        pj = prelu(mm(flat(cur), wpq_ref[k]) + bpq_ref[k].astype(f32),
                   apq_ref[k])
        pj = vrows(unflat(pj.astype(dt), n_in), first)
        acc = conv9(pj, cvq_ref, k * 9, n_in - 2)
        c = prelu(acc + bcq_ref[k].astype(f32), acq_ref[k]).astype(dt)
        e = mm(c, weq_ref[k]) + beq_ref[k].astype(f32)
        out = prelu(e + flat(cur[1:-1]).astype(f32), arq_ref[k])
        other[0:n_in - 2] = vrows(unflat(out.astype(dt), n_in - 2),
                                  first + 1)
        src, other = other, src
    if upto == "s4":
        out_ref[i, j] = jnp.sum(flat(src[0:n40 - 4]).astype(f32))
        return

    # --- Bottleneck5_0 ---  h42 in src, cells [-3..TE], extent TE+4
    n42 = te + 4
    h42 = src[0:n42]
    p5 = prelu(mm(flat(h42), wp5_ref[...]) + bp5_ref[...].astype(f32),
               ap5_ref[...])
    p5 = vrows(unflat(p5.astype(dt), n42), -3)
    d5 = deconv4(p5, kd5_ref, -3)                # cells [-2..TE]
    d5 = prelu(d5 + bd5_ref[...].astype(f32), ad5_ref[...]).astype(dt)
    e5 = mm(d5, we5_ref[...]) + be5_ref[...].astype(f32)
    r5q = mm(flat(h42[1:]), wr5_ref[...]).astype(dt)
    r5h = mm(r5q, x5_ref[...])
    # B1_0 switch mask, merged IN-kernel from the front kernel's raw
    # quarter-grid tiles (two placement matmuls; see _m1_merge_mats):
    # eighth rows rel [-2..te+1) <- quarter row pairs [2r, 2r+1]
    nm = te + 3
    qcat = jnp.concatenate([m1p_ref[0], m1c_ref[0], m1n_ref[0]],
                           axis=0)                   # [6te, w8, 128]
    q = qcat[2 * te - 4:2 * te + 2 * (te + 1)].astype(dt)
    qq = q.reshape(nm, 2, w8, 128)
    m1f = (mm(qq[:, 0].reshape(nm * w8, 128), m1m_ref[0])
           + mm(qq[:, 1].reshape(nm * w8, 128), m1m_ref[1]))
    m1v = vrows(unflat(m1f, nm), -2)
    h50 = prelu(e5 + r5h * flat(m1v), ar5_ref[...])
    n50 = te + 3
    other[0:n50] = vrows(unflat(h50.astype(dt), n50), -2)
    if upto == "b50":
        out_ref[i, j] = jnp.sum(h50)
        return
    h50s = other[0:n50]

    # --- Bottleneck5_1 ---  output cells [-1..TE-1]
    q1 = prelu(mm(flat(h50s), wp51_ref[...])
               + bp51_ref[...].astype(f32), ap51_ref[...])
    q1 = vrows(unflat(q1.astype(dt), n50), -2)
    acc = conv9(q1, cv51_ref, 0, n50 - 2)
    c = prelu(acc + bc51_ref[...].astype(f32),
              ac51_ref[...]).astype(dt)
    e = mm(c, we51_ref[...]) + be51_ref[...].astype(f32)
    h51 = prelu(e + flat(h50s[1:-1]).astype(f32), ar51_ref[...])
    h51 = vrows(unflat(h51.astype(dt), n50 - 2), -1)
    if upto == "b51":
        out_ref[i, j] = jnp.sum(flat(h51).astype(f32))
        return

    # --- Final + entropy/argmax ---  output cells [0..TE)
    # Row-chunked: the full-tile logits at 64C lanes ([TE*W8, 1216]
    # f32, ~21 MB at te=16) can never live in VREGs — computing them
    # whole forces Mosaic through a vmem spill stack for every
    # elementwise op. Stage h51 in scratch and walk `fc`-row chunks so
    # each chunk's logits/exp temporaries stay small; only the scalar
    # entropy sum (or the int8 label tile) survives the loop.
    scr_a[0:te + 1] = h51
    if mode == "predict":
        # ``kf_ref`` is the CLASS-major permutation (c*64 + phase) of
        # the packed Final kernel, so each class's 64 phase logits are
        # one contiguous lane slice; the first-max running argmax
        # matches XLA's lowest-index tie-breaking.
        for r0 in range(0, te, fc):
            r1 = min(r0 + fc, te)
            lp = deconv4(scr_a[r0:r1 + 1], kf_ref, r0 - 1)
            best = lp[:, 0:64]
            idx = jnp.zeros_like(best, dtype=jnp.int32)
            for c in range(1, num_classes):
                v = lp[:, 64 * c:64 * (c + 1)]
                idx = jnp.where(v > best, c, idx)
                best = jnp.maximum(v, best)
            out_ref[0, r0:r1] = idx.reshape(
                r1 - r0, w8, 64).astype(jnp.int8)
        return

    seg = seg_ref[...].astype(f32)
    neg_entropy_sum = jnp.float32(0.0)
    for r0 in range(0, te, fc):
        r1 = min(r0 + fc, te)
        lp = deconv4(scr_a[r0:r1 + 1], kf_ref, r0 - 1)
        if upto == "fdeconv":
            neg_entropy_sum += jnp.sum(lp)
            continue
        mrow = jnp.max(lp, axis=-1, keepdims=True)
        lshift = lp - mrow
        ex = jnp.exp(lshift)
        z = jnp.dot(ex, seg, preferred_element_type=f32)
        sm = jnp.dot(ex * lshift, seg, preferred_element_type=f32)
        neg_entropy_sum += jnp.sum(sm / z - jnp.log(z))

    log_c = jnp.log(jnp.float32(num_classes))
    pixels = jnp.float32(64 * te * w8)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "te", "fc",
                                    "interpret", "upto"))
def fused_tail_entropy_score(y: jnp.ndarray, switches2: jnp.ndarray,
                             mask1: jnp.ndarray, packed: dict,
                             num_classes: int, te: int = 16,
                             fc: int = 4,
                             interpret: bool = False,
                             upto: str = "full") -> jnp.ndarray:
    """Per-image mean entropy-confidence from stage-3 features: stages
    4 and 5, the Final deconv, and the entropy reduction in one Pallas
    kernel over the eighth-res grid.

    :param y:         ``[N, H8, W8, 128]`` stage-3 output
    :param switches2: int8 ``[N, H8, W8, 64]`` B2_0 pool switch VALUES
                      (0..3; reshape of the model's compact storage)
    :param mask1:     ``[N, Hq, Wq, 64]`` B1_0 switch one-hot mask in
                      the front kernel's quarter-grid layout, consumed
                      RAW (the s2d(4) lane re-pack happens in-kernel)
    :returns: ``[N]`` float32 — same math as forward_stage4 + the
              decoder + ``acquisition.mean_confidence(..., "entropy")``
    """
    n, h8, w8, _ = y.shape
    if te < 6 or h8 % te != 0:
        te = h8
    grid_h = h8 // te
    fc = max(1, min(fc, te))

    # compact switch VALUES go to the kernel; one-hot happens in VMEM
    sw = switches2.astype(y.dtype)
    # quarter-grid mask goes RAW: only the free minor-dim pair merge
    # ([.,2W8,64] -> [.,W8,128]) happens in XLA; the phase re-pack to
    # s2d(4)-over-eighth lanes runs IN-kernel via two placement
    # matmuls (the XLA transpose materialized ~268 MB in a strided
    # layout at the custom-call boundary — measured ~14 ms/dispatch)
    m1 = mask1.reshape(n, 2 * h8, w8, 128).astype(y.dtype)

    def tile_at(arr_ch, offs, rows=te):
        return pl.BlockSpec(
            (1, rows, w8, arr_ch),
            lambda i, j, offs=offs: (
                i, jnp.clip(j + offs, 0, grid_h - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    b41, b42 = packed["b41"], packed["b42"]
    stk = lambda key: jnp.stack([b41[key], b42[key]])
    consts = [packed["wp4"], packed["bp4"], packed["ap4"],
              packed["kd4"], packed["bd4"], packed["ad4"],
              packed["we4"], packed["be4"], packed["wr4"],
              packed["ar4"],
              stk("wp"), stk("bp"), stk("ap"),
              jnp.concatenate([b41["cv"], b42["cv"]], axis=0),
              stk("bc"), stk("ac"), stk("we"), stk("be"), stk("ar"),
              packed["wp5"], packed["bp5"], packed["ap5"],
              packed["kd5"], packed["bd5"], packed["ad5"],
              packed["we5"], packed["be5"], packed["wr5"],
              packed["x5"], packed["ar5"],
              packed["wp51"], packed["bp51"], packed["ap51"],
              packed["cv51"], packed["bc51"], packed["ac51"],
              packed["we51"], packed["be51"], packed["ar51"],
              packed["kf"], packed["seg"], packed["m1merge"]]

    partial_sums = pl.pallas_call(
        functools.partial(_tail_kernel, num_classes=num_classes, te=te,
                          h8=h8, fc=fc, upto=upto),
        grid=(n, grid_h),
        in_specs=[tile_at(128, -1), tile_at(128, 0), tile_at(128, 1),
                  tile_at(64, -1), tile_at(64, 0), tile_at(64, 1),
                  tile_at(128, -1, rows=2 * te),
                  tile_at(128, 0, rows=2 * te),
                  tile_at(128, 1, rows=2 * te)]
        + [const_spec(a) for a in consts],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((te + 9, w8, 256), y.dtype),
                        pltpu.VMEM((te + 9, w8, 256), y.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(y, y, y, sw, sw, sw, m1, m1, m1, *consts)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(64 * h8 * w8)


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "te", "fc",
                                    "interpret"))
def fused_tail_predict(y: jnp.ndarray, switches2: jnp.ndarray,
                       mask1: jnp.ndarray, packed: dict,
                       num_classes: int, te: int = 16, fc: int = 4,
                       interpret: bool = False) -> jnp.ndarray:
    """Per-pixel argmax labels from stage-3 features: the same fused
    stage4 + stage5 + Final kernel as :func:`fused_tail_entropy_score`
    but ending in an in-kernel argmax instead of the entropy
    reduction — the inference CLI's hot path (reference
    inference.py:90-98) with full-resolution lane-padded logits never
    existing in HBM.

    Same inputs as the score variant; returns int8 ``[N, H, W]``
    full-resolution class labels (unpacked from the kernel's s2d(8)
    phase tiles by a free-for-int8 host-side reshape/transpose).
    """
    n, h8, w8, _ = y.shape
    if te < 6 or h8 % te != 0:
        te = h8
    grid_h = h8 // te
    fc = max(1, min(fc, te))

    sw = switches2.astype(y.dtype)
    m1 = mask1.reshape(n, 2 * h8, w8, 128).astype(y.dtype)

    def tile_at(arr_ch, offs, rows=te):
        return pl.BlockSpec(
            (1, rows, w8, arr_ch),
            lambda i, j, offs=offs: (
                i, jnp.clip(j + offs, 0, grid_h - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    # class-major permutation of the packed Final kernel: column
    # c*64+phase <- phase*C+c, so each class's 64 phase logits are one
    # contiguous lane slice for the in-kernel argmax sweep
    c = num_classes
    perm = (np.arange(64)[None, :] * c
            + np.arange(c)[:, None]).reshape(-1)
    kfp = packed["kf"][:, :, perm]

    b41, b42 = packed["b41"], packed["b42"]
    stk = lambda key: jnp.stack([b41[key], b42[key]])
    consts = [packed["wp4"], packed["bp4"], packed["ap4"],
              packed["kd4"], packed["bd4"], packed["ad4"],
              packed["we4"], packed["be4"], packed["wr4"],
              packed["ar4"],
              stk("wp"), stk("bp"), stk("ap"),
              jnp.concatenate([b41["cv"], b42["cv"]], axis=0),
              stk("bc"), stk("ac"), stk("we"), stk("be"), stk("ar"),
              packed["wp5"], packed["bp5"], packed["ap5"],
              packed["kd5"], packed["bd5"], packed["ad5"],
              packed["we5"], packed["be5"], packed["wr5"],
              packed["x5"], packed["ar5"],
              packed["wp51"], packed["bp51"], packed["ap51"],
              packed["cv51"], packed["bc51"], packed["ac51"],
              packed["we51"], packed["be51"], packed["ar51"],
              kfp, packed["seg"], packed["m1merge"]]

    labels8 = pl.pallas_call(
        functools.partial(_tail_kernel, num_classes=num_classes, te=te,
                          h8=h8, fc=fc, mode="predict"),
        grid=(n, grid_h),
        in_specs=[tile_at(128, -1), tile_at(128, 0), tile_at(128, 1),
                  tile_at(64, -1), tile_at(64, 0), tile_at(64, 1),
                  tile_at(128, -1, rows=2 * te),
                  tile_at(128, 0, rows=2 * te),
                  tile_at(128, 1, rows=2 * te)]
        + [const_spec(a) for a in consts],
        out_specs=pl.BlockSpec((1, te, w8, 64),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h8, w8, 64), jnp.int8),
        scratch_shapes=[pltpu.VMEM((te + 9, w8, 256), y.dtype),
                        pltpu.VMEM((te + 9, w8, 256), y.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(y, y, y, sw, sw, sw, m1, m1, m1, *consts)

    # s2d(8) phase layout (a*8+b) -> spatial: labels[., 8r+a, 8q+b]
    return (labels8.reshape(n, h8, w8, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h8 * 8, w8 * 8))


# ============================================================
# ICNet front kernel: Branch1 (three conv-BN-ReLU, each 3x3/s2,
# models/icnet.py Branch1_1..Branch1_3) fused with the half-res
# bilinear downsample that feeds the shared stem — one pass over the
# raw full-resolution image (the two dominant full-res costs of the
# ICNet scoring path, reference hot loop active_learning.py:229-263).
#
# Layouts (all RAW or free reshapes of NHWC — no XLA relayout at the
# custom-call boundary):
#   image  [N, H, W, 3]    -> [N, H,    wq, 96]   (32 px x 3 ch lanes)
#   f1     [N, H/8, W/8, 64] = [N, H/8, wq, 256]  (4 px x 64 ch)
#   x_half [N, H/2, W/2, 3]  = [N, H/2, wq, 48]   (16 px x 3 ch)
# with wq = W // 32; every stage keeps one lane-block per 32 input px.
#
# Stride-2 SAME convs (pad_low 0, taps at src 2q+dx, dx in {0,1,2} —
# verified against flax.linen.Conv) are lifted to packed matmuls by
# _wpack_taps_s2; the packing halves per stage: (32 px, 3 ch) ->
# (16, 32) -> (8, 32) -> (4, 64). Row taps read even/odd image rows
# directly from the (prev, cur, next) raw blocks; conv1/conv2 results
# round-trip VMEM scratch split by row parity so the stride-2 row
# selection of the next stage reads contiguous scratch slices.
#
# The 2x downsample matches jax.image.resize(..., "bilinear")
# EXACTLY: antialiased 4-tap tent (1/8, 3/8, 3/8, 1/8) on rows/cols
# (2i-1 .. 2i+2), with boundary weights renormalized over the valid
# taps — (3/7, 3/7, 1/7) at the leading edge, mirrored at the
# trailing edge (measured from resize weight matrices; resize
# renormalizes rather than clamps for down-scaling kernels).
# ============================================================


def _wpack_taps_s2(taps_by_dx, p_in: int):
    """Lift per-column taps ``{dx: [cin, cout]}`` of a stride-2 SAME
    conv (out col q draws src col 2q+dx, dx in {0,1,2}; XLA pads low 0
    high 1) to packed matmul kernels ``{dj: [p_in*cin, p_in//2*cout]}``
    on the (col_phase, channel) lane layout."""
    out = {}
    for dx, w in taps_by_dx.items():
        sels = {}
        for q in range(p_in // 2):
            dj, pb = divmod(2 * q + dx, p_in)
            sels.setdefault(dj, np.zeros((p_in, p_in // 2),
                                         np.float32))[pb, q] = 1.0
        for dj, s in sels.items():
            t = jnp.kron(jnp.asarray(s), w)
            out[dj] = out[dj] + t if dj in out else t
    return out


def _lift3_s2(kernel, p_in: int):
    """3x3/s2 conv kernel -> stacked lifted matmuls ``[6, ...]``
    ordered (dy, dj) row-major, dy in (0, 1, 2) reading image rows
    (2k, 2k+1, 2k+2), dj in (0, 1) reading (unshifted, next-block)."""
    ks = []
    for dy in range(3):
        lifted = _wpack_taps_s2({0: kernel[dy, 0], 1: kernel[dy, 1],
                                 2: kernel[dy, 2]}, p_in)
        zero = jnp.zeros_like(lifted[0])
        ks.extend(lifted.get(dj, zero) for dj in (0, 1))
    return jnp.stack(ks)


def pack_icnet_front(variables):
    """Fold BN and build the packed matmul kernels for
    :func:`fused_icnet_front` from an ICNet variables pytree."""
    p = variables["params"]
    bs = variables["batch_stats"]
    f32 = lambda a: a.astype(jnp.float32)

    def conv_bn(name):
        k, b = _fold_bn(f32(p[name]["conv"]["kernel"]),
                        jax.tree.map(f32, p[name]["bn"]),
                        jax.tree.map(f32, bs[name]["bn"]))
        return k, b

    k1, b1 = conv_bn("Branch1_1")                 # [3,3,3,32]
    k2, b2 = conv_bn("Branch1_2")                 # [3,3,32,32]
    k3, b3 = conv_bn("Branch1_3")                 # [3,3,32,64]
    tile = lambda v, ph: jnp.concatenate([v] * ph)[None, :]

    # half-res downsample column matrices [96, 48]: out px p draws
    # src px (2p-1 .. 2p+2) with (1/8, 3/8, 3/8, 1/8); bm/bp carry the
    # taps that cross into the previous/next 32-px block, f0/fl the
    # boundary renormalization deltas for the image's first/last col.
    bm = np.zeros((96, 48), np.float32)
    b0 = np.zeros((96, 48), np.float32)
    bp = np.zeros((96, 48), np.float32)
    for px in range(16):
        for c in range(3):
            o = px * 3 + c
            for s, wt in ((2 * px - 1, .125), (2 * px, .375),
                          (2 * px + 1, .375), (2 * px + 2, .125)):
                if s < 0:
                    bm[(32 + s) * 3 + c, o] += wt
                elif s > 31:
                    bp[(s - 32) * 3 + c, o] += wt
                else:
                    b0[s * 3 + c, o] += wt
    f0 = np.zeros((96, 48), np.float32)
    fl = np.zeros((96, 48), np.float32)
    for c in range(3):
        f0[0 * 3 + c, c] += 3 / 7 - .375       # out px 0: renorm over
        f0[1 * 3 + c, c] += 3 / 7 - .375       # valid srcs (0, 1, 2)
        f0[2 * 3 + c, c] += 1 / 7 - .125
        o = 15 * 3 + c                         # last out px: (29,30,31)
        fl[29 * 3 + c, o] += 1 / 7 - .125
        fl[30 * 3 + c, o] += 3 / 7 - .375
        fl[31 * 3 + c, o] += 3 / 7 - .375

    return dict(
        w1=_lift3_s2(k1, 32), b1=tile(b1, 16),    # [6,96,512], [1,512]
        w2=_lift3_s2(k2, 16), b2=tile(b2, 8),     # [6,512,256], [1,256]
        w3=_lift3_s2(k3, 8), b3=tile(b3, 4),      # [6,256,256], [1,256]
        bm=jnp.asarray(bm), b0=jnp.asarray(b0), bp=jnp.asarray(bp),
        f0=jnp.asarray(f0), fl=jnp.asarray(fl))


def _make_icnet_front_ops(rawp_ref, rawc_ref, rawn_ref, t, h, dt,
                          bm_ref, b0_ref, bp_ref, f0_ref, fl_ref):
    """Shared body of the two ICNet front kernels
    (:func:`_icnet_front_kernel` / :func:`_icnet_front_stem_kernel`):
    raw-image row access with SAME zero padding, 32-px block shifts,
    lifted stride-2/stride-1 conv row chunks, the 4-tap antialiased
    half-res tent row with top/bottom edge renormalization, and the
    half-res column downsample with left/right edge renormalization.
    One home for the resize weights, edge handling, and conv row
    masking so the fuse_stem=True/False paths cannot diverge (cf.
    :func:`_make_mid_ops_w` for the ENet mid kernels)."""
    f32 = jnp.float32
    wq = rawc_ref.shape[2]
    h2, h4 = h // 2, h // 4

    def mm(a2d, w):
        return jnp.dot(a2d, w.astype(a2d.dtype),
                       preferred_element_type=f32)

    def img_row(local):
        """One raw image row [wq, 96], local index in [-32, 64)
        relative to this tile's 32-row window; rows outside [0, H)
        read zeros (the SAME conv zero padding)."""
        if local < 0:
            v = rawp_ref[0, 32 + local]
        elif local < 32:
            v = rawc_ref[0, local]
        else:
            v = rawn_ref[0, local - 32]
        g = 32 * t + local
        return jnp.where((g >= 0) & (g < h), v, jnp.zeros((), v.dtype))

    def shift_n(a3d):    # next 32-px block (zeros in: right image edge)
        return jnp.concatenate([a3d[:, 1:], jnp.zeros_like(a3d[:, :1])],
                               axis=1)

    def shift_p(a3d):    # previous block (zeros in: left image edge)
        return jnp.concatenate([jnp.zeros_like(a3d[:, :1]), a3d[:, :-1]],
                               axis=1)

    flat = lambda a: a.reshape(a.shape[0] * wq, a.shape[2])

    def finish(acc, m, b_ref, gbase, glimit):
        """Bias + ReLU + row masking shared by the lifted convs: rows
        whose global index falls outside [0, glimit) are SAME zero
        padding and must not carry relu(bias)."""
        out = jnp.maximum(acc + b_ref[...].astype(f32),
                          jnp.zeros((), f32))
        out = out.reshape(m, wq, out.shape[-1]).astype(dt)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (m, 1, 1), 0) + gbase
        return jnp.where((rows >= 0) & (rows < glimit), out,
                         jnp.zeros((), dt))

    def conv_rows(rows_by_dy, w_ref, b_ref, gbase, glimit):
        """One chunk of a lifted stride-2 conv (dj in (0, 1)):
        ``rows_by_dy[dy]`` is the [m, wq, lanes] operand for row tap
        dy."""
        acc = None
        for dy, x in enumerate(rows_by_dy):
            a = mm(flat(x), w_ref[2 * dy]) \
                + mm(flat(shift_n(x)), w_ref[2 * dy + 1])
            acc = a if acc is None else acc + a
        return finish(acc, rows_by_dy[0].shape[0], b_ref, gbase, glimit)

    def conv_s1(rows_by_dy, w_ref, b_ref, gbase, glimit):
        """One chunk of a lifted stride-1 3x3 conv (dj in (-1, 0, 1),
        _wpack_conv3 order)."""
        acc = None
        for dy, x in enumerate(rows_by_dy):
            a = (mm(flat(shift_p(x)), w_ref[3 * dy])
                 + mm(flat(x), w_ref[3 * dy + 1])
                 + mm(flat(shift_n(x)), w_ref[3 * dy + 2]))
            acc = a if acc is None else acc + a
        return finish(acc, rows_by_dy[0].shape[0], b_ref, gbase, glimit)

    def half_row(il, edges=True):
        """Half-res row il (local to this tile): 4-tap antialiased tent
        over image rows 2i-1..2i+2, with renormalized weights at the
        top/bottom image edge and zeros outside [0, H/2). Callers that
        know il is strictly interior pass edges=False to skip the edge
        selects."""
        g = 16 * t + il
        rm1 = img_row(2 * il - 1)
        r0 = img_row(2 * il)
        rp1 = img_row(2 * il + 1)
        rp2 = img_row(2 * il + 2)
        row = .125 * rm1 + .375 * r0 + .375 * rp1 + .125 * rp2
        if not edges:
            return row
        row = jnp.where(g == 0, (3 / 7) * r0 + (3 / 7) * rp1
                        + (1 / 7) * rp2, row)
        row = jnp.where(g == h2 - 1, (1 / 7) * rm1 + (3 / 7) * r0
                        + (3 / 7) * rp1, row)
        return jnp.where((g >= 0) & (g < h2), row,
                         jnp.zeros((), row.dtype))

    def cols_half(x):
        """Column 2x downsample [m, wq, 96] -> [m, wq, 48] with the
        first/last-image-column renormalization."""
        m = x.shape[0]
        v = (mm(flat(shift_p(x)), bm_ref[...]) + mm(flat(x), b0_ref[...])
             + mm(flat(shift_n(x)), bp_ref[...]))
        bidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        zero = jnp.zeros((), x.dtype)
        v = v + mm(flat(jnp.where(bidx == 0, x, zero)), f0_ref[...])
        v = v + mm(flat(jnp.where(bidx == wq - 1, x, zero)), fl_ref[...])
        return v.reshape(m, wq, 48).astype(dt)

    def branch1(w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                s1e, s1o, s2e, s2o):
        """Branch1 conv1 -> conv2 -> conv3 over one 32-row tile;
        returns the tile's [4, wq, 256] f1 block.

        conv1: rows k_local 0..18 (k = 16t + k_local), taps at image
        rows 2k+dy; even k_local -> s1e[k_local/2], odd -> s1o[...].
        conv2: rows j_local 0..8 (j = 8t + j_local), taps at conv1
        rows 2j+dy -> (s1e[j_local], s1o[j_local], s1e[j_local+1]).
        conv3: rows r_local 0..3, taps (s2e[r], s2o[r], s2e[r+1]); all
        four rows are valid (glimit 4 disables the mask)."""
        def c1_operands(a, m):
            return [jnp.stack([img_row(2 * k + dy)
                               for k in range(a, a + m)])
                    for dy in (0, 1, 2)]

        for c in range(9):
            out = conv_rows(c1_operands(2 * c, 2), w1_ref, b1_ref,
                            16 * t + 2 * c, h2)
            s1e[c] = out[0]
            s1o[c] = out[1]
        s1e[9] = conv_rows(c1_operands(18, 1), w1_ref, b1_ref,
                           16 * t + 18, h2)[0]

        def c2_operands(a, m):
            return [s1e[a:a + m], s1o[a:a + m], s1e[a + 1:a + m + 1]]

        for c in range(4):
            out = conv_rows(c2_operands(2 * c, 2), w2_ref, b2_ref,
                            8 * t + 2 * c, h4)
            s2e[c] = out[0]
            s2o[c] = out[1]
        s2e[4] = conv_rows(c2_operands(8, 1), w2_ref, b2_ref,
                           8 * t + 8, h4)[0]

        return conv_rows([s2e[0:4], s2o[0:4], s2e[1:5]],
                         w3_ref, b3_ref, 0, 4)

    return (mm, img_row, shift_n, shift_p, flat, conv_rows, conv_s1,
            half_row, cols_half, branch1)


def _icnet_front_kernel(rawp_ref, rawc_ref, rawn_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        bm_ref, b0_ref, bp_ref, f0_ref, fl_ref,
                        f1_ref, xh_ref, s1e, s1o, s2e, s2o, *, h: int):
    """ICNet front kernel; see the section comment. Each grid cell
    produces 4 rows of f1 (= 32 image rows) and 16 rows of x_half."""
    t = pl.program_id(1)
    (_mm, _img_row, _shn, _shp, _flat, _conv_rows, _conv_s1,
     half_row, cols_half, branch1) = _make_icnet_front_ops(
        rawp_ref, rawc_ref, rawn_ref, t, h, s1e.dtype,
        bm_ref, b0_ref, bp_ref, f0_ref, fl_ref)

    f1_ref[0] = branch1(w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        s1e, s1o, s2e, s2o)

    # x_half: this tile's 16 half rows; all of il 1..14 are interior
    # (only the first/last row of the image renormalize)
    xh_ref[0] = cols_half(jnp.stack(
        [half_row(il, edges=il in (0, 15)) for il in range(16)]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_icnet_front(image: jnp.ndarray, packed: dict,
                      interpret: bool = False):
    """Branch1 + half-res downsample in one Pallas pass over the raw
    image (models/icnet.py:220-227). Returns ``(f1, x_half)`` —
    ``[N, H/8, W/8, 64]`` and ``[N, H/2, W/2, 3]`` — exactly matching
    the flax Branch1_* stack and ``jax.image.resize(x, H/2 x W/2)``.

    :param image: ``[N, H, W, 3]``, H % 32 == W % 32 == 0, already cast
                  to the model compute dtype
    """
    n, h, w, _c = image.shape
    wq = w // 32
    raw = image.reshape(n, h, wq, 96)
    grid = (n, h // 32)
    tl = h // 32 - 1

    blk = lambda im: pl.BlockSpec((1, 32, wq, 96), im,
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    cdt = image.dtype
    consts = [packed["w1"].astype(cdt), packed["b1"],
              packed["w2"].astype(cdt), packed["b2"],
              packed["w3"].astype(cdt), packed["b3"],
              packed["bm"].astype(cdt), packed["b0"].astype(cdt),
              packed["bp"].astype(cdt), packed["f0"].astype(cdt),
              packed["fl"].astype(cdt)]

    f1, xh = pl.pallas_call(
        functools.partial(_icnet_front_kernel, h=h),
        grid=grid,
        in_specs=[blk(lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0)),
                  blk(lambda i, j: (i, j, 0, 0)),
                  blk(lambda i, j: (i, jnp.minimum(j + 1, tl), 0, 0))]
        + [const(a) for a in consts],
        out_specs=[pl.BlockSpec((1, 4, wq, 256),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 16, wq, 48),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, h // 8, wq, 256), cdt),
                   jax.ShapeDtypeStruct((n, h // 2, wq, 48), cdt)],
        scratch_shapes=[pltpu.VMEM((10, wq, 512), cdt),
                        pltpu.VMEM((9, wq, 512), cdt),
                        pltpu.VMEM((5, wq, 256), cdt),
                        pltpu.VMEM((4, wq, 256), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(raw, raw, raw, *consts)

    return (f1.reshape(n, h // 8, w // 8, 64),
            xh.reshape(n, h // 2, w // 2, 3))


def pack_icnet_front_stem(variables):
    """:func:`pack_icnet_front` plus the folded/lifted SharedStem front
    (conv1_1 s2 -> conv1_2 -> conv1_3 -> maxpool 3x3/s2,
    models/icnet.py SharedStem) for :func:`fused_icnet_front_stem`."""
    packed = dict(pack_icnet_front(variables))
    p = variables["params"]["SharedStem"]
    bs = variables["batch_stats"]["SharedStem"]
    f32 = lambda a: a.astype(jnp.float32)

    def conv_bn(name):
        return _fold_bn(f32(p[name]["conv"]["kernel"]),
                        jax.tree.map(f32, p[name]["bn"]),
                        jax.tree.map(f32, bs[name]["bn"]))

    k1, b1 = conv_bn("conv1_1")                   # [3,3,3,32]
    k2, b2 = conv_bn("conv1_2")                   # [3,3,32,32]
    k3, b3 = conv_bn("conv1_3")                   # [3,3,32,64]
    tile = lambda v, ph: jnp.concatenate([v] * ph)[None, :]

    # maxpool 3x3/s2 column routing on the (8 qtr-px, 64 ch) lane
    # layout: out phase e draws qtr phases 2e+dx, dx in {0,1,2}; the
    # dx=2 tap at e=3 crosses into the next block's phase 0 (s2n reads
    # the shift_n operand; disjoint lanes, so s2+s2n sum = union).
    s0 = np.zeros((512, 256), np.float32)
    s1 = np.zeros((512, 256), np.float32)
    s2 = np.zeros((512, 256), np.float32)
    s2n = np.zeros((512, 256), np.float32)
    for e in range(4):
        for c in range(64):
            s0[(2 * e) * 64 + c, e * 64 + c] = 1.0
            s1[(2 * e + 1) * 64 + c, e * 64 + c] = 1.0
            if e < 3:
                s2[(2 * e + 2) * 64 + c, e * 64 + c] = 1.0
            else:
                s2n[c, e * 64 + c] = 1.0
    packed.update(
        sw1=_lift3_s2(k1, 16), sb1=tile(b1, 8),   # [6,48,256], [1,256]
        sw2=_wpack_conv3(k2, 8), sb2=tile(b2, 8),  # [9,256,256]
        sw3=_wpack_conv3(k3, 8), sb3=tile(b3, 8),  # [9,256,512], [1,512]
        s0=jnp.asarray(s0), s1=jnp.asarray(s1),
        s2=jnp.asarray(s2), s2n=jnp.asarray(s2n))
    return packed


def _icnet_front_stem_kernel(rawp_ref, rawc_ref, rawn_ref,
                             w1_ref, b1_ref, w2_ref, b2_ref,
                             w3_ref, b3_ref,
                             bm_ref, b0_ref, bp_ref, f0_ref, fl_ref,
                             sw1_ref, sb1_ref, sw2_ref, sb2_ref,
                             sw3_ref, sb3_ref,
                             p0_ref, p1_ref, p2_ref, p2n_ref,
                             f1_ref, st_ref,
                             s1e, s1o, s2e, s2o, sc1, sc2, sc3,
                             *, h: int):
    """ICNet front+stem kernel: Branch1 (shared with
    _icnet_front_kernel via _make_icnet_front_ops) plus the SharedStem
    front, with the half-res image consumed entirely in VMEM. Each
    grid cell (32 image rows) produces 4 rows of f1 and 4 rows of the
    pooled stem features (both 1/8 res)."""
    t = pl.program_id(1)
    dt = s1e.dtype
    wq = rawc_ref.shape[2]
    h4 = h // 4
    (mm, _img_row, shift_n, _shp, flat, conv_rows, conv_s1,
     half_row, cols_half, branch1) = _make_icnet_front_ops(
        rawp_ref, rawc_ref, rawn_ref, t, h, dt,
        bm_ref, b0_ref, bp_ref, f0_ref, fl_ref)

    f1_ref[0] = branch1(w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        s1e, s1o, s2e, s2o)

    # --- stem: half rows il in [-4, 22] (conv1_1 halo); even/odd
    # parity stacks so conv1_1's stride-2 row taps are contiguous
    # slices: she[u] = half row 2u-4, sho[u] = half row 2u-3 ---
    she = cols_half(jnp.stack([half_row(2 * u - 4) for u in range(14)]))
    sho = cols_half(jnp.stack([half_row(2 * u - 3) for u in range(13)]))

    # conv1_1 (s2): quarter rows k in [-2, 10], taps at half rows
    # 2k+dy -> (she[k+2], sho[k+2], she[k+3])
    sc1[...] = conv_rows([she[0:13], sho[0:13], she[1:14]],
                         sw1_ref, sb1_ref, 8 * t - 2, h4)
    # conv1_2: quarter rows j in [-1, 9], taps sc1 rows j-1..j+1
    sc2[...] = conv_s1([sc1[0:11], sc1[1:12], sc1[2:13]],
                       sw2_ref, sb2_ref, 8 * t - 1, h4)
    # conv1_3: quarter rows r in [0, 8], taps sc2 rows r-1..r+1
    sc3[...] = conv_s1([sc2[0:9], sc2[1:10], sc2[2:11]],
                       sw3_ref, sb3_ref, 8 * t, h4)

    # maxpool 3x3/s2: rows max over conv1_3 rows 2m..2m+2 (zero rows
    # past the edge are max-neutral on post-ReLU values), then column
    # routing matmuls + elementwise max for the three column taps
    v = jnp.stack([jnp.maximum(jnp.maximum(sc3[2 * m], sc3[2 * m + 1]),
                               sc3[2 * m + 2]) for m in range(4)])
    r = jnp.maximum(jnp.maximum(mm(flat(v), p0_ref[...]),
                                mm(flat(v), p1_ref[...])),
                    mm(flat(v), p2_ref[...])
                    + mm(flat(shift_n(v)), p2n_ref[...]))
    st_ref[0] = r.reshape(4, wq, 256).astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_icnet_front_stem(image: jnp.ndarray, packed: dict,
                           interpret: bool = False):
    """Branch1 + half-res downsample + SharedStem front in one Pallas
    pass over the raw image (models/icnet.py:220-228 and SharedStem
    conv1_1..maxpool). Returns ``(f1, stem1)`` — both
    ``[N, H/8, W/8, 64]`` — exactly matching the flax Branch1_* stack
    and ``max_pool(conv1_3(conv1_2(conv1_1(resize(x, H/2 x W/2)))))``.
    The half-res image lives only in VMEM; neither it nor the stem's
    low-channel intermediates ever exist in HBM.

    :param image: ``[N, H, W, 3]``, H % 32 == W % 32 == 0, already cast
                  to the model compute dtype
    """
    n, h, w, _c = image.shape
    wq = w // 32
    raw = image.reshape(n, h, wq, 96)
    grid = (n, h // 32)
    tl = h // 32 - 1

    blk = lambda im: pl.BlockSpec((1, 32, wq, 96), im,
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    cdt = image.dtype
    fp32_keys = {"b1", "b2", "b3", "sb1", "sb2", "sb3"}
    names = ("w1", "b1", "w2", "b2", "w3", "b3",
             "bm", "b0", "bp", "f0", "fl",
             "sw1", "sb1", "sw2", "sb2", "sw3", "sb3",
             "s0", "s1", "s2", "s2n")
    consts = [packed[k] if k in fp32_keys else packed[k].astype(cdt)
              for k in names]

    out8 = lambda: pl.BlockSpec((1, 4, wq, 256), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
    f1, st = pl.pallas_call(
        functools.partial(_icnet_front_stem_kernel, h=h),
        grid=grid,
        in_specs=[blk(lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0)),
                  blk(lambda i, j: (i, j, 0, 0)),
                  blk(lambda i, j: (i, jnp.minimum(j + 1, tl), 0, 0))]
        + [const(a) for a in consts],
        out_specs=[out8(), out8()],
        out_shape=[jax.ShapeDtypeStruct((n, h // 8, wq, 256), cdt),
                   jax.ShapeDtypeStruct((n, h // 8, wq, 256), cdt)],
        scratch_shapes=[pltpu.VMEM((10, wq, 512), cdt),
                        pltpu.VMEM((9, wq, 512), cdt),
                        pltpu.VMEM((5, wq, 256), cdt),
                        pltpu.VMEM((4, wq, 256), cdt),
                        pltpu.VMEM((13, wq, 256), cdt),
                        pltpu.VMEM((11, wq, 256), cdt),
                        pltpu.VMEM((9, wq, 512), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(raw, raw, raw, *consts)

    return (f1.reshape(n, h // 8, w // 8, 64),
            st.reshape(n, h // 8, w // 8, 64))


# ---------------------------------------------------------------------------
# Fused ICNet CFF2 + head: cascade fusion 2 folded into the head kernel
# ---------------------------------------------------------------------------
#
# tools/probe_icnet_boundary.py localized the ICNet chain's largest
# XLA segment cost to CFF2's composition in context: jax.image.resize's
# 2x upsample lowers through gathers in the full graph (an explicit
# polyphase-tap rewrite wins 8.9 ms/batch-16 in XLA but collapses 20x
# at the head8 custom-call boundary — docs/PERF.md ICNet notes). The
# fix with real headroom is to PIN the whole segment inside the kernel:
# this extension computes, per 1/8-row tile,
#
#   low_up = resize2x(fused16)        polyphase taps, clamped edges
#   low_f  = dil-2 3x3 conv 128->128  9 shifted matmuls, BN folded
#   high_f = 1x1(f1) 64->128          BN folded
#   fused8 = relu(low_f + high_f)
#
# and then the unchanged head math (classifier + composed 8x upsample +
# softmax + normalized entropy). Neither fused8, the 1/4-res logits,
# nor any resize intermediate exists in HBM. Ships OFF by default
# (`ICNet.fused_score(fuse_cff2=True)`) until benched on hardware.


def pack_icnet_cff2_head(variables, num_classes: int):
    """Fold CFF2's two ConvBN branches (inference running stats) and
    bundle the head constants for :func:`fused_cff2_head8_entropy_score`.

    Reference math being folded (models/icnet.py CascadeFeatureFusion):
    ``y = (conv(x) - mean) / sqrt(var + eps) * scale + bias`` with
    eps 1e-3 — per-output-channel kernel scaling + bias."""
    # jnp throughout: the pack may run under jit (trace-safe)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    p = variables["params"]["CFF2"]
    s = variables["batch_stats"]["CFF2"]

    def fold(branch):
        k = f32(p[branch]["conv"]["kernel"])
        bn_p, bn_s = p[branch]["bn"], s[branch]["bn"]
        inv = f32(bn_p["scale"]) / jnp.sqrt(f32(bn_s["var"]) + 1e-3)
        return k * inv, (f32(bn_p["bias"])
                         - f32(bn_s["mean"]) * inv)[None, :]

    kc, bc = fold("low")              # [3,3,128,128], [1,128]
    kh, bh = fold("high")             # [1,1,64,128],  [1,128]

    cls_p = variables["params"]["Classifier"]
    c = num_classes
    eye = np.eye(c, dtype=np.float32)
    ml = np.concatenate([w[0] * eye for w in _HEAD8_W], axis=-1)
    m0 = np.concatenate([w[1] * eye for w in _HEAD8_W], axis=-1)
    mr = np.concatenate([w[2] * eye for w in _HEAD8_W], axis=-1)
    seg = np.repeat(np.eye(8, dtype=np.float32), c, axis=0)
    return dict(
        kc=kc.reshape(9, 128, 128),
        bc=bc,
        kh=kh[0, 0], bh=bh,
        wcls=f32(cls_p["kernel"][0, 0]),
        bcls=f32(cls_p["bias"])[None, :],
        ml=jnp.asarray(ml), m0=jnp.asarray(m0), mr=jnp.asarray(mr),
        seg=jnp.asarray(seg))


def _cff2_head8_kernel(f16_ref, u2_ref, u1_ref, d1_ref, d2_ref,
                       f1_ref, f1u_ref, f1d_ref,
                       kc_ref, bc_ref, kh_ref, bh_ref,
                       wcls_ref, bcls_ref, ml_ref, m0_ref, mr_ref,
                       seg_ref, out_ref,
                       *, num_classes: int, tile_h: int, h8: int,
                       mode: str = "entropy"):
    """See the section comment. Grid (N, H8/tile_h); the fused16 tile
    carries four single-row clipped halos (the resize's edge clamp),
    f1 two; the conv's SAME zero padding comes from masking rows
    outside the global image."""
    i, j = pl.program_id(0), pl.program_id(1)
    f32 = jnp.float32
    th = tile_h
    th2 = th // 2
    dt = f16_ref.dtype

    # --- resize2x rows: sixteenth rows (clamped) -> eighth rows ---
    y16 = jnp.concatenate(
        [u2_ref[0], u1_ref[0], f16_ref[0], d1_ref[0], d2_ref[0]],
        axis=0)                        # [th2+4, W16, 128], row k ↦
    #                                    global sixteenth j*th2 - 2 + k
    rows = []
    for er in range(th + 6):           # eighth rows j*th - 3 + er
        off = er - 3
        par = off % 2
        base = (off - par) // 2 + 2    # y16 index of sixteenth row i16
        if par == 0:                   # out[2i] = .25 y[i-1] + .75 y[i]
            rows.append(0.25 * y16[base - 1] + 0.75 * y16[base])
        else:                          # out[2i+1] = .75 y[i] + .25 y[i+1]
            rows.append(0.75 * y16[base] + 0.25 * y16[base + 1])
    lu = jnp.stack(rows)               # [th+6, W16, 128]
    # resize2x columns (edge clamp)
    left = jnp.concatenate([lu[:, :1], lu[:, :-1]], axis=1)
    right = jnp.concatenate([lu[:, 1:], lu[:, -1:]], axis=1)
    ce = 0.25 * left + 0.75 * lu
    co = 0.75 * lu + 0.25 * right
    low_up = jnp.stack([ce, co], axis=2)
    w8 = 2 * lu.shape[1]
    low_up = low_up.reshape(th + 6, w8, 128).astype(dt)
    # conv SAME zero padding at the global top/bottom edges
    ge = (jax.lax.broadcasted_iota(jnp.int32, (th + 6, 1, 1), 0)
          + j * th - 3)
    low_up = jnp.where((ge >= 0) & (ge < h8), low_up,
                       jnp.zeros((), dt))

    # --- dil-2 3x3 conv (BN folded), output eighth rows j*th-1 .. ---
    zeros2 = jnp.zeros_like(low_up[:, :2])
    l2 = jnp.concatenate([zeros2, low_up[:, :-2]], axis=1)
    r2 = jnp.concatenate([low_up[:, 2:], zeros2], axis=1)
    nrows = th + 2
    flatc = lambda a: a.reshape(nrows * w8, 128)
    acc = bc_ref[...].astype(f32)
    for ty in range(3):                 # dy = 2*(ty-1)
        r0 = 2 * ty                     # low_up rel row of out row 0
        for tx, src in enumerate((l2, low_up, r2)):
            acc = acc + jnp.dot(
                flatc(src[r0:r0 + nrows]),
                kc_ref[ty * 3 + tx].astype(dt),
                preferred_element_type=f32)

    # --- 1x1 high branch (BN folded) on clamped f1 rows ---
    f1rows = jnp.concatenate([f1u_ref[0], f1_ref[0], f1d_ref[0]],
                             axis=0)    # [th+2, W8, 64]
    high = jnp.dot(f1rows.reshape(nrows * w8, -1),
                   kh_ref[...].astype(dt),
                   preferred_element_type=f32) + bh_ref[...].astype(f32)

    f8 = jnp.maximum(acc + high, 0.0).reshape(nrows, w8, 128) \
        .astype(dt)
    # the head's row clamp at the GLOBAL edges: row above the first
    # tile / below the last tile must equal the boundary row itself
    grid_h = h8 // th
    top = jnp.where(j == 0, f8[1], f8[0])
    bot = jnp.where(j == grid_h - 1, f8[th], f8[th + 1])
    f8 = jnp.concatenate([top[None], f8[1:th + 1], bot[None]], axis=0)

    # --- unchanged head math (classifier + composed 8x + entropy) ---
    wcls = wcls_ref[...].astype(dt)
    bcls = bcls_ref[...].astype(f32)
    cls = lambda a: (jnp.dot(a.reshape(th * w8, 128), wcls,
                             preferred_element_type=f32)
                     + bcls).reshape(th, w8, -1)
    y, yu, yd = cls(f8[1:th + 1]), cls(f8[0:th]), cls(f8[2:th + 2])

    c = y.shape[-1]
    flat = lambda a: a.reshape(th * w8, c)
    ml = ml_ref[...].astype(f32)
    m0 = m0_ref[...].astype(f32)
    mr = mr_ref[...].astype(f32)
    seg = seg_ref[...].astype(f32)

    if mode == "predict":
        # ml/m0/mr arrive CLASS-major (see fused_head8_predict):
        # first-max running argmax == XLA's lowest-index tie-breaking
        labs = []
        for t in range(8):
            w = _HEAD8_W[t]
            r = w[0] * yu + w[1] * y + w[2] * yd
            rl = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
            rr = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
            lp = (jnp.dot(flat(rl), ml, preferred_element_type=f32)
                  + jnp.dot(flat(r), m0, preferred_element_type=f32)
                  + jnp.dot(flat(rr), mr, preferred_element_type=f32))
            best = lp[:, 0:8]
            idx = jnp.zeros_like(best, dtype=jnp.int32)
            for cc in range(1, num_classes):
                v = lp[:, 8 * cc:8 * (cc + 1)]
                idx = jnp.where(v > best, cc, idx)
                best = jnp.maximum(v, best)
            labs.append(idx.reshape(th, w8, 8))
        out_ref[0] = jnp.concatenate(labs, axis=-1).astype(jnp.int8)
        return

    log_c = jnp.log(jnp.float32(num_classes))
    neg_entropy_sum = jnp.float32(0.0)
    for t in range(8):
        w = _HEAD8_W[t]
        r = w[0] * yu + w[1] * y + w[2] * yd
        rl = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
        rr = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
        lp = (jnp.dot(flat(rl), ml, preferred_element_type=f32)
              + jnp.dot(flat(r), m0, preferred_element_type=f32)
              + jnp.dot(flat(rr), mr, preferred_element_type=f32))
        m = jnp.max(lp, axis=-1, keepdims=True)
        lshift = lp - m
        e = jnp.exp(lshift)
        z = jnp.dot(e, seg, preferred_element_type=f32)
        s = jnp.dot(e * lshift, seg, preferred_element_type=f32)
        neg_entropy_sum = neg_entropy_sum + jnp.sum(s / z - jnp.log(z))
    pixels = jnp.float32(64 * th * w8)
    out_ref[i, j] = pixels + neg_entropy_sum / log_c


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_h", "interpret"))
def fused_cff2_head8_entropy_score(fused16: jnp.ndarray,
                                   f1: jnp.ndarray, packed: dict,
                                   num_classes: int, tile_h: int = 4,
                                   interpret: bool = False
                                   ) -> jnp.ndarray:
    """Per-image mean entropy-confidence of CFF2 + the full ICNet head
    in ONE Pallas pass over the 1/16-res fused features and the
    1/8-res branch-1 features (see the section comment; exactness vs
    the XLA ``cff2 -> fused_head8_entropy_score`` composition is
    pinned in tests/test_icnet.py).

    :param fused16: ``[N, H16, W16, 128]`` CFF1 output
    :param f1:      ``[N, H8, W8, 64]`` branch-1 features (H8 = 2*H16)
    :param packed:  :func:`pack_icnet_cff2_head` output
    :returns: ``[N]`` float32 mean confidences
    """
    n, h16, w16, _ = fused16.shape
    h8 = 2 * h16
    w8 = 2 * w16
    if tile_h % 2 or h8 % tile_h:
        tile_h = h8 if h8 % 2 == 0 else 2 * h8  # h8 always even
    grid_h = h8 // tile_h
    th2 = tile_h // 2

    names = ("kc", "bc", "kh", "bh", "wcls", "bcls", "ml", "m0", "mr",
             "seg")
    consts = [packed[k] for k in names]
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    f16_spec = pl.BlockSpec((1, th2, w16, 128),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def row16(off):
        return pl.BlockSpec(
            (1, 1, w16, 128),
            lambda i, j, off=off: (i, jnp.clip(j * th2 + off, 0,
                                               h16 - 1), 0, 0),
            memory_space=pltpu.VMEM)

    f1_spec = pl.BlockSpec((1, tile_h, w8, 64),
                           lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)

    def row8(off, scale):
        return pl.BlockSpec(
            (1, 1, w8, 64),
            lambda i, j, off=off: (i, jnp.clip(j * scale + off, 0,
                                               h8 - 1), 0, 0),
            memory_space=pltpu.VMEM)

    partial_sums = pl.pallas_call(
        functools.partial(_cff2_head8_kernel, num_classes=num_classes,
                          tile_h=tile_h, h8=h8),
        grid=(n, grid_h),
        in_specs=[f16_spec, row16(-2), row16(-1), row16(th2),
                  row16(th2 + 1), f1_spec, row8(-1, tile_h),
                  row8(tile_h, tile_h)]
        + [const(a) for a in consts],
        out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fused16, fused16, fused16, fused16, fused16, f1, f1, f1,
      *consts)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(64 * h8 * w8)


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile_h", "interpret"))
def fused_cff2_head8_predict(fused16: jnp.ndarray, f1: jnp.ndarray,
                             packed: dict, num_classes: int,
                             tile_h: int = 4,
                             interpret: bool = False) -> jnp.ndarray:
    """Per-pixel argmax labels of CFF2 + the full ICNet head in ONE
    Pallas pass (the predict twin of
    :func:`fused_cff2_head8_entropy_score`; same tile/halo layout,
    ending in the in-kernel argmax of :func:`fused_head8_predict`).
    Returns int8 ``[N, H, W]`` full-resolution class labels."""
    n, h16, w16, _ = fused16.shape
    h8 = 2 * h16
    w8 = 2 * w16
    # same scoped-vmem stack clamp as fused_head8_predict (the argmax
    # sweep's footprint scales with tile_h*w8), floored at 2 because
    # the kernel consumes 1/16-res rows in pairs
    while tile_h > 2 and tile_h * w8 > 512:
        tile_h -= 2
    if tile_h % 2 or h8 % tile_h:
        tile_h = h8
    grid_h = h8 // tile_h
    th2 = tile_h // 2
    c = num_classes

    eye = np.eye(c, dtype=np.float32)
    ml = np.concatenate([w[0] * eye for w in _HEAD8_W], axis=-1)
    m0 = np.concatenate([w[1] * eye for w in _HEAD8_W], axis=-1)
    mr = np.concatenate([w[2] * eye for w in _HEAD8_W], axis=-1)
    # class-major permutation (see fused_head8_predict)
    perm = (np.arange(8)[None, :] * c
            + np.arange(c)[:, None]).reshape(-1)
    ml, m0, mr = ml[:, perm], m0[:, perm], mr[:, perm]
    seg = np.repeat(np.eye(8, dtype=np.float32), c, axis=0)

    consts = [packed["kc"], packed["bc"], packed["kh"], packed["bh"],
              packed["wcls"], packed["bcls"], jnp.asarray(ml),
              jnp.asarray(m0), jnp.asarray(mr), jnp.asarray(seg)]
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    f16_spec = pl.BlockSpec((1, th2, w16, 128),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def row16(off):
        return pl.BlockSpec(
            (1, 1, w16, 128),
            lambda i, j, off=off: (i, jnp.clip(j * th2 + off, 0,
                                               h16 - 1), 0, 0),
            memory_space=pltpu.VMEM)

    f1_spec = pl.BlockSpec((1, tile_h, w8, 64),
                           lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)

    def row8(off):
        return pl.BlockSpec(
            (1, 1, w8, 64),
            lambda i, j, off=off: (i, jnp.clip(j * tile_h + off, 0,
                                               h8 - 1), 0, 0),
            memory_space=pltpu.VMEM)

    labels8 = pl.pallas_call(
        functools.partial(_cff2_head8_kernel, num_classes=num_classes,
                          tile_h=tile_h, h8=h8, mode="predict"),
        grid=(n, grid_h),
        in_specs=[f16_spec, row16(-2), row16(-1), row16(th2),
                  row16(th2 + 1), f1_spec, row8(-1), row8(tile_h)]
        + [const(a) for a in consts],
        out_specs=pl.BlockSpec((1, tile_h, w8, 64),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h8, w8, 64), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fused16, fused16, fused16, fused16, fused16, f1, f1, f1,
      *consts)

    # lane layout t*8+p -> spatial: labels[., 8r+t, 8q+p]
    return (labels8.reshape(n, h8, w8, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h8 * 8, w8 * 8))
