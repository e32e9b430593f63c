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
def fused_decoder_entropy_score(f4: jnp.ndarray, switches: jnp.ndarray,
                                packed: dict, num_classes: int,
                                tile_q: int = 4,
                                interpret: bool = False) -> jnp.ndarray:
    """Per-image mean entropy-confidence from stage-4 features: the whole
    ENet decoder (Bottleneck5_0 + 5_1 + Final) fused with the entropy
    reduction in one Pallas kernel (see module comment).

    :param f4:       ``[N, Hq, Wq, 64]`` stage-4 output (quarter res)
    :param switches: ``[N, Hq, Wq*C2]`` int8 pool switches from
                     Bottleneck1_0 (ops/nn.py storage layout)
    :param packed:   :func:`pack_enet_decoder` output
    :returns: ``[N]`` float32 — same math as running Bottleneck5_0/5_1 +
              Final then ``acquisition.mean_confidence(..., "entropy")``
    """
    n, hq, wq, _cin = f4.shape
    c2 = switches.shape[-1] // wq
    if tile_q < 2 or hq % tile_q != 0:
        tile_q = hq
    grid_h = hq // tile_q

    # one-hot switches in phase-packed layout [N,Hq,Wq,4*C2]
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
        interpret=interpret,
    )(f4, f4, f4, f4, msk, msk, msk, *consts)

    return jnp.sum(partial_sums, axis=1) / jnp.float32(16 * hq * wq)
