"""ICNet (arXiv:1704.08545) — full implementation.

The reference shipped only an empty 7-line stub
(models/icnet/icnet.py:1-7) while its configs still listed ICNet as a
capability target, so this is net-new work following the paper:

- **Branch 1** (full res, light): three 3x3/s2 conv-BN-ReLU layers
  (32, 32, 64 channels) -> features at 1/8 resolution.
- **Branch 2** (1/2 res): PSPNet50-style stem + res-stage 2 and the
  first stride-2 unit of stage 3 -> 256-channel features at 1/16.
- **Branch 3** (1/4 res): continues from branch 2's features,
  downsampled 2x, through res-stages 3..5 with dilated convolutions
  (2 for stage 4, 4 for stage 5 — no further striding) and a pyramid
  pooling module (sum-fused, windows 1/2/3/6) -> 256ch at 1/32.
  Branches 2 and 3 share weights over stages 1-3a exactly as in the
  paper (§3.1: the half/quarter branches share the top layers).
- **CFF** (cascade feature fusion, §3.3): upsample low-res 2x ->
  3x3 dilation-2 conv-BN alongside a 1x1 conv-BN on the high-res
  input, sum, ReLU. Each CFF also emits an auxiliary classifier on the
  upsampled low-res features for cascade label guidance (§3.2,
  loss weights 1.0 / 0.4 / 0.4).
- Head: fused 1/8 features -> upsample 2x -> 1x1 classifier at 1/4 ->
  bilinear upsample 4x to full-resolution logits.

Input H/W must be divisible by 32. All convs are bias-free conv-BN(-ReLU).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import Conv

_KERNEL_INIT = nn.initializers.glorot_uniform()


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear")


def _resize_bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (``jax.image.resize`` semantics:
    half-pixel centers, edge clamp) as explicit polyphase taps
    (0.25/0.75 of clamped neighbours) + lane-full interleaves.

    ``jax.image.resize``'s general lowering of the same op measured
    +8.9 ms/batch-16 inside the CFF segment on v5e
    (tools/probe_icnet_boundary.py ``chain`` 53.6 vs ``phup`` 44.7
    ms/batch): in context XLA lowers it through gathers, while the tap
    form is two weighted adds per axis on full-lane 128-channel
    planes. Agreement with ``_resize_bilinear(x, (2H, 2W))`` is
    pinned to fp tolerance in tests/test_icnet.py."""
    n, h, w, c = x.shape
    r0 = 0.25 * _shift1d_clamped(x, 1, -1) + 0.75 * x
    r1 = 0.75 * x + 0.25 * _shift1d_clamped(x, 1, 1)
    r = jnp.stack([r0, r1], axis=2).reshape(n, 2 * h, w, c)
    c0 = 0.25 * _shift1d_clamped(r, 2, -1) + 0.75 * r
    c1 = 0.75 * r + 0.25 * _shift1d_clamped(r, 2, 1)
    return jnp.stack([c0, c1], axis=3).reshape(n, 2 * h, 2 * w, c) \
        .astype(x.dtype)


def _shift1d_clamped(x: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """``y[i] = x[clamp(i + d)]`` along ``axis``, ``d`` in {-1, 0, 1}
    (the edge-clamped neighbour reads of a bilinear upsample)."""
    if d == 0:
        return x
    body = [slice(None)] * x.ndim
    edge = [slice(None)] * x.ndim
    if d > 0:
        body[axis] = slice(1, None)
        edge[axis] = slice(-1, None)
        return jnp.concatenate([x[tuple(body)], x[tuple(edge)]],
                               axis=axis)
    body[axis] = slice(None, -1)
    edge[axis] = slice(None, 1)
    return jnp.concatenate([x[tuple(edge)], x[tuple(body)]], axis=axis)


def _resize_bilinear_phase(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """``factor``-x bilinear upsample emitted in the
    ``ops.nn.s2d_plane`` phase order: ``[N,h,w,C] -> [N,h,f*f*w,C]``
    where flat column ``f*f*cc + f*a + b`` equals full-res pixel
    ``(f*r + a, f*c + b)`` of ``_resize_bilinear(x, (f*h, f*w))``.

    A bilinear upsample is a polyphase filter: each of the ``f*f``
    output phases is a fixed 2x2-tap interpolation of the coarse grid
    (half-pixel centers, edge clamp — jax.image.resize semantics; edge
    taps collapse onto the border pixel exactly like its weight
    renormalization). Emitting phases directly skips the full-res
    interleave, whose strided relayout XLA lowers at ~12 GB/s — the
    same pathology measured at +58 ms on the ENet train step — and
    per-pixel consumers (argmax/CE/confusion) are permutation-
    invariant."""
    f = factor
    n, h, w, c = x.shape

    def taps(a):
        off = (2 * a + 1 - f) / (2 * f)
        lo = -1 if off < 0 else 0
        frac = off - lo
        return lo, 1.0 - frac, frac

    rows = []
    for a in range(f):
        lo, w0, w1 = taps(a)
        rows.append(w0 * _shift1d_clamped(x, 1, lo)
                    + w1 * _shift1d_clamped(x, 1, lo + 1))
    phases = []
    for a in range(f):
        for b in range(f):
            lo, w0, w1 = taps(b)
            phases.append(w0 * _shift1d_clamped(rows[a], 2, lo)
                          + w1 * _shift1d_clamped(rows[a], 2, lo + 1))
    y = jnp.stack(phases, axis=3)        # [n, h, w, f*f (a*f+b), c]
    return y.reshape(n, h, f * f * w, c).astype(x.dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32   # computation dtype; bf16 for TPU speed
    conv_impl: str = "auto"    # models/blocks.py conv lowering

    @nn.compact
    def __call__(self, x, training: bool):
        x = x.astype(self.dtype)
        x = Conv(self.features, (self.kernel, self.kernel),
                 strides=(self.strides, self.strides),
                 dilation=self.dilation, dtype=self.dtype,
                 impl=self.conv_impl, name="conv")(x)
        # statistics/params stay fp32; activations may be bf16
        x = nn.BatchNorm(use_running_average=not training, momentum=0.90,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class ResBottleneck(nn.Module):
    """ResNet bottleneck: 1x1 reduce -> 3x3 (stride/dilation) -> 1x1
    expand, projection shortcut when shape changes."""

    features: int            # output channels (4x the bottleneck width)
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool):
        width = self.features // 4
        dt = self.dtype
        ci = self.conv_impl
        h = ConvBN(width, 1, dtype=dt, conv_impl=ci,
                   name="reduce")(x, training)
        h = ConvBN(width, 3, strides=self.strides, dilation=self.dilation,
                   dtype=dt, conv_impl=ci, name="conv")(h, training)
        h = ConvBN(self.features, 1, relu=False, dtype=dt, conv_impl=ci,
                   name="expand")(h, training)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvBN(self.features, 1, strides=self.strides,
                       relu=False, dtype=dt, conv_impl=ci,
                       name="proj")(x, training)
        return nn.relu(h + x.astype(dt))


class PyramidPooling(nn.Module):
    """Sum-fused pyramid pooling (ICNet uses sum, not PSPNet's concat):
    average pool at window fractions 1/1, 1/2, 1/3, 1/6 of the feature
    map, upsample back, add."""

    bins: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x, training: bool):
        n, h, w, c = x.shape
        out = x
        for b in self.bins:
            ph, pw = max(h // b, 1), max(w // b, 1)
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            out = out + _resize_bilinear(pooled, (h, w)).astype(out.dtype)
        return out


class CascadeFeatureFusion(nn.Module):
    """CFF unit (paper fig. 4) + auxiliary cascade classifier."""

    features: int
    num_classes: int
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, low, high, training: bool):
        # NOTE: the polyphase-tap 2x form (_resize_bilinear_up2)
        # measured 8.9 ms/batch-16 FASTER here in the XLA-only chain
        # (tools/probe_icnet_boundary.py 'phup') but 20x SLOWER when
        # the fused8 output feeds the head8 Pallas kernel (the
        # interleaved layout collides with the custom-call boundary:
        # BENCH_MODEL=ICNet measured 18.5 img/s vs 364) — so the
        # resize lowering stays; see docs/PERF.md ICNet notes.
        low_up = _resize_bilinear(low, (high.shape[1], high.shape[2]))
        # aux logits in fp32 for loss stability
        aux_logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                             kernel_init=_KERNEL_INIT,
                             name="aux_cls")(low_up.astype(jnp.float32))
        low_f = ConvBN(self.features, 3, dilation=2, relu=False,
                       dtype=self.dtype, conv_impl=self.conv_impl,
                       name="low")(low_up, training)
        high_f = ConvBN(self.features, 1, relu=False, dtype=self.dtype,
                        conv_impl=self.conv_impl,
                        name="high")(high, training)
        return nn.relu(low_f + high_f), aux_logits


class SharedStem(nn.Module):
    """PSPNet50 layers shared by branches 2 and 3: stem (1/2) ->
    maxpool (1/4) -> stage2 (3 blocks, 128ch) -> stage3 first unit
    (stride 2, 256ch) => 1/8 of its input."""

    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    def setup(self):
        dt = self.dtype
        ci = self.conv_impl
        self.conv1_1 = ConvBN(32, 3, strides=2, dtype=dt, conv_impl=ci,
                              name="conv1_1")
        self.conv1_2 = ConvBN(32, 3, dtype=dt, conv_impl=ci,
                              name="conv1_2")
        self.conv1_3 = ConvBN(64, 3, dtype=dt, conv_impl=ci,
                              name="conv1_3")
        self.res2 = [ResBottleneck(128, dtype=dt, conv_impl=ci,
                                   name=f"res2_{i + 1}")
                     for i in range(3)]
        self.res3_1 = ResBottleneck(256, strides=2, dtype=dt,
                                    conv_impl=ci, name="res3_1")

    def __call__(self, x, training: bool):
        h = self.conv1_1(x, training)
        h = self.conv1_2(h, training)
        h = self.conv1_3(h, training)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        return self.from_pool(h, training)

    def from_pool(self, h, training: bool):
        """Res-blocks from the pooled 1/4(-of-branch-input) features —
        the entry point for the Pallas front+stem kernel, which emits
        these directly (ops/pallas_kernels.fused_icnet_front_stem)."""
        for blk in self.res2:
            h = blk(h, training)
        return self.res3_1(h, training)


class LowResTail(nn.Module):
    """Branch-3 continuation at 1/32: rest of stage 3, dilated stages
    4-5, pyramid pooling, 1x1 reduce to 256."""

    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool, upto: str = None):
        # ``upto`` returns the intermediate after that group — the
        # attribution entry points for tools/probe_icnet_cff.py (apply
        # with a partial graph leaves later params unused, which is
        # fine outside init)
        dt = self.dtype
        ci = self.conv_impl
        h = x
        for i in range(3):
            h = ResBottleneck(256, dtype=dt, conv_impl=ci,
                              name=f"res3_{i + 2}")(h, training)
        if upto == "res3":
            return h
        for i in range(6):
            h = ResBottleneck(512, dilation=2, dtype=dt, conv_impl=ci,
                              name=f"res4_{i + 1}")(h, training)
        if upto == "res4":
            return h
        for i in range(3):
            h = ResBottleneck(1024, dilation=4, dtype=dt, conv_impl=ci,
                              name=f"res5_{i + 1}")(h, training)
        if upto == "res5":
            return h
        h = PyramidPooling(name="ppm")(h, training)
        if upto == "ppm":
            return h
        return ConvBN(256, 1, dtype=dt, conv_impl=ci,
                      name="reduce")(h, training)


class ICNet(nn.Module):
    num_classes: int
    # accepted for registry uniformity with ENet; ICNet has no dropout
    drop_rates: Sequence[float] = ()
    dtype: Any = jnp.float32   # computation dtype; bf16 for TPU speed
    # conv lowering: "auto" = lax.conv EVERYWHERE for ICNet (round 5,
    # measured at the production shape, batch 8 @1024x2048 bf16
    # grouped: training 168.2 ms/step with the shifted-matmul
    # branches/stem vs 97.8 with lax — the lowering that wins ENet
    # training at 512x1024 loses 1.72x here; the 256-1024ch tail was
    # already lax per the round-4 CFF probe, docs/PERF.md §2b).
    # "matmul"/"lax" force one lowering everywhere.
    conv_impl: str = "auto"

    # no dropout layers -> MC-dropout measures (BALD) are meaningless
    uses_dropout = False
    # cascade label guidance weights: (1/4 main, 1/8 aux, 1/16 aux)
    ms_loss_weights = (1.0, 0.4, 0.4)
    # scoring can stop at the 1/4-res classifier head: the full-res
    # logits are a pure bilinear upsample of it (see fused_score)
    supports_fused_scoring = True
    # serving default: the plain lax forward beats the predict-kernel
    # chain for ICNet since the round-5 conv lowering (224.8 vs 180.5
    # img/s at batch 16 @1024x2048 bf16, tools/probe_icnet_predict.py)
    # — the kernels remain available via SSAL_FUSED_PREDICT=1
    fused_predict_default = False
    # top-level param collection holding the classifier head (used by
    # checkpoint.reinitialize_final_layer, the `-r` transfer flag)
    output_module = "Classifier"
    # input H/W must divide this (1/32-resolution low branch)
    input_divisor = 32
    # __call__(return_phase_logits=True) emits [N, H/4, 4W, C] logits
    # in the 4x-upsample's polyphase pixel order (ops.nn.s2d_plane
    # factor 4). Unlike ENet — whose Final deconv is phase-NATIVE, so
    # phase-domain training skipped a measured +58 ms d2s relayout —
    # ICNet's phase form must be *constructed* (16 clamped-shift
    # weighted adds, _resize_bilinear_phase) while XLA lowers the plain
    # bilinear resize efficiently: measured train step 91.4 ms plain vs
    # 96.1 ms phase (batch 8 @512x1024 bf16 multiscale, v5e, incl
    # ~28 ms relay floor). Phase therefore stays OPT-IN here
    # (make_*_step(phase_logits=True)); parity is pinned by
    # tests/test_phase_logits.py::TestICNetPhase.
    supports_phase_logits = False
    phase_factor = 4
    # the multiscale loss heads (cls4/aux8/aux16) exclude the primary
    # logits, so phase logits compose with multiscale training (the
    # metrics argmax consumes them; the cascade CE never does)
    phase_with_multiscale = True

    def setup(self):
        dt = self.dtype if self.dtype is not None else jnp.float32
        # see conv_impl: "auto" resolves to lax for every ICNet stage
        ci = "lax" if self.conv_impl == "auto" else self.conv_impl
        self.branch1_1 = ConvBN(32, 3, strides=2, dtype=dt, conv_impl=ci,
                                name="Branch1_1")
        self.branch1_2 = ConvBN(32, 3, strides=2, dtype=dt, conv_impl=ci,
                                name="Branch1_2")
        self.branch1_3 = ConvBN(64, 3, strides=2, dtype=dt, conv_impl=ci,
                                name="Branch1_3")
        self.stem = SharedStem(dtype=dt, conv_impl=ci, name="SharedStem")
        # high-channel 1/32-res tail: MXU-shape-bound, keep lax under
        # "auto" (same reasoning as ENet's stage-2/3)
        self.tail = LowResTail(dtype=dt, conv_impl=ci,
                               name="LowResTail")
        self.cff1 = CascadeFeatureFusion(128, self.num_classes, dtype=dt,
                                         conv_impl=ci, name="CFF1")
        self.cff2 = CascadeFeatureFusion(128, self.num_classes, dtype=dt,
                                         conv_impl=ci, name="CFF2")
        self.classifier = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                                  kernel_init=_KERNEL_INIT,
                                  name="Classifier")

    def __call__(self, x, training: bool = False,
                 multiscale: bool = False,
                 return_pre_logits: bool = False,
                 return_features8: bool = False,
                 return_embedding: bool = False,
                 return_phase_logits: bool = False):
        n, h, w, _c = x.shape
        if h % 32 or w % 32:
            raise ValueError(
                f"ICNet input dims must be divisible by 32, got {h}x{w}")
        dt = self.dtype if self.dtype is not None else jnp.float32
        x = x.astype(dt)

        # Branch 1: full res -> 1/8, 64ch
        f1 = self.branch1_1(x, training)
        f1 = self.branch1_2(f1, training)
        f1 = self.branch1_3(f1, training)

        # Branch 2: 1/2 res through the shared stem -> 1/16, 256ch
        x_half = _resize_bilinear(x, (h // 2, w // 2))
        f2 = self.stem(x_half, training)

        # Branch 3: share f2, downsample 2x, dilated tail -> 1/32, 256ch
        f3 = _resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2))
        f3 = self.tail(f3, training)

        # Cascade fusion: (1/32 + 1/16) -> 1/16, then (1/16 + 1/8) -> 1/8
        fused16, aux16 = self.cff1(f3, f2, training)
        fused8, aux8 = self.cff2(fused16, f1, training)

        if return_embedding:
            # global-average-pooled cascade-fused features [N,128] for
            # diversity (core-set) selection, ops/selection
            return jnp.mean(fused8.astype(jnp.float32), axis=(1, 2))

        if return_features8:
            # 1/8-res fused features for the fully-fused scoring head
            # (pallas_kernels.fused_head8_entropy_score): the 1x1
            # classifier commutes with the bilinear resizes, so the
            # whole head runs in-kernel off these features.
            return fused8

        # Head: 1/8 -> 1/4 -> classify (fp32 logits) -> full res
        up4 = _resize_bilinear(fused8, (h // 4, w // 4))
        cls4 = self.classifier(up4.astype(jnp.float32))

        if return_pre_logits:
            # 1/4-res logits for the fused scoring path: the tail
            # (bilinear 4x upsample + softmax + confidence + mean) runs
            # chunked in ops/acquisition.chunked_upsample_mean_confidence
            # so full-res lane-padded logits never hit HBM.
            return cls4

        if return_phase_logits:
            logits = _resize_bilinear_phase(cls4, 4)
        else:
            logits = _resize_bilinear(cls4, (h, w))

        if not multiscale:
            return logits
        return logits, (cls4, aux8, aux16)

    def fuse_from_front(self, f1, x_half, training: bool = False):
        """Stem -> tail -> cascade fusion from precomputed Branch1
        features and the half-res image (both produced by the Pallas
        front kernel, ops/pallas_kernels.fused_icnet_front)."""
        f2 = self.stem(x_half, training)
        f3 = _resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2))
        f3 = self.tail(f3, training)
        fused16, _ = self.cff1(f3, f2, training)
        fused8, _ = self.cff2(fused16, f1, training)
        return fused8

    def fuse_to_cff1(self, stem1, training: bool = False):
        """Stem res-blocks -> tail -> CFF1 only: returns the 1/16-res
        fused features for the CFF2+head Pallas kernel
        (ops/pallas_kernels.fused_cff2_head8_entropy_score)."""
        f2 = self.stem.from_pool(stem1, training)
        f3 = _resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2))
        f3 = self.tail(f3, training)
        fused16, _ = self.cff1(f3, f2, training)
        return fused16

    def fuse_from_stem1(self, f1, stem1, training: bool = False):
        """Stem res-blocks -> tail -> cascade fusion from precomputed
        Branch1 features and pooled stem-front features (both produced
        by the Pallas front+stem kernel,
        ops/pallas_kernels.fused_icnet_front_stem)."""
        f2 = self.stem.from_pool(stem1, training)
        f3 = _resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2))
        f3 = self.tail(f3, training)
        fused16, _ = self.cff1(f3, f2, training)
        fused8, _ = self.cff2(fused16, f1, training)
        return fused8

    def head_pre_logits(self, fused8):
        """1/8-res fused features -> 1/4-res classifier logits (the
        head's pre-upsample half; the chunked XLA scoring tail consumes
        these — see ``fused_score``'s fallback path)."""
        n, h8, w8, _c = fused8.shape
        up4 = _resize_bilinear(fused8, (2 * h8, 2 * w8))
        return self.classifier(up4.astype(jnp.float32))

    def spatial_front_score(self, variables, image, measure: str,
                            mesh, interpret: bool = False):
        """Width-sharded scoring with the Pallas FRONT+STEM kernel
        running per shard under ``jax.shard_map`` — the
        ``("data", "space")`` mesh no longer forces ICNet onto the full
        XLA fallback (the full-res model is the one SURVEY §5 names as
        the spatial-sharding motivation).

        Exactness by halo analysis: an f1 column (three 3x3/s2 convs)
        depends on at most +-7 image columns; a stem1 column depends on
        the half-res image within +-7 half-res columns, i.e. +-17
        image columns including the antialiased 2x downsample taps —
        both within a 32-column halo. Unlike the ENet front (pure
        SAME-zero-padded convs, where ppermute zero-fill IS the
        padding), the in-kernel bilinear downsample CLAMPS at the image
        boundary, so the shards take ``parallel.spatial
        .edge_aligned_window``: uniform-width windows that coincide
        with the true global edges on the edge shards (the kernel's own
        boundary handling lands exactly where the unsharded kernel
        applies it) and carry real neighbor columns in the interior.
        The per-shard kernel outputs are cropped back to own columns —
        bit-equal to the unsharded kernel (tests/test_spatial.py).
        The stem body/tail/CFFs and the chunked upsample head stay XLA
        under GSPMD width sharding (their dilated receptive fields at
        1/16-1/32 res span most of a shard — the same cost analysis as
        ENet's stages 2-5, quantified in docs/PERF.md)."""
        import jax
        from jax.sharding import PartitionSpec as P

        from ..ops import acquisition, pallas_kernels
        from ..parallel import spatial as sp

        packed = pallas_kernels.pack_icnet_front_stem(variables)
        halo = 32            # >= the +-17-col receptive field
        axis = "space"
        dt = self.dtype if self.dtype is not None else jnp.float32

        def local(img):
            win, off = sp.edge_aligned_window(img, axis, halo)
            f1, st = pallas_kernels.fused_icnet_front_stem(
                win.astype(dt), packed, interpret=interpret)
            o8 = off // 8
            wl8 = img.shape[2] // 8
            f1 = jax.lax.dynamic_slice_in_dim(f1, o8, wl8, axis=2)
            st = jax.lax.dynamic_slice_in_dim(st, o8, wl8, axis=2)
            return f1, st

        spec = P("data", None, axis, None)
        f1, stem1 = jax.shard_map(
            local, mesh=mesh, in_specs=spec, out_specs=(spec, spec),
            check_vma=False)(image)
        fused8 = self.apply(variables, f1, stem1, training=False,
                            method=ICNet.fuse_from_stem1)
        cls4 = self.apply(variables, fused8,
                          method=ICNet.head_pre_logits)
        return acquisition.chunked_upsample_mean_confidence(
            cls4, 4, measure, self.num_classes)

    def fused_score(self, variables, image, measure: str,
                    use_pallas: bool = False, fuse_stem: bool = True,
                    fuse_cff2: bool = True, interpret: bool = False,
                    spatial_mesh=None):
        """Acquisition scoring without materializing full-res logits
        (the AL pool-ranking hot loop, reference
        active_learning.py:229-263)."""
        from ..ops import acquisition, pallas_kernels
        _n, h, w, _c = image.shape
        if spatial_mesh is not None:
            # ("data","space") mesh: per-shard front+stem kernel + XLA
            # rest when the shard geometry allows it, else full XLA (an
            # unsharded pallas_call under GSPMD would be replicated by
            # the partitioner — never let one through here). W_local
            # needs %32 (the kernel's column blocks) and >= 64 (the
            # edge-aligned window's 2*halo exchange).
            ns = spatial_mesh.shape.get("space", 1)
            wl = w // max(ns, 1)
            if (measure == "entropy" and _c == 3 and ns > 1
                    and h % 32 == 0 and w % ns == 0
                    and wl % 32 == 0 and wl >= 64):
                return self.spatial_front_score(
                    variables, image, measure, spatial_mesh,
                    interpret=interpret)
            use_pallas = False
        if h % 32 or w % 32:
            # same guard as __call__ — the Pallas front kernels reshape
            # the image into 32-px column blocks and would otherwise
            # die with an opaque reshape error
            raise ValueError(
                f"ICNet input dims must be divisible by 32, got {h}x{w}")
        # the packed front kernels hard-assume a 3-channel image (the
        # column-block reshape folds C=3 into the tap matmuls); extra
        # modality channels take the plain XLA forward instead
        use_pallas = use_pallas and _c == 3
        if use_pallas and measure == "entropy":
            # Front: Branch1 + half-res downsample (+ the stem's
            # conv1_1..maxpool when fuse_stem) in one kernel over the
            # raw image — the dominant full-res/low-channel costs; the
            # half-res image never exists in HBM. Head: classifier +
            # 2x + 4x upsample + entropy in one kernel over the
            # 1/8-res features — the 1/4-res fp32 logits (and shifted
            # copies) never exist in HBM.
            dt = self.dtype if self.dtype is not None else jnp.float32
            if fuse_stem:
                packed = pallas_kernels.pack_icnet_front_stem(variables)
                f1, stem1 = pallas_kernels.fused_icnet_front_stem(
                    image.astype(dt), packed, interpret=interpret)
                if fuse_cff2:
                    # CFF2 + head in ONE kernel over the 1/16-res CFF1
                    # output — pins the resize lowering and the fused8
                    # custom-call boundary (measured 63.3 -> 55.9
                    # ms/batch-16 at group 4 on v5e; docs/PERF.md)
                    fused16 = self.apply(variables, stem1,
                                         training=False,
                                         method=ICNet.fuse_to_cff1)
                    packed_ch = pallas_kernels.pack_icnet_cff2_head(
                        variables, self.num_classes)
                    return (pallas_kernels
                            .fused_cff2_head8_entropy_score(
                                fused16.astype(dt), f1.astype(dt),
                                packed_ch, self.num_classes,
                                interpret=interpret))
                fused8 = self.apply(variables, f1, stem1,
                                    training=False,
                                    method=ICNet.fuse_from_stem1)
            else:
                packed = pallas_kernels.pack_icnet_front(variables)
                f1, x_half = pallas_kernels.fused_icnet_front(
                    image.astype(dt), packed, interpret=interpret)
                fused8 = self.apply(variables, f1, x_half,
                                    training=False,
                                    method=ICNet.fuse_from_front)
            cls_p = variables["params"]["Classifier"]
            return pallas_kernels.fused_head8_entropy_score(
                fused8, cls_p["kernel"][0, 0].astype(jnp.float32),
                cls_p["bias"].astype(jnp.float32), self.num_classes,
                interpret=interpret)
        cls4 = self.apply(variables, image, training=False,
                          return_pre_logits=True)
        return acquisition.chunked_upsample_mean_confidence(
            cls4, 4, measure, self.num_classes)

    def fused_predict(self, variables, image,
                      use_pallas: bool = False, fuse_stem: bool = True,
                      fuse_cff2: bool = True, interpret: bool = False):
        """Per-pixel argmax labels without materializing full-res (or
        even 1/4-res) logits — the inference CLI's forward (reference
        inference.py:90-98) through the same kernel chain as
        :meth:`fused_score` (front+stem kernel -> XLA mid -> head8
        kernel), with the head ending in an in-kernel argmax. Returns
        int32 ``[N, H, W]``.

        Falls back to the plain XLA forward + argmax off-TPU or when
        ``use_pallas`` is unset (input divisibility by 32 is enforced
        either way by ``__call__``/``fused_score``)."""
        from ..ops import pallas_kernels
        _n, h, w, _c = image.shape
        if h % 32 or w % 32:
            raise ValueError(
                f"ICNet input dims must be divisible by 32, got {h}x{w}")
        # 3-channel assumption: see fused_score
        use_pallas = use_pallas and _c == 3
        if use_pallas:
            dt = self.dtype if self.dtype is not None else jnp.float32
            if fuse_stem:
                packed = pallas_kernels.pack_icnet_front_stem(variables)
                f1, stem1 = pallas_kernels.fused_icnet_front_stem(
                    image.astype(dt), packed, interpret=interpret)
                if fuse_cff2:
                    # CFF2 + head in one kernel (the predict twin of
                    # the scoring path's fusion; see fused_score)
                    fused16 = self.apply(variables, stem1,
                                         training=False,
                                         method=ICNet.fuse_to_cff1)
                    packed_ch = pallas_kernels.pack_icnet_cff2_head(
                        variables, self.num_classes)
                    labels = pallas_kernels.fused_cff2_head8_predict(
                        fused16.astype(dt), f1.astype(dt), packed_ch,
                        self.num_classes, interpret=interpret)
                    return labels.astype(jnp.int32)
                fused8 = self.apply(variables, f1, stem1,
                                    training=False,
                                    method=ICNet.fuse_from_stem1)
            else:
                packed = pallas_kernels.pack_icnet_front(variables)
                f1, x_half = pallas_kernels.fused_icnet_front(
                    image.astype(dt), packed, interpret=interpret)
                fused8 = self.apply(variables, f1, x_half,
                                    training=False,
                                    method=ICNet.fuse_from_front)
            cls_p = variables["params"]["Classifier"]
            labels = pallas_kernels.fused_head8_predict(
                fused8, cls_p["kernel"][0, 0].astype(jnp.float32),
                cls_p["bias"].astype(jnp.float32), self.num_classes,
                interpret=interpret)
            return labels.astype(jnp.int32)
        logits = self.apply(variables, image, training=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
