"""ENet building blocks as flax modules.

Faithful re-designs of the reference's hand-rolled Keras layers
(models/enet/enet_modules.py): each sub-stage is conv -> BatchNorm
(momentum 0.90, eps 1e-3, matching ``tf.nn.fused_batch_norm`` defaults,
extra_ops.py:154-185) -> per-channel PReLU(0.25). Downsample blocks
return one-hot pooling *switches* consumed by the matching upsample
block (see ops/nn.py for why switches replace argmax indices on TPU).

Convolutions carry no bias (BN beta serves); kernels default to glorot
uniform like the reference (enet.py:11).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as xops
from ..ops import shiftconv

_KERNEL_INIT = nn.initializers.glorot_uniform()


def _use_matmul(impl: str) -> bool:
    """Resolve a conv ``impl`` flag: ``"matmul"`` / ``"lax"`` force the
    shifted-matmul / ``lax.conv`` lowerings; ``"auto"`` (the default
    everywhere) picks matmul off-CPU — measured 1.8x faster fwd+bwd on
    v5e for the low-channel segments (tools/probe_packed_bottleneck.py)
    — and ``lax.conv`` on CPU, where eigen's conv wins.

    Applies to SPATIAL kernels only: 1x1 convs are plain matmuls, not
    shifted-matmul lowerings, and use the dot path under every impl —
    so ``"lax"`` A/B baselines are hybrid (lax spatial + dot 1x1)."""
    if impl == "auto":
        return jax.default_backend() not in ("cpu",)
    return impl == "matmul"


class Conv(nn.Module):
    """No-bias SAME conv, drop-in for the ``nn.Conv`` call sites (same
    param name/shape/init, so checkpoints are interchangeable), with
    the TPU path lowered through ops/shiftconv shifted matmuls."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", _KERNEL_INIT,
                            (kh, kw, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if (kh, kw) == (1, 1):
            # a 1x1 conv IS a matmul on every backend (not a shifted-
            # matmul lowering), so it takes this path on EVERY impl —
            # including "lax", whose A/B baselines are therefore
            # hybrid: lax spatial convs + dot 1x1s (see _use_matmul).
            # SAME/s2 reads the even grid positions. No
            # preferred_element_type: the MXU accumulates fp32
            # internally either way, and asking for an fp32 result
            # forces a full-size fp32 plane + a convert at EVERY
            # bottleneck (measured +30 ms on the batch-8 512x1024 step)
            if self.strides == (2, 2):
                x = x[:, ::2, ::2]
            n, hh, ww, cc = x.shape
            return jnp.dot(x.reshape(-1, cc),
                           k[0, 0]).reshape(n, hh, ww, -1)
        # shapes the matmul lowerings don't cover fall back to lax:
        # conv_same centers odd kernels only; conv_down2 phase-
        # decomposes even grids, 2x2/3x3 kernels, no dilation
        covered = ((self.strides == (1, 1) and kh % 2 and kw % 2)
                   or (self.strides == (2, 2) and self.dilation == 1
                       and kh == kw and kh in (2, 3)
                       and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0))
        if not _use_matmul(self.impl) or not covered:
            return lax.conv_general_dilated(
                x, k, self.strides, "SAME",
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.strides == (2, 2):
            return shiftconv.conv_down2(x, k)
        return shiftconv.conv_same(x, k, self.dilation)


class ConvTranspose(nn.Module):
    """No-bias SAME 3x3/s2 transposed conv, drop-in for the
    ``nn.ConvTranspose`` call sites (same param name/shape/init).

    ``phase=True`` returns the polyphase form ``[N, H, 2*W_out, co]``
    (``ops.nn.s2d_plane`` pixel order) instead of the full-resolution
    plane — per-pixel consumers skip the d2s relayout entirely."""

    features: int
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, phase: bool = False):
        kernel = self.param("kernel", _KERNEL_INIT,
                            (3, 3, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if not _use_matmul(self.impl):
            out = lax.conv_transpose(x, k, (2, 2), "SAME",
                                     rhs_dilation=(1, 1),
                                     transpose_kernel=False)
            return xops.s2d_nhwc(out) if phase else out
        if phase:
            return shiftconv.conv_transpose_up2_phase(x, k)
        return shiftconv.conv_transpose_up2(x, k)


class PReLU(nn.Module):
    """Per-channel parametrized ReLU, alpha init 0.25 (enet.py:12)."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha",
                           nn.initializers.constant(self.init_alpha),
                           (x.shape[-1],))
        return xops.prelu(x, alpha.astype(x.dtype))


def _batch_norm(training: bool, name: str,
                dtype=jnp.float32) -> nn.BatchNorm:
    # statistics/params stay fp32; activations may be bf16
    return nn.BatchNorm(use_running_average=not training, momentum=0.90,
                        epsilon=1e-3, dtype=dtype, name=name)


class Initial(nn.Module):
    """3x3/s2 conv (out_ch - in_ch filters) || 2x2/s2 maxpool -> concat
    -> BN -> PReLU (enet_modules.py:45-224)."""

    output_channels: int = 16
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool):
        x = x.astype(self.dtype)
        filters = self.output_channels - x.shape[-1]
        conv = Conv(filters, (3, 3), strides=(2, 2), dtype=self.dtype,
                    impl=self.conv_impl, name="conv")(x)
        pool = xops.max_pool_2x2(x)
        out = jnp.concatenate([conv, pool], axis=-1)
        out = _batch_norm(training, "bn", self.dtype)(out)
        return PReLU(name="prelu")(out)


class Bottleneck(nn.Module):
    """Plain / dilated / asymmetric bottleneck (enet_modules.py:226-599).

    1x1 project (cin/4) -> 3x3 conv (optionally dilated, or 5x1+1x5
    asymmetric) -> 1x1 expand, BN(+PReLU) after each, spatial dropout on
    the expansion during training, residual add -> PReLU.
    """

    output_channels: int
    kernel_size: int = 3
    asymmetric: bool = False
    dilation: int = 1
    projection_rate: int = 4
    drop_rate: float = 0.1
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool):
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        filters = cin // self.projection_rate
        k = self.kernel_size

        h = Conv(filters, (1, 1), dtype=self.dtype,
                 impl=self.conv_impl, name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        if self.asymmetric:
            # (k,1) then (1,k), the reference's KernelCol/KernelRow order
            # (enet_modules.py:553-563).
            h = Conv(filters, (k, 1), dtype=self.dtype,
                     impl=self.conv_impl, name="conv_col")(h)
            h = Conv(filters, (1, k), dtype=self.dtype,
                     impl=self.conv_impl, name="conv_row")(h)
        else:
            h = Conv(filters, (k, k), dilation=self.dilation,
                     dtype=self.dtype, impl=self.conv_impl,
                     name="conv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = Conv(self.output_channels, (1, 1), dtype=self.dtype,
                 impl=self.conv_impl, name="exp_conv")(h)
        h = _batch_norm(training, "exp_bn", self.dtype)(h)
        if self.drop_rate > 0.0 and (training
                                      or self.has_rng("dropout")):
            # dropout whenever a "dropout" rng is supplied: training
            # passes always supply one; eval passes none; MC-dropout
            # acquisition (ops/acquisition.py BALD) supplies one with
            # training=False so BN stays on running averages
            h = xops.spatial_dropout(h, self.drop_rate,
                                     self.make_rng("dropout"))

        return PReLU(name="res_prelu")(h + x)


class BottleneckDownsample(nn.Module):
    """Downsampling bottleneck (enet_modules.py:601-938).

    Main: 2x2/s2 conv projection (2*cin/4 filters, compensating the
    resolution drop) -> 3x3 conv -> 1x1 expand. Residual: 2x2 maxpool
    with switches + zero channel padding. Returns (out, switches).
    """

    output_channels: int
    projection_rate: int = 4
    drop_rate: float = 0.1
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        filters = 2 * (cin // self.projection_rate)

        h = Conv(filters, (2, 2), strides=(2, 2), dtype=self.dtype,
                 impl=self.conv_impl, name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        h = Conv(filters, (3, 3), dtype=self.dtype,
                 impl=self.conv_impl, name="conv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = Conv(self.output_channels, (1, 1), dtype=self.dtype,
                 impl=self.conv_impl, name="exp_conv")(h)
        h = _batch_norm(training, "exp_bn", self.dtype)(h)
        if self.drop_rate > 0.0 and (training
                                      or self.has_rng("dropout")):
            # dropout whenever a "dropout" rng is supplied: training
            # passes always supply one; eval passes none; MC-dropout
            # acquisition (ops/acquisition.py BALD) supplies one with
            # training=False so BN stays on running averages
            h = xops.spatial_dropout(h, self.drop_rate,
                                     self.make_rng("dropout"))

        res, switches = xops.max_pool_with_switches(x)
        res = jnp.pad(res, ((0, 0), (0, 0), (0, 0),
                            (0, self.output_channels - cin)))
        return PReLU(name="res_prelu")(h + res), switches


class BottleneckUpsample(nn.Module):
    """Upsampling bottleneck (enet_modules.py:940-1292).

    Main: 1x1 project (cin/4) -> 3x3/s2 transpose conv (cin/8 filters)
    -> 1x1 expand. Residual: 1x1 conv to output channels + 2x2 unpool
    using the encoder's switches.
    """

    output_channels: int
    projection_rate: int = 4
    drop_rate: float = 0.1
    dtype: Any = jnp.float32
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, switches, training: bool):
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        proj_filters = cin // self.projection_rate
        conv_filters = proj_filters // 2

        h = Conv(proj_filters, (1, 1), dtype=self.dtype,
                 impl=self.conv_impl, name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        h = ConvTranspose(conv_filters, dtype=self.dtype,
                          impl=self.conv_impl, name="deconv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = Conv(self.output_channels, (1, 1), dtype=self.dtype,
                 impl=self.conv_impl, name="exp_conv")(h)
        h = _batch_norm(training, "exp_bn", self.dtype)(h)
        if self.drop_rate > 0.0 and (training
                                      or self.has_rng("dropout")):
            # dropout whenever a "dropout" rng is supplied: training
            # passes always supply one; eval passes none; MC-dropout
            # acquisition (ops/acquisition.py BALD) supplies one with
            # training=False so BN stays on running averages
            h = xops.spatial_dropout(h, self.drop_rate,
                                     self.make_rng("dropout"))

        res = Conv(self.output_channels, (1, 1), dtype=self.dtype,
                   impl=self.conv_impl, name="res_conv")(x)
        res = xops.unpool_with_switches(res, switches)
        return PReLU(name="res_prelu")(h + res)


class Final(nn.Module):
    """3x3/s2 transpose conv to class logits (enet_modules.py:1294-1381).

    Computes in the model dtype and by default emits float32 logits so
    loss / softmax numerics are dtype-independent. ``fp32_out=False``
    emits the compute dtype instead — the CE loss and argmax upcast
    per-element in registers, so the lane-padded logits plane's HBM
    traffic halves (bf16) while loss accumulation stays fp32; only the
    bf16 rounding of individual logits differs. ``phase=True`` emits
    the polyphase logits ``[N, H/2, 2W, classes]`` (``ops.nn.s2d_plane``
    pixel order) so per-pixel training consumers never materialize the
    full-resolution lane-padded plane."""

    classes: int
    dtype: Any = jnp.float32
    conv_impl: str = "auto"
    fp32_out: bool = True

    @nn.compact
    def __call__(self, x, phase: bool = False):
        out = ConvTranspose(self.classes, dtype=self.dtype,
                            impl=self.conv_impl, name="deconv")(
                                x, phase=phase)
        return out.astype(jnp.float32) if self.fp32_out else out
