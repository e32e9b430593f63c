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
import jax.numpy as jnp

from ..ops import nn as xops

_KERNEL_INIT = nn.initializers.glorot_uniform()


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

    @nn.compact
    def __call__(self, x, training: bool):
        x = x.astype(self.dtype)
        filters = self.output_channels - x.shape[-1]
        conv = nn.Conv(filters, (3, 3), strides=(2, 2), padding="SAME",
                       use_bias=False, kernel_init=_KERNEL_INIT,
                       dtype=self.dtype, name="conv")(x)
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

    @nn.compact
    def __call__(self, x, training: bool):
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        filters = cin // self.projection_rate
        k = self.kernel_size

        h = nn.Conv(filters, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        if self.asymmetric:
            # (k,1) then (1,k), the reference's KernelCol/KernelRow order
            # (enet_modules.py:553-563).
            h = nn.Conv(filters, (k, 1), use_bias=False, padding="SAME",
                        kernel_init=_KERNEL_INIT, dtype=self.dtype,
                        name="conv_col")(h)
            h = nn.Conv(filters, (1, k), use_bias=False, padding="SAME",
                        kernel_init=_KERNEL_INIT, dtype=self.dtype,
                        name="conv_row")(h)
        else:
            h = nn.Conv(filters, (k, k), use_bias=False, padding="SAME",
                        kernel_dilation=(self.dilation, self.dilation),
                        kernel_init=_KERNEL_INIT, dtype=self.dtype,
                        name="conv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="exp_conv")(h)
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

    @nn.compact
    def __call__(self, x, training: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        filters = 2 * (cin // self.projection_rate)

        h = nn.Conv(filters, (2, 2), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=_KERNEL_INIT,
                    dtype=self.dtype, name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        h = nn.Conv(filters, (3, 3), use_bias=False, padding="SAME",
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="conv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="exp_conv")(h)
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

    @nn.compact
    def __call__(self, x, switches, training: bool):
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        proj_filters = cin // self.projection_rate
        conv_filters = proj_filters // 2

        h = nn.Conv(proj_filters, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="proj_conv")(x)
        h = _batch_norm(training, "proj_bn", self.dtype)(h)
        h = PReLU(name="proj_prelu")(h)

        h = nn.ConvTranspose(conv_filters, (3, 3), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             kernel_init=_KERNEL_INIT, dtype=self.dtype,
                             name="deconv")(h)
        h = _batch_norm(training, "conv_bn", self.dtype)(h)
        h = PReLU(name="conv_prelu")(h)

        h = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                    kernel_init=_KERNEL_INIT, dtype=self.dtype,
                    name="exp_conv")(h)
        h = _batch_norm(training, "exp_bn", self.dtype)(h)
        if self.drop_rate > 0.0 and (training
                                      or self.has_rng("dropout")):
            # dropout whenever a "dropout" rng is supplied: training
            # passes always supply one; eval passes none; MC-dropout
            # acquisition (ops/acquisition.py BALD) supplies one with
            # training=False so BN stays on running averages
            h = xops.spatial_dropout(h, self.drop_rate,
                                     self.make_rng("dropout"))

        res = nn.Conv(self.output_channels, (1, 1), use_bias=False,
                      kernel_init=_KERNEL_INIT, dtype=self.dtype,
                      name="res_conv")(x)
        res = xops.unpool_with_switches(res, switches)
        return PReLU(name="res_prelu")(h + res)


class Final(nn.Module):
    """3x3/s2 transpose conv to class logits (enet_modules.py:1294-1381).

    Computes in the model dtype but emits float32 logits so loss /
    softmax numerics are dtype-independent."""

    classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.ConvTranspose(self.classes, (3, 3), strides=(2, 2),
                               padding="SAME", use_bias=False,
                               kernel_init=_KERNEL_INIT,
                               dtype=self.dtype, name="deconv")(x)
        return out.astype(jnp.float32)
