"""Segmentation losses (reference: tensortools/losses.py).

``masked_softmax_cross_entropy`` reproduces losses.py:3-74 exactly:
label smoothing via on/off one-hot values, ignore-mask multiply,
optional ENet inverse-log class weighting ``w = 1/log(c + (e-c)*p_true)``
(lower-bounded at 1 by construction), and the two-phase high-precision
reduction (sum over batch, divide by mask sum, sum over space). The
reference upcast to float64 for the final reduction (losses.py:69);
TPUs have no fp64, so the reduction runs in float32 — parity against a
float64 numpy oracle is enforced in tests.

The multiscale variant mirrors losses.py:76-156 but the learned 1x1
endpoint heads live in the model (``ENet.ms_heads``) rather than being
created inside the loss; labels/masks are nearest-resized per scale.
``normalize=True`` averages over scales (fixing the reference's
``len(loss)``-of-a-scalar bug, losses.py:153-154).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_EULER = 1.718281828459045  # the reference's constant (losses.py:27)


def masked_softmax_cross_entropy(labels: jnp.ndarray, logits: jnp.ndarray,
                                 mask: jnp.ndarray, num_classes: int,
                                 weight: float = 0.0,
                                 label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean masked (optionally class-weighted, smoothed) cross-entropy.

    :param labels: ``[B,H,W]`` int class ids (ignore pixels already 0,
                   excluded via ``mask``)
    :param logits: ``[B,H,W,C]``
    :param mask:   ``[B,H,W]`` float 0/1
    """
    on_value = 1.0 - label_smoothing
    off_value = label_smoothing / (num_classes - 1.0)

    # The smoothed one-hot contraction collapses algebraically so no
    # [B,H,W,C] one-hot / log_softmax plane is ever materialized (lane
    # padding makes those planes the loss's dominant HBM cost on TPU):
    #   sum_c onehot_c * logp_c
    #     = (on-off) * (logit[label] - lse) + off * (sum_c logit_c - C*lse)
    # The label pick is an iota-compare masked reduce, which XLA fuses
    # into the same pass as the logsumexp — and whose gradient is
    # elementwise (no scatter).
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    is_label = (jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                         logits.ndim - 1)
                == labels[..., None].astype(jnp.int32))
    logit_label = jnp.sum(jnp.where(is_label, logits, 0.0), axis=-1)
    picked = (on_value - off_value) * (logit_label - lse)
    if label_smoothing != 0.0:
        sum_logits = jnp.sum(logits, axis=-1)
        picked = picked + off_value * (sum_logits - num_classes * lse)
    loss = -picked * mask.astype(jnp.float32)

    if weight > 1.0:
        # p_class under the same smoothed one-hot: off-probabilities sum
        # to off * 1 across classes.
        p_true = jnp.exp(logit_label - lse)
        p_class = (on_value - off_value) * p_true + off_value
        w_class = 1.0 / jnp.log(weight + (_EULER - weight) * p_class)
        loss = loss * w_class

    # Two-phase reduction (losses.py:63-73): batch-sum, normalize by the
    # mask sum, then reduce the spatial plane.
    loss = jnp.sum(loss, axis=0)
    denom = jnp.sum(mask.astype(jnp.float32))
    return jnp.sum(loss / denom)


def _nearest_resize_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """TF1-legacy nearest resize over the two trailing-spatial dims of a
    ``[B,H,W]`` array: ``src = floor(dst * in/out)``."""
    in_h, in_w = x.shape[1], x.shape[2]
    out_h, out_w = out_hw
    rows = jnp.minimum((jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32),
                       in_h - 1)
    cols = jnp.minimum((jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32),
                       in_w - 1)
    return x[:, rows][:, :, cols]


def multiscale_masked_softmax_cross_entropy(
        labels: jnp.ndarray, logits_per_scale: Sequence[jnp.ndarray],
        mask: jnp.ndarray, num_classes: int, weight: float = 0.0,
        label_smoothing: float = 0.0, normalize: bool = False,
        scale_weights: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Sum of masked CE over logits heads at decreasing scales
    (losses.py:76-156). Labels/masks are nearest-resized to each head.

    :param logits_per_scale: ``[primary, head_1/2, head_1/4, ...]``
    :param scale_weights:    optional per-head loss weights (ICNet's
                             cascade label guidance, arXiv:1704.08545
                             §3.2 uses 1.0/0.4/0.4); None = all 1
    """
    losses = []
    for i, logits in enumerate(logits_per_scale):
        if logits.shape[1:3] == labels.shape[1:3]:
            labels_s, mask_s = labels, mask
        else:
            out_hw = (logits.shape[1], logits.shape[2])
            labels_s = _nearest_resize_2d(labels, out_hw)
            mask_s = _nearest_resize_2d(mask, out_hw)
        term = masked_softmax_cross_entropy(
            labels_s, logits, mask_s, num_classes, weight,
            label_smoothing)
        if scale_weights is not None:
            term = term * scale_weights[i]
        losses.append(term)
    total = sum(losses)
    if normalize:
        total = total / len(losses)
    return total


def regularization_loss(params, l1: float = 0.0, l2: float = 0.0,
                        glorot_scaling: bool = False) -> jnp.ndarray:
    """Keras-style L1/L2 weight regularization over conv kernels and
    PReLU alphas (the reference registers regularizers on both,
    enet_modules.py:366-382; BN parameters are never regularized).

    ``glorot_scaling`` scales each *kernel's* coefficients by its
    initializer variance, the Bayesian-MAP argument of
    enet_modules.py:9-42: ``var = 2/(kh*kw*(cin+cout))``,
    ``l2' = l2/var``, ``l1' = l1/sqrt(var/2)``.
    """
    if l1 <= 0.0 and l2 <= 0.0:
        return jnp.zeros((), jnp.float32)
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            eff_l1, eff_l2 = l1, l2
            if glorot_scaling and leaf.ndim >= 2:
                spatial = 1
                for d in leaf.shape[:-2]:
                    spatial *= d
                var_scale = 2.0 / (spatial * (leaf.shape[-2] + leaf.shape[-1]))
                eff_l2 = l2 / var_scale
                eff_l1 = l1 / jnp.sqrt(var_scale / 2.0)
        elif name == "alpha":
            eff_l1, eff_l2 = l1, l2
        else:
            continue
        w = leaf.astype(jnp.float32)
        if l1 > 0.0:
            total = total + eff_l1 * jnp.sum(jnp.abs(w))
        if l2 > 0.0:
            total = total + eff_l2 * jnp.sum(jnp.square(w))
    return total
