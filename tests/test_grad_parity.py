"""Gradient parity vs a TF float64 oracle of the reference loss.

The value-level fp64 numpy oracles (tests/test_losses_metrics.py) prove
our loss matches the reference math (tensortools/losses.py:3-74); this
extends the evidence to GRADIENTS: a TF2 GradientTape re-derivation of
the reference loss in float64 must produce dLoss/dlogits matching
``jax.grad`` of ops/losses.masked_softmax_cross_entropy (fp32 on
device). Run on realistic skewed label distributions (Cityscapes-like
class imbalance) with ignore masks, for every hyperparameter branch:
plain, label-smoothed, and ENet inverse-log class weighting — the
weighting multiplies the per-pixel loss by a softmax-dependent factor,
so its gradient flows through the weight exactly as in the reference
(no stop_gradient there, losses.py:55-62)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.ops import losses

tf = pytest.importorskip("tensorflow")

C = 19
_EULER = 1.718281828459045  # the reference's constant (losses.py:27)


def _tf_reference_loss(labels, logits, mask, weight, label_smoothing):
    """float64 re-derivation of the reference loss semantics
    (tensortools/losses.py:3-74) in TF2 ops."""
    on = 1.0 - label_smoothing
    off = label_smoothing / (C - 1.0)
    onehot = tf.one_hot(labels, C, dtype=tf.float64) * (on - off) + off
    onehot = tf.stop_gradient(onehot)
    logp = tf.nn.log_softmax(logits, axis=-1)
    loss = -tf.reduce_sum(onehot * logp, axis=-1) * mask
    if weight > 1.0:
        p_class = tf.reduce_sum(tf.nn.softmax(logits, axis=-1) * onehot,
                                axis=-1)
        w_class = 1.0 / tf.math.log(weight + (_EULER - weight) * p_class)
        loss = loss * w_class
    # two-phase reduction: batch-sum, normalize by mask sum, spatial sum
    loss = tf.reduce_sum(loss, axis=0)
    return tf.reduce_sum(loss / tf.reduce_sum(mask))


def _realistic_batch(seed):
    """Skewed (Cityscapes-like) label frequencies + ignore mask."""
    rng = np.random.default_rng(seed)
    shape = (2, 16, 24)
    # zipf-ish class distribution: a few classes dominate
    p = 1.0 / np.arange(1, C + 1) ** 1.3
    p /= p.sum()
    labels = rng.choice(C, size=shape, p=p).astype(np.int32)
    logits = (rng.normal(scale=2.0, size=(*shape, C))
              .astype(np.float64))
    mask = (rng.uniform(size=shape) > 0.08).astype(np.float64)
    labels = labels * (mask > 0)  # ignore pixels zeroed like the ETL
    return labels, logits, mask


@pytest.mark.parametrize("weight,ls", [
    (0.0, 0.0),          # plain masked CE
    (0.0, 0.05),         # label smoothing
    (1.02, 0.0),         # inverse-log class weighting (AL confs)
    (50.0, 0.05),        # aggressive weighting + smoothing combined
])
def test_loss_and_grad_match_tf_oracle(weight, ls):
    labels, logits, mask = _realistic_batch(hash((weight, ls)) % 2**31)

    logits_tf = tf.Variable(logits)
    with tf.GradientTape() as tape:
        loss_tf = _tf_reference_loss(
            tf.constant(labels), logits_tf, tf.constant(mask), weight, ls)
    grad_tf = tape.gradient(loss_tf, logits_tf).numpy()

    def jax_loss(lg):
        return losses.masked_softmax_cross_entropy(
            jnp.asarray(labels), lg, jnp.asarray(mask, jnp.float32), C,
            weight, ls)

    loss_jax, grad_jax = jax.value_and_grad(jax_loss)(
        jnp.asarray(logits, jnp.float32))

    np.testing.assert_allclose(float(loss_jax), float(loss_tf),
                               rtol=2e-5)
    # gradient entries span ~[1e-8, 1e-3]; fp32 vs fp64 forward noise
    np.testing.assert_allclose(np.asarray(grad_jax), grad_tf,
                               rtol=5e-3, atol=2e-7)


def test_multiscale_grad_matches_tf_oracle():
    """The multiscale sum of heads (losses.py:76-156): gradients on
    every head match a TF oracle built from the same per-scale loss
    with TF1-legacy nearest-resized labels/masks."""
    labels, logits, mask = _realistic_batch(11)
    logits_half = (np.random.default_rng(12)
                   .normal(scale=2.0, size=(2, 8, 12, C)))

    def _resize_nearest(x, hw):
        in_h, in_w = x.shape[1], x.shape[2]
        rows = np.minimum((np.arange(hw[0]) * (in_h / hw[0])).astype(int),
                          in_h - 1)
        cols = np.minimum((np.arange(hw[1]) * (in_w / hw[1])).astype(int),
                          in_w - 1)
        return x[:, rows][:, :, cols]

    l_half = _resize_nearest(labels, (8, 12))
    m_half = _resize_nearest(mask, (8, 12))

    v_full = tf.Variable(logits)
    v_half = tf.Variable(logits_half)
    with tf.GradientTape() as tape:
        loss_tf = (_tf_reference_loss(tf.constant(labels), v_full,
                                      tf.constant(mask), 0.0, 0.05)
                   + _tf_reference_loss(tf.constant(l_half), v_half,
                                        tf.constant(m_half), 0.0, 0.05))
    g_full, g_half = [g.numpy() for g in
                      tape.gradient(loss_tf, [v_full, v_half])]

    def jax_loss(lg_full, lg_half):
        return losses.multiscale_masked_softmax_cross_entropy(
            jnp.asarray(labels), (lg_full, lg_half),
            jnp.asarray(mask, jnp.float32), C, 0.0, 0.05)

    (jf, jh) = jax.grad(jax_loss, argnums=(0, 1))(
        jnp.asarray(logits, jnp.float32),
        jnp.asarray(logits_half, jnp.float32))
    np.testing.assert_allclose(np.asarray(jf), g_full, rtol=5e-3,
                               atol=2e-7)
    np.testing.assert_allclose(np.asarray(jh), g_half, rtol=5e-3,
                               atol=2e-7)
