"""Acquisition / confidence measures for active learning.

Reproduces the reference's pseudo-annotation subgraph
(active_learning.py:229-269): softmax over logits, then one of

- ``entropy``:    1 - H(p)/log(C)   (normalized to [0,1], class-count
                  independent, active_learning.py:240-251)
- ``margin``:     p_top1 - p_top2   (252-255)
- ``confidence``: max_c p_c         (256-258)

plus the per-image mean used as the acquisition score (261-263; the
reference reduced in float64 — fp32 here, oracle-tested) and the
pixel-level threshold mask for pseudo-labeling (265-269).

Everything is fused under jit: XLA keeps the softmax/entropy/mean chain
in registers per tile, so scoring a pool batch never materializes
probability maps in HBM (BASELINE.json north star).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Lowest representable float32 (reference: active_learning.py:40)
EPSILON = float(np.finfo(np.float32).tiny)

MEASURES = ("entropy", "margin", "confidence")


def confidence_map(logits: jnp.ndarray, measure: str,
                   num_classes: int) -> jnp.ndarray:
    """Per-pixel confidence ``[B,H,W]`` from logits ``[B,H,W,C]``."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if measure == "entropy":
        entropy = -jnp.sum(prob * jnp.log(prob + EPSILON), axis=-1)
        entropy = entropy / jnp.log(jnp.float32(num_classes))
        return 1.0 - entropy
    if measure == "margin":
        top2 = jax.lax.top_k(prob, 2)[0]
        return top2[..., 0] - top2[..., 1]
    if measure == "confidence":
        return jnp.max(prob, axis=-1)
    raise NotImplementedError(
        f"Uncertainty function {measure!r} not implemented.")


def mean_confidence(logits: jnp.ndarray, measure: str,
                    num_classes: int) -> jnp.ndarray:
    """Per-image mean confidence ``[B]`` — the pool acquisition score
    (active_learning.py:261-263)."""
    return jnp.mean(confidence_map(logits, measure, num_classes),
                    axis=(1, 2))


def pseudo_annotate(logits: jnp.ndarray, measure: str, num_classes: int,
                    threshold: float):
    """Pseudo-label + high-confidence mask from a no-dropout forward
    (active_learning.py:231-269).

    :returns: (pseudo_label int32 ``[B,H,W]``,
               pseudo_mask float32 ``[B,H,W]``,
               mean_conf float32 ``[B]``)
    """
    logits = jax.lax.stop_gradient(logits)
    pseudo_label = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    conf = confidence_map(logits, measure, num_classes)
    pseudo_mask = (conf >= threshold).astype(jnp.float32)
    return pseudo_label, pseudo_mask, jnp.mean(conf, axis=(1, 2))
