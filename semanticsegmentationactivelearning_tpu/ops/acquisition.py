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
# Monte-Carlo measures need several stochastic forwards per image and a
# PRNG key; they are acquisition-only (pseudo-labeling falls back to
# "entropy" — a per-pixel MI is not a confidence in the predicted label)
MC_MEASURES = ("bald",)


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


def chunked_deconv_mean_confidence(features: jnp.ndarray,
                                   kernel: jnp.ndarray, measure: str,
                                   num_classes: int,
                                   chunk: int = 32) -> jnp.ndarray:
    """Fused tail of the scoring pass: 3x3/s2 transpose conv (the ENet
    ``Final`` layer) -> softmax -> confidence -> per-image mean, streamed
    over row chunks of the half-resolution features.

    Why: the full-resolution logits ``[N,H,W,C]`` pad C to 128 lanes on
    TPU — 6.7x HBM expansion for C=19, which both wastes ~16GB of
    bandwidth per scoring step and OOMs batches >=8 at 1024x2048
    (measured; see bench.py). Chunking keeps only a
    ``[N, 2*chunk+4, W, C]`` logits window live, so HBM traffic for the
    tail drops to the features themselves.

    Chunks carry a one-row halo on each side: a stride-2 kernel-3
    transpose conv's output row ``y`` draws from input rows
    ``floor((y-1)/2)..floor((y+1)/2)``, so after running SAME on the
    haloed slice the two outermost output rows are invalid and dropped.

    :param features: ``[N, H2, W2, cin]`` pre-Final features (H = 2*H2)
    :param kernel:   ``[3, 3, cin, C]`` flax ConvTranspose kernel
    :returns: ``[N]`` mean confidence (float32)
    """
    n, h2, w2, _cin = features.shape
    if h2 % chunk != 0:
        # fall back to one chunk if the height doesn't divide evenly
        chunk = h2
    num_chunks = h2 // chunk
    dn = ("NHWC", "HWIO", "NHWC")

    # zero-pad one feature row top+bottom so halo slices never clamp
    padded = jnp.pad(features, ((0, 0), (1, 1), (0, 0), (0, 0)))

    def body(i, acc):
        rows = jax.lax.dynamic_slice(
            padded, (0, i * chunk, 0, 0),
            (n, chunk + 2, w2, features.shape[-1]))
        logits = jax.lax.conv_transpose(
            rows.astype(kernel.dtype), kernel, strides=(2, 2),
            padding="SAME", dimension_numbers=dn)
        logits = logits[:, 2:-2].astype(jnp.float32)
        conf = confidence_map(logits, measure, num_classes)
        return acc + jnp.sum(conf, axis=(1, 2))

    # derive the zero carry from the input so it carries the same
    # varying manual axes under shard_map (train/steps.py score paths)
    acc0 = jnp.sum(jnp.zeros_like(features[:, :1, 0, 0]),
                   axis=1, dtype=jnp.float32)
    sums = jax.lax.fori_loop(0, num_chunks, body, acc0)
    return sums / jnp.float32(h2 * 2 * w2 * 2)


def chunked_upsample_mean_confidence(logits_low: jnp.ndarray, scale: int,
                                     measure: str, num_classes: int,
                                     chunk: int = 32) -> jnp.ndarray:
    """Fused scoring tail for models that classify at reduced resolution
    (ICNet's 1/4-res head, models/icnet.py): bilinear ``scale``x
    upsample -> softmax -> confidence -> per-image mean, streamed over
    row chunks of the low-res logits so the padded full-resolution
    logits (19 -> 128 lanes, 6.7x HBM) never materialize.

    Exactness: each chunk carries a one-row halo taken from an
    edge-replicated pad. For bilinear upsampling (tent support < 1
    low-res row) the kept interior rows of a slice-resize equal the
    global resize — including at the true image edges, where the
    replicated row reproduces ``jax.image.resize``'s clamping. Verified
    against the unchunked resize in tests/test_icnet.py.

    :param logits_low: ``[N, Hl, Wl, C]`` low-resolution logits
    :param scale:      integer upsample factor to full resolution
    :returns: ``[N]`` mean confidence (float32)
    """
    n, hl, wl, c = logits_low.shape
    if hl % chunk != 0:
        chunk = hl
    num_chunks = hl // chunk
    wf = wl * scale

    padded = jnp.pad(logits_low.astype(jnp.float32),
                     ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")

    def body(i, acc):
        rows = jax.lax.dynamic_slice(
            padded, (0, i * chunk, 0, 0), (n, chunk + 2, wl, c))
        up = jax.image.resize(
            rows, (n, (chunk + 2) * scale, wf, c), method="bilinear")
        up = up[:, scale:-scale]
        conf = confidence_map(up, measure, num_classes)
        return acc + jnp.sum(conf, axis=(1, 2))

    # zero carry derived from the input: keeps shard_map varying axes
    acc0 = jnp.sum(jnp.zeros_like(logits_low[:, :1, 0, 0]),
                   axis=1, dtype=jnp.float32)
    sums = jax.lax.fori_loop(0, num_chunks, body, acc0)
    return sums / jnp.float32(hl * scale * wf)


def bald_confidence_map(probs_t: jnp.ndarray,
                        num_classes: int) -> jnp.ndarray:
    """Per-pixel BALD confidence ``[B,H,W]`` from T MC-dropout
    probability maps ``[T,B,H,W,C]``.

    BALD (Houlsby et al., arXiv:1112.5745; Gal et al., arXiv:1703.02910)
    scores the *mutual information* between the prediction and the
    model parameters:

        I(y; w | x) = H(E_t[p_t]) - E_t[H(p_t)]

    — high where the MC passes disagree (epistemic uncertainty), low
    where they agree (even if each pass is itself high-entropy, i.e.
    aleatoric noise the model cannot resolve with more labels). Both
    entropies are normalized by ``log C`` like the reference's entropy
    measure (active_learning.py:243-251), and the result is returned as
    a *confidence* ``1 - I_norm`` so it ranks through the same
    lowest-K selection as the stock measures: ``0 <= I <= H(mean)``
    by Jensen's inequality, so the clip only guards fp rounding.
    """
    probs_t = probs_t.astype(jnp.float32)
    log_c = jnp.log(jnp.float32(num_classes))
    ent_t = -jnp.sum(probs_t * jnp.log(probs_t + EPSILON), axis=-1)
    mean_ent = jnp.mean(ent_t, axis=0) / log_c            # E_t[H(p_t)]
    mean_p = jnp.mean(probs_t, axis=0)
    pred_ent = -jnp.sum(mean_p * jnp.log(mean_p + EPSILON),
                        axis=-1) / log_c                  # H(E_t[p_t])
    return 1.0 - jnp.clip(pred_ent - mean_ent, 0.0, 1.0)


def mean_bald_confidence(logits_t: jnp.ndarray,
                         num_classes: int) -> jnp.ndarray:
    """Per-image mean BALD confidence ``[B]`` from stacked MC logits
    ``[T,B,H,W,C]`` (the generic-model scoring tail)."""
    probs_t = jax.nn.softmax(logits_t.astype(jnp.float32), axis=-1)
    return jnp.mean(bald_confidence_map(probs_t, num_classes),
                    axis=(1, 2))


def chunked_deconv_bald_confidence(features_t: jnp.ndarray,
                                   kernel: jnp.ndarray,
                                   num_classes: int,
                                   chunk: int = 8) -> jnp.ndarray:
    """BALD scoring tail for pre-logits models (ENet): the T MC passes'
    half-resolution features ``[T,N,H2,W2,cin]`` go through the Final
    3x3/s2 transpose conv -> softmax -> per-pixel mutual information ->
    per-image mean, streamed over row chunks — the T full-resolution
    lane-padded probability maps never exist in HBM (only a
    ``[T,N,2*chunk+4,W,C]`` window is live per step). Same halo
    arithmetic as :func:`chunked_deconv_mean_confidence`; chunks
    default smaller because the window carries the extra T axis.
    """
    t, n, h2, w2, cin = features_t.shape
    if h2 % chunk != 0:
        chunk = h2
    num_chunks = h2 // chunk
    dn = ("NHWC", "HWIO", "NHWC")

    padded = jnp.pad(features_t,
                     ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))

    def body(i, acc):
        rows = jax.lax.dynamic_slice(
            padded, (0, 0, i * chunk, 0, 0), (t, n, chunk + 2, w2, cin))
        logits = jax.lax.conv_transpose(
            rows.reshape(t * n, chunk + 2, w2, cin).astype(kernel.dtype),
            kernel, strides=(2, 2), padding="SAME",
            dimension_numbers=dn)
        logits = logits[:, 2:-2].astype(jnp.float32)
        logits = logits.reshape(t, n, *logits.shape[1:])
        probs = jax.nn.softmax(logits, axis=-1)
        conf = bald_confidence_map(probs, num_classes)
        return acc + jnp.sum(conf, axis=(1, 2))

    acc0 = jnp.sum(jnp.zeros_like(features_t[0, :, :1, 0, 0]),
                   axis=1, dtype=jnp.float32)
    sums = jax.lax.fori_loop(0, num_chunks, body, acc0)
    return sums / jnp.float32(h2 * 2 * w2 * 2)


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
