"""Device-side, jit-compiled input preprocessing.

Replaces the reference's tf.data decode/augment maps
(tensortools/input.py:235-329) with one fused, statically-shaped jax
function applied to a whole batch on device:

- random crop within each example's valid region
- random left-right flip
- uint8 -> float32 in [0,1]
- per-example, per-channel intensity scaling U[0.8, 1.4), clipped
  (the reference's ``px_scaling``, input.py:308-326)
- ignore-mask generation: ``mask = label != 255``, masked labels -> 0
  (input.py:18-36)

The train path returns both the undistorted crop (``image_raw``, used by
the pseudo-labeling forward pass, active_learning.py:231) and the
distorted crop, exactly like ``_default_augmentation``
(input.py:296-329).

Batches arrive as a uint8 stack ``[B, Hs, Ws, C+1]`` (image channels +
label plane) padded to a static storage shape, with per-example valid
``heights``/``widths`` so crops never sample padding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def generate_mask(labels: jnp.ndarray, mask_index: int = 255
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``mask = label != mask_index``; masked labels mapped to 0
    (reference: input.py:18-36)."""
    mask = (labels != mask_index)
    clean = jnp.where(mask, labels, 0).astype(jnp.int32)
    return clean, mask.astype(jnp.float32)


def _crop_one(stack, top, left, crop_h, crop_w):
    return jax.lax.dynamic_slice(
        stack, (top, left, 0), (crop_h, crop_w, stack.shape[-1]))


def _random_crop_flip(stack, heights, widths, key, crop_hw):
    """Shared random crop + horizontal flip.

    One code path for the train and scoring pipelines so both consume
    the PRNG identically: for the same ``key`` the scoring path's crop
    window and flip equal the train path's, making label-free scores
    bit-identical to scores computed through ``augment_batch``.

    :returns: (crops ``[B,ch,cw,planes]`` uint8, leftover scale key)
    """
    batch = stack.shape[0]
    crop_h, crop_w = crop_hw
    k_top, k_left, k_flip, k_scale = jax.random.split(key, 4)

    # Random crop origin within the valid region (tf.random_crop).
    max_top = jnp.maximum(heights - crop_h, 0)
    max_left = jnp.maximum(widths - crop_w, 0)
    u_top = jax.random.uniform(k_top, (batch,))
    u_left = jax.random.uniform(k_left, (batch,))
    tops = jnp.floor(u_top * (max_top + 1)).astype(jnp.int32)
    lefts = jnp.floor(u_left * (max_left + 1)).astype(jnp.int32)

    crops = jax.vmap(_crop_one, in_axes=(0, 0, 0, None, None))(
        stack, tops, lefts, crop_h, crop_w)

    # Random horizontal flip (tf.image.random_flip_left_right).
    flip = jax.random.bernoulli(k_flip, 0.5, (batch,))
    crops = jnp.where(flip[:, None, None, None], crops[:, :, ::-1, :],
                      crops)
    return crops, k_scale


@functools.partial(jax.jit, static_argnames=("crop_hw", "channels"))
def augment_batch(stack: jnp.ndarray, heights: jnp.ndarray,
                  widths: jnp.ndarray, key: jax.Array,
                  crop_hw: Tuple[int, int], channels: int = 3):
    """Training-path augmentation.

    :param stack:   ``[B, Hs, Ws, channels+1]`` uint8 images+label plane
    :param heights: ``[B]`` valid heights (<= Hs)
    :param widths:  ``[B]`` valid widths  (<= Ws)
    :param key:     PRNG key for this batch
    :param crop_hw: static ``(crop_h, crop_w)`` network input size
    :returns: ``(image_raw, image_dist, label, mask)`` with
              ``image_*`` float32 ``[B,ch,cw,channels]``,
              ``label`` int32 ``[B,ch,cw]``, ``mask`` float32.
    """
    batch = stack.shape[0]
    crops, k_scale = _random_crop_flip(stack, heights, widths, key,
                                       crop_hw)
    image = crops[..., :channels].astype(jnp.float32) / 255.0
    label = crops[..., channels].astype(jnp.int32)

    # Per-example per-channel intensity scaling U[0.8, 1.4), clipped.
    px_scale = jax.random.uniform(k_scale, (batch, 1, 1, channels),
                                  minval=0.8, maxval=1.4)
    image_dist = jnp.clip(image * px_scale, 0.0, 1.0)

    label, mask = generate_mask(label)
    return image, image_dist, label, mask


@functools.partial(jax.jit, static_argnames=("crop_hw", "channels"))
def score_batch(stack: jnp.ndarray, heights: jnp.ndarray,
                widths: jnp.ndarray, key: jax.Array,
                crop_hw: Tuple[int, int],
                channels: int | None = None) -> jnp.ndarray:
    """Acquisition-scoring preprocessing: the train path's *raw*
    (undistorted) crop, computed from a label-free stack.

    The reference scores the pool on the input pipeline's undistorted
    image (active_learning.py:687-700 feeding the ``train_input.output``
    raw tensor); here the pool loader skips the label plane entirely
    (``RecordLoader(with_label=False)``), so this takes ``[B,Hs,Ws,C]``
    stacks and returns only ``image_raw``. For the same ``key`` the
    result equals ``augment_batch(...)[0]`` on the labelled stack —
    the crop/flip PRNG path is shared (``_random_crop_flip``).

    :param channels: image channels to keep (default: every stack
                     plane — label-free stacks carry image/modality
                     planes only). Pass the model's input channel
                     count, like ``augment_batch``, to guard against
                     an oversized stack.
    """
    crops, _ = _random_crop_flip(stack, heights, widths, key, crop_hw)
    if channels is not None:
        crops = crops[..., :channels]
    return crops.astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("crop_hw", "channels"))
def score_batch_indexed(stack: jnp.ndarray, heights: jnp.ndarray,
                        widths: jnp.ndarray, pass_key: jax.Array,
                        index: jnp.ndarray, crop_hw: Tuple[int, int],
                        channels: int | None = None) -> jnp.ndarray:
    """:func:`score_batch` with per-EXAMPLE crop/flip randomness.

    Each row's PRNG key is ``fold_in(pass_key, global example index)``,
    so for a fixed ``pass_key`` an example's crop window and flip are
    functions of the example alone — pool scores become invariant to
    how the pool is batched (grouped dispatch, size buckets and
    multi-host row layouts all re-chunk the stream). The per-batch
    :func:`score_batch` draws fresh randomness per dispatch instead,
    which ties scores to the batch composition.

    :param pass_key: one key per ranking pass (e.g. per AL round)
    :param index:    ``[B]`` int global example indices
    """
    crop_h, crop_w = crop_hw

    def one(stack_i, h_i, w_i, idx_i):
        # same crop-origin formula and slice helper as
        # _random_crop_flip, keyed per example instead of per batch
        key_i = jax.random.fold_in(pass_key, idx_i)
        kt, kl, kf = jax.random.split(key_i, 3)
        top = jnp.floor(
            jax.random.uniform(kt)
            * (jnp.maximum(h_i - crop_h, 0) + 1)).astype(jnp.int32)
        left = jnp.floor(
            jax.random.uniform(kl)
            * (jnp.maximum(w_i - crop_w, 0) + 1)).astype(jnp.int32)
        crop = _crop_one(stack_i, top, left, crop_h, crop_w)
        flip = jax.random.bernoulli(kf, 0.5)
        return jnp.where(flip, crop[:, ::-1, :], crop)

    crops = jax.vmap(one)(stack, heights, widths,
                          index.astype(jnp.int32))
    if channels is not None:
        crops = crops[..., :channels]
    return crops.astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("crop_hw", "channels"))
def eval_batch(stack: jnp.ndarray, heights: jnp.ndarray,
               widths: jnp.ndarray, crop_hw: Tuple[int, int],
               channels: int = 3):
    """Evaluation-path preprocessing: deterministic center crop
    (reference: input.py:277-293)."""
    crop_h, crop_w = crop_hw
    tops = jnp.maximum(heights // 2 - crop_h // 2, 0).astype(jnp.int32)
    lefts = jnp.maximum(widths // 2 - crop_w // 2, 0).astype(jnp.int32)
    crops = jax.vmap(_crop_one, in_axes=(0, 0, 0, None, None))(
        stack, tops, lefts, crop_h, crop_w)
    image = crops[..., :channels].astype(jnp.float32) / 255.0
    label, mask = generate_mask(crops[..., channels].astype(jnp.int32))
    return image, label, mask
