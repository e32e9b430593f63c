"""Low-level neural-net ops (reference: models/util/extra_ops.py).

The reference's ``max_pool_with_argmax`` + ``unpool_2d``-via-``scatter_nd``
pair (extra_ops.py:28-86) is re-designed for XLA/TPU: dynamic-index
scatter is hostile to the compiler, so pooling instead returns a one-hot
*switch* tensor over each 2x2 window (the argmax position, first-max
tie-breaking like tf.argmax) and unpooling is a broadcast-multiply +
reshape — pure dense ops that XLA fuses. The round-trip property
``max_pool(unpool(max_pool(x))) == max_pool(x)`` from the reference's
only test (models/util/test_xops.py:6-21) holds exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Parametrized ReLU, per-channel alpha (extra_ops.py:9-26)."""
    return jnp.where(x >= 0, x, alpha * x)


def _to_windows(x: jnp.ndarray) -> jnp.ndarray:
    """``[N,H,W,C] -> [N,H/2,W/2,4,C]`` row-major 2x2 windows."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (
        f"max_pool_with_switches requires even spatial dims, got {h}x{w}")
    win = x.reshape(n, h // 2, 2, w // 2, 2, c)
    win = win.transpose(0, 1, 3, 2, 4, 5)
    return win.reshape(n, h // 2, w // 2, 4, c)


def _from_windows(win: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_to_windows`."""
    n, h2, w2, _four, c = win.shape
    out = win.reshape(n, h2, w2, 2, 2, c)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, h2 * 2, w2 * 2, c)


def max_pool_with_switches(x: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/stride-2 max pool returning (pooled, switches).

    ``switches`` records the window position (0..3, row-major,
    first-maximum tie-breaking like tf.argmax) of each pooled value —
    the dense equivalent of ``tf.nn.max_pool_with_argmax`` indices
    (extra_ops.py:63-81 documents the index-arithmetic bugs the dense
    design removes entirely).

    Storage layout: int8 ``[N, H/2, (W/2)*C]``. The switch tensor stays
    live from encoder to decoder, and a ``[N,h,w,4,C]`` one-hot would
    pad its (4, C) minor dims to (8, 128) tiles — a 16x HBM blowup that
    OOMs 1024x2048 batches; the flattened index layout pads to ~1x.
    Treat it as opaque; use :func:`switches_to_onehot` to inspect.
    """
    win = _to_windows(x)
    pooled = jnp.max(win, axis=3)
    idx = jnp.argmax(win, axis=3).astype(jnp.int8)  # first max, like tf
    n, h2, w2, c = pooled.shape
    return pooled, idx.reshape(n, h2, w2 * c)


def switches_to_onehot(switches: jnp.ndarray, channels: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Expand opaque switches to one-hot ``[N,h,w,4,C]``."""
    n, h2, flat = switches.shape
    idx = switches.reshape(n, h2, flat // channels, channels)
    return jax.nn.one_hot(idx, 4, axis=3, dtype=dtype)


def unpool_with_switches(y: jnp.ndarray, switches: jnp.ndarray
                         ) -> jnp.ndarray:
    """Place each pooled value at its recorded window position, zeros
    elsewhere (the Zeiler/Fergus unpool; extra_ops.py:28-86)."""
    onehot = switches_to_onehot(switches, y.shape[-1], dtype=y.dtype)
    scattered = y[:, :, :, None, :] * onehot
    return _from_windows(scattered)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Plain 2x2/stride-2 max pool (Initial block residual branch)."""
    return jnp.max(_to_windows(x), axis=3)


def spatial_dropout(x: jnp.ndarray, rate: float, key: jax.Array,
                    training: bool = True) -> jnp.ndarray:
    """Channel-wise spatial dropout, noise shape ``[N,1,1,C]``
    (extra_ops.py:137-151)."""
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def s2d_plane(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """``[N, H, W] -> [N, H/f, fW]`` spatial permutation matching the
    phase-domain logits of ``shiftconv.conv_transpose_up2_phase`` /
    ``models.blocks.Final(phase=True)`` (f=2) and the ICNet polyphase
    4x head upsample (f=4): flat column ``f*f*c + f*a + b`` holds pixel
    ``(f*r + a, f*c + b)``.

    Cross-entropy, argmax and confusion counts are per-pixel, so
    permuting labels/masks with this (instead of depth-to-spacing the
    logits to full resolution) computes identical losses and exactly
    identical confusion-matrix counts while the full-resolution
    lane-padded logits plane never materializes (its d2s relayout
    measured +58 ms on the batch-8 512x1024 train step)."""
    f = factor
    n, h, w = x.shape
    y = x.reshape(n, h // f, f, w // f, f)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(n, h // f, f * w)


def d2s_plane(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Inverse of :func:`s2d_plane`: ``[N, H/f, fW] -> [N, H, W]``."""
    f = factor
    n, hf, wfxf = x.shape
    wf = wfxf // (f * f)
    y = x.reshape(n, hf, wf, f, f)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(n, f * hf, f * wf)


def s2d_nhwc(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """``[N, H, W, C] -> [N, H/f, fW, C]``: the :func:`s2d_plane`
    permutation with a trailing channel axis (used by the lax-conv
    fallback of ``Final(phase=True)`` so both conv lowerings emit the
    same phase-domain form)."""
    f = factor
    n, h, w, c = x.shape
    y = x.reshape(n, h // f, f, w // f, f, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h // f, f * w, c)
