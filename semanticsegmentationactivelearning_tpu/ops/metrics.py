"""Streaming confusion-matrix metrics (reference: tensortools/metrics.py).

The device side computes one batch-level confusion matrix per step via
the reference's bincount trick (``num_classes * label + pred`` weighted
by the ignore mask, metrics.py:226-257). Accumulation across steps
happens host-side in int64 (the reference used an in-graph int64
variable, metrics.py:12-24; host accumulation is exact, trivially
resettable, and keeps the jit step functional). Per-batch counts fit
int32 comfortably (8 x 1024 x 2048 ~= 1.7e7).

Derived metrics follow metrics.py:155-224, including the
``max(denominator, 1)`` guards and deriving TP/FP/FN without
``diag_part`` semantics differences.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


_MATMUL_CHUNK = 1 << 21  # pixels per MXU chunk (~512MB padded one-hots)


def confusion_matrix(labels: jnp.ndarray, predictions: jnp.ndarray,
                     num_classes: int, mask: jnp.ndarray = None,
                     use_matmul: bool = None) -> jnp.ndarray:
    """Batch confusion matrix ``[C,C]`` (rows = labels, cols = preds),
    int32 counts, jit-safe.

    On accelerators this uses chunked one-hot matmuls
    (``onehot(l)ᵀ @ (onehot(p)·w)``) — the MXU path measures ~2.2x the
    scatter-add bincount on v5e, and chunking bounds the padded one-hot
    buffers. Exactness: 0/1 one-hots in bf16 with a per-chunk fp32
    accumulator are exact for chunk counts <= 2^21 << 2^24; chunks are
    cast to int32 before the cross-chunk sum, so totals are exact up to
    int32 range. CPU keeps the scatter bincount.
    """
    l = labels.reshape(-1).astype(jnp.int32)
    p = predictions.reshape(-1).astype(jnp.int32)
    if mask is not None:
        w = mask.reshape(-1)
    else:
        w = jnp.ones_like(l, jnp.float32)

    import jax
    if use_matmul is None:
        use_matmul = (jax.default_backend() != "cpu"
                      and l.size >= (1 << 16))
    if not use_matmul:
        idx = num_classes * l + p
        flat = jnp.zeros((num_classes * num_classes,), jnp.int32)
        flat = flat.at[idx].add(w.astype(jnp.int32), mode="drop")
        return flat.reshape(num_classes, num_classes)

    chunk = min(_MATMUL_CHUNK, l.size)
    pad = (-l.size) % chunk
    if pad:
        # padded tail contributes zero via a zero weight
        l = jnp.pad(l, (0, pad))
        p = jnp.pad(p, (0, pad))
        w = jnp.pad(w, (0, pad))
    k = l.size // chunk

    def body(i, acc):
        sl = lambda a: jax.lax.dynamic_slice(a, (i * chunk,), (chunk,))
        lo = jax.nn.one_hot(sl(l), num_classes, dtype=jnp.bfloat16)
        po = jax.nn.one_hot(sl(p), num_classes, dtype=jnp.bfloat16)
        po = po * sl(w).astype(jnp.bfloat16)[:, None]
        part = jnp.dot(lo.T, po, preferred_element_type=jnp.float32)
        # Per-chunk fp32 counts <= 2^21 are exact; cast before the
        # cross-chunk sum so the int32 accumulator has no fp32 2^24
        # integer-exactness ceiling at large batch x resolution.
        return acc + part.astype(jnp.int32)

    return jax.lax.fori_loop(
        0, k, body, jnp.zeros((num_classes, num_classes), jnp.int32))


def derive_metrics(confusion: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side derived metrics from an accumulated int64 confusion
    matrix (metrics.py:155-224)."""
    conf = np.asarray(confusion, dtype=np.int64)
    samples = conf.sum()
    tp = np.diag(conf).copy()
    off = conf - np.diag(tp)
    fp = off.sum(axis=0)
    fn = off.sum(axis=1)
    tp_fp = tp + fp
    tp_fp_fn = tp_fp + fn
    tn = samples - tp_fp_fn

    class_accuracy = (tp + tn) / max(samples, 1)
    class_precision = tp / np.maximum(tp_fp, 1)
    class_recall = tp / np.maximum(tp + fn, 1)
    class_iou = tp / np.maximum(tp_fp_fn, 1)
    pixel_accuracy = tp.sum() / max(samples, 1)
    mean_iou = class_iou.mean()

    return {
        "TruePositive": tp, "TrueNegative": tn,
        "FalsePositive": fp, "FalseNegative": fn,
        "ClassAccuracy": class_accuracy,
        "ClassPrecision": class_precision,
        "ClassRecall": class_recall,
        "ClassMeanIoU": class_iou,
        "PixelAccuracy": pixel_accuracy,
        "MeanIoU": mean_iou,
        "ConfusionMat": conf,
    }


class ConfusionAccumulator:
    """Host-side streaming accumulator (replaces the reference's
    assign_add variable + reset initializer, metrics.py:12-77).

    ``update`` is LAZY: device arrays are buffered and only fetched
    when a result is read. Fetching a jit output forces a device sync,
    so an eager per-step ``np.asarray`` would serialize the hot loop —
    uploads of the next batch could never overlap the in-flight step
    (measured ~2x step-time through the TPU relay). Buffered [C,C]
    int32 matrices are ~1.4KB each; an epoch of thousands of steps
    holds a few MB at most."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self) -> None:
        self._matrix = np.zeros((self.num_classes, self.num_classes),
                                dtype=np.int64)
        self._pending = []

    def update(self, batch_confusion) -> None:
        self._pending.append(batch_confusion)

    def _drain(self) -> None:
        if self._pending:
            pending, self._pending = self._pending, []
            for m in pending:
                m = np.asarray(m, dtype=np.int64)
                if m.ndim == 3:
                    # a grouped step's per-step [K,C,C] stack (kept
                    # un-summed when the dispatch pixel count could
                    # overflow an int32 device sum): exact here
                    m = m.sum(axis=0)
                self._matrix += m

    @property
    def matrix(self) -> np.ndarray:
        self._drain()
        return self._matrix

    def metrics(self) -> Dict[str, np.ndarray]:
        return derive_metrics(self.matrix)

    @property
    def mean_iou(self) -> float:
        return float(self.metrics()["MeanIoU"])
