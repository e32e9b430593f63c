"""Loss / metric / acquisition tests against float64 numpy oracles
(SURVEY.md §4a). The oracles re-derive the reference math independently
(losses.py:3-74, metrics.py:155-257, active_learning.py:240-263)."""

import numpy as np
import pytest


import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.ops import (acquisition,
                                                        losses, metrics)


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _oracle_masked_ce_weighted(labels, logits, mask, C, weight, ls=0.0):
    """float64 re-derivation of losses.py:3-74."""
    labels = np.asarray(labels)
    logits = np.asarray(logits, np.float64)
    mask = np.asarray(mask, np.float64)
    on, off = 1.0 - ls, ls / (C - 1.0)
    onehot = np.full(logits.shape, off)
    np.put_along_axis(onehot, labels[..., None], on, axis=-1)
    p = _np_softmax(logits)
    loss = -(onehot * np.log(p)).sum(-1) * mask
    if weight > 1.0:
        euler = 1.718281828459045
        p_true = (p * onehot).sum(-1)
        loss = loss / np.log(weight + (euler - weight) * p_true)
    return loss.sum() / mask.sum()


@pytest.fixture
def ce_inputs():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 12, 6
    labels = rng.integers(0, C, (B, H, W))
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32) * 3
    mask = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)
    return labels, logits, mask, C


class TestMaskedCE:
    def test_plain(self, ce_inputs):
        labels, logits, mask, C = ce_inputs
        got = float(losses.masked_softmax_cross_entropy(
            jnp.array(labels), jnp.array(logits), jnp.array(mask), C))
        want = _oracle_masked_ce_weighted(labels, logits, mask, C, 0.0)
        assert got == pytest.approx(want, rel=1e-5)

    def test_label_smoothing(self, ce_inputs):
        labels, logits, mask, C = ce_inputs
        got = float(losses.masked_softmax_cross_entropy(
            jnp.array(labels), jnp.array(logits), jnp.array(mask), C,
            label_smoothing=0.05))
        want = _oracle_masked_ce_weighted(labels, logits, mask, C, 0.0,
                                          ls=0.05)
        assert got == pytest.approx(want, rel=1e-5)

    def test_inverse_log_weighting(self, ce_inputs):
        labels, logits, mask, C = ce_inputs
        got = float(losses.masked_softmax_cross_entropy(
            jnp.array(labels), jnp.array(logits), jnp.array(mask), C,
            weight=1.02))
        want = _oracle_masked_ce_weighted(labels, logits, mask, C, 1.02)
        assert got == pytest.approx(want, rel=1e-5)

    def test_fully_masked_pixel_contributes_zero(self, ce_inputs):
        labels, logits, mask, C = ce_inputs
        base = float(losses.masked_softmax_cross_entropy(
            jnp.array(labels), jnp.array(logits), jnp.array(mask), C))
        # perturb logits only where mask == 0
        logits2 = logits.copy()
        logits2[mask == 0] += 100.0
        pert = float(losses.masked_softmax_cross_entropy(
            jnp.array(labels), jnp.array(logits2), jnp.array(mask), C))
        assert base == pytest.approx(pert, rel=1e-6)

    def test_multiscale_sums_scales(self, ce_inputs):
        labels, logits, mask, C = ce_inputs
        rng = np.random.default_rng(1)
        half = rng.normal(size=(2, 4, 6, C)).astype(np.float32)
        got = float(losses.multiscale_masked_softmax_cross_entropy(
            jnp.array(labels), [jnp.array(logits), jnp.array(half)],
            jnp.array(mask), C))
        l0 = _oracle_masked_ce_weighted(labels, logits, mask, C, 0.0)
        labels_h = labels[:, ::2, ::2]
        mask_h = mask[:, ::2, ::2]
        l1 = _oracle_masked_ce_weighted(labels_h, half, mask_h, C, 0.0)
        assert got == pytest.approx(l0 + l1, rel=1e-5)
        # normalize=True averages over scales (reference's intended
        # semantics, losses.py:153-154 had a bug here)
        got_n = float(losses.multiscale_masked_softmax_cross_entropy(
            jnp.array(labels), [jnp.array(logits), jnp.array(half)],
            jnp.array(mask), C, normalize=True))
        assert got_n == pytest.approx((l0 + l1) / 2, rel=1e-5)


class TestRegularization:
    def test_kernels_and_alphas_only(self):
        params = {
            "Block": {"conv": {"kernel": jnp.ones((3, 3, 2, 4))},
                      "prelu": {"alpha": jnp.full((4,), 0.5)},
                      "bn": {"scale": jnp.ones((4,)),
                             "bias": jnp.ones((4,))}},
        }
        got = float(losses.regularization_loss(params, l1=0.0, l2=2e-4))
        want = 2e-4 * (3 * 3 * 2 * 4 * 1.0 + 4 * 0.25)
        assert got == pytest.approx(want, rel=1e-6)

    def test_glorot_scaling(self):
        k = jnp.ones((3, 3, 2, 4))
        params = {"c": {"kernel": k}}
        var_scale = 2.0 / (9 * (2 + 4))
        want = (2e-4 / var_scale) * float(jnp.sum(k ** 2))
        got = float(losses.regularization_loss(params, l2=2e-4,
                                               glorot_scaling=True))
        assert got == pytest.approx(want, rel=1e-6)

    def test_zero_when_disabled(self):
        assert float(losses.regularization_loss(
            {"c": {"kernel": jnp.ones((1, 1, 1, 1))}})) == 0.0


class TestConfusionMatrix:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        C = 5
        labels = rng.integers(0, C, (2, 16, 16))
        preds = rng.integers(0, C, (2, 16, 16))
        mask = (rng.uniform(size=(2, 16, 16)) > 0.3).astype(np.float32)
        got = np.asarray(metrics.confusion_matrix(
            jnp.array(labels), jnp.array(preds), C, jnp.array(mask)))
        want = np.zeros((C, C), np.int64)
        for l, p, m in zip(labels.ravel(), preds.ravel(), mask.ravel()):
            want[l, p] += int(m)
        np.testing.assert_array_equal(got, want)

    def test_matmul_path_matches_oracle(self):
        rng = np.random.default_rng(4)
        C = 5
        labels = rng.integers(0, C, (3, 33, 47))
        preds = rng.integers(0, C, (3, 33, 47))
        mask = (rng.uniform(size=(3, 33, 47)) > 0.3).astype(np.float32)
        got = np.asarray(metrics.confusion_matrix(
            jnp.array(labels), jnp.array(preds), C, jnp.array(mask),
            use_matmul=True))
        want = np.zeros((C, C), np.int64)
        for l, p, m in zip(labels.ravel(), preds.ravel(), mask.ravel()):
            want[l, p] += int(m)
        np.testing.assert_array_equal(got, want)

    def test_matmul_path_exact_above_fp32_integer_ceiling(self):
        """Cross-chunk accumulation is int32, so a single confusion
        cell above 2^24 (the fp32 integer-exactness limit a single
        fp32 accumulator would silently hit at batch 8 x 1024 x 2048)
        stays exact."""
        n = (1 << 24) + 4097
        labels = jnp.zeros((n,), jnp.int32)
        preds = jnp.zeros((n,), jnp.int32)
        got = np.asarray(metrics.confusion_matrix(
            labels, preds, 2, use_matmul=True))
        assert got[0, 0] == n

    def test_derived_metrics(self):
        conf = np.array([[10, 2, 0], [1, 20, 3], [0, 0, 4]], np.int64)
        m = metrics.derive_metrics(conf)
        np.testing.assert_array_equal(m["TruePositive"], [10, 20, 4])
        np.testing.assert_array_equal(m["FalsePositive"], [1, 2, 3])
        np.testing.assert_array_equal(m["FalseNegative"], [2, 4, 0])
        total = conf.sum()
        assert m["PixelAccuracy"] == pytest.approx(34 / total)
        ious = [10 / 13, 20 / 26, 4 / 7]
        np.testing.assert_allclose(m["ClassMeanIoU"], ious)
        assert m["MeanIoU"] == pytest.approx(np.mean(ious))

    def test_absent_class_iou_zero(self):
        conf = np.zeros((3, 3), np.int64)
        conf[0, 0] = 5
        m = metrics.derive_metrics(conf)
        np.testing.assert_allclose(m["ClassMeanIoU"], [1.0, 0.0, 0.0])

    def test_accumulator(self):
        acc = metrics.ConfusionAccumulator(3)
        acc.update(np.eye(3, dtype=np.int32) * 2)
        acc.update(np.eye(3, dtype=np.int32))
        np.testing.assert_array_equal(acc.matrix, np.eye(3) * 3)
        assert acc.mean_iou == pytest.approx(1.0)
        acc.reset()
        assert acc.matrix.sum() == 0

    def test_accumulator_grouped_stack(self):
        # a grouped train step may hand back per-step [K,C,C] counts
        # (kept un-summed when the dispatch pixel count could overflow
        # an int32 device sum): the host accumulates them exactly
        acc = metrics.ConfusionAccumulator(2)
        stack = np.stack([np.eye(2, dtype=np.int32),
                          2 * np.eye(2, dtype=np.int32)])
        acc.update(stack)
        acc.update(np.eye(2, dtype=np.int32))
        np.testing.assert_array_equal(acc.matrix, 4 * np.eye(2))


class TestAcquisition:
    @pytest.fixture
    def logits(self):
        rng = np.random.default_rng(4)
        return rng.normal(size=(2, 8, 8, 6)).astype(np.float32) * 2

    def test_entropy_oracle(self, logits):
        got = np.asarray(acquisition.mean_confidence(
            jnp.array(logits), "entropy", 6))
        p = _np_softmax(np.asarray(logits, np.float64))
        ent = -(p * np.log(p + acquisition.EPSILON)).sum(-1) / np.log(6)
        want = (1.0 - ent).mean(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_margin_oracle(self, logits):
        got = np.asarray(acquisition.mean_confidence(
            jnp.array(logits), "margin", 6))
        p = _np_softmax(np.asarray(logits, np.float64))
        srt = np.sort(p, axis=-1)
        want = (srt[..., -1] - srt[..., -2]).mean(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_confidence_oracle(self, logits):
        got = np.asarray(acquisition.mean_confidence(
            jnp.array(logits), "confidence", 6))
        p = _np_softmax(np.asarray(logits, np.float64))
        want = p.max(-1).mean(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_entropy_range_and_extremes(self):
        # uniform logits -> confidence 0; one-hot-ish -> near 1
        uniform = jnp.zeros((1, 2, 2, 4))
        c = np.asarray(acquisition.confidence_map(uniform, "entropy", 4))
        np.testing.assert_allclose(c, 0.0, atol=1e-6)
        peaked = jnp.zeros((1, 2, 2, 4)).at[..., 0].set(50.0)
        c = np.asarray(acquisition.confidence_map(peaked, "entropy", 4))
        np.testing.assert_allclose(c, 1.0, atol=1e-5)

    def test_pseudo_annotate(self, logits):
        label, mask, conf = acquisition.pseudo_annotate(
            jnp.array(logits), "confidence", 6, threshold=0.5)
        p = _np_softmax(np.asarray(logits, np.float64))
        np.testing.assert_array_equal(np.asarray(label), p.argmax(-1))
        np.testing.assert_array_equal(np.asarray(mask),
                                      (p.max(-1) >= 0.5).astype(np.float32))
        assert conf.shape == (2,)

    def test_unknown_measure_raises(self, logits):
        with pytest.raises(NotImplementedError):
            acquisition.confidence_map(jnp.array(logits), "bogus", 6)


class TestBald:
    """MC-dropout BALD (mutual information) acquisition — a capability
    extension over the reference's three deterministic measures."""

    @pytest.fixture
    def logits_t(self):
        rng = np.random.default_rng(7)
        return rng.normal(size=(4, 2, 6, 6, 5)).astype(np.float32) * 2

    def test_oracle(self, logits_t):
        got = np.asarray(acquisition.mean_bald_confidence(
            jnp.array(logits_t), 5))
        p = _np_softmax(np.asarray(logits_t, np.float64))
        ent = -(p * np.log(p + acquisition.EPSILON)).sum(-1) / np.log(5)
        mp = p.mean(0)
        pent = -(mp * np.log(mp + acquisition.EPSILON)).sum(-1) / np.log(5)
        mi = np.clip(pent - ent.mean(0), 0.0, 1.0)
        want = (1.0 - mi).mean(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_identical_passes_full_confidence(self):
        # agreement across passes => MI 0 => confidence 1, even though
        # each pass is itself high-entropy (aleatoric-only uncertainty
        # should NOT be selected by BALD)
        rng = np.random.default_rng(8)
        one = rng.normal(size=(1, 2, 4, 4, 5)).astype(np.float32) * 0.1
        logits_t = jnp.array(np.repeat(one, 6, axis=0))
        got = np.asarray(acquisition.mean_bald_confidence(logits_t, 5))
        np.testing.assert_allclose(got, 1.0, atol=1e-5)
        # and the entropy measure on the same logits is far from 1
        ent_conf = np.asarray(acquisition.mean_confidence(
            jnp.array(one[0]), "entropy", 5))
        assert (ent_conf < 0.1).all()

    def test_disagreeing_passes_low_confidence(self):
        # passes confidently predicting different classes => high MI
        t, c = 5, 5
        logits_t = np.full((t, 1, 2, 2, c), -20.0, np.float32)
        for ti in range(t):
            logits_t[ti, ..., ti % c] = 20.0
        got = np.asarray(acquisition.mean_bald_confidence(
            jnp.array(logits_t), c))
        assert (got < 0.05).all()

    def test_chunked_deconv_matches_unchunked(self):
        rng = np.random.default_rng(9)
        t, n, h2, w2, cin, c = 3, 2, 8, 4, 6, 5
        feats = rng.normal(size=(t, n, h2, w2, cin)).astype(np.float32)
        kernel = rng.normal(size=(3, 3, cin, c)).astype(np.float32) * 0.5
        got = np.asarray(acquisition.chunked_deconv_bald_confidence(
            jnp.array(feats), jnp.array(kernel), c, chunk=2))
        # oracle: full per-pass transpose conv, then the stacked math
        full = jax.lax.conv_transpose(
            jnp.array(feats.reshape(t * n, h2, w2, cin)),
            jnp.array(kernel), strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        full = jnp.reshape(full, (t, n, h2 * 2, w2 * 2, c))
        want = np.asarray(acquisition.mean_bald_confidence(full, c))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
