"""Phase-domain (polyphase) training-logits parity tests.

The train/eval steps consume the Final deconv's logits in its polyphase
pixel order (``models.blocks.Final(phase=True)``, flat column
``4c + 2a + b`` = pixel ``(2r + a, 2c + b)``) with labels/masks permuted
by ``ops.nn.s2d_plane`` — per-pixel consumers are permutation-invariant,
so losses match (mod fp32 reassociation) and confusion counts match
bit-exactly while the full-resolution fp32 logits plane (whose d2s
relayout measured +58 ms on the batch-8 512x1024 v5e train step) never
materializes. These tests pin the permutation contract and end-to-end
step parity against the full-resolution path.

Reference semantics being preserved: the per-pixel CE + per-step
confusion counts of /root/reference/train.py:108-206.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


from semanticsegmentationactivelearning_tpu.models import ENet, blocks
from semanticsegmentationactivelearning_tpu.ops import nn as xops
from semanticsegmentationactivelearning_tpu.train import (
    TrainState, make_eval_step, make_train_step)

HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 5e-4,
    "optimizer": {"type": "Adam", "kwargs": {"beta1": 0.9}},
    "weight_reg": {"L2": 2e-4, "L1": 0.0},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": False},
}


def test_s2d_plane_index_mapping():
    """Flat column 4c + 2a + b holds pixel (2r + a, 2c + b)."""
    n, h, w = 2, 6, 8
    x = np.arange(n * h * w).reshape(n, h, w).astype(np.int32)
    y = np.asarray(xops.s2d_plane(jnp.asarray(x)))
    assert y.shape == (n, h // 2, 2 * w)
    for r in range(h // 2):
        for c in range(w // 2):
            for a in (0, 1):
                for b in (0, 1):
                    assert y[:, r, 4 * c + 2 * a + b] == pytest.approx(
                        x[:, 2 * r + a, 2 * c + b])
    back = np.asarray(xops.d2s_plane(jnp.asarray(y)))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("impl", ["lax", "matmul"])
def test_conv_transpose_phase_is_s2d_of_full(impl):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 6)).astype(np.float32))
    mod = blocks.ConvTranspose(4, impl=impl)
    variables = mod.init(jax.random.PRNGKey(0), x)
    full = mod.apply(variables, x)
    phase = mod.apply(variables, x, phase=True)
    assert phase.shape == (2, 5, 28, 4)
    np.testing.assert_array_equal(np.asarray(xops.s2d_nhwc(full)),
                                  np.asarray(phase))


@pytest.mark.parametrize("impl", ["lax", "matmul"])
def test_enet_phase_logits_is_s2d_of_logits(impl):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 24, 3)).astype(np.float32))
    model = ENet(num_classes=5, conv_impl=impl)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, training=False)
    full = model.apply(variables, x, training=False)
    phase = model.apply(variables, x, training=False,
                        return_phase_logits=True)
    assert phase.shape == (1, 8, 48, 5)
    np.testing.assert_array_equal(np.asarray(xops.s2d_nhwc(full)),
                                  np.asarray(phase))


def _batch(rng, b, h, w, num_classes, pseudo=False):
    batch = {
        "image": jnp.asarray(
            rng.uniform(size=(b, h, w, 3)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, num_classes, size=(b, h, w))
            .astype(np.int32)),
        "mask": jnp.asarray(
            (rng.uniform(size=(b, h, w)) > 0.1).astype(np.float32)),
        "valid": jnp.ones((b,), jnp.float32),
    }
    if pseudo:
        batch["image_raw"] = jnp.asarray(
            rng.uniform(size=(b, h, w, 3)).astype(np.float32))
        batch["labelled"] = jnp.asarray(
            np.array([1.0] + [0.0] * (b - 1), np.float32))
    return batch


@pytest.mark.parametrize("pseudo", [False, True])
def test_train_step_phase_parity(pseudo):
    """make_train_step(phase_logits=True) computes the same loss (fp32
    reassociation tolerance), bit-identical confusion counts, and the
    same parameter update as the full-resolution path."""
    num_classes = 5
    model = ENet(num_classes=num_classes,
                 drop_rates=[0.0] * 5)  # rng-free: exact comparability
    optimizer = optax.adam(5e-4)
    rng = np.random.default_rng(2)
    batch = _batch(rng, 2, 16, 24, num_classes, pseudo=pseudo)
    x0 = batch["image"][:1]
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x0, training=True)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32))
    pseudo_cfg = ({"measure": "entropy", "threshold": 0.7}
                  if pseudo else None)
    key = jax.random.PRNGKey(7)

    results = {}
    for phase in (False, True):
        step = make_train_step(model, optimizer, num_classes, HPARAMS,
                               pseudo_cfg=pseudo_cfg,
                               phase_logits=phase)
        # donate_argnums: pass a fresh copy of the state each time
        st = jax.tree.map(jnp.copy, state)
        new_state, aux = step(st, dict(batch), key)
        results[phase] = (new_state, aux)

    (s_full, a_full), (s_phase, a_phase) = results[False], results[True]
    np.testing.assert_array_equal(np.asarray(a_full["confusion"]),
                                  np.asarray(a_phase["confusion"]))
    np.testing.assert_allclose(float(a_full["loss"]),
                               float(a_phase["loss"]), rtol=1e-5)
    # Adam divides near-zero grads by near-zero sqrt(nu), amplifying
    # the fp32 reassociation difference between the two CE orderings;
    # the margin also absorbs XLA compile-variant noise (source-line
    # metadata alone changes scheduling enough to move the max rel
    # diff ~2x on CPU), so this is deliberately looser than the loss
    # tolerance above. A real wiring bug fails by orders of magnitude.
    for pf, pp in zip(jax.tree.leaves(s_full.params),
                      jax.tree.leaves(s_phase.params)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pp),
                                   rtol=1e-3, atol=1e-5)


def test_eval_step_phase_parity():
    num_classes = 5
    model = ENet(num_classes=num_classes)
    rng = np.random.default_rng(3)
    batch = _batch(rng, 2, 16, 24, num_classes)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            batch["image"][:1], training=False))(jax.random.PRNGKey(0))
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=(), step=jnp.zeros((), jnp.int32),
                       epoch=jnp.zeros((), jnp.int32))
    cm_full = make_eval_step(model, num_classes, phase_logits=False)(
        state, batch)
    cm_phase = make_eval_step(model, num_classes, phase_logits=True)(
        state, batch)
    assert np.asarray(cm_full).sum() > 0
    np.testing.assert_array_equal(np.asarray(cm_full),
                                  np.asarray(cm_phase))


def _assert_argmax_agree(a, b, frac=1e-3):
    """Unlike ENet's phase logits (a bit-exact permutation), ICNet's
    are a different fp evaluation of the same interpolation, so argmax
    may flip at near-tie pixels; require >=99.9% agreement instead of
    exact equality."""
    mismatch = int((np.asarray(a) != np.asarray(b)).sum())
    assert mismatch <= max(1, int(frac * np.asarray(a).size)), mismatch


def _assert_confusion_close(cm_a, cm_b, frac=1e-3):
    cm_a, cm_b = np.asarray(cm_a), np.asarray(cm_b)
    assert cm_a.sum() == cm_b.sum()
    # each flipped pixel moves one count between two cells
    assert np.abs(cm_a - cm_b).sum() <= 2 * max(1, int(frac * cm_a.sum()))


class TestICNetPhase:
    """ICNet factor-4 polyphase head: the 4x bilinear upsample emitted
    in phase order (models/icnet._resize_bilinear_phase) so the
    full-res fp32 plane never exists in the train/eval steps."""

    @pytest.fixture(scope="class")
    def icnet_and_vars(self):
        from semanticsegmentationactivelearning_tpu.models import ICNet
        model = ICNet(num_classes=5)
        x = jnp.zeros((1, 32, 64, 3), jnp.float32)
        variables = jax.jit(lambda k: model.init(
            {"params": k}, x, training=True, multiscale=True))(
                jax.random.PRNGKey(0))
        return model, variables

    @pytest.mark.parametrize("factor", [2, 4])
    def test_resize_phase_matches_jax_image(self, factor):
        from semanticsegmentationactivelearning_tpu.models import icnet
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 5, 7, 6)).astype(np.float32))
        full = icnet._resize_bilinear(
            x, (factor * x.shape[1], factor * x.shape[2]))
        phase = icnet._resize_bilinear_phase(x, factor)
        assert phase.shape == (2, 5, factor * factor * 7, 6)
        np.testing.assert_allclose(
            np.asarray(xops.s2d_nhwc(full, factor)), np.asarray(phase),
            rtol=1e-5, atol=1e-6)
        _assert_argmax_agree(jnp.argmax(xops.s2d_nhwc(full, factor), -1),
                             jnp.argmax(phase, -1))

    def test_icnet_phase_logits_matches_full(self, icnet_and_vars):
        model, variables = icnet_and_vars
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(size=(1, 32, 64, 3))
                        .astype(np.float32))
        full = model.apply(variables, x, training=False)
        phase = model.apply(variables, x, training=False,
                            return_phase_logits=True)
        assert phase.shape == (1, 8, 256, 5)
        np.testing.assert_allclose(
            np.asarray(xops.s2d_nhwc(full, 4)), np.asarray(phase),
            rtol=1e-4, atol=1e-5)
        _assert_argmax_agree(jnp.argmax(xops.s2d_nhwc(full, 4), -1),
                             jnp.argmax(phase, -1))

    def test_icnet_train_step_phase_parity(self, icnet_and_vars):
        """Multiscale (the shipped conf): the cascade CE sees full-res
        labels either way; phase affects only the metrics argmax."""
        import optax as _optax
        model, variables = icnet_and_vars
        num_classes = 5
        hparams = dict(HPARAMS)
        hparams["softmax"] = {"label_smoothing": 0.0,
                              "loginverse_scaling": 0.0,
                              "multiscale": True}
        optimizer = _optax.adam(1e-3)
        rng = np.random.default_rng(6)
        batch = _batch(rng, 2, 32, 64, num_classes)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32))
        results = {}
        for phase in (False, True):
            step = make_train_step(model, optimizer, num_classes,
                                   hparams, phase_logits=phase)
            st = jax.tree.map(jnp.copy, state)
            _, aux = step(st, dict(batch), jax.random.PRNGKey(3))
            results[phase] = aux
        np.testing.assert_allclose(float(results[False]["loss"]),
                                   float(results[True]["loss"]),
                                   rtol=1e-5)
        _assert_confusion_close(results[False]["confusion"],
                                results[True]["confusion"])

    def test_icnet_eval_step_phase_parity(self, icnet_and_vars):
        model, variables = icnet_and_vars
        rng = np.random.default_rng(7)
        batch = _batch(rng, 2, 32, 64, 5)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=(), step=jnp.zeros((), jnp.int32),
                           epoch=jnp.zeros((), jnp.int32))
        cm_full = make_eval_step(model, 5, phase_logits=False)(
            state, batch)
        cm_phase = make_eval_step(model, 5, phase_logits=True)(
            state, batch)
        assert np.asarray(cm_full).sum() > 0
        _assert_confusion_close(cm_full, cm_phase)

    def test_icnet_fused_predict_fallback(self, icnet_and_vars):
        model, variables = icnet_and_vars
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.uniform(size=(1, 32, 64, 3))
                        .astype(np.float32))
        full = model.apply(variables, x, training=False)
        pred = model.fused_predict(variables, x)
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(full, -1)))
