"""ICNet tests: multi-branch shapes, cascade heads, trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.models import ICNet, get_model
from semanticsegmentationactivelearning_tpu.train import (
    create_train_state, make_train_step, optim)

HW = (64, 96)
C = 5

HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 1e-3,
    "learning_rate_decay": 0.0,
    "optimizer": {"type": "Adam", "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    "weight_reg": {"L2": 0.0, "L1": 0.0, "glorot_scaling": False},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": True},
}


@pytest.fixture(scope="module")
def icnet_and_vars():
    model = ICNet(num_classes=C)
    x = jnp.zeros((1, *HW, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x, training=True, multiscale=True))(
            jax.random.PRNGKey(0))
    return model, variables


class TestICNetForward:
    def test_full_res_logits(self, icnet_and_vars):
        model, variables = icnet_and_vars
        x = jnp.ones((2, *HW, 3), jnp.float32)
        fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
        logits = fwd(variables, x)
        assert logits.shape == (2, *HW, C)
        assert np.isfinite(np.asarray(logits)).all()

    def test_cascade_heads(self, icnet_and_vars):
        model, variables = icnet_and_vars
        x = jnp.ones((1, *HW, 3), jnp.float32)
        logits, heads = jax.jit(
            lambda v, x: model.apply(v, x, training=False,
                                     multiscale=True))(variables, x)
        cls4, aux8, aux16 = heads
        assert cls4.shape == (1, HW[0] // 4, HW[1] // 4, C)
        assert aux8.shape == (1, HW[0] // 8, HW[1] // 8, C)
        assert aux16.shape == (1, HW[0] // 16, HW[1] // 16, C)
        assert model.ms_loss_weights == (1.0, 0.4, 0.4)

    def test_indivisible_input_raises(self, icnet_and_vars):
        model, variables = icnet_and_vars
        with pytest.raises(ValueError, match="divisible by 32"):
            model.apply(variables, jnp.zeros((1, 60, 96, 3)),
                        training=False)

    def test_registry_and_param_scale(self, icnet_and_vars):
        assert isinstance(get_model("icnet", C), ICNet)
        _, variables = icnet_and_vars
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
        # the official ICNet (half-width PSPNet50 backbone) is ~6.7M
        assert 5.0e6 < n < 1.0e7, n


class TestICNetTraining:
    def test_train_step_decreases_loss(self):
        model = ICNet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), HW,
                                   multiscale=True)
        step = make_train_step(model, optimizer, C, HPARAMS)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.uniform(size=(2, *HW, 3)).astype(np.float32),
            "label": rng.integers(0, C, (2, *HW)).astype(np.int32),
            "mask": np.ones((2, *HW), np.float32),
            "valid": np.ones((2,), np.float32),
        }
        losses = []
        for i in range(4):
            state, m = step(state, dict(batch), jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
