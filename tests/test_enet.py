"""ENet model tests: shapes, parameter structure, batch-stats updates,
determinism, and the multiscale endpoint heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.models import ENet, get_model


@pytest.fixture(scope="module")
def enet_and_vars():
    model = ENet(num_classes=6)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, training=True, multiscale=True)
    return model, variables


class TestForward:
    def test_logit_shape_full_resolution(self, enet_and_vars):
        model, variables = enet_and_vars
        x = jnp.ones((2, 32, 48, 3), jnp.float32)
        logits = model.apply(variables, x, training=False)
        assert logits.shape == (2, 32, 48, 6)
        assert np.isfinite(np.asarray(logits)).all()

    def test_multiscale_endpoint_shapes(self, enet_and_vars):
        model, variables = enet_and_vars
        x = jnp.ones((1, 32, 48, 3), jnp.float32)
        logits, heads = model.apply(variables, x, training=False,
                                    multiscale=True)
        assert logits.shape == (1, 32, 48, 6)
        # loss heads: primary (full res) + endpoints at 1/2 (b5_1),
        # 1/4 (b4_2), 1/8 (b3_8) resolution
        assert heads[0] is logits
        assert heads[1].shape == (1, 16, 24, 6)
        assert heads[2].shape == (1, 8, 12, 6)
        assert heads[3].shape == (1, 4, 6, 6)

    def test_eval_deterministic(self, enet_and_vars):
        model, variables = enet_and_vars
        x = jnp.array(np.random.default_rng(0).normal(
            size=(1, 32, 48, 3)).astype(np.float32))
        a = model.apply(variables, x, training=False)
        b = model.apply(variables, x, training=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_updates_batch_stats(self, enet_and_vars):
        model, variables = enet_and_vars
        x = jnp.array(np.random.default_rng(1).normal(
            size=(2, 32, 48, 3)).astype(np.float32) + 3.0)
        _, mutated = model.apply(
            variables, x, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        old = variables["batch_stats"]["Initial"]["bn"]["mean"]
        new = mutated["batch_stats"]["Initial"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_dropout_only_in_training(self, enet_and_vars):
        model, variables = enet_and_vars
        x = jnp.array(np.random.default_rng(2).normal(
            size=(1, 32, 48, 3)).astype(np.float32))
        t1 = model.apply(variables, x, training=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])[0]
        t2 = model.apply(variables, x, training=True,
                         rngs={"dropout": jax.random.PRNGKey(9)},
                         mutable=["batch_stats"])[0]
        assert not np.allclose(np.asarray(t1), np.asarray(t2))


class TestParams:
    def test_param_count_order_of_magnitude(self, enet_and_vars):
        # ENet is ~0.37M params (paper table 1)
        _, variables = enet_and_vars
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
        assert 3.0e5 < n < 6.0e5, n

    def test_expected_block_names(self, enet_and_vars):
        _, variables = enet_and_vars
        params = variables["params"]
        for name in ["Initial", "Bottleneck1_0", "Bottleneck2_8",
                     "Bottleneck3_8", "Bottleneck4_0", "Bottleneck5_1",
                     "Final", "MultiscaleHead_0"]:
            assert name in params, sorted(params)[:8]
        # dilated block kernel is 3x3x32x32 at stage 2
        k = params["Bottleneck2_2"]["conv"]["kernel"]
        assert k.shape == (3, 3, 32, 32)
        # asymmetric block has (5,1)+(1,5) kernels
        assert params["Bottleneck2_3"]["conv_col"]["kernel"].shape == \
            (5, 1, 32, 32)
        assert params["Bottleneck2_3"]["conv_row"]["kernel"].shape == \
            (1, 5, 32, 32)

    def test_drop_rates_validation(self):
        with pytest.raises(ValueError, match="length must be 5"):
            ENet(num_classes=3, drop_rates=(0.1,)).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                training=False)

    def test_registry(self):
        assert isinstance(get_model("enet", 19), ENet)
        with pytest.raises(NotImplementedError):
            get_model("resnet", 19)
