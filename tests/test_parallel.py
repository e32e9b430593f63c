"""Multi-device SPMD tests on the 8-virtual-CPU mesh: DP train step
parity with single-device, sharded scoring, and the driver dry run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.models import ENet
from semanticsegmentationactivelearning_tpu.parallel import (
    check_batch_divisible, make_mesh)
from semanticsegmentationactivelearning_tpu.train import (
    create_train_state, make_eval_step, make_score_step, make_train_step,
    optim)

HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 1e-3,
    "learning_rate_decay": 0.0,
    "optimizer": {"type": "Adam", "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": False},
}
HW = (32, 48)
C = 4


def _batch(batch=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.uniform(size=(batch, *HW, 3)).astype(np.float32),
        "label": rng.integers(0, C, (batch, *HW)).astype(np.int32),
        "mask": np.ones((batch, *HW), np.float32),
        "valid": np.ones((batch,), np.float32),
    }


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}
        assert make_mesh(4).shape == {"data": 4}

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh(1024)

    def test_batch_divisibility(self):
        mesh = make_mesh(8)
        check_batch_divisible(16, mesh)
        with pytest.raises(ValueError):
            check_batch_divisible(12, mesh)


class TestDataParallelSteps:
    @pytest.fixture(scope="class")
    def setup(self):
        model = ENet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), HW)
        return model, optimizer, state

    def test_dp_matches_single_device(self, setup):
        """One DP step over 8 devices == one single-device step (same
        batch, same key) within float tolerance."""
        model, optimizer, state0 = setup
        batch = _batch(8)
        key = jax.random.PRNGKey(5)

        single = make_train_step(model, optimizer, C, HPARAMS)
        s1, m1 = single(jax.tree.map(jnp.copy, state0), dict(batch), key)

        mesh = make_mesh(8)
        dp = make_train_step(model, optimizer, C, HPARAMS, mesh=mesh)
        s8, m8 = dp(jax.tree.map(jnp.copy, state0), dict(batch), key)

        # dropout noise can differ between sharded/unsharded lowerings,
        # so assert the deterministic pieces (confusion totals) and that
        # one optimizer step lands numerically close.
        assert np.isfinite(float(m8["loss"]))
        assert np.asarray(m8["confusion"]).sum() == \
            np.asarray(m1["confusion"]).sum()
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l8))
        assert worst < 5e-2  # dropout-pattern differences only

    def test_eval_and_score_sharded(self, setup):
        model, _opt, state = setup
        mesh = make_mesh(8)
        ev = make_eval_step(model, C, mesh=mesh)
        conf = np.asarray(ev(state, _batch(8)))
        assert conf.sum() == 8 * HW[0] * HW[1]

        sc = make_score_step(model, C, "entropy", mesh=mesh)
        scores = sc(state, {"image": _batch(8)["image"]})
        assert scores.shape == (8,)
        # output is batch-sharded over the mesh
        assert len(scores.sharding.device_set) == 8
        single_sc = make_score_step(model, C, "entropy")
        want = np.asarray(single_sc(state, {"image": _batch(8)["image"]}))
        np.testing.assert_allclose(np.asarray(scores), want, atol=1e-5)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__
        fn, (variables, x) = __graft_entry__.entry()
        pred, scores = jax.jit(fn)(variables, x)
        assert pred.shape == (1, 512, 1024)
        assert scores.shape == (1,)
