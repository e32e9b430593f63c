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
    create_train_state, make_eval_step, make_pool_score_step,
    make_score_step, make_train_step, optim)

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

    def test_dp_matches_single_device_exactly(self):
        """With dropout disabled the DP step over 8 devices must match
        the single-device step to float-reduction tolerance — a real
        gradient-reduction bug cannot hide behind dropout noise.

        Plain SGD, not Adam: Adam's step-1 update is ~±lr for every
        parameter regardless of gradient magnitude, so fp32 noise
        flipping a near-zero gradient's sign would flip the whole
        update. Under SGD the param delta IS the (scaled) gradient, so
        this directly asserts the psum'd gradient."""
        nodrop = dict(HPARAMS, dropout_rates=[0.0] * 5)
        model = ENet(num_classes=C, drop_rates=(0.0,) * 5)
        import optax
        optimizer = optax.sgd(1e-3)
        state0 = create_train_state(model, optimizer,
                                    jax.random.PRNGKey(0), HW)
        batch = _batch(8)
        key = jax.random.PRNGKey(5)

        single = make_train_step(model, optimizer, C, nodrop)
        s1, m1 = single(jax.tree.map(jnp.copy, state0), dict(batch), key)

        mesh = make_mesh(8)
        dp = make_train_step(model, optimizer, C, nodrop, mesh=mesh)
        s8, m8 = dp(jax.tree.map(jnp.copy, state0), dict(batch), key)

        # tolerance: fp32 reduction-order noise between the sharded
        # (psum-tree) and unsharded lowerings is ~1e-5 relative; a
        # missing gradient reduction is orders of magnitude larger
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=1e-4)
        # argmax near-ties under a freshly-initialized net can flip
        # between lowerings; assert the mask-weighted total only
        assert np.asarray(m8["confusion"]).sum() == \
            np.asarray(m1["confusion"]).sum()
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l8))
        assert worst < 1e-4, worst

    def test_dp_matches_single_device_with_dropout(self, setup):
        """With dropout on, sharded/unsharded lowerings may draw
        different noise; assert the deterministic pieces and that one
        optimizer step lands close."""
        model, optimizer, state0 = setup
        batch = _batch(8)
        key = jax.random.PRNGKey(5)

        single = make_train_step(model, optimizer, C, HPARAMS)
        s1, m1 = single(jax.tree.map(jnp.copy, state0), dict(batch), key)

        mesh = make_mesh(8)
        dp = make_train_step(model, optimizer, C, HPARAMS, mesh=mesh)
        s8, m8 = dp(jax.tree.map(jnp.copy, state0), dict(batch), key)

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

    def test_pool_score_sharded_matches_single(self, setup):
        """Grouped (lax.map) pool scoring under a mesh == per-batch
        single-device scoring: multi-chip AL ranking keeps the
        dispatch-amortized path."""
        model, _opt, state = setup
        mesh = make_mesh(8)
        images = np.concatenate(
            [_batch(8, seed=s)["image"] for s in (1, 2, 3)], axis=0)
        pooled = make_pool_score_step(model, C, "entropy",
                                      micro_batch=8, mesh=mesh)
        got = np.asarray(pooled(state, images))
        assert got.shape == (24,)
        single_sc = make_score_step(model, C, "entropy")
        want = np.concatenate([
            np.asarray(single_sc(state, {"image": images[i:i + 8]}))
            for i in range(0, 24, 8)])
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestGroupScoreStep:
    @pytest.fixture(scope="class")
    def setup(self):
        model = ENet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), HW)
        return model, optimizer, state

    def test_group_score_matches_per_batch(self, setup):
        """Multi-host grouped dispatch (tuple of sharded batches
        stacked inside jit, per-shard chunks under shard_map) must
        score exactly like the per-batch path — grouping only changes
        the dispatch packaging (train.steps.make_group_score_step)."""
        from semanticsegmentationactivelearning_tpu.train import (
            make_group_score_step)
        model, _opt, state = setup
        mesh = make_mesh(8)
        batches = [_batch(8, seed=s)["image"] for s in (1, 2, 3)]
        group = make_group_score_step(model, C, "entropy", group=3,
                                      mesh=mesh)
        got = np.asarray(group(state, tuple(
            jnp.asarray(b) for b in batches)))
        assert got.shape == (3, 8)
        single_sc = make_score_step(model, C, "entropy", mesh=mesh)
        want = np.stack([
            np.asarray(single_sc(state, {"image": b}))
            for b in batches])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_group_score_rejects_spatial_mesh(self, setup):
        from semanticsegmentationactivelearning_tpu.train import (
            make_group_score_step)
        model, _opt, _state = setup
        mesh = make_mesh(8, ("data", "space"))
        with pytest.raises(ValueError, match="data"):
            make_group_score_step(model, C, "entropy", group=2,
                                  mesh=mesh)


class TestSpatialScoreStep:
    """Full spatially-sharded scoring: on a ("data","space") mesh the
    whole ENet forward runs width-sharded (GSPMD inserts per-conv halo
    exchanges); scores must equal the unsharded result."""

    def test_spatial_score_matches_single(self):
        model = ENet(num_classes=C, drop_rates=(0.0,) * 5)
        optimizer = optim.make_optimizer(HPARAMS)
        # W must divide (space degree x 8): use 64 wide
        hw = (32, 64)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), hw)
        rng = np.random.default_rng(9)
        image = rng.uniform(size=(4, *hw, 3)).astype(np.float32)

        mesh2d = make_mesh(8, ("data", "space"), shape=(2, 4))
        sc = make_score_step(model, C, "entropy", mesh=mesh2d)
        got = np.asarray(sc(state, {"image": image}))

        single = make_score_step(model, C, "entropy")
        want = np.asarray(single(state, {"image": image}))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_mc_bald_matches_single_on_both_meshes(self):
        """BALD MC-dropout scoring is mesh-invariant: per-image dropout
        keys fold in the GLOBAL batch index, so the data mesh
        (shard_map) and the 2-D spatial mesh (GSPMD) must reproduce the
        single-device scores exactly (up to fp assoc.)."""
        from semanticsegmentationactivelearning_tpu.train import (
            make_mc_score_step)
        model = ENet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        hw = (32, 64)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), hw)
        rng = np.random.default_rng(21)
        images = jnp.asarray(rng.uniform(size=(8, *hw, 3))
                             .astype(np.float32))
        key = jax.random.PRNGKey(6)
        want = np.asarray(make_mc_score_step(model, C, passes=2)(
            state, images, key))
        got_dp = np.asarray(make_mc_score_step(
            model, C, passes=2, mesh=make_mesh(8))(state, images, key))
        np.testing.assert_allclose(got_dp, want, rtol=1e-4, atol=1e-5)
        mesh2d = make_mesh(8, ("data", "space"), shape=(2, 4))
        got_2d = np.asarray(make_mc_score_step(
            model, C, passes=2, mesh=mesh2d)(state, images, key))
        np.testing.assert_allclose(got_2d, want, rtol=1e-4, atol=1e-5)

    def test_grouped_pool_score_on_spatial_mesh(self):
        """Grouped (lax.map) dispatch composes with the 2-D
        ("data","space") mesh at halved micro-batch — the AL CLI no
        longer falls back to ungrouped scoring when spatial sharding
        engages (active_learning.py score_group wiring)."""
        model = ENet(num_classes=C, drop_rates=(0.0,) * 5)
        optimizer = optim.make_optimizer(HPARAMS)
        hw = (32, 64)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), hw)
        rng = np.random.default_rng(11)
        images = rng.uniform(size=(8, *hw, 3)).astype(np.float32)

        mesh2d = make_mesh(8, ("data", "space"), shape=(2, 4))
        pooled = make_pool_score_step(model, C, "entropy",
                                      micro_batch=2, mesh=mesh2d)
        got = np.asarray(pooled(state, images))
        assert got.shape == (8,)
        single = make_score_step(model, C, "entropy")
        want = np.asarray(single(state, {"image": images}))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_make_mesh_auto(self):
        from semanticsegmentationactivelearning_tpu.parallel import \
            make_mesh_auto
        # tiny inputs: pure DP
        m = make_mesh_auto(8, (64, 128), dtype_bytes=2, num_devices=8)
        assert m.axis_names == ("data",) and m.shape["data"] == 8
        # spatial pays off when the batch can't spread over every chip:
        # batch 2 on 8 devices, one fp32 2048x4096 image (~14G) exceeds
        # a chip — DP alone leaves 1 img/chip, space splits it further
        m2 = make_mesh_auto(2, (2048, 4096), dtype_bytes=4,
                            num_devices=8)
        assert m2.axis_names == ("data", "space")
        assert m2.shape["data"] == 2 and m2.shape["space"] == 4
        from semanticsegmentationactivelearning_tpu.parallel import \
            estimate_score_hbm
        per = estimate_score_hbm(1, (2048, 4096), 4)
        assert per / m2.shape["space"] <= 0.8 * 15.75e9 < per


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
