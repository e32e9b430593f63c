"""Training-runtime tests: state creation, train/eval/score steps
(including the pseudo-labeling path), optimizer conf, and the two-phase
checkpoint manager."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentationactivelearning_tpu.models import ENet
from semanticsegmentationactivelearning_tpu.train import (
    checkpoint, config, create_train_state, make_eval_step,
    make_score_step, make_train_step, optim)

HW = (32, 48)
C = 4
HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 1e-3,
    "learning_rate_decay": 0.0,
    "optimizer": {"type": "Adam", "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": False},
}


@pytest.fixture(scope="module")
def _setup_shared():
    model = ENet(num_classes=C)
    optimizer = optim.make_optimizer(HPARAMS)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), HW)
    return model, optimizer, state


@pytest.fixture
def setup(_setup_shared):
    # train_step donates its input state, so hand each test a copy
    model, optimizer, state = _setup_shared
    return model, optimizer, jax.tree.map(jnp.copy, state)


def _batch(seed=0, batch=2, labelled=None):
    rng = np.random.default_rng(seed)
    b = {
        "image": jnp.asarray(rng.uniform(
            size=(batch, *HW, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, C, (batch, *HW)),
                             dtype=jnp.int32),
        "mask": jnp.ones((batch, *HW), jnp.float32),
        "valid": jnp.ones((batch,), jnp.float32),
    }
    b["image_raw"] = b["image"]
    if labelled is not None:
        b["labelled"] = jnp.asarray(labelled)
    return b


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, C, HPARAMS)
        batch = _batch()
        losses = []
        for i in range(8):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
        assert int(state.step) == 8

    def test_confusion_matrix_totals(self, setup):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, C, HPARAMS)
        batch = _batch()
        _, m = step(state, batch, jax.random.PRNGKey(0))
        conf = np.asarray(m["confusion"])
        assert conf.shape == (C, C)
        assert conf.sum() == 2 * HW[0] * HW[1]

    def test_grouped_step_matches_sequential(self, setup):
        """K scanned micro-steps in one dispatch == K sequential
        make_train_step calls with the same per-step keys (the grouped
        step amortizes the fixed per-dispatch overhead without changing
        the trajectory)."""
        from semanticsegmentationactivelearning_tpu.data import pipeline
        from semanticsegmentationactivelearning_tpu.train import (
            make_grouped_train_step)
        model, optimizer, state = setup
        K, B = 3, 2
        rng = np.random.default_rng(5)
        stacks = rng.integers(0, 255, (K, B, 40, 56, 4), np.uint8)
        heights = np.full((K, B), 40, np.int32)
        widths = np.full((K, B), 56, np.int32)
        valid = np.ones((K, B), np.float32)
        keys = jnp.stack([jax.random.PRNGKey(100 + i)
                          for i in range(K)])

        # SGD keeps fp drift proportional: the scan body compiles in a
        # different fusion context than the standalone step, so values
        # drift at ulp scale — under Adam that sub-noise drift is
        # amplified to ±lr sign flips on near-zero-grad weights
        # (measured ~500x growth per step; see
        # test_model_parity.TestTrainingTrajectoryParity's docstring)
        hp = dict(HPARAMS,
                  optimizer={"type": "GradientDescent", "kwargs": {}})
        optimizer = optim.make_optimizer(hp)
        state = state.replace(opt_state=optimizer.init(state.params))
        grouped = make_grouped_train_step(model, optimizer, C, hp,
                                          group=K, crop_hw=HW)
        gs, gm = grouped(jax.tree.map(jnp.copy, state),
                         {"stack": stacks, "heights": heights,
                          "widths": widths, "valid": valid}, keys)
        assert gm["loss"].shape == (K,)
        assert gm["confusion"].shape == (C, C)

        step = make_train_step(model, optimizer, C, hp)
        st = jax.tree.map(jnp.copy, state)
        conf_total = np.zeros((C, C), np.int64)
        for i in range(K):
            k_aug, k_drop = jax.random.split(keys[i])
            _raw, image, label, mask = pipeline.augment_batch(
                stacks[i], heights[i], widths[i], k_aug, crop_hw=HW)
            st, m = step(st, {"image": image, "label": label,
                              "mask": mask,
                              "valid": jnp.asarray(valid[i])}, k_drop)
            np.testing.assert_allclose(float(gm["loss"][i]),
                                       float(m["loss"]), rtol=1e-5)
            np.testing.assert_allclose(float(gm["learning_rate"][i]),
                                       float(m["learning_rate"]),
                                       rtol=1e-6)
            conf_total += np.asarray(m["confusion"], np.int64)
        np.testing.assert_array_equal(np.asarray(gm["confusion"]),
                                      conf_total)
        assert int(gs.step) == int(st.step) == K
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-4, atol=1e-5),
            gs.params, st.params)

    def test_remat_matches_default(self, setup):
        # remat only changes WHEN the forward recomputes, not the math:
        # one step with remat="dots"/"all" must match the default step
        model, optimizer, state = setup
        batch = _batch()
        key = jax.random.PRNGKey(3)
        outs = {}
        for mode in (None, "dots", "all"):
            s = jax.tree.map(jnp.copy, state)
            step = make_train_step(model, optimizer, C, HPARAMS,
                                   remat=mode)
            s, m = step(s, batch, key)
            outs[mode] = (s, m)
        for mode in ("dots", "all"):
            # recompute changes fp association; Adam's m/sqrt(v) then
            # amplifies ~1e-7 grad drift on near-zero grads, so the
            # bound is absolute on the ~1e-3-sized update, not relative
            # the bound is absolute at half-an-update scale (lr=1e-3):
            # a real math change diverges wholesale, fp drift doesn't
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a, np.float32),
                    np.asarray(b, np.float32), rtol=0, atol=5e-4),
                outs[None][0].params, outs[mode][0].params)
            np.testing.assert_allclose(float(outs[mode][1]["loss"]),
                                       float(outs[None][1]["loss"]),
                                       rtol=1e-6)

    def test_bf16_logits_close_to_fp32(self):
        # fp32_logits=False: CE/confusion consume compute-dtype logits;
        # loss must track the fp32-logits model closely
        key = jax.random.PRNGKey(0)
        batch = _batch()
        out = {}
        for fp32 in (True, False):
            model = ENet(num_classes=C, dtype=jnp.bfloat16,
                         fp32_logits=fp32)
            optimizer = optim.make_optimizer(HPARAMS)
            state = create_train_state(model, optimizer, key, HW)
            step = make_train_step(model, optimizer, C, HPARAMS)
            _, m = step(state, batch, jax.random.PRNGKey(1))
            out[fp32] = m
        assert np.asarray(out[False]["confusion"]).sum() \
            == np.asarray(out[True]["confusion"]).sum()
        np.testing.assert_allclose(float(out[False]["loss"]),
                                   float(out[True]["loss"]), rtol=5e-2)

    def test_reported_learning_rate_decays(self, setup):
        # the step reports the decayed LR it applies (reference exposed
        # it as a per-iteration scalar summary, train.py:167-176)
        model, optimizer, state = setup
        hp = dict(HPARAMS, learning_rate_decay=2.0)
        opt = optim.make_optimizer(hp, steps_per_epoch=4)
        state = state.replace(opt_state=opt.init(state.params))
        step = make_train_step(model, opt, C, hp, steps_per_epoch=4)
        batch = _batch()
        lrs = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            lrs.append(float(m["learning_rate"]))
        # inverse-time decay: lr / (1 + rate * step / decay_steps)
        expect = [1e-3 / (1.0 + 2.0 * s / 4) for s in range(3)]
        np.testing.assert_allclose(lrs, expect, rtol=1e-6)

    def test_step_scalar_buffer_single_fetch(self, setup):
        # device-side buffering: values survive the chunked stack/fetch
        # across the chunk boundary (chunk=64) and the buffer drains
        from semanticsegmentationactivelearning_tpu.utils import cli
        buf = cli.StepScalarBuffer(("loss", "cost"))
        n = 70
        for i in range(n):
            buf.append({"loss": jnp.float32(i),
                        "cost": jnp.float32(2 * i + 1)})
        assert len(buf) == n
        out = buf.flush()
        assert out.shape == (n, 2) and len(buf) == 0
        np.testing.assert_allclose(out[:, 0], np.arange(n))
        np.testing.assert_allclose(out[:, 1], 2 * np.arange(n) + 1)
        assert buf.flush().shape == (0, 2)
        # mixed scalar + grouped rows keep append order (the grouped
        # step's [K]-leading metrics via extend_group)
        buf.append({"loss": jnp.float32(0.5), "cost": jnp.float32(1.5)})
        buf.extend_group({"loss": jnp.arange(3, dtype=jnp.float32),
                          "cost": jnp.arange(3, dtype=jnp.float32)
                          + 10})
        buf.append({"loss": jnp.float32(9.0), "cost": jnp.float32(9.5)})
        assert len(buf) == 5
        out = buf.flush()
        np.testing.assert_allclose(out[:, 0], [0.5, 0, 1, 2, 9.0])
        np.testing.assert_allclose(out[:, 1], [1.5, 10, 11, 12, 9.5])

    def test_invalid_examples_excluded(self, setup):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, C, HPARAMS)
        batch = _batch()
        batch["valid"] = jnp.array([1.0, 0.0])
        _, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.asarray(m["confusion"]).sum() == HW[0] * HW[1]

    def test_multiscale_path(self, setup):
        model, optimizer, _ = setup
        hp = dict(HPARAMS)
        hp["softmax"] = dict(HPARAMS["softmax"], multiscale=True)
        state = create_train_state(model, optimizer, jax.random.PRNGKey(1),
                                   HW, multiscale=True)
        assert "MultiscaleHead_0" in state.params
        step = make_train_step(model, optimizer, C, hp)
        k0 = np.asarray(state.params["MultiscaleHead_0"]["kernel"]).copy()
        state2, m = step(state, _batch(), jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        # heads received gradient updates
        k1 = np.asarray(state2.params["MultiscaleHead_0"]["kernel"])
        assert not np.allclose(k0, k1)

    def test_pseudo_labeling_path(self, setup):
        model, optimizer, state = setup
        step = make_train_step(
            model, optimizer, C, HPARAMS,
            pseudo_cfg={"measure": "entropy", "threshold": 0.0})
        # threshold 0: unlabelled examples get fully pseudo-labelled
        batch = _batch(labelled=[True, False])
        _, m = step(jax.tree.map(jnp.copy, state), batch,
                    jax.random.PRNGKey(0))
        conf = np.asarray(m["confusion"])
        assert conf.sum() == 2 * HW[0] * HW[1]

        step_hi = make_train_step(
            model, optimizer, C, HPARAMS,
            pseudo_cfg={"measure": "entropy", "threshold": 1.1})
        # threshold > 1: pseudo mask empty, only the labelled example
        # contributes pixels
        _, m2 = step_hi(state, batch, jax.random.PRNGKey(0))
        assert np.asarray(m2["confusion"]).sum() == HW[0] * HW[1]


class TestEvalAndScore:
    def test_eval_step(self, setup):
        model, _opt, state = setup
        ev = make_eval_step(model, C)
        conf = ev(state, _batch())
        assert np.asarray(conf).sum() == 2 * HW[0] * HW[1]

    def test_score_step_matches_direct(self, setup):
        model, _opt, state = setup
        sc = make_score_step(model, C, "entropy")
        batch = _batch()
        scores = np.asarray(sc(state, batch))
        assert scores.shape == (2,)
        assert (0.0 <= scores).all() and (scores <= 1.0).all()

    def test_pool_score_matches_per_batch(self, setup):
        from semanticsegmentationactivelearning_tpu.train import (
            make_pool_score_step)
        model, _opt, state = setup
        sc = make_score_step(model, C, "entropy")
        pool = make_pool_score_step(model, C, "entropy", micro_batch=2)
        b1, b2 = _batch(seed=1), _batch(seed=2)
        want = np.concatenate([
            np.asarray(sc(state, b1)), np.asarray(sc(state, b2))])
        images = np.concatenate([b1["image"], b2["image"]], axis=0)
        got = np.asarray(pool(state, images))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMcScore:
    """MC-dropout BALD scoring (make_mc_score_step)."""

    def test_dropout_gated_on_rng(self, setup):
        # training=False + dropout rng => stochastic forward with BN on
        # running averages; without the rng the forward is the plain
        # deterministic eval
        model, _opt, state = setup
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        img = _batch()["image"]
        a = model.apply(variables, img, training=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        b = model.apply(variables, img, training=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        det = model.apply(variables, img, training=False)
        det2 = model.apply(variables, img, training=False)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))

    def test_matches_direct_mc_math(self, setup):
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        from semanticsegmentationactivelearning_tpu.train import (
            make_mc_score_step)
        model, _opt, state = setup
        passes = 3
        step = make_mc_score_step(model, C, passes)
        key = jax.random.PRNGKey(42)
        img = _batch()["image"]
        got = np.asarray(step(state, img, key))
        # oracle: per-image independent dropout keys (fold_in image
        # index, then pass index), stochastic forwards to full logits
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        want = []
        for i in range(img.shape[0]):
            ki = jax.random.fold_in(key, i)
            logits_t = jnp.stack([
                model.apply(variables, img[i:i + 1], training=False,
                            rngs={"dropout": jax.random.fold_in(ki, t)})
                for t in range(passes)])
            want.append(np.asarray(
                acquisition.mean_bald_confidence(logits_t, C))[0])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert (0.0 <= got).all() and (got <= 1.0).all()

    def test_deterministic_given_key(self, setup):
        from semanticsegmentationactivelearning_tpu.train import (
            make_mc_score_step)
        model, _opt, state = setup
        step = make_mc_score_step(model, C, 2)
        img = _batch()["image"]
        a = np.asarray(step(state, img, jax.random.PRNGKey(7)))
        b = np.asarray(step(state, img, jax.random.PRNGKey(7)))
        c = np.asarray(step(state, img, jax.random.PRNGKey(8)))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_generic_model_path(self, setup):
        # a model without supports_pre_logits takes the stacked-logits
        # branch; wrap ENet hiding the capability flag
        from semanticsegmentationactivelearning_tpu.train import (
            make_mc_score_step)
        model, _opt, state = setup

        class NoPreLogits:
            supports_pre_logits = False

            def apply(self, *a, **kw):
                kw.pop("return_pre_logits", None)
                return model.apply(*a, **kw)

        step_g = make_mc_score_step(NoPreLogits(), C, 3)
        step_f = make_mc_score_step(model, C, 3)
        img = _batch()["image"]
        key = jax.random.PRNGKey(5)
        np.testing.assert_allclose(np.asarray(step_g(state, img, key)),
                                   np.asarray(step_f(state, img, key)),
                                   rtol=1e-4, atol=1e-5)


class TestOptim:
    def test_inverse_time_decay(self):
        sched = optim.make_schedule(1.0, 0.5, 10)
        assert sched(0) == pytest.approx(1.0)
        assert sched(10) == pytest.approx(1.0 / 1.5)

    def test_unknown_optimizer(self):
        with pytest.raises(NotImplementedError):
            optim.make_optimizer({"optimizer": {"type": "LBFGS"}})


class TestConfig:
    def test_defaults_merge(self, tmp_path):
        p = tmp_path / "conf.json"
        p.write_text('{"batch_size": 2, "hyperparams": '
                     '{"learning_rate": 0.1}}')
        params = config.load_params(str(p))
        assert params["batch_size"] == 2
        assert params["hyperparams"]["learning_rate"] == 0.1
        # untouched defaults survive
        assert params["hyperparams"]["optimizer"]["type"] == "Adam"
        assert params["network"]["model"] == "ENet"

    def test_dump(self, tmp_path):
        config.dump_params({"a": 1}, str(tmp_path / "log"))
        assert os.path.exists(tmp_path / "log" / "config.json")

    def test_all_shipped_confs_load(self):
        """Every conf/*.json must merge cleanly, name a registered
        model, and use known acquisition knobs — a drop-in-compat
        guard over the whole shipped surface (C22)."""
        from semanticsegmentationactivelearning_tpu.models import (
            get_model)
        from semanticsegmentationactivelearning_tpu.ops import (
            acquisition)
        conf_dir = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "conf")
        files = [f for f in os.listdir(conf_dir)
                 if f.endswith(".json")]
        assert len(files) >= 10  # 7 reference confs + extensions
        for f in files:
            params = config.load_params(os.path.join(conf_dir, f))
            model = get_model(params["network"]["model"], 19)
            assert params["batch_size"] >= 1, f
            assert len(params["hyperparams"]["dropout_rates"]) == 5, f
            al = params.get("active_learning", {})
            if "measure" in al:
                assert al["measure"] in (acquisition.MEASURES
                                         + acquisition.MC_MEASURES), f
            assert al.get("selection", "uncertainty") in (
                "uncertainty", "coreset"), f
            if al.get("measure") in acquisition.MC_MEASURES:
                assert model.uses_dropout, f


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        model, _opt, state = setup
        path = checkpoint.save_checkpoint(str(tmp_path / "m.ckpt"), state)
        zero = jax.tree.map(jnp.zeros_like, state)
        restored = checkpoint.restore_checkpoint(path, zero)
        np.testing.assert_array_equal(
            np.asarray(restored.params["Final"]["deconv"]["kernel"]),
            np.asarray(state.params["Final"]["deconv"]["kernel"]))

    @pytest.mark.parametrize("old_flat,new_flat",
                             [(False, True), (True, False)])
    def test_optimizer_layout_conversion(self, setup, tmp_path,
                                         old_flat, new_flat):
        """A checkpoint written with one optimizer moment layout
        (per-leaf vs optax.flatten-raveled, train/optim.py) restores
        into a template built with the other: restore_checkpoint
        converts the moments (same jax.tree.flatten leaf order) and
        the next train step runs."""
        model, _opt, _state = setup
        old_opt = optim.make_optimizer(HPARAMS, flatten=old_flat)
        old_state = create_train_state(model, old_opt,
                                       jax.random.PRNGKey(0), HW)
        # make the moments non-trivial before saving
        step = make_train_step(model, old_opt, C, HPARAMS)
        old_state, _ = step(old_state, _batch(1), jax.random.PRNGKey(1))
        mu_old = jax.tree.leaves(old_state.opt_state[0].mu)
        path = checkpoint.save_checkpoint(
            str(tmp_path / "old.ckpt"), old_state)

        new_opt = optim.make_optimizer(HPARAMS, flatten=new_flat)
        template = create_train_state(model, new_opt,
                                      jax.random.PRNGKey(2), HW)
        restored = checkpoint.restore_checkpoint(path, template)
        mu_new = jax.tree.leaves(restored.opt_state[0].mu)
        np.testing.assert_array_equal(
            np.concatenate([np.ravel(np.asarray(m)) for m in mu_old]),
            np.concatenate([np.ravel(np.asarray(m)) for m in mu_new]))
        # params restored too, and the next step runs on the new layout
        np.testing.assert_array_equal(
            np.asarray(restored.params["Final"]["deconv"]["kernel"]),
            np.asarray(old_state.params["Final"]["deconv"]["kernel"]))
        step2 = make_train_step(model, new_opt, C, HPARAMS)
        out, aux = step2(restored, _batch(2), jax.random.PRNGKey(3))
        assert np.isfinite(float(aux["loss"]))

    def test_cache_commit_protocol(self, setup, tmp_path):
        _m, _o, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path), max_to_keep=2)
        # commit with nothing cached -> ""
        assert mgr.commit() == ""
        mgr.cache(state)
        first = mgr.commit("model")
        assert first.endswith("model-1.ckpt") and os.path.exists(first)
        # cache overwrites previous cache; commit bumps counter
        mgr.cache(state)
        mgr.cache(state)
        second = mgr.commit("model")
        assert second.endswith("model-2.ckpt")
        # FIFO prune at max_to_keep=2
        mgr.cache(state)
        third = mgr.commit("model")
        assert third.endswith("model-3.ckpt")
        assert not os.path.exists(first)
        assert checkpoint.latest_checkpoint(str(tmp_path)) == third

    def test_async_cache_commit_roundtrip(self, setup, tmp_path):
        """async_io=True: cache runs on a background thread; commit
        joins it before the rename, and the committed state restores
        byte-identically to the cached one."""
        model, _opt, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path), async_io=True)
        mgr.cache(state)
        path = mgr.commit("model")
        assert path.endswith("model-1.ckpt") and os.path.exists(path)
        restored = checkpoint.restore_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # successive caches serialize (second joins the first)
        mgr.cache(state)
        mgr.cache(state)
        assert mgr.commit("model").endswith("model-2.ckpt")
        mgr.close()

    def test_async_error_surfaces(self, setup, tmp_path):
        model, _opt, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path), async_io=True)
        mgr._directory = str(tmp_path / "gone")  # unwritable target
        mgr.cache(state)
        with pytest.raises(OSError):
            mgr.close()

    def test_async_save(self, setup, tmp_path):
        model, _opt, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path), async_io=True)
        p = mgr.save("model", state)
        mgr.close()
        assert os.path.exists(p)
        checkpoint.restore_checkpoint(p, state)

    @pytest.mark.parametrize("async_io", [False, True])
    def test_save_fifo_eviction_after_write(self, setup, tmp_path,
                                            async_io):
        """Rapid successive saves past max_to_keep: the FIFO victim is
        evicted only AFTER its replacement lands (a crash in between
        must never shrink the on-disk set), checkpoint.json matches the
        surviving files, and back-to-back async saves don't race the
        in-flight job's state-file write."""
        import json as _json
        _m, _o, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path), max_to_keep=2,
                                           async_io=async_io)
        paths = [mgr.save("model", state) for _ in range(4)]
        mgr.close()
        assert not os.path.exists(paths[0])
        assert not os.path.exists(paths[1])
        assert os.path.exists(paths[2]) and os.path.exists(paths[3])
        with open(tmp_path / "checkpoint.json") as fp:
            meta = _json.load(fp)
        assert meta["checkpoints"] == [os.path.basename(p)
                                       for p in paths[2:]]
        assert meta["save_counter"] == 4

    def test_chdir_keeps_counter(self, setup, tmp_path):
        _m, _o, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path / "a"))
        mgr.cache(state)
        mgr.commit("model")
        mgr.chdir(str(tmp_path / "b"))
        assert mgr.latest_checkpoint == ""
        mgr.cache(state)
        committed = mgr.commit("model")
        assert committed.endswith("model-2.ckpt")
        assert os.path.dirname(committed).endswith("b")

    def test_chdir_adopts_existing_round_state(self, setup, tmp_path):
        """Re-entering a round directory after an interrupted run must
        resume its counter/FIFO instead of overwriting model-N files."""
        _m, _o, state = setup
        # First run commits two checkpoints into round dir "a"
        mgr1 = checkpoint.CheckpointManager(str(tmp_path))
        mgr1.chdir(str(tmp_path / "a"))
        mgr1.cache(state)
        first = mgr1.commit("model")
        mgr1.cache(state)
        second = mgr1.commit("model")
        # Fresh manager (process restart) re-enters the same round dir
        mgr2 = checkpoint.CheckpointManager(str(tmp_path))
        mgr2.chdir(str(tmp_path / "a"))
        assert mgr2.save_counter == 2
        assert mgr2.latest_checkpoint == second
        mgr2.cache(state)
        third = mgr2.commit("model")
        assert third.endswith("model-3.ckpt")
        assert os.path.exists(first) and os.path.exists(second)

    def test_restore_from_directory(self, setup, tmp_path):
        _m, _o, state = setup
        mgr = checkpoint.CheckpointManager(str(tmp_path))
        mgr.cache(state)
        mgr.commit("model")
        zero = jax.tree.map(jnp.zeros_like, state)
        restored = checkpoint.restore_checkpoint(str(tmp_path), zero)
        assert int(restored.step) == int(state.step)

    def test_partial_restore_across_multiscale(self, setup, tmp_path):
        """expect_partial semantics (reference train.py:243-245):
        a multiscale-pretrained checkpoint restores into a plain run
        (heads dropped) and vice versa (heads keep fresh init)."""
        model, optimizer, _ = setup
        ms = create_train_state(model, optimizer, jax.random.PRNGKey(3),
                                HW, multiscale=True)
        plain = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(4), HW)
        p = checkpoint.save_checkpoint(str(tmp_path / "ms.ckpt"), ms)
        restored = checkpoint.restore_checkpoint(
            p, jax.tree.map(jnp.copy, plain))
        np.testing.assert_array_equal(
            np.asarray(restored.params["Initial"]["conv"]["kernel"]),
            np.asarray(ms.params["Initial"]["conv"]["kernel"]))
        assert "MultiscaleHead_0" not in restored.params

        p2 = checkpoint.save_checkpoint(str(tmp_path / "p.ckpt"), plain)
        back = checkpoint.restore_checkpoint(
            p2, jax.tree.map(jnp.copy, ms))
        assert "MultiscaleHead_0" in back.params
        np.testing.assert_array_equal(
            np.asarray(back.params["Final"]["deconv"]["kernel"]),
            np.asarray(plain.params["Final"]["deconv"]["kernel"]))

    def test_reinitialize_final_layer(self, setup):
        model, _o, state = setup
        new = checkpoint.reinitialize_final_layer(
            state, model, jax.random.PRNGKey(42), HW)
        assert not np.allclose(
            np.asarray(new.params["Final"]["deconv"]["kernel"]),
            np.asarray(state.params["Final"]["deconv"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(new.params["Initial"]["conv"]["kernel"]),
            np.asarray(state.params["Initial"]["conv"]["kernel"]))

    def test_reinitialize_final_layer_icnet(self):
        """The -r flag resolves the model's real output module
        ("Classifier" for ICNet), not a hardcoded ENet name."""
        from semanticsegmentationactivelearning_tpu.models import ICNet
        model = ICNet(num_classes=C)
        optimizer = optim.make_optimizer(HPARAMS)
        hw = (32, 64)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(1), hw)
        new = checkpoint.reinitialize_final_layer(
            state, model, jax.random.PRNGKey(42), hw)
        assert not np.allclose(
            np.asarray(new.params["Classifier"]["kernel"]),
            np.asarray(state.params["Classifier"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(
                new.params["SharedStem"]["conv1_1"]["conv"]["kernel"]),
            np.asarray(
                state.params["SharedStem"]["conv1_1"]["conv"]["kernel"]))
