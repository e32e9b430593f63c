"""Reference-checkpoint import: TF object-based checkpoint -> TrainState.

Builds a TF object graph with the reference's exact attribute layout
(reference: models/enet/enet.py:35-247, enet_modules.py:139-188,
366-524, 730-938, 1070-1292, 1294-1381; checkpoint root
train.py:226-229), fills it with a flax ENet init transplanted through
the measured flax->TF layout mappings (tests/test_model_parity.py),
saves it with ``tf.train.Checkpoint``, and asserts the importer
recovers the original flax tree bit-exactly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

import flax  # noqa: E402

from semanticsegmentationactivelearning_tpu.models import ENet  # noqa: E402
from semanticsegmentationactivelearning_tpu.train import (  # noqa: E402
    checkpoint as ckpt, optim, steps, tf_import)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NUM_CLASSES = 5
IN_HW = (32, 48)


def _flax_variables():
    model = ENet(num_classes=NUM_CLASSES)
    x = jnp.zeros((1, IN_HW[0], IN_HW[1], 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, training=False,
        multiscale=True)
    # distinct BN stats so mean/var mapping mistakes can't cancel
    rng = np.random.default_rng(5)
    stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.1, 1.0, a.shape).astype(np.float32)),
        variables["batch_stats"])
    return model, {**variables, "batch_stats": stats}


def _deconv_to_tf(k):
    """Inverse of the importer's deconv mapping (the flax->TF direction
    test_model_parity.py uses to feed tf.nn.conv2d_transpose)."""
    return np.transpose(np.asarray(k)[::-1, ::-1], (0, 1, 3, 2))


def _reference_tf_tree(variables):
    """The reference's attribute layout as a tf.Module graph."""
    params = flax.serialization.to_state_dict(variables["params"])
    stats = flax.serialization.to_state_dict(variables["batch_stats"])

    def V(a):
        return tf.Variable(np.asarray(a))

    def bn_attrs(mod, ref_prefix, p_bn, s_bn):
        setattr(mod, f"{ref_prefix}gamma", V(p_bn["scale"]))
        setattr(mod, f"{ref_prefix}beta", V(p_bn["bias"]))
        setattr(mod, f"{ref_prefix}mean", V(s_bn["mean"]))
        setattr(mod, f"{ref_prefix}variance", V(s_bn["var"]))

    model = tf.Module()

    ini = tf.Module()
    ini.kernel = V(params["Initial"]["conv"]["kernel"])
    ini.alpha = V(params["Initial"]["prelu"]["alpha"])
    bn_attrs(ini, "", params["Initial"]["bn"], stats["Initial"]["bn"])
    model.Initial = ini

    for name in params:
        if not name.startswith("Bottleneck"):
            continue
        p, s = params[name], stats[name]
        blk = tf.Module()
        blk.proj_kernel = V(p["proj_conv"]["kernel"])
        blk.proj_alpha = V(p["proj_prelu"]["alpha"])
        bn_attrs(blk, "proj_", p["proj_bn"], s["proj_bn"])
        if "conv_col" in p:     # asymmetric: [col(kx1), row(1xk)]
            blk.conv_kernel = [V(p["conv_col"]["kernel"]),
                               V(p["conv_row"]["kernel"])]
        elif "deconv" in p:     # upsample
            blk.conv_kernel = V(_deconv_to_tf(p["deconv"]["kernel"]))
            blk.res_kernel = V(p["res_conv"]["kernel"])
        else:
            blk.conv_kernel = V(p["conv"]["kernel"])
        blk.conv_alpha = V(p["conv_prelu"]["alpha"])
        bn_attrs(blk, "conv_", p["conv_bn"], s["conv_bn"])
        blk.exp_kernel = V(p["exp_conv"]["kernel"])
        bn_attrs(blk, "exp_", p["exp_bn"], s["exp_bn"])
        blk.residual_alpha = V(p["res_prelu"]["alpha"])
        setattr(model, name, blk)

    fin = tf.Module()
    fin.kernel = V(_deconv_to_tf(params["Final"]["deconv"]["kernel"]))
    model.Final = fin

    model.loss_scale_weights = [
        V(params[f"MultiscaleHead_{i}"]["kernel"]) for i in range(3)]
    return model


@pytest.fixture(scope="module")
def saved_reference_ckpt(tmp_path_factory):
    model, variables = _flax_variables()
    tf_model = _reference_tf_tree(variables)
    checkpoint = tf.train.Checkpoint(
        model=tf_model,
        epoch=tf.Variable(7, dtype=tf.int64),
        step=tf.Variable(123, dtype=tf.int64))
    out = tmp_path_factory.mktemp("refckpt")
    prefix = checkpoint.save(str(out / "model"))
    return model, variables, prefix


class TestConvert:
    def test_round_trip_exact(self, saved_reference_ckpt):
        _model, variables, prefix = saved_reference_ckpt
        converted = tf_import.convert_reference_checkpoint(prefix)
        assert converted["epoch"] == 7
        assert converted["step"] == 123

        want_p = flax.serialization.to_state_dict(variables["params"])
        want_s = flax.serialization.to_state_dict(
            variables["batch_stats"])
        for want, got in ((want_p, converted["params"]),
                          (want_s, converted["batch_stats"])):
            wl = jax.tree_util.tree_leaves_with_path(want)
            gl = jax.tree_util.tree_leaves_with_path(got)
            assert [p for p, _ in wl] == [p for p, _ in gl]
            for (path, w), (_, g) in zip(wl, gl):
                np.testing.assert_array_equal(
                    np.asarray(w), np.asarray(g), err_msg=str(path))
        # only the checkpoint-object bookkeeping should be skipped
        assert all("save_counter" in k or "OBJECT" in k.upper()
                   for k in converted["skipped"]), converted["skipped"]

    def test_directory_lookup(self, saved_reference_ckpt):
        _model, _variables, prefix = saved_reference_ckpt
        converted = tf_import.convert_reference_checkpoint(
            os.path.dirname(prefix))
        assert converted["step"] == 123

    def test_to_train_state_and_forward(self, saved_reference_ckpt):
        model, variables, prefix = saved_reference_ckpt
        optimizer = optim.make_optimizer(
            {"learning_rate": 1e-3, "optimizer": {"type": "Adam"}})
        template = steps.create_train_state(
            model, optimizer, jax.random.PRNGKey(42), IN_HW,
            multiscale=True)
        converted = tf_import.convert_reference_checkpoint(prefix)
        state = tf_import.to_train_state(converted, template)
        assert int(state.epoch) == 7 and int(state.step) == 123

        x = jnp.asarray(np.random.default_rng(2).uniform(
            size=(1, IN_HW[0], IN_HW[1], 3)).astype(np.float32))
        want = model.apply(variables, x, training=False)
        got = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, x,
                          training=False)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want))


class TestImportCLI:
    def test_tool_end_to_end(self, saved_reference_ckpt, tmp_path):
        """The tool writes a checkpoint dir our restore path loads."""
        model, variables, prefix = saved_reference_ckpt
        conf = tmp_path / "conf.json"
        conf.write_text("""{
            "batch_size": 4, "epochs": 1,
            "hyperparams": {
                "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
                "learning_rate": 1e-3,
                "optimizer": {"type": "Adam", "kwargs": {}},
                "weight_reg": {"L2": 0.0, "L1": 0.0},
                "softmax": {"multiscale": true}},
            "network": {"model": "ENet",
                        "input": {"height": 32, "width": 48}}}""")
        out = tmp_path / "imported"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        res = subprocess.run(
            [sys.executable, "tools/import_reference_checkpoint.py",
             "--tf-checkpoint", prefix, "-t", "generic",
             "--num-classes", str(NUM_CLASSES),
             "-p", str(conf), "-o", str(out)],
            cwd=REPO, env=env, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr

        optimizer = optim.make_optimizer(
            {"learning_rate": 1e-3, "optimizer": {"type": "Adam"}})
        # generic dataset default num_classes differs from our fixture;
        # restore shape-checks per leaf, so build the matching template
        template = steps.create_train_state(
            model, optimizer, jax.random.PRNGKey(0), IN_HW,
            multiscale=True)
        state = ckpt.restore_checkpoint(str(out), template)
        assert int(state.epoch) == 7 and int(state.step) == 123
        np.testing.assert_array_equal(
            np.asarray(state.params["Initial"]["conv"]["kernel"]),
            np.asarray(variables["params"]["Initial"]["conv"]["kernel"]))

    def test_tool_rejects_mismatched_conf(self, saved_reference_ckpt,
                                          tmp_path):
        """A conf whose model can't absorb the converted weights must
        abort instead of emitting a checkpoint with silently-dropped
        (multiscale-head) weights and a wrong-shaped classifier."""
        _model, _variables, prefix = saved_reference_ckpt
        conf = tmp_path / "conf.json"
        # no softmax.multiscale -> MultiscaleHead_* have nowhere to go;
        # wrong --num-classes -> Final deconv shape mismatch
        conf.write_text("""{
            "batch_size": 4, "epochs": 1,
            "hyperparams": {
                "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
                "learning_rate": 1e-3,
                "optimizer": {"type": "Adam", "kwargs": {}},
                "weight_reg": {"L2": 0.0, "L1": 0.0},
                "softmax": {}},
            "network": {"model": "ENet",
                        "input": {"height": 32, "width": 48}}}""")
        out = tmp_path / "imported"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        args = [sys.executable, "tools/import_reference_checkpoint.py",
                "--tf-checkpoint", prefix, "-t", "generic",
                "--num-classes", str(NUM_CLASSES + 2),
                "-p", str(conf), "-o", str(out)]
        res = subprocess.run(args, cwd=REPO, env=env,
                             capture_output=True, text=True)
        assert res.returncode != 0
        assert "no destination in the target model" in res.stderr
        assert not out.exists()
        # --allow-partial downgrades the abort to a warning
        res = subprocess.run(args + ["--allow-partial"], cwd=REPO,
                             env=env, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        assert "keep fresh initialization" in res.stderr
