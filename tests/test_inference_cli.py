"""End-to-end inference CLI tests: checkpoint -> prediction PNGs for
ENet *and* ICNet (reference capability: inference.py:61-153).

Covers reverse-embedding to dataset ids (cityscapes), ``--color``
colormap output, ``--output-size`` resizing, and model-family
resolution from the training run's config.json.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1",
           JAX_COMPILATION_CACHE_DIR="/tmp/ssal_test_jax_cache")

H, W, C = 32, 64, 19


def _png_bytes(arr):
    import io
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    """Three cityscapes-style .tfrecord files (trainId label maps)."""
    from semanticsegmentationactivelearning_tpu.data import (example,
                                                             tfrecord)
    out = tmp_path_factory.mktemp("records")
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        lbl = rng.integers(0, C, (H, W)).astype(np.uint8)
        ex = example.SegExample(
            file_id=f"sample{i:02d}", height=H, width=W,
            label=_png_bytes(lbl),
            modalities={"image": (_png_bytes(img), "png", 3)})
        tfrecord.write_record_file(
            str(out / f"sample{i:02d}.tfrecord"), example.make_example(ex))
    return out


def _make_run_dir(tmp_path_factory, model_name):
    """A training-run-shaped directory: checkpoint + config.json."""
    import jax
    from semanticsegmentationactivelearning_tpu.models import get_model
    from semanticsegmentationactivelearning_tpu.train import (
        checkpoint, create_train_state, optim)

    log_dir = tmp_path_factory.mktemp(f"run_{model_name.lower()}")
    model = get_model(model_name, C)
    state = create_train_state(model, optim.make_optimizer({}),
                               jax.random.PRNGKey(0), (H, W))
    checkpoint.save_checkpoint(str(log_dir / "model-1.ckpt"), state)
    (log_dir / "config.json").write_text(json.dumps({
        "network": {"model": model_name,
                    "input": {"height": H, "width": W}}}))
    return log_dir


@pytest.fixture(scope="module")
def enet_run(tmp_path_factory):
    return _make_run_dir(tmp_path_factory, "ENet")


@pytest.fixture(scope="module")
def icnet_run(tmp_path_factory):
    return _make_run_dir(tmp_path_factory, "ICNet")


def _run_inference(ckpt, records, out, extra=()):
    return subprocess.run(
        [sys.executable, "inference.py", "-c", str(ckpt), "-d",
         str(records), "-o", str(out), "-t", "cityscapes", *extra],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)


def test_enet_reverse_embedded_ids(enet_run, records, tmp_path):
    from semanticsegmentationactivelearning_tpu import datasets
    out = tmp_path / "pred"
    res = _run_inference(enet_run / "model-1.ckpt", records, out)
    assert res.returncode == 0, res.stdout + res.stderr
    pngs = sorted(out.glob("*.png"))
    assert [p.name for p in pngs] == [f"sample{i:02d}.png"
                                      for i in range(3)]
    valid_ids = set(
        np.asarray(datasets.Cityscapes().embedding_reversed)[:C].tolist())
    for p in pngs:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (H, W)      # grayscale dataset-id map
        assert set(np.unique(arr).tolist()) <= valid_ids


def test_color_and_output_size(enet_run, records, tmp_path):
    from semanticsegmentationactivelearning_tpu import datasets
    out = tmp_path / "pred"
    res = _run_inference(enet_run / "model-1.ckpt", records, out,
                         extra=("--color", "-s", "16", "32"))
    assert res.returncode == 0, res.stdout + res.stderr
    cmap_rows = {tuple(row) for row in
                 np.asarray(datasets.Cityscapes().colormap)[:C].tolist()}
    for p in sorted(out.glob("*.png")):
        arr = np.asarray(Image.open(p))
        assert arr.shape == (16, 32, 3)  # resized colormap output
        pixels = {tuple(px) for px in arr.reshape(-1, 3).tolist()}
        assert pixels <= cmap_rows


def test_icnet_model_resolved_from_config(icnet_run, records, tmp_path):
    """The model family comes from config.json next to the checkpoint —
    an ICNet checkpoint infers without any flag."""
    out = tmp_path / "pred"
    res = _run_inference(icnet_run / "model-1.ckpt", records, out)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Model: ICNet" in res.stdout + res.stderr
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 3
    # 32x64 records pad to ICNet's /32 requirement and crop back
    assert np.asarray(Image.open(pngs[0])).shape == (H, W)


def test_explicit_model_flag_overrides(icnet_run, records, tmp_path):
    out = tmp_path / "pred"
    res = _run_inference(icnet_run / "model-1.ckpt", records, out,
                         extra=("-m", "ICNet"))
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Model: ICNet" in res.stdout + res.stderr


def test_sharded_serving_matches_single_device(enet_run, records,
                                               tmp_path):
    """`-b 4` on a 4-device mesh serves data-parallel through
    jax.shard_map (one image per device; the last batch is padding
    beyond the 3 records, exercising the valid-mask under sharding);
    outputs must agree with the single-device run."""
    out_1 = tmp_path / "pred1"
    res = _run_inference(enet_run / "model-1.ckpt", records, out_1)
    assert res.returncode == 0, res.stdout + res.stderr
    out_4 = tmp_path / "pred4"
    res = subprocess.run(
        [sys.executable, "inference.py", "-c",
         str(enet_run / "model-1.ckpt"), "-d", str(records), "-o",
         str(out_4), "-t", "cityscapes", "-b", "4"],
        cwd=REPO,
        env=dict(ENV,
                 XLA_FLAGS="--xla_force_host_platform_device_count=4"),
        capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Data-parallel serving over 4 devices" in (res.stdout
                                                      + res.stderr)
    pngs_1 = sorted(out_1.glob("*.png"))
    pngs_4 = sorted(out_4.glob("*.png"))
    assert [p.name for p in pngs_4] == [p.name for p in pngs_1]
    for p1, p4 in zip(pngs_1, pngs_4):
        a1 = np.asarray(Image.open(p1))
        a4 = np.asarray(Image.open(p4))
        # batch-3 vs per-shard batch-1 convs may flip argmax ties
        assert (a1 == a4).mean() > 0.99


@pytest.mark.parametrize("run_fixture", ["enet_run", "icnet_run"])
def test_fused_predict_path_matches_xla(run_fixture, records_fused,
                                        tmp_path, request):
    """SSAL_FUSED_PREDICT=1 drives the fully-kernelized predict chain
    (ENet: W-packed front -> mid -> in-kernel-argmax tail; ICNet:
    front+stem kernel -> predict-mode head8 kernel; Pallas interpret
    mode on CPU) through the real CLI; its PNGs must agree with the
    default XLA forward per-pixel up to argmax ties."""
    run_dir = request.getfixturevalue(run_fixture)
    outs = {}
    for mode in ("0", "1"):
        out = tmp_path / f"pred{mode}"
        res = subprocess.run(
            [sys.executable, "inference.py", "-c",
             str(run_dir / "model-1.ckpt"), "-d", str(records_fused),
             "-o", str(out), "-t", "cityscapes"],
            cwd=REPO, env=dict(ENV, SSAL_FUSED_PREDICT=mode),
            capture_output=True, text=True, timeout=900)
        assert res.returncode == 0, res.stdout + res.stderr
        pngs = sorted(out.glob("*.png"))
        assert len(pngs) == 2
        outs[mode] = [np.asarray(Image.open(p)) for p in pngs]
    for xla, fused in zip(outs["0"], outs["1"]):
        assert xla.shape == fused.shape == (64, 64)
        # random-init logits have tiny margins; tolerate tie flips
        assert (xla == fused).mean() > 0.99


def test_sharded_fused_predict_in_process(monkeypatch):
    """mesh + fused kernels together — the combination a v5e-8 serves:
    make_predict_fn under a ("data",) shard_map with the Pallas predict
    chain forced on (interpret mode), vs the plain XLA argmax."""
    monkeypatch.setenv("SSAL_FUSED_PREDICT", "1")
    import jax
    import jax.numpy as jnp

    import inference
    from semanticsegmentationactivelearning_tpu.parallel import (
        make_mesh)
    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, optim)

    h, w = 48, 64
    model = ENet(num_classes=5)
    state = create_train_state(model, optim.make_optimizer({}),
                               jax.random.PRNGKey(0), (h, w))
    lut = jnp.arange(256, dtype=jnp.uint8)  # identity: raw class ids
    predict, use_fused = inference.make_predict_fn(
        model, state, lut, h, w, in_channels=3, mesh=make_mesh(4))
    assert use_fused
    rng = np.random.default_rng(41)
    stack = rng.integers(0, 255, (4, h, w, 3), dtype=np.uint8)
    got = np.asarray(predict(jnp.asarray(stack)))
    assert got.shape == (4, h, w)

    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(stack).astype(jnp.float32) / 255.0, training=False)
    logits = np.asarray(logits, dtype=np.float32)
    want = np.argmax(logits, axis=-1)
    top2 = np.sort(logits, axis=-1)[..., -2:]
    decided = (top2[..., 1] - top2[..., 0]) > 1e-4
    assert decided.mean() > 0.99
    np.testing.assert_array_equal(got[decided], want[decided])


@pytest.fixture(scope="module")
def records_fused(tmp_path_factory):
    """64x64 records: tall/wide enough for the fused kernel gate
    (H >= 48, W % 32 == 0)."""
    from semanticsegmentationactivelearning_tpu.data import (example,
                                                             tfrecord)
    out = tmp_path_factory.mktemp("records_fused")
    rng = np.random.default_rng(3)
    for i in range(2):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        lbl = rng.integers(0, C, (64, 64)).astype(np.uint8)
        ex = example.SegExample(
            file_id=f"big{i:02d}", height=64, width=64,
            label=_png_bytes(lbl),
            modalities={"image": (_png_bytes(img), "png", 3)})
        tfrecord.write_record_file(
            str(out / f"big{i:02d}.tfrecord"), example.make_example(ex))
    return out
