"""Multi-modal records consumed at train time.

The reference decoder stacks any ``<modality>/*`` channels present in a
record into the network input (tensortools/input.py:265-269); its
``--modalities`` train flag was parsed but never wired through
(reference train.py:30,466). Here the full chain works: Freiburg-layout
tree with an extra ``nir_gray`` modality -> generate_dataset.py ->
4-channel RecordLoader -> train.py end to end."""

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


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    """Synthetic Freiburg tree with rgb + nir_gray modalities; the NIR
    plane carries the label signal so training exercises it."""
    root = tmp_path_factory.mktemp("freiburg_mm")
    rng = np.random.default_rng(5)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    for split, n in [("train", 24), ("test", 4)]:
        for sub in ("GT_color", "rgb", "nir_gray"):
            (root / split / sub).mkdir(parents=True)
        for i in range(n):
            idx = rng.integers(0, len(colors), (4, 6))
            big = np.kron(idx, np.ones((8, 8), np.int64))  # 32x48
            Image.fromarray(colors[big]).save(
                root / split / "GT_color" / f"{split[0]}{i:03d}_mask.png")
            img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
            Image.fromarray(img).save(
                root / split / "rgb" / f"{split[0]}{i:03d}.png")
            nir = (big * 50 + 10).astype(np.uint8)
            Image.fromarray(nir, mode="L").save(
                root / split / "nir_gray" / f"{split[0]}{i:03d}.png")
    out = tmp_path_factory.mktemp("records_mm")
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", str(root),
         "-t", "freiburg", "-o", str(out),
         "--modalities", "rgb", "nir_gray"],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return out


def test_loader_stacks_modalities(records):
    import glob
    import sys as _sys
    _sys.path.insert(0, REPO)
    from semanticsegmentationactivelearning_tpu.data import loader

    files = sorted(glob.glob(str(records / "train" / "*.tfrecord")))
    assert files
    ld = loader.RecordLoader(files, batch_size=4,
                             modalities=("nir_gray",))
    assert ld.channels == 4
    batch = next(iter(ld.batches()))
    assert batch["stack"].shape[-1] == 5  # rgb + nir + label plane
    # nir plane round-trips: quantized label signal (big*50+10)
    nir = batch["stack"][0, :, :, 3]
    assert set(np.unique(nir)) <= {10, 60, 110, 160, 210}
    # label plane present (trainIds 0..4 after embedding)
    assert batch["stack"][0, :, :, 4].max() <= 5


def test_loader_missing_modality_raises(records):
    import glob
    from semanticsegmentationactivelearning_tpu.data import loader

    files = sorted(glob.glob(str(records / "train" / "*.tfrecord")))
    ld = loader.RecordLoader(files, batch_size=2, channels=4,
                             modalities=("depth",))
    with pytest.raises(ValueError, match="depth"):
        next(iter(ld.batches()))


def test_train_cli_four_channels(records, tmp_path):
    conf = {
        "batch_size": 4,
        "epochs": 1,
        "hyperparams": {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 1e-3,
            "learning_rate_decay": 0.0,
            "optimizer": {"type": "Adam",
                          "kwargs": {"beta1": 0.9, "beta2": 0.99}},
            "weight_reg": {"L2": 2e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0, "multiscale": False},
        },
        "network": {"model": "ENet",
                    "input": {"height": 32, "width": 48}},
    }
    conf_path = tmp_path / "conf.json"
    conf_path.write_text(json.dumps(conf))
    log_dir = tmp_path / "log"
    res = subprocess.run(
        [sys.executable, "train.py", "freiburg", "-d", str(records),
         "-l", str(log_dir), "-p", str(conf_path),
         "-m", "rgb", "nir_gray"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "4 input channels" in res.stdout + res.stderr
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(l["split"] == "train" for l in lines)
    assert (log_dir / "model-1.ckpt").exists()

def test_loader_modality_dim_mismatch_raises(tmp_path):
    """A modality plane whose dimensions differ from the image plane
    must raise the loader's descriptive ValueError (mirroring the ETL's
    cross-modality shape check, reference generate_dataset.py:189-195),
    not a numpy broadcast error from inside the worker pool."""
    import io

    from PIL import Image as PILImage

    from semanticsegmentationactivelearning_tpu.data import (
        example, loader, tfrecord)

    def png(arr):
        buf = io.BytesIO()
        PILImage.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    rng = np.random.default_rng(3)
    img = png(rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
    nir = png(rng.integers(0, 255, (16, 48)).astype(np.uint8))  # wrong H
    ex = example.SegExample(
        file_id="bad", height=32, width=48,
        label=png(np.zeros((32, 48), np.uint8)),
        modalities={"image": (img, "png", 3), "nir": (nir, "png", 1)})
    path = tmp_path / "bad.tfrecord"
    tfrecord.write_record_file(str(path), example.make_example(ex))

    with pytest.raises(ValueError, match="nir.*16x48|16x48.*nir"):
        loader.load_stack(str(path), (32, 48), channels=4,
                          modalities=("nir",))


def test_fused_score_multichannel_fallback():
    """The packed Pallas front kernels hard-assume 3-channel images;
    fused_score/fused_predict on a 4-channel (RGB+NIR) model must fall
    back to the XLA path and match it exactly, not die at trace time
    inside pack_enet_front_w (regression: the AL CLI wires -m
    modalities straight into the default use_pallas scoring path)."""
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import acquisition

    rng = np.random.default_rng(13)
    model = ENet(num_classes=5)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 4)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, training=False)

    got = np.asarray(model.fused_score(
        variables, x, "entropy", use_pallas=True, interpret=True))
    logits = model.apply(variables, x, training=False)
    want = np.asarray(acquisition.mean_confidence(logits, "entropy", 5))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    labels = np.asarray(model.fused_predict(
        variables, x, use_pallas=True, interpret=True))
    np.testing.assert_array_equal(
        labels, np.argmax(np.asarray(logits), axis=-1))


def test_icnet_fused_score_multichannel_fallback():
    """Same guard for ICNet: 4-channel input takes the plain XLA
    forward (the front kernels fold C=3 into their column-block
    reshape)."""
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ICNet
    from semanticsegmentationactivelearning_tpu.ops import acquisition

    rng = np.random.default_rng(17)
    model = ICNet(num_classes=5)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 4)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                           training=False))()

    got = np.asarray(model.fused_score(
        variables, x, "entropy", use_pallas=True, interpret=True))
    cls4 = model.apply(variables, x, training=False,
                       return_pre_logits=True)
    want = np.asarray(acquisition.chunked_upsample_mean_confidence(
        cls4, 4, "entropy", 5))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    labels = np.asarray(model.fused_predict(
        variables, x, use_pallas=True, interpret=True))
    logits = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(
        labels, np.argmax(np.asarray(logits), axis=-1))
