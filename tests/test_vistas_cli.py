"""Mapillary-Vistas-layout end-to-end CLI pipeline: synthetic
``{training,validation,testing}/{images,labels}`` trees with
RGB-color-coded labels and per-record mixed sizes ->
``generate_dataset.py -t vistas`` (256^3 color->trainId LUT, no width
normalization) -> 1-epoch ``train.py vistas`` over the mixed-size
records (loader max-dims scan) -> ``inference.py``, exercising the C3
walk (reference datasets/vistas.py:147-192) and the variable-size
record path (reference tensortools/tfrecord.py:7-38 dim peek) in
integration."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from semanticsegmentationactivelearning_tpu import datasets  # noqa: E402
from semanticsegmentationactivelearning_tpu.data import etl, example  # noqa: E402

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1",
           JAX_COMPILATION_CACHE_DIR="/tmp/ssal_test_jax_cache")

# Vistas ground-truth colors -> expected Cityscapes trainIds
# (datasets/vistas.py label table): road, sidewalk, building,
# vegetation, sky
COLORS = np.array([(128, 64, 128), (244, 35, 232), (70, 70, 70),
                   (107, 142, 35), (70, 130, 180)], dtype=np.uint8)
TRAIN_IDS = np.array([0, 1, 2, 8, 10], dtype=np.uint8)
UNMAPPED = (90, 120, 150)  # "barrier": trainId 255


def _make_split(root, split, sizes, rng, labelled=True):
    img_dir = root / split / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    if labelled:
        lbl_dir = root / split / "labels"
        lbl_dir.mkdir(parents=True, exist_ok=True)
    for i, (h, w) in enumerate(sizes):
        stem = f"{split[:4]}_{i:04d}"
        idx = rng.integers(0, len(COLORS), (h // 8, w // 8))
        big = np.kron(idx, np.ones((8, 8), np.int64))  # h x w blocks
        img = np.clip(big[..., None] * 45 +
                      rng.integers(-15, 15, (h, w, 3)),
                      0, 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{stem}.jpg", quality=95)
        if labelled:
            color = COLORS[big]
            color[:8, :8] = UNMAPPED  # one void patch per label
            Image.fromarray(color).save(lbl_dir / f"{stem}.png")


@pytest.fixture(scope="module")
def vistas_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vistas")
    rng = np.random.default_rng(7)
    # mixed per-record sizes, as real Vistas ships
    _make_split(root, "training",
                [(32, 48)] * 4 + [(40, 56)] * 4, rng)
    _make_split(root, "validation", [(40, 56)] * 3, rng)
    _make_split(root, "testing", [(32, 48)] * 2, rng, labelled=False)
    return root


@pytest.fixture(scope="module")
def vistas_records(tmp_path_factory, vistas_tree):
    out = tmp_path_factory.mktemp("records_vistas")
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", str(vistas_tree),
         "-t", "vistas", "-o", str(out)],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return out


def test_etl_walk_splits_and_color_lut(vistas_records):
    """The walk renamed training/validation/testing to train/val/test;
    RGB labels embedded to Cityscapes trainIds via the 256^3 LUT with
    255 at unmapped colors; per-record dims preserved (no --width)."""
    splits = {p.name: sorted(os.listdir(p))
              for p in vistas_records.iterdir()}
    assert len(splits["train"]) == 8
    assert len(splits["val"]) == 3
    assert len(splits["test"]) == 2
    ex = example.read_example(
        str(vistas_records / "train" / splits["train"][0]))
    lbl = etl.decode_image(ex.label)
    assert lbl.shape in ((32, 48), (40, 56))
    assert set(np.unique(lbl)) <= set(TRAIN_IDS.tolist()) | {255}
    assert (lbl[:8, :8] == 255).all()  # the void patch
    # both record sizes survived (no width normalization)
    dims = {example.peek_dims(str(vistas_records / "train" / f))[:2]
            for f in splits["train"]}
    assert dims == {(32, 48), (40, 56)}


def test_train_mixed_sizes_then_inference(vistas_records, tmp_path):
    """train.py vistas over mixed-size records (loader scans headers
    for max dims), then colorized inference on the uniform val set."""
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
    conf_path = tmp_path / "tiny.json"
    conf_path.write_text(json.dumps(conf))
    log_dir = tmp_path / "log"
    res = subprocess.run(
        [sys.executable, "train.py", "vistas",
         "-d", str(vistas_records), "-l", str(log_dir),
         "-p", str(conf_path)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "8 train / 3 val examples" in res.stdout + res.stderr
    assert (log_dir / "model-1.ckpt").exists()

    out_dir = tmp_path / "preds"
    res2 = subprocess.run(
        [sys.executable, "inference.py", "-t", "vistas",
         "-c", str(log_dir / "model-1.ckpt"),
         "-d", str(vistas_records / "val"),
         "-o", str(out_dir), "--color"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res2.returncode == 0, res2.stdout[-3000:] + res2.stderr[-3000:]
    preds = sorted(out_dir.glob("*.png"))
    assert len(preds) == 3
    arr = np.asarray(Image.open(preds[0]))
    assert arr.shape == (40, 56, 3)
    # colorized output draws from the Vistas trainId colormap only
    palette = {tuple(int(v) for v in c)
               for c in datasets.Vistas().colormap}
    flat = {tuple(int(v) for v in px) for px in arr.reshape(-1, 3)}
    assert flat <= palette
