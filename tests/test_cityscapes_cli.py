"""Cityscapes-layout end-to-end CLI pipeline: synthetic
``leftImg8bit/gtFine`` (+ ``gtCoarse``) city trees -> generate_dataset.py
-> 1-epoch ``train.py cityscapes --use-coarse`` -> inference.py,
exercising the C1 file walk (reference datasets/cityscapes.py:173-248),
train_extra consumption, and the AL val-as-test aliasing in
integration."""

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

# raw Cityscapes label ids with trainIds 0..: road(7), sidewalk(8),
# building(11), vegetation(21), sky(23)
RAW_IDS = np.array([7, 8, 11, 21, 23], dtype=np.uint8)


def _make_city(root, gt_type, split, city, ids, rng, n=4, frames=None):
    img_dir = root / "leftImg8bit" / split / city
    lbl_dir = root / gt_type / split / city
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        frame = frames[i] if frames else f"{i:06d}_{i:06d}"
        idx = rng.integers(0, len(ids), (4, 6))
        big = np.kron(idx, np.ones((8, 8), np.int64))   # 32x48
        Image.fromarray(ids[big]).save(
            lbl_dir / f"{city}_{frame}_{gt_type}_labelIds.png")
        # decoys the walk must skip
        Image.fromarray(ids[big]).save(
            lbl_dir / f"{city}_{frame}_{gt_type}_instanceIds.png")
        img = np.clip(
            (big[..., None] * 45 + rng.integers(-15, 15, (32, 48, 3))),
            0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            img_dir / f"{city}_{frame}_leftImg8bit.png")


@pytest.fixture(scope="module")
def city_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    rng = np.random.default_rng(2)
    _make_city(root, "gtFine", "train", "aachen", RAW_IDS, rng, n=8)
    _make_city(root, "gtFine", "val", "frankfurt", RAW_IDS, rng, n=3)
    _make_city(root, "gtCoarse", "train", "aachen", RAW_IDS, rng, n=8)
    _make_city(root, "gtCoarse", "train_extra", "augsburg", RAW_IDS,
               rng, n=5)
    _make_city(root, "gtCoarse", "val", "frankfurt", RAW_IDS, rng, n=3)
    # unlabeled test images (image-only recursive walk)
    timg = root / "leftImg8bit" / "test" / "berlin"
    timg.mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
        Image.fromarray(img).save(
            timg / f"berlin_{i:06d}_000000_leftImg8bit.png")
    return root


@pytest.fixture(scope="module")
def coarse_records(tmp_path_factory, city_tree):
    out = tmp_path_factory.mktemp("records_coarse")
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", str(city_tree),
         "-t", "cityscapes", "-o", str(out), "--use-coarse"],
        cwd=REPO, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return out


@pytest.fixture(scope="module")
def tiny_conf(tmp_path_factory):
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
    path = tmp_path_factory.mktemp("conf") / "tiny.json"
    path.write_text(json.dumps(conf))
    return path


def test_etl_walk_and_splits(coarse_records):
    """The coarse walk found fine+coarse trains, train_extra, val and
    image-only test; instance/polygon decoys skipped."""
    splits = {p.name: sorted(os.listdir(coarse_records / p.name))
              for p in coarse_records.iterdir()}
    assert len(splits["train"]) == 8
    assert len(splits["train_extra"]) == 5
    assert len(splits["val"]) == 3
    assert len(splits["test"]) == 2
    assert all(f.endswith(".tfrecord") for f in splits["train"])
    assert splits["train_extra"][0].startswith("augsburg_")


def test_train_coarse_then_inference(coarse_records, tiny_conf,
                                     tmp_path):
    log_dir = tmp_path / "log"
    res = subprocess.run(
        [sys.executable, "train.py", "cityscapes", "--use-coarse",
         "-d", str(coarse_records), "-l", str(log_dir),
         "-p", str(tiny_conf)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    # train_extra records joined the train sweep: 8 + 5 examples
    assert "13 train / 3 val examples" in res.stdout + res.stderr
    assert (log_dir / "model-1.ckpt").exists()

    # inference on the val records, colorized
    out_dir = tmp_path / "preds"
    res2 = subprocess.run(
        [sys.executable, "inference.py", "-t", "cityscapes",
         "-c", str(log_dir / "model-1.ckpt"),
         "-d", str(coarse_records / "val"),
         "-o", str(out_dir), "--color"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res2.returncode == 0, res2.stdout[-3000:] + res2.stderr[-3000:]
    preds = sorted(out_dir.glob("*.png"))
    assert len(preds) == 3
    arr = np.asarray(Image.open(preds[0]))
    assert arr.shape == (32, 48, 3)


def test_al_val_as_test_aliasing(coarse_records, tmp_path):
    """cityscapes AL: the annotated val split serves as the test set
    (active_learning.py:58-60); one selection round end to end."""
    conf = {
        "batch_size": 2,
        "epochs": 1,
        "hyperparams": {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 1e-7,
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
        "active_learning": {
            "iterations": 1,
            "num_initially_labelled": 3,
            "num_validation": 2,
            "pseudo_labelling_proportion": 0.0,
            "selection_size": 2,
            "measure": "entropy",
            "threshold": 0.9,
            "epochs/warm_up": 1,
        },
    }
    conf_path = tmp_path / "al.json"
    conf_path.write_text(json.dumps(conf))
    log_dir = tmp_path / "al_log"
    res = subprocess.run(
        [sys.executable, "active_learning.py", "cityscapes",
         "-d", str(coarse_records), "-l", str(log_dir),
         "-p", str(conf_path)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    state = json.loads((log_dir / "state.json").read_text())
    # test filenames are the val records (aliasing), not leftImg8bit test
    test_files = state["dataset"]["test"]["filenames"]
    assert len(test_files) == 3
    assert all("frankfurt" in os.path.basename(f) for f in test_files)
    assert len(state["dataset"]["train"]["labelled"]) == 3 + 2
