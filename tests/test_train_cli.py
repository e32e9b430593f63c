"""End-to-end CLI test: synthetic Freiburg records -> train.py -> metrics
+ checkpoints + resume (the SURVEY §7 step-4 'minimum end-to-end slice',
scaled down for CI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    """Synthetic learnable dataset: color blocks perfectly predict the
    label, ETL'd through generate_dataset.py."""
    root = tmp_path_factory.mktemp("freiburg")
    rng = np.random.default_rng(0)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    img_colors = np.array([(200, 40, 40), (40, 200, 40), (40, 40, 200),
                           (200, 200, 40), (40, 200, 200)], dtype=np.uint8)
    for split, n in [("train", 30), ("test", 4)]:
        (root / split / "GT_color").mkdir(parents=True)
        (root / split / "rgb").mkdir(parents=True)
        for i in range(n):
            idx = rng.integers(0, len(colors), (4, 6))
            big = np.kron(idx, np.ones((8, 8), np.int64))  # 32x48 blocks
            Image.fromarray(colors[big]).save(
                root / split / "GT_color" / f"{split[0]}{i:03d}_mask.png")
            img = img_colors[big]
            noise = rng.integers(-20, 20, img.shape)
            img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / split / "rgb" / f"{split[0]}{i:03d}.png")
    out = tmp_path_factory.mktemp("records")
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", str(root),
         "-t", "freiburg", "-o", str(out)], cwd=REPO,
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return out


@pytest.fixture(scope="module")
def tiny_conf(tmp_path_factory):
    conf = {
        "batch_size": 4,
        "epochs": 2,
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


ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1",
           JAX_COMPILATION_CACHE_DIR="/tmp/ssal_test_jax_cache")


@pytest.mark.quick  # the fast lane's one end-to-end CLI smoke
def test_train_cli_end_to_end(records, tiny_conf, tmp_path):
    log_dir = tmp_path / "log"
    res = subprocess.run(
        [sys.executable, "train.py", "freiburg", "-d", str(records),
         "-l", str(log_dir), "-p", str(tiny_conf)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr

    # config dumped for provenance
    assert (log_dir / "config.json").exists()
    # per-epoch checkpoints
    ckpts = sorted(p.name for p in log_dir.glob("model-*.ckpt"))
    assert ckpts == ["model-1.ckpt", "model-2.ckpt"]
    # metrics recorded for train/val/final_val
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    splits = [l["split"] for l in lines]
    assert splits.count("train") == 2
    assert splits.count("val") == 2
    assert "final_val" in splits
    final = lines[-1]
    assert 0.0 <= final["mean_iou"] <= 1.0
    # the task is trivially learnable: loss must drop epoch 1 -> 2
    train_lines = [l for l in lines if l["split"] == "train"]
    assert train_lines[1]["loss"] < train_lines[0]["loss"]
    # step-resolution scalars (reference train.py:167-176): one record
    # per train step with loss / total cost / decayed LR
    iters = [l for l in lines if l["split"] == "train_iter"]
    assert iters, "no per-iteration scalar records"
    steps = [l["step"] for l in iters]
    assert steps == sorted(steps) and len(set(steps)) == len(steps)
    assert all(np.isfinite(l["loss"]) and np.isfinite(l["cost"])
               for l in iters)
    # decay 0.0 -> constant LR, observable every step
    assert all(abs(l["learning_rate"] - 1e-3) < 1e-9 for l in iters)
    # per-step losses reconcile with the epoch aggregate
    ep1 = [l["loss"] for l in iters if l["epoch"] == 1]
    assert len(ep1) > 1
    assert abs(np.mean(ep1) - train_lines[0]["loss"]) < 1e-4
    # per-epoch raw confusion matrices (reference metrics.py:92-153)
    val_lines = [l for l in lines if l["split"] == "val"]
    for rec in (train_lines[0], val_lines[0]):
        conf = np.asarray(rec["confusion"])
        assert conf.ndim == 2 and conf.shape[0] == conf.shape[1]
        assert conf.sum() > 0
    # per-epoch colorized image summaries (reference train.py:178-206)
    image_names = sorted(p.name for p in (log_dir / "images").glob("*"))
    assert "val-00001-0-pred.png" in image_names
    assert "val-00002-0-label.png" in image_names
    assert "val-00001-0-input.png" in image_names

    # resume: epochs already done -> immediately final-validates
    res2 = subprocess.run(
        [sys.executable, "train.py", "freiburg", "-d", str(records),
         "-l", str(log_dir), "-p", str(tiny_conf)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res2.returncode == 0, res2.stdout + res2.stderr
    assert "Resuming from checkpoint" in res2.stdout


def test_train_cli_icnet_loss_decreases(records, tmp_path):
    """ICNet CI convergence slice: the cascade-guidance multiscale
    loss (weights 1/0.4/0.4) through the real train CLI on the
    trivially-learnable dataset must DECREASE over 2 epochs — a
    miswired cascade head or aux-classifier would pass the per-kernel
    exactness tests but fail here (round-4 verdict weak #1; the full
    convergence curves live in docs/ACCURACY.md §6)."""
    conf = {
        "batch_size": 4,
        "epochs": 2,
        "hyperparams": {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 1e-3,
            "learning_rate_decay": 0.0,
            # the production icnet conf trains with Momentum
            # (conf/icnet_cityscapes.json)
            "optimizer": {"type": "Momentum",
                          "kwargs": {"momentum": 0.9}},
            "weight_reg": {"L2": 1e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0, "multiscale": True},
        },
        # ICNet input dims must divide 32; the loader pads 48 -> 64
        "network": {"model": "ICNet",
                    "input": {"height": 32, "width": 64}},
        "image_summaries": {"cadence": 0},
    }
    conf_path = tmp_path / "icnet.json"
    conf_path.write_text(json.dumps(conf))
    log_dir = tmp_path / "log_icnet"
    res = subprocess.run(
        [sys.executable, "train.py", "freiburg", "-d", str(records),
         "-l", str(log_dir), "-p", str(conf_path)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    train_lines = [l for l in lines if l["split"] == "train"]
    assert len(train_lines) == 2
    assert np.isfinite(train_lines[0]["loss"])
    assert train_lines[1]["loss"] < train_lines[0]["loss"]
    final = [l for l in lines if l["split"] == "final_val"][-1]
    assert 0.0 <= final["mean_iou"] <= 1.0


def test_train_cli_grouped_matches_ungrouped(records, tiny_conf,
                                             tmp_path):
    """`train_group` scans K steps per dispatch without changing the
    trajectory: per-step losses and the final validation must equal an
    ungrouped run with the same seed (tail batches that don't fill a
    group take the per-step path)."""
    runs = {}
    for tag, group in [("flat", 1), ("grouped", 3)]:
        conf = json.loads(tiny_conf.read_text())
        conf["train_group"] = group
        # SGD: the scan body compiles in a different fusion context, so
        # fp drifts at ulp scale — Adam amplifies that to per-mille
        # loss divergence within a few steps (sign-descent on
        # sub-noise gradients); with SGD the trajectories stay tight
        conf["hyperparams"]["optimizer"] = {"type": "GradientDescent",
                                            "kwargs": {}}
        conf_path = tmp_path / f"conf_{tag}.json"
        conf_path.write_text(json.dumps(conf))
        log_dir = tmp_path / f"log_{tag}"
        res = subprocess.run(
            [sys.executable, "train.py", "freiburg", "-d",
             str(records), "-l", str(log_dir), "-p", str(conf_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True,
            timeout=900)
        assert res.returncode == 0, res.stdout + res.stderr
        lines = [json.loads(l) for l in
                 (log_dir / "metrics.jsonl").read_text().splitlines()]
        runs[tag] = (res, lines)
    assert "Grouped training dispatch: 3 steps/call" \
        in runs["grouped"][0].stdout
    for split in ("train_iter", "final_val"):
        flat = [l for l in runs["flat"][1] if l["split"] == split]
        grp = [l for l in runs["grouped"][1] if l["split"] == split]
        assert len(flat) == len(grp) > 0
        for a, b in zip(flat, grp):
            # scan-vs-unrolled compilation drifts at ulp scale and
            # grows ~30x/step through the net's conditioning (measured;
            # see steps' grouped unit test for the tight same-context
            # equality); 2e-3 relative still pins the trajectory
            for key in ("loss", "mean_iou", "step"):
                if key in a:
                    assert abs(a[key] - b[key]) <= 2e-3 * (
                        1 + abs(a[key])), (split, key, a, b)


def test_train_cli_no_data(tiny_conf, tmp_path):
    res = subprocess.run(
        [sys.executable, "train.py", "freiburg", "-d",
         str(tmp_path / "empty"), "-l", str(tmp_path / "log"),
         "-p", str(tiny_conf)],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=300)
    assert res.returncode == 1
    assert "No training records" in res.stdout + res.stderr
