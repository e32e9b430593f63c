"""Active-learning loop integration test on a tiny synthetic dataset:
state.json round-trip, selection determinism under fixed seeds, label
set growth, and the random-baseline branch (SURVEY.md §4e)."""

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
    root = tmp_path_factory.mktemp("freiburg")
    rng = np.random.default_rng(1)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    img_colors = np.array([(200, 40, 40), (40, 200, 40), (40, 40, 200),
                           (200, 200, 40), (40, 200, 200)], dtype=np.uint8)
    for split, n in [("train", 26), ("test", 4)]:
        (root / split / "GT_color").mkdir(parents=True)
        (root / split / "rgb").mkdir(parents=True)
        for i in range(n):
            idx = rng.integers(0, len(colors), (4, 6))
            big = np.kron(idx, np.ones((8, 8), np.int64))
            Image.fromarray(colors[big]).save(
                root / split / "GT_color" / f"{split[0]}{i:03d}_mask.png")
            img = np.clip(img_colors[big].astype(int) +
                          rng.integers(-20, 20, (32, 48, 3)),
                          0, 255).astype(np.uint8)
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
def mixed_records(tmp_path_factory):
    """Freiburg-layout records with two native sizes (32x48 and 64x96,
    alternating) — a mixed-size pool like real Vistas; the ETL keeps
    per-record dims (no --width)."""
    root = tmp_path_factory.mktemp("freiburg_mixed")
    rng = np.random.default_rng(3)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    img_colors = np.array([(200, 40, 40), (40, 200, 40), (40, 40, 200),
                           (200, 200, 40), (40, 200, 200)],
                          dtype=np.uint8)
    for split, n in [("train", 26), ("test", 2)]:
        (root / split / "GT_color").mkdir(parents=True)
        (root / split / "rgb").mkdir(parents=True)
        for i in range(n):
            h, w = (32, 48) if i % 2 == 0 else (64, 96)
            idx = rng.integers(0, len(colors), (h // 8, w // 8))
            big = np.kron(idx, np.ones((8, 8), np.int64))
            Image.fromarray(colors[big]).save(
                root / split / "GT_color" / f"{split[0]}{i:03d}_mask.png")
            img = np.clip(img_colors[big].astype(int) +
                          rng.integers(-20, 20, (h, w, 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / split / "rgb" / f"{split[0]}{i:03d}.png")
    out = tmp_path_factory.mktemp("records_mixed")
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", str(root),
         "-t", "freiburg", "-o", str(out)], cwd=REPO,
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    return out


def _conf(tmp_path, selection_size=3, measure="entropy",
          iterations=2, model="ENet", input_hw=(32, 48),
          extra_al=None):
    conf = {
        "batch_size": 4,
        "epochs": 1,                      # patience of 1 epoch
        "hyperparams": {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            # near-zero lr: val mIoU stays flat so the early-stopping
            # loop exits after warm_up+patience epochs; the AL
            # mechanics under test don't need a learning model
            "learning_rate": 1e-7,
            "learning_rate_decay": 0.0,
            "optimizer": {"type": "Adam",
                          "kwargs": {"beta1": 0.9, "beta2": 0.99}},
            "weight_reg": {"L2": 2e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0, "multiscale": False},
        },
        "network": {"model": model,
                    "input": {"height": input_hw[0],
                              "width": input_hw[1]}},
        "active_learning": {
            "iterations": iterations,
            "num_initially_labelled": 6,
            "num_validation": 4,
            "pseudo_labelling_proportion": 0.25,
            "selection_size": selection_size,
            "measure": measure,
            "threshold": 0.9,
            "epochs/warm_up": 1,
        },
    }
    if extra_al:
        conf["active_learning"].update(extra_al)
    path = tmp_path / "al.json"
    path.write_text(json.dumps(conf))
    return path


def _run(records, log_dir, conf_path, timeout=900):
    return subprocess.run(
        [sys.executable, "active_learning.py", "freiburg",
         "-d", str(records), "-l", str(log_dir), "-p", str(conf_path)],
        cwd=REPO, env=ENV, capture_output=True, text=True,
        timeout=timeout)


class TestActiveLearningCLI:
    @pytest.mark.parametrize("model,input_hw", [
        ("ENet", (32, 48)),
        # the second model family through the identical 2-round loop
        # (ICNet input dims must divide 32; the loader pads 48->64)
        ("ICNet", (32, 64)),
    ])
    def test_two_rounds_end_to_end(self, records, tmp_path, model,
                                   input_hw):
        log_dir = tmp_path / "al_log"
        res = _run(records, log_dir,
                   _conf(tmp_path, model=model, input_hw=input_hw))
        assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]

        state = json.loads((log_dir / "state.json").read_text())
        # schema identical to the reference
        assert set(state) == {"checkpoint", "iteration", "dataset"}
        assert set(state["dataset"]) == {"train", "val", "test"}
        assert set(state["dataset"]["train"]) == {
            "filenames", "labelled", "unlabelled", "no_label"}
        assert state["iteration"] == 2
        # 26 train records -> 1 to val-split... (freiburg strided split
        # happens at ETL time; num_validation=4 taken off the top here)
        n_train = len(state["dataset"]["train"]["filenames"])
        lab = state["dataset"]["train"]["labelled"]
        unlab = state["dataset"]["train"]["unlabelled"]
        # 6 initial + 3 per round * 2 rounds
        assert len(lab) == 6 + 3 * 2
        assert len(lab) + len(unlab) == n_train
        assert set(lab).isdisjoint(unlab)
        assert state["checkpoint"] is not None
        assert os.path.exists(state["checkpoint"])

        # round subdirectories with committed checkpoints
        assert (log_dir / "pretrain").is_dir()
        assert (log_dir / "iter-1").is_dir()

        # metrics: test curve keyed by labelled count + confidence hist
        lines = [json.loads(l) for l in
                 (log_dir / "metrics.jsonl").read_text().splitlines()]
        tests = [l for l in lines if l["split"] == "al_test"]
        assert [t["labelled"] for t in tests] == [6, 9]
        hists = [l for l in lines if l["split"] == "al_confidence"]
        assert len(hists) == 2
        # round-0 histogram covers the then-unlabelled pool (before the
        # two selections of 3 were moved out of it)
        assert sum(hists[0]["histogram"]) == len(unlab) + 6
        assert sum(hists[1]["histogram"]) == len(unlab) + 3
        # per-round phase wall clocks (tools/bench_al_round.py input)
        timing = [l for l in lines if l["split"] == "al_timing"]
        assert [t["round"] for t in timing] == [0, 1]
        assert [t["labelled"] for t in timing] == [6, 9]
        for t in timing:
            assert set(t) >= {"round_s", "train_s", "restore_s",
                              "test_s", "score_select_s"}
            assert t["round_s"] >= t["train_s"] > 0

    def test_resume_from_state(self, records, tmp_path):
        log_dir = tmp_path / "al_log2"
        conf_path = _conf(tmp_path, iterations=1)
        res = _run(records, log_dir, conf_path)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        state1 = json.loads((log_dir / "state.json").read_text())
        assert state1["iteration"] == 1

        # bump iterations and resume: picks up state + checkpoint
        conf_path2 = _conf(tmp_path, iterations=2)
        res2 = _run(records, log_dir, conf_path2)
        assert res2.returncode == 0, res2.stdout[-2000:] + res2.stderr[-2000:]
        assert "Resuming from checkpoint" in res2.stdout
        state2 = json.loads((log_dir / "state.json").read_text())
        assert state2["iteration"] == 2
        assert len(state2["dataset"]["train"]["labelled"]) == \
            len(state1["dataset"]["train"]["labelled"]) + 3

    def test_random_baseline_branch(self, records, tmp_path):
        # negative selection_size -> random draw of |N| (the baseline
        # config's semantics)
        log_dir = tmp_path / "al_log3"
        res = _run(records, log_dir,
                   _conf(tmp_path, selection_size=-3, iterations=1))
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        state = json.loads((log_dir / "state.json").read_text())
        assert len(state["dataset"]["train"]["labelled"]) == 9

    def test_bald_measure_end_to_end(self, records, tmp_path):
        """BALD (MC-dropout mutual information) acquisition — a
        capability extension over the reference's three measures: one
        selection round with measure=bald, pseudo-labeling falling back
        to entropy."""
        log_dir = tmp_path / "al_bald"
        res = _run(records, log_dir,
                   _conf(tmp_path, iterations=1, measure="bald",
                         extra_al={"mc_passes": 3}))
        assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
        assert "BALD acquisition: 3 MC-dropout passes" in res.stdout
        state = json.loads((log_dir / "state.json").read_text())
        assert state["iteration"] == 1
        assert len(state["dataset"]["train"]["labelled"]) == 9
        lines = [json.loads(l) for l in
                 (log_dir / "metrics.jsonl").read_text().splitlines()]
        hists = [l for l in lines if l["split"] == "al_confidence"]
        assert len(hists) == 1

    def test_coreset_selection_end_to_end(self, records, tmp_path):
        """Diversity selection (greedy k-center over pool embeddings) —
        a capability extension over the reference's confidence
        ranking: one round with selection=coreset."""
        log_dir = tmp_path / "al_coreset"
        res = _run(records, log_dir,
                   _conf(tmp_path, iterations=1,
                         extra_al={"selection": "coreset"}))
        assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
        assert "Core-set (k-center greedy) selection" in res.stdout
        state = json.loads((log_dir / "state.json").read_text())
        assert state["iteration"] == 1
        lab = state["dataset"]["train"]["labelled"]
        assert len(lab) == 9 and len(set(lab)) == 9
        lines = [json.loads(l) for l in
                 (log_dir / "metrics.jsonl").read_text().splitlines()]
        core = [l for l in lines if l["split"] == "al_coreset"]
        assert len(core) == 1 and core[0]["selected"] == 3
        assert core[0]["min_dist_mean"] is not None

    def test_bald_rejected_without_dropout(self, records, tmp_path):
        # ICNet has no dropout: MC sampling is meaningless, the CLI
        # must fail fast with a clear error
        log_dir = tmp_path / "al_bald_icnet"
        res = _run(records, log_dir,
                   _conf(tmp_path, iterations=1, measure="bald",
                         model="ICNet", input_hw=(32, 64)))
        assert res.returncode != 0
        assert "needs a model with" in res.stderr + res.stdout

    def test_size_buckets_reduce_bytes_keep_selection(
            self, mixed_records, tmp_path):
        """Mixed-size pools: the ranking pass splits into per-size
        storage windows (loader.size_buckets) — one oversized record
        no longer inflates every pool decode/stack/H2D — while
        selections are IDENTICAL to the single-window run (crops are
        per-example-keyed, pipeline.score_batch_indexed, so scores
        don't depend on how the pool is chunked)."""
        results = {}
        for tag, knob in [("bucketed", "auto"), ("flat", 0)]:
            log_dir = tmp_path / f"al_{tag}"
            conf_dir = tmp_path / tag
            conf_dir.mkdir()
            res = _run(mixed_records, log_dir,
                       _conf(conf_dir, iterations=1,
                             extra_al={"size_buckets": knob}))
            assert res.returncode == 0, \
                res.stdout[-3000:] + res.stderr[-3000:]
            results[tag] = (res, json.loads(
                (log_dir / "state.json").read_text()))
        res_b, state_b = results["bucketed"]
        res_f, state_f = results["flat"]
        out_b = res_b.stdout + res_b.stderr
        assert "size buckets" in out_b, out_b[-2000:]
        assert "size buckets" not in res_f.stdout + res_f.stderr
        # identical labelled sets -> identical ranking despite the
        # smaller per-bucket stacks
        assert state_b["dataset"]["train"]["labelled"] == \
            state_f["dataset"]["train"]["labelled"]
        assert state_b["dataset"]["train"]["unlabelled"] == \
            state_f["dataset"]["train"]["unlabelled"]

    def test_icnet_end_to_end(self, records, tmp_path):
        """The second model family through the full AL loop: ICNet's
        cascade-guidance training + 1/4-res fused-head scoring drive a
        selection round (network.model=ICNet per BASELINE.json confs;
        reference stub models/icnet/icnet.py:1-7). Input 32x64 (ICNet
        needs /32 dims); the 48-wide records pad + mask."""
        log_dir = tmp_path / "al_icnet"
        res = _run(records, log_dir,
                   _conf(tmp_path, iterations=1, model="ICNet",
                         input_hw=(32, 64)), timeout=1200)
        assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
        state = json.loads((log_dir / "state.json").read_text())
        assert state["iteration"] == 1
        assert len(state["dataset"]["train"]["labelled"]) == 9
        lines = [json.loads(l) for l in
                 (log_dir / "metrics.jsonl").read_text().splitlines()]
        hists = [l for l in lines if l["split"] == "al_confidence"]
        assert len(hists) == 1  # entropy scores ran over the pool
