#!/usr/bin/env python
"""One-command active-learning ROUND wall-clock benchmark.

Drives the REAL ``active_learning.py`` CLI end to end on a synthetic
Freiburg-layout dataset (generate_dataset.py ETL -> records) for
``--iterations`` rounds and reports the per-round wall clock with its
phase decomposition (train-to-patience / best-checkpoint restore /
test pass / score+select) from the CLI's own per-round ``al_timing``
records in ``metrics.jsonl``. This catches regressions the component
benches (bench.py scoring, bench_train.py training) cannot see:
host-side selection stalls, checkpoint IO between phases, loader
warm-up — the full flagship loop of reference
``active_learning.py:728-854``.

Run on the real TPU from the repo root (no JAX_PLATFORMS override);
for a CPU sanity pass set ``JAX_PLATFORMS=cpu``. Prints ONE JSON line
on stdout; diagnostics on stderr. The checked-in result lives in
``BENCH_AL_ROUND.json`` with the config stated inline (PERF.md §4).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dataset(cache_dir: str, n_train: int, n_test: int, hw):
    """Synthetic learnable Freiburg-layout dataset -> ETL'd records
    (cached across runs; the same recipe as the CLI integration
    tests: color blocks predict labels, +-20 intensity noise)."""
    from PIL import Image
    h, w = hw
    key = f"alround_{h}x{w}_{n_train}_{n_test}"
    out = os.path.join(cache_dir, key, "records")
    stamp = os.path.join(cache_dir, key, "done")
    if os.path.exists(stamp):
        return out
    root = os.path.join(cache_dir, key, "raw")
    shutil.rmtree(os.path.join(cache_dir, key), ignore_errors=True)
    rng = np.random.default_rng(0)
    colors = np.array([(170, 170, 170), (0, 255, 0), (102, 102, 51),
                       (0, 120, 255), (0, 0, 0)], dtype=np.uint8)
    img_colors = np.array([(200, 40, 40), (40, 200, 40), (40, 40, 200),
                           (200, 200, 40), (40, 200, 200)],
                          dtype=np.uint8)
    for split, n in [("train", n_train), ("test", n_test)]:
        os.makedirs(os.path.join(root, split, "GT_color"))
        os.makedirs(os.path.join(root, split, "rgb"))
        for i in range(n):
            idx = rng.integers(0, len(colors), (h // 8, w // 8))
            big = np.kron(idx, np.ones((8, 8), np.int64))
            Image.fromarray(colors[big]).save(os.path.join(
                root, split, "GT_color", f"{split[0]}{i:04d}_mask.png"))
            img = np.clip(img_colors[big].astype(int)
                          + rng.integers(-20, 20, (h, w, 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(
                root, split, "rgb", f"{split[0]}{i:04d}.png"))
    res = subprocess.run(
        [sys.executable, "generate_dataset.py", "-d", root,
         "-t", "freiburg", "-o", out], cwd=REPO,
        capture_output=True, text=True)
    if res.returncode:
        raise RuntimeError(f"ETL failed:\n{res.stderr}")
    open(stamp, "w").close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ENet",
                    choices=["ENet", "ICNet"])
    ap.add_argument("--hw", default="128x192",
                    help="network input (and record) size; production "
                         "Cityscapes trains at 512x1024 — scale up on "
                         "hosts that can decode it")
    ap.add_argument("--n-train", type=int, default=96)
    ap.add_argument("--n-test", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--seed-labels", type=int, default=24)
    ap.add_argument("--selection-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=2,
                    help="early-stopping patience")
    ap.add_argument("--warm-up", type=int, default=2)
    ap.add_argument("--train-group", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cache", default="/tmp/ssal_al_round")
    ap.add_argument("--log-dir", default=None,
                    help="keep the run's log dir (default: temp)")
    args = ap.parse_args()

    h, w = (int(v) for v in args.hw.split("x"))
    records = make_dataset(args.cache, args.n_train, args.n_test,
                           (h, w))

    conf = {
        "batch_size": args.batch,
        "epochs": args.epochs,
        "train_group": args.train_group,
        "hyperparams": {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 1e-3, "learning_rate_decay": 0.0,
            "optimizer": {"type": "Adam",
                          "kwargs": {"beta1": 0.9, "beta2": 0.99}},
            "weight_reg": {"L2": 2e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0,
                        "multiscale": args.model == "ICNet"},
        },
        "network": {"model": args.model, "dtype": args.dtype,
                    "input": {"height": h, "width": w}},
        "active_learning": {
            "iterations": args.iterations,
            "num_initially_labelled": args.seed_labels,
            "num_validation": args.batch,
            "pseudo_labelling_proportion": 0.0,
            "selection_size": args.selection_size,
            "measure": "entropy",
            "threshold": 0.9,
            "epochs": args.epochs,
            "warm_up": args.warm_up,
        },
    }
    log_dir = args.log_dir or os.path.join(
        args.cache, f"log_{args.model}_{int(time.time())}")
    os.makedirs(log_dir, exist_ok=True)
    conf_path = os.path.join(log_dir, "bench_conf.json")
    with open(conf_path, "w") as fp:
        json.dump(conf, fp, indent=2)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   "/tmp/ssal_jax_cache")
    log(f"AL run: model={args.model} {h}x{w} batch={args.batch} "
        f"iters={args.iterations} -> {log_dir}")
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, "active_learning.py", "freiburg",
         "-d", records, "-l", log_dir, "-p", conf_path],
        cwd=REPO, env=env, capture_output=True, text=True)
    total_s = time.time() - t0
    sys.stderr.write(res.stdout[-2000:] + res.stderr[-4000:])
    if res.returncode:
        log(f"active_learning.py failed rc={res.returncode}")
        return 1

    lines = [json.loads(ln) for ln in
             open(os.path.join(log_dir, "metrics.jsonl"))]
    timing = [ln for ln in lines if ln["split"] == "al_timing"]
    test_miou = [(ln["round"], ln.get("mean_iou"))
                 for ln in lines if ln["split"] == "al_test"]
    if not timing:
        log("no al_timing records found")
        return 1
    # round 0 pays every compile; steady-state rounds are the metric
    steady = timing[1:] or timing
    phases = {}
    for key in ("train_s", "restore_s", "test_s", "score_select_s"):
        vals = [t[key] for t in steady if key in t]
        if vals:
            phases[key] = round(float(np.median(vals)), 2)
    round_s = float(np.median([t["round_s"] for t in steady]))
    log(f"rounds: {[t['round_s'] for t in timing]} s "
        f"(first includes compiles); test mIoU by round: {test_miou}")
    print(json.dumps({
        "metric": f"{args.model.lower()}_al_round_seconds",
        "value": round(round_s, 2),
        "unit": "seconds/round",
        "phases": phases,
        "rounds_timed": len(steady),
        "first_round_s": round(timing[0]["round_s"], 2),
        "total_s": round(total_s, 2),
        "config": {"model": args.model, "hw": args.hw,
                   "batch": args.batch,
                   "n_train": args.n_train,
                   "seed_labels": args.seed_labels,
                   "selection_size": args.selection_size,
                   "patience": args.epochs, "warm_up": args.warm_up,
                   "train_group": args.train_group,
                   "dtype": args.dtype},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
