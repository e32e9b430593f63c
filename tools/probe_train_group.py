#!/usr/bin/env python
"""Grouped-train-step dispatch amortization probe (real TPU).

tools/probe_train_levers.py put the batch-8 512x1024 bf16 step at
~90 ms including the ~28 ms fixed relay round-trip — dispatch overhead
is ~30% of the hot loop. ``train.steps.make_grouped_train_step`` scans
K sequential steps (augment included) in ONE dispatch; this probe
measures the per-step-equivalent time at K = 1, 2, 4, 8 with uint8
stacks resident on device (the loop's device_prefetch steady state).

Run from the repo root: python tools/probe_train_group.py
Args: --batch 8 --hw 512x1024 --iters 4 --groups 1,2,4,8
Reference hot loop being amortized: train.py:319-341.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--groups", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.data import pipeline
    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_grouped_train_step, make_train_step,
        optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    num_classes = 19
    hparams = {
        "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
        "learning_rate": 5e-4, "learning_rate_decay": 0.0,
        "optimizer": {"type": "Adam",
                      "kwargs": {"beta1": 0.9, "beta2": 0.99}},
        "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
        "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                    "multiscale": False},
    }
    model = ENet(num_classes=num_classes, dtype=jnp.bfloat16)
    optimizer = optim.make_optimizer(hparams)
    state0 = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                                (h, w))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    r = {}
    for g in (int(x) for x in args.groups.split(",")):
        stacks = jax.device_put(rng.integers(
            0, 255, (g, args.batch, h, w, 4), np.uint8))
        heights = np.full((g, args.batch), h, np.int32)
        widths = np.full((g, args.batch), w, np.int32)
        valid = np.ones((g, args.batch), np.float32)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(g)])
        state = jax.tree.map(jnp.copy, state0)
        if g == 1:
            step = make_train_step(model, optimizer, num_classes,
                                   hparams)

            def run(state):
                k_aug, k_drop = jax.random.split(keys[0])
                _raw, image, label, mask = pipeline.augment_batch(
                    stacks[0], heights[0], widths[0], k_aug,
                    crop_hw=(h, w))
                state, m = step(state, {
                    "image": image, "label": label, "mask": mask,
                    "valid": jnp.asarray(valid[0])}, k_drop)
                return state, m["loss"]
        else:
            gstep = make_grouped_train_step(
                model, optimizer, num_classes, hparams, group=g,
                crop_hw=(h, w))

            def run(state, _gstep=gstep, _stacks=stacks,
                    _heights=heights, _widths=widths, _valid=valid,
                    _keys=keys):
                state, m = _gstep(state, {
                    "stack": _stacks, "heights": _heights,
                    "widths": _widths, "valid": _valid}, _keys)
                return state, m["loss"][-1]

        t0 = time.time()
        state, loss = run(state)
        np.asarray(loss).sum()
        log(f"  group {g}: compile+first {time.time() - t0:.1f}s")
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            state, loss = run(state)
            np.asarray(loss).sum()
            times.append((time.time() - t0) / g)
        dt = float(np.median(times)) * 1e3
        r[f"group{g}"] = round(dt, 1)
        log(f"  group {g}: {dt:.1f} ms/step-equivalent "
            f"(median of {args.iters})")
    print(r)


if __name__ == "__main__":
    sys.exit(main())
