#!/usr/bin/env python
"""Train-loop throughput benchmark: ENet 512x1024 supervised training,
images/sec/chip, printed as ONE JSON line (the training counterpart of
bench.py's scoring north-star; reference hot loop train.py:319-341).

Measures the REAL hot-loop configuration: fresh host uint8 stacks
uploaded through double-buffered ``device_prefetch``, on-device
augmentation, and the grouped training dispatch
(``train.steps.make_grouped_train_step``, ``BT_GROUP`` scanned steps
per jit call — the round-4 lever that amortizes the ~28 ms relay
round-trip; measured 98 -> 60.5 ms/step at group 16,
tools/probe_train_group.py).

Like bench.py, the timed loop runs over DEVICE-RESIDENT uint8 stacks:
through this container's loopback relay a fresh 268 MB group upload
costs ~7-10 s (pure transport, ~36 MB/s — measured 669.6 ms/step at
group 16 with fresh uploads), which benchmarks the relay, not the
trainer; production hosts overlap PCIe DMA with compute
(data/device_prefetch, PERF.md §3). ``BT_UPLOAD=1`` opts into the
fresh-upload mode as a transport diagnostic.

Env knobs: BT_BATCH (8), BT_HW ("512x1024"), BT_GROUPS (number of
grouped dispatches timed, 6), BT_GROUP (16), BT_DTYPE ("bf16"|"fp32"),
BT_CONV ("auto"|"lax"|"matmul"), BT_UPLOAD (0), BT_MODEL
("ENet"|"ICNet"), BT_REPEATS (3), BT_MULTISCALE (model default).

``BT_MODEL=ICNet`` benches the ICNet training step at its production
configuration (conf/icnet_cityscapes.json: batch 8, cascade-guidance
multiscale loss, Momentum 0.9) — set BT_HW=1024x2048 for the conf
shape. Its JSON goes to BENCH_TRAIN_ICNET.json (PERF.md §2b).

Variance protocol (round 5): the timed dispatches are split into
``BT_REPEATS`` >= 3 blocks timed independently; ``value`` is the
median block throughput, ``value_min``/``value_max`` the spread.

Baseline (ENet): the round-3 per-step dispatch measured 97.9 ms/step
at 512x1024 batch 8 = 81.7 img/s/chip; ``vs_baseline`` is measured
throughput over that. For ICNet the baseline is the ungrouped
(group 1) lax-conv step at the same shape, measured once and pinned
below. Writes the JSON to stdout; run from the repo root on the real
TPU and copy the line into BENCH_TRAIN{,_ICNET}.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# ms per image baselines. ENet: round-3 97.9 ms/step at batch 8
# 512x1024. ICNet: the round-5 ungrouped production-shape measurement
# (184.8 ms/step at batch 8 1024x2048 bf16 multiscale Momentum,
# BT_GROUP=1, median of 3 blocks) — the pre-grouping reference point
# for PERF.md §2b.
_BASELINE_MS = {"ENet": 97.9 / 8, "ICNet": 184.8 / 8}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.data import (
        device_prefetch)
    from semanticsegmentationactivelearning_tpu.models import get_model
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_grouped_train_step, make_train_step,
        optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    model_name = os.environ.get("BT_MODEL", "ENet")
    batch = int(os.environ.get("BT_BATCH", 8))
    h, w = (int(v) for v in
            os.environ.get("BT_HW", "512x1024").split("x"))
    group = int(os.environ.get("BT_GROUP", 16))
    n_groups = int(os.environ.get("BT_GROUPS", 6))
    num_classes = 19
    if model_name == "ICNet":
        # conf/icnet_cityscapes.json hyperparams: cascade-guidance
        # multiscale loss (weights 1/0.4/0.4), Momentum 0.9
        hparams = {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 1e-3, "learning_rate_decay": 0.0,
            "optimizer": {"type": "Momentum",
                          "kwargs": {"momentum": 0.9}},
            "weight_reg": {"L2": 1e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0, "multiscale": True},
        }
    else:
        hparams = {
            "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
            "learning_rate": 5e-4, "learning_rate_decay": 0.0,
            "optimizer": {"type": "Adam",
                          "kwargs": {"beta1": 0.9, "beta2": 0.99}},
            "weight_reg": {"L2": 2e-4, "L1": 0.0,
                           "glorot_scaling": False},
            "softmax": {"label_smoothing": 0.0,
                        "loginverse_scaling": 0.0, "multiscale": False},
        }
    if os.environ.get("BT_MULTISCALE"):
        hparams["softmax"]["multiscale"] = bool(
            int(os.environ["BT_MULTISCALE"]))
    multiscale = bool(hparams["softmax"]["multiscale"])
    model_kwargs = {"conv_impl": os.environ.get("BT_CONV", "auto")}
    if os.environ.get("BT_DTYPE", "bf16") == "bf16":
        model_kwargs["dtype"] = jnp.bfloat16
    model = get_model(model_name, num_classes, **model_kwargs)
    optimizer = optim.make_optimizer(hparams)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               (h, w), multiscale=multiscale)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, model={model_name}, batch={batch}, "
        f"group={group}, input={h}x{w}, multiscale={multiscale}")

    if group > 1:
        step = make_grouped_train_step(model, optimizer, num_classes,
                                       hparams, group=group,
                                       crop_hw=(h, w))
    else:
        single = make_train_step(model, optimizer, num_classes, hparams)
        from semanticsegmentationactivelearning_tpu.data import pipeline

        def step(state, gb, keys):
            k_aug, k_drop = jax.random.split(keys[0])
            _raw, image, label, mask = pipeline.augment_batch(
                gb["stack"][0], gb["heights"][0], gb["widths"][0],
                k_aug, crop_hw=(h, w))
            state, m = single(state, {
                "image": image, "label": label, "mask": mask,
                "valid": jnp.asarray(gb["valid"][0])}, k_drop)
            return state, m

    rng = np.random.default_rng(0)
    n_bufs = 3   # distinct buffers so data varies across dispatches
    stacks = [rng.integers(0, 255, (group, batch, h, w, 4),
                           dtype=np.uint8) for _ in range(n_bufs)]
    if not int(os.environ.get("BT_UPLOAD", 0)):
        stacks = [jax.device_put(s) for s in stacks]
        np.asarray(stacks[-1][0, 0, 0, 0])   # sync the uploads
    heights = np.full((group, batch), h, np.int32)
    widths = np.full((group, batch), w, np.int32)
    valid = np.ones((group, batch), np.float32)

    def batches(n):
        for i in range(n):
            yield {"stack": stacks[i % n_bufs]}

    def run(n, i0=0):
        nonlocal state
        last = None
        it = device_prefetch.device_prefetch(batches(n))
        for i, b in enumerate(it):
            keys = jnp.stack([
                jax.random.PRNGKey(i0 + i * group + k)
                for k in range(group)])
            state, m = step(state, {
                "stack": b["stack"], "heights": heights,
                "widths": widths, "valid": valid}, keys)
            last = m["loss"]
        return float(np.asarray(last).reshape(-1)[-1])

    log("compiling...")
    t0 = time.time()
    loss = run(1)
    log(f"compile+first: {time.time() - t0:.1f}s, loss={loss:.3f}")

    repeats = max(1, int(os.environ.get("BT_REPEATS", 3)))
    block = max(1, n_groups // repeats)
    rates = []
    for r in range(repeats):
        t0 = time.time()
        loss = run(block, i0=1000 * (r + 1))
        dt = time.time() - t0
        per_step = dt / (block * group)
        rates.append(batch / per_step)
        log(f"block {r + 1}/{repeats}: {per_step * 1e3:.1f} ms/step "
            f"({block} dispatches x {group} steps), loss={loss:.3f}")
    img_s = float(np.median(rates))
    per_step = batch / img_s
    log(f"steady state median of {repeats} blocks: "
        f"{per_step * 1e3:.1f} ms/step ({img_s:.1f} img/s, "
        f"min {min(rates):.1f}, max {max(rates):.1f})")
    result = {
        "metric": f"{model_name.lower()}_{h}x{w}"
                  f"_train_images_per_sec_per_chip",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "ms_per_step": round(per_step * 1e3, 1),
        "batch": batch, "group": group,
        "value_min": round(min(rates), 1),
        "value_max": round(max(rates), 1),
        "repeats": repeats, "block_dispatches": block,
    }
    base_ms = _BASELINE_MS.get(model_name)
    if base_ms:
        result["vs_baseline"] = round(img_s * base_ms / 1e3, 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
