#!/usr/bin/env python
"""Train-step throughput probe: measures the end-to-end hot-loop step
time (H2D upload of uint8 stacks + on-device augment + train step) vs
pure on-device compute, quantifying the transfer/compute overlap from
``data/device_prefetch`` (reference equivalent: tf.data prefetch after
batching, tensortools/input.py:193-195).

Run on the real TPU from the repo root:
    python tools/bench_train.py
Env knobs: BT_BATCH (8), BT_HW ("512x1024"), BT_STEPS (12),
BT_DTYPE ("bf16"), BT_CONV ("auto" | "lax" | "matmul" — the
models/blocks.py conv lowering, for A/Bing shifted matmuls vs
lax.conv).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from semanticsegmentationactivelearning_tpu.data import (
        device_prefetch, pipeline)
    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_train_step, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    batch = int(os.environ.get("BT_BATCH", 8))
    h, w = (int(v) for v in
            os.environ.get("BT_HW", "512x1024").split("x"))
    steps = int(os.environ.get("BT_STEPS", 12))
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
    dtype = None
    if os.environ.get("BT_DTYPE", "bf16") == "bf16":
        import jax.numpy as jnp
        dtype = jnp.bfloat16
    model = ENet(num_classes=num_classes,
                 conv_impl=os.environ.get("BT_CONV", "auto"),
                 **({"dtype": dtype} if dtype is not None else {}))
    optimizer = optim.make_optimizer(hparams)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               (h, w))
    train_step = make_train_step(model, optimizer, num_classes, hparams)

    rng = np.random.default_rng(0)
    n_bufs = 4  # distinct host batches so uploads are real
    stacks = [rng.integers(0, 255, (batch, h, w, 4), dtype=np.uint8)
              for _ in range(n_bufs)]
    heights = np.full(batch, h, np.int32)
    widths = np.full(batch, w, np.int32)
    valid = np.ones(batch, np.float32)

    def batches(n):
        for i in range(n):
            yield {"stack": stacks[i % n_bufs]}

    def run(n, prefetched, fetch_every_step=True):
        it = batches(n)
        if prefetched:
            it = device_prefetch.device_prefetch(it)
        nonlocal state
        t0 = time.time()
        last = None
        for i, b in enumerate(it):
            key = jax.random.PRNGKey(i)
            _raw, image, label, mask = pipeline.augment_batch(
                b["stack"], heights, widths, key, crop_hw=(h, w))
            state, m = train_step(state, {
                "image": image, "label": label, "mask": mask,
                "valid": valid}, key)
            last = m["loss"]
            if fetch_every_step:
                float(last)  # sync through the relay
        float(last)
        return (time.time() - t0) / n

    log("compiling...")
    run(2, prefetched=True)

    results = {}
    for name, pf, sync in [("numpy-feed/sync", False, True),
                           ("prefetch/sync", True, True),
                           ("numpy-feed/nosync", False, False),
                           ("prefetch/nosync", True, False)]:
        results[name] = run(steps, prefetched=pf, fetch_every_step=sync)
    # compute-only: resident device buffers, no fresh upload
    dev = [jax.device_put(s) for s in stacks]
    stacks_host = stacks
    try:
        stacks[:] = dev
        results["compute-only"] = run(steps, prefetched=False,
                                      fetch_every_step=False)
    finally:
        stacks[:] = stacks_host

    log(f"batch {batch} @{h}x{w}:")
    base = results["compute-only"]
    for name, t in results.items():
        log(f"  {name:20s} {t*1e3:7.1f} ms/step ({t/base:.2f}x compute)")
    print(" ".join(f"{results[k]*1e3:.1f}" for k in results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
