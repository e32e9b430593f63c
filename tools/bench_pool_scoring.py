#!/usr/bin/env python
"""North-star benchmark END TO END: score a 2975-record pool through
the active-learning CLI's REAL path — records on disk -> RecordLoader
(PNG decode) -> device_prefetch (H2D overlap) -> grouped fused Pallas
scoring -> scores fetched — and report wall-clock for the whole pool.

The compute-only number (bench.py) proves the kernel; this proves IO
doesn't eat the margin (BASELINE.md: "score the 2975-image Cityscapes
pool < 30 s on v5e-8"; the reference's analogous hot loop is the full
``sess.run`` pool pass, /root/reference/active_learning.py:687-700).

A configurable number of UNIQUE 1024x2048 records is generated once and
cycled to 2975 filenames: decode work per example is identical to
distinct files (same bytes through the same zlib/PNG path; the page
cache serves either case after warm-up on a 250G host).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_records(cache_dir: str, n_unique: int, hw):
    """Generate unique synthetic records once (cached)."""
    from PIL import Image

    from semanticsegmentationactivelearning_tpu.data import (etl,
                                                             example,
                                                             tfrecord)
    os.makedirs(cache_dir, exist_ok=True)
    h, w = hw
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n_unique):
        p = os.path.join(cache_dir, f"pool{h}x{w}_{i:04d}.tfrecord")
        paths.append(p)
        if os.path.exists(p):
            continue
        t0 = time.time()
        # realistic photographic-entropy content: smooth fields + noise
        yy = np.linspace(0, 4 * np.pi, h)[:, None, None]
        xx = np.linspace(0, 4 * np.pi, w)[None, :, None]
        base = (np.sin(yy + i) + np.cos(xx * (1 + i % 3))) * 60 + 128
        img = np.clip(base + rng.normal(0, 25, (h, w, 3)),
                      0, 255).astype(np.uint8)
        import io
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="png")
        blob = example.make_example(example.SegExample(
            file_id=f"pool_{i:04d}", height=h, width=w, label=None,
            modalities={"image": (buf.getvalue(), "png", 3)}))
        tfrecord.write_record_file(p, blob)
        log(f"  wrote {p} ({time.time() - t0:.1f}s)")
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=2975)
    ap.add_argument("--unique", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--chips", type=int, default=8,
                    help="v5e slice size to project the single-chip "
                         "measurement onto")
    ap.add_argument("--cache", default="/tmp/ssal_pool_records")
    ap.add_argument("--phases", action="store_true",
                    help="also measure decode-only and H2D-only rates "
                         "(for projecting to other host topologies)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.data import (
        device_prefetch, loader, pipeline)
    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_pool_score_step, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    log(f"device: {jax.devices()[0]}")

    unique = make_records(args.cache, args.unique, (h, w))
    filenames = [unique[i % len(unique)] for i in range(args.pool)]

    hparams = {
        "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
        "learning_rate": 5e-4, "learning_rate_decay": 0.0,
        "optimizer": {"type": "Adam",
                      "kwargs": {"beta1": 0.9, "beta2": 0.99}},
        "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
        "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                    "multiscale": False},
    }
    model = ENet(19, dtype=jnp.bfloat16)
    state = create_train_state(model, optim.make_optimizer(hparams),
                               jax.random.PRNGKey(0), (h, w))
    pool_score = make_pool_score_step(model, 19, "entropy",
                                      micro_batch=args.batch)

    # label-free pool loader, exactly like the AL CLI's rank_loader
    ld = loader.RecordLoader(filenames, args.batch, storage_hw=(h, w),
                             with_label=False)

    def run_pool():
        """One full rank_confidence-equivalent pass (the AL CLI hot
        loop, active_learning.py rank_confidence)."""
        confidence = np.zeros(len(filenames), np.float32)
        buf, idxs, vals, pending = [], [], [], []

        def flush():
            if not buf:
                return
            imgs = jnp.concatenate(buf, axis=0)
            pending.append((pool_score(state, imgs),
                            np.concatenate(idxs), np.concatenate(vals)))
            buf.clear(); idxs.clear(); vals.clear()

        for b in device_prefetch.device_prefetch(ld.batches()):
            raw = pipeline.score_batch(
                b["stack"], b["heights"], b["widths"],
                jax.random.PRNGKey(0), crop_hw=(h, w))
            buf.append(raw)
            idxs.append(b["index"])
            vals.append(b["valid"])
            if len(buf) == args.group:
                flush()
        flush()
        for sc, idx, val in pending:
            sc = np.asarray(sc)
            confidence[idx[val]] = sc[val]
        return confidence

    # warm-up: compile + page-cache the records (one mini pass)
    t0 = time.time()
    ld_warm = loader.RecordLoader(
        filenames[:args.batch * args.group], args.batch,
        storage_hw=(h, w), with_label=False)
    for b in device_prefetch.device_prefetch(ld_warm.batches()):
        raw = pipeline.score_batch(
            b["stack"], b["heights"], b["widths"],
            jax.random.PRNGKey(0), crop_hw=(h, w))
        np.asarray(pool_score(
            state, jnp.concatenate([raw] * args.group, axis=0)))
        break
    log(f"warm-up/compile: {time.time() - t0:.1f}s")

    t0 = time.time()
    conf = run_pool()
    dt = time.time() - t0
    assert np.isfinite(conf).all()
    per_chip = args.pool / dt
    projected = dt / args.chips
    log(f"pool of {args.pool} @ {h}x{w}: {dt:.1f}s end-to-end on ONE "
        f"chip ({per_chip:.1f} img/s incl. decode+H2D+score)")
    log(f"projected v5e-{args.chips} (pool split across chips): "
        f"{projected:.1f}s vs 30s target")

    extra = {}
    if args.phases:
        # decode-only (host, all cores the container has)
        n_dec = min(args.batch * 8, args.pool)
        ld_d = loader.RecordLoader(filenames[:n_dec], args.batch,
                                   storage_hw=(h, w), with_label=False)
        t0 = time.time()
        n = sum(int(b["valid"].sum()) for b in ld_d.batches())
        decode_ms = 1000 * (time.time() - t0) / n
        # H2D-only (whatever link this host has to the chip)
        x = np.zeros((args.batch, h, w, 3), np.uint8)
        dev = jax.devices()[0]
        jax.device_put(x, dev).block_until_ready()  # warm
        t0 = time.time()
        for _ in range(4):
            jax.device_put(x, dev).block_until_ready()
        h2d_ms = 1000 * (time.time() - t0) / (4 * args.batch)
        log(f"phases: decode {decode_ms:.1f} ms/img "
            f"({os.cpu_count()} host cores), H2D {h2d_ms:.1f} ms/img")
        extra = {"decode_ms_per_img": round(decode_ms, 1),
                 "h2d_ms_per_img": round(h2d_ms, 1),
                 "host_cores": os.cpu_count()}

    import json
    print(json.dumps({
        "metric": "pool2975_end_to_end_seconds_one_chip",
        "value": round(dt, 2),
        "images_per_sec_one_chip": round(per_chip, 2),
        f"projected_v5e{args.chips}_seconds": round(projected, 2),
        **extra}))


if __name__ == "__main__":
    sys.exit(main())
