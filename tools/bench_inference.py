#!/usr/bin/env python
"""Serving benchmark END TO END: run the inference CLI's REAL predict
path — records on disk -> RecordLoader (PNG decode) -> device_prefetch
(H2D overlap) -> ``inference.make_predict_fn`` (the same jitted closure
the CLI serves with) -> label-map fetch -> optional host PNG encode —
and report steady-state images/second.

``--fuse on|off|auto`` A/Bs the fully-kernelized predict chain
(W-packed front -> mid -> in-kernel-argmax tail) against the plain XLA
forward by setting ``SSAL_FUSED_PREDICT`` before the closure is built.
The reference's analogous hot loop is the per-batch ``sess.run`` +
in-graph PNG encode, /root/reference/inference.py:90-119.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from tools.bench_pool_scoring import log, make_records  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--unique", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--model", choices=("ENet", "ICNet"),
                    default="ENet")
    ap.add_argument("--fuse", choices=("auto", "on", "off"),
                    default="auto")
    ap.add_argument("--encode", action="store_true",
                    help="include host PNG encode + write (the CLI's "
                         "full output path: background AsyncPngWriter)")
    ap.add_argument("--encode-sync", action="store_true",
                    help="A/B: serial in-loop PIL encode instead of "
                         "the async writer")
    ap.add_argument("--color", action="store_true",
                    help="colormap RGB output instead of id maps")
    ap.add_argument("--cache", default="/tmp/ssal_pool_records")
    ap.add_argument("--out", default="/tmp/ssal_bench_infer_out")
    args = ap.parse_args()

    if args.fuse != "auto":
        os.environ["SSAL_FUSED_PREDICT"] = \
            "1" if args.fuse == "on" else "0"

    import jax
    import jax.numpy as jnp

    import inference
    from semanticsegmentationactivelearning_tpu import datasets
    from semanticsegmentationactivelearning_tpu.data import etl, loader
    from semanticsegmentationactivelearning_tpu.models import get_model
    from semanticsegmentationactivelearning_tpu.data import (
        device_prefetch)
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    log(f"device: {jax.devices()[0]}")

    unique = make_records(args.cache, args.unique, (h, w))
    filenames = [unique[i % len(unique)] for i in range(args.images)]

    dataset = datasets.Cityscapes()
    model = get_model(args.model, dataset.num_classes,
                      dtype=jnp.bfloat16)
    state = create_train_state(model, optim.make_optimizer({}),
                               jax.random.PRNGKey(0), (h, w))
    lut = (jnp.asarray(dataset.colormap) if args.color
           else jnp.asarray(dataset.embedding_reversed))
    predict, use_fused = inference.make_predict_fn(
        model, state, lut, h, w, in_channels=3)
    log(f"fused predict chain: {use_fused}")

    encode = args.encode or args.encode_sync
    if encode:
        os.makedirs(args.out, exist_ok=True)

    def run(names, tag):
        from semanticsegmentationactivelearning_tpu.data import (
            png_writer)
        ld = loader.RecordLoader(names, args.batch, storage_hw=(h, w),
                                 with_label=False)
        n, t0 = 0, time.time()
        writer = None if args.encode_sync or not encode \
            else png_writer.AsyncPngWriter()
        for b in device_prefetch.device_prefetch(ld.batches()):
            out = np.asarray(predict(b["stack"]))
            if encode:
                paths = [os.path.join(args.out,
                                      f"{tag}_{n + j:05d}.png")
                         if b["valid"][j] else None
                         for j in range(len(out))]
                if writer is not None:
                    writer.submit(paths, out)
                else:
                    for j, p in enumerate(paths):
                        if p is not None:
                            with open(p, "wb") as fp:
                                fp.write(etl.encode_png(out[j]))
            n += int(b["valid"].sum())
        if writer is not None:
            writer.close()
        return n, time.time() - t0

    # warm-up: compile + page-cache (one batch pass)
    _, dt = run(filenames[:args.batch], "warm")
    log(f"warm-up/compile: {dt:.1f}s")

    n, dt = run(filenames, "img")
    rate = n / dt
    log(f"{n} images @ {h}x{w}: {dt:.1f}s "
        f"({rate:.1f} img/s incl. decode+H2D+predict"
        f"{'+PNG encode' if encode else ''})")
    print(json.dumps({
        "metric": "inference_images_per_sec_one_chip",
        "value": round(rate, 2),
        "model": args.model, "images": n, "hw": args.hw,
        "batch": args.batch, "fused": bool(use_fused),
        "encode": bool(encode),
        "encode_async": bool(encode and not args.encode_sync)}))


if __name__ == "__main__":
    sys.exit(main())
