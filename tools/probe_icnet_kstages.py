#!/usr/bin/env python
"""Per-stage cost probe for the KERNELIZED ICNet scoring path on the
real TPU: cumulative prefixes of (front+stem kernel -> XLA stem
res-blocks -> low-res tail -> cascade fusion -> head8 kernel), each
jitted separately, grouped over ``--group`` micro-batches per dispatch
to amortize the ~26 ms relay overhead. ``--nostem`` probes the
front-only kernel path (stem conv1_1..maxpool in XLA) for A/B.
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--nostem", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ICNet
    from semanticsegmentationactivelearning_tpu.models.icnet import (
        _resize_bilinear)
    from semanticsegmentationactivelearning_tpu.ops import (
        pallas_kernels as pk)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ICNet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}, "
        f"fuse_stem={not args.nostem}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.group, args.batch, h, w, 3)).astype(np.float32))

    def front(v, img):
        if args.nostem:
            packed = pk.pack_icnet_front(v)
            f1, xh = pk.fused_icnet_front(img.astype(jnp.bfloat16),
                                          packed)
            stem1 = None
        else:
            packed = pk.pack_icnet_front_stem(v)
            f1, stem1 = pk.fused_icnet_front_stem(
                img.astype(jnp.bfloat16), packed)
            xh = None
        return f1, xh, stem1

    def upto(v, img, stage):
        f1, xh, stem1 = front(v, img)
        if stage == "front":
            outs = [f1] + [a for a in (xh, stem1) if a is not None]
            return sum(jnp.sum(a.astype(jnp.float32)) for a in outs)

        def run(mdl):
            if stem1 is not None:
                f2 = mdl.stem.from_pool(stem1, False)
            else:
                f2 = mdl.stem(xh, False)
            if stage == "stem":
                return f2
            f3 = _resize_bilinear(f2, (f2.shape[1] // 2,
                                       f2.shape[2] // 2))
            f3 = mdl.tail(f3, False)
            if stage == "tail":
                return f3
            fused16, _ = mdl.cff1(f3, f2, False)
            fused8, _ = mdl.cff2(fused16, f1, False)
            return fused8

        out = model.apply(v, method=run)
        return jnp.sum(out.astype(jnp.float32))

    def full(v, img):
        return jnp.sum(model.fused_score(
            v, img, "entropy", use_pallas=True,
            fuse_stem=not args.nostem))

    def timed(fn, tag, prev):
        f = jax.jit(lambda v, imgs: jax.lax.map(
            lambda im: fn(v, im), imgs))
        t0 = time.time()
        np.asarray(f(variables, image))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(variables, image))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, image))
        dt = (time.time() - t0) / args.iters / args.group * 1e3
        log(f"  {tag}: {dt:.1f} ms/batch (delta {dt - prev:.1f})")
        return dt

    prev = 0.0
    for st in ("front", "stem", "tail", "cff"):
        prev = timed(lambda v, im, st=st: upto(v, im, st), st, prev)
    timed(full, "full(fused_score)", prev)


if __name__ == "__main__":
    sys.exit(main())
