#!/usr/bin/env python
"""ICNet CFF-segment attribution + alternatives probe (real TPU).

docs/PERF.md's round-3 ICNet stage attribution measured the "CFF
fusion" block — rest-of-stage-3 + dilated stages 4/5 + pyramid pooling
+ reduce + the two cascade fusions, all XLA — at +15.9 ms of the ~42 ms
batch-16 1024x2048 device time, and declined kernelizing it without a
number. This probe supplies the numbers:

1. sub-stage attribution INSIDE the segment (cumulative prefixes via
   ``LowResTail.__call__(upto=...)``): res3 rest / res4 (512ch dil 2)
   / res5 (1024ch dil 4) / ppm / reduce / cff1 / cff2;
2. conv-lowering A/B for the tail: ``lax`` (shipped default under
   "auto") vs ``matmul`` (ops/shiftconv shifted matmuls);
3. a PPM variant replacing the four ``jax.image.resize`` bilinear
   upsamples with matmul interpolation (the resize lowers to gathers
   whose cost is invisible from outside).

The segment runs from captured REAL stem features (shapes from
jax.eval_shape on the actual model) so numbers transfer to the scoring
path. Grouped over --group micro-batches per dispatch (relay ~26 ms).

Run: python tools/probe_icnet_cff.py [--batch 16 --hw 1024x2048]
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
    ap.add_argument("--impls", default="lax,matmul")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ICNet
    from semanticsegmentationactivelearning_tpu.models.icnet import (
        _resize_bilinear)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ICNet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    # real feature shapes via eval_shape on the actual branches
    def shapes(v, img):
        xh = _resize_bilinear(img, (h // 2, w // 2))

        def run(mdl):
            f1 = mdl.branch1_3(
                mdl.branch1_2(mdl.branch1_1(img.astype(jnp.bfloat16),
                                            False), False), False)
            f2 = mdl.stem(xh.astype(jnp.bfloat16), False)
            return f1, f2

        return model.apply(v, method=run)

    f1_s, f2_s = jax.eval_shape(
        shapes, variables,
        jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.float32))
    log(f"f1 {f1_s.shape} f2 {f2_s.shape}")
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(args.group, *f1_s.shape))
                     .astype(np.float32)).astype(f1_s.dtype)
    f2 = jnp.asarray(rng.normal(size=(args.group, *f2_s.shape))
                     .astype(np.float32)).astype(f2_s.dtype)

    stages = ("res3", "res4", "res5", "ppm", "reduce", "cff1", "cff2")

    def build(impl):
        mdl = ICNet(19, dtype=jnp.bfloat16, conv_impl=impl)

        def seg(v, f1b, f2b, stage):
            def run(m):
                f3 = _resize_bilinear(f2b, (f2b.shape[1] // 2,
                                            f2b.shape[2] // 2))
                f3 = f3.astype(jnp.bfloat16)
                upto = stage if stage in ("res3", "res4", "res5",
                                          "ppm") else None
                t = m.tail(f3, False, upto)
                if upto is not None:
                    return t
                if stage == "reduce":
                    return t
                fused16, _ = m.cff1(t, f2b, False)
                if stage == "cff1":
                    return fused16
                fused8, _ = m.cff2(fused16, f1b, False)
                return fused8

            out = mdl.apply(v, method=run)
            return jnp.sum(out.astype(jnp.float32))

        return seg

    def timed(fn, tag, prev):
        f = jax.jit(lambda v, a, b: jax.lax.map(
            lambda ab: fn(v, ab[0], ab[1]), (a, b)))
        t0 = time.time()
        np.asarray(f(variables, f1, f2))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(variables, f1, f2))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, f1, f2))
        dt = (time.time() - t0) / args.iters / args.group * 1e3
        log(f"  {tag}: {dt:.2f} ms/batch (delta {dt - prev:+.2f})")
        return dt

    results = {}
    for impl in args.impls.split(","):
        # tail impl override: ICNet "auto" pins the tail to lax, so
        # force the requested lowering through conv_impl directly
        seg = build(impl)
        log(f"-- tail conv_impl={impl}")
        prev = 0.0
        for st in stages:
            prev = timed(lambda v, a, b, st=st: seg(v, a, b, st),
                         f"{impl}:{st}", prev)
            results[f"{impl}:{st}"] = round(prev, 2)
    print(results)


if __name__ == "__main__":
    sys.exit(main())
