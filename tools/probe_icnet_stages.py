#!/usr/bin/env python
"""Per-stage cost probe for the ICNet scoring path on the real TPU:
cumulative prefixes of (branch1 -> half-res stem -> low-res tail ->
CFF fusion -> 1/4-res head -> fused upsample+entropy kernel), each
jitted separately and synced by fetching a small reduction. Grouped
over ``--group`` micro-batches per dispatch to amortize the ~26 ms
relay overhead (see .claude/skills/verify/SKILL.md).
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ICNet
    from semanticsegmentationactivelearning_tpu.models.icnet import \
        _resize_bilinear
    from semanticsegmentationactivelearning_tpu.ops import \
        pallas_kernels as pk
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ICNet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.group, args.batch, h, w, 3)).astype(np.float32))

    # free functions usable as flax apply methods (self == module)
    def upto(mdl, x, stage):
        n, hh, ww, _ = x.shape
        x = x.astype(mdl.dtype)
        f1 = mdl.branch1_3(
            mdl.branch1_2(mdl.branch1_1(x, False), False), False)
        if stage == "branch1":
            return jnp.sum(f1.astype(jnp.float32))
        x_half = _resize_bilinear(x, (hh // 2, ww // 2))
        if stage == "resize_half":
            return (jnp.sum(f1.astype(jnp.float32))
                    + jnp.sum(x_half.astype(jnp.float32)))
        f2 = mdl.stem(x_half, False)
        if stage == "stem":
            return (jnp.sum(f1.astype(jnp.float32))
                    + jnp.sum(f2.astype(jnp.float32)))
        f3 = _resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2))
        f3 = mdl.tail(f3, False)
        if stage == "tail":
            return (jnp.sum(f1.astype(jnp.float32))
                    + jnp.sum(f3.astype(jnp.float32)))
        fused16, _ = mdl.cff1(f3, f2, False)
        fused8, _ = mdl.cff2(fused16, f1, False)
        if stage == "cff":
            return jnp.sum(fused8.astype(jnp.float32))
        up4 = _resize_bilinear(fused8, (hh // 4, ww // 4))
        cls4 = mdl.classifier(up4.astype(jnp.float32))
        return jnp.sum(cls4)

    def timed(fn, tag, prev):
        f = jax.jit(fn)
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
    for st in ("branch1", "resize_half", "stem", "tail", "cff",
               "head"):
        def fn(v, imgs, st=st):
            return jax.lax.map(
                lambda im: model.apply(
                    v, im, st, method=upto), imgs)
        prev = timed(fn, st, prev)

    def full(v, imgs):
        return jax.lax.map(
            lambda im: model.fused_score(v, im, "entropy",
                                         use_pallas=True), imgs)
    timed(full, "full(fused_score)", prev)


if __name__ == "__main__":
    sys.exit(main())
