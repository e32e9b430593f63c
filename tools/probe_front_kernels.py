#!/usr/bin/env python
"""Compare the v1 and W-packed (v2) fused front kernels on the real
TPU at production shape, plus the end-to-end fused scoring step with
each. Synced by fetching a small reduction (relay-safe)."""

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
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--rc", type=int, default=16)
    ap.add_argument("--which", default="v1,v2",
                    help="comma list: v1, v2, e2e_v1, e2e_v2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import \
        pallas_kernels as pk
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ENet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, x0,
        training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.batch, h, w, 3)).astype(np.float32))

    def v1(v, img):
        packed = pk.pack_enet_front(v)
        x1, mask = pk.fused_front_stage1(img, packed,
                                         out_dtype=jnp.bfloat16)
        return (jnp.sum(x1.astype(jnp.float32))
                + jnp.sum(mask.astype(jnp.float32)))

    def v2(v, img):
        packed = pk.pack_enet_front_w(v)
        x1, mask = pk.fused_front_stage1_w(
            img, packed, tile_q=args.tile, rc=args.rc,
            out_dtype=jnp.bfloat16)
        return (jnp.sum(x1.astype(jnp.float32))
                + jnp.sum(mask.astype(jnp.float32)))

    def timed(fn, tag):
        f = jax.jit(fn)
        t0 = time.time()
        r = np.asarray(f(variables, image))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s "
            f"(val {r:.6g})")
        np.asarray(f(variables, image))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, image))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    which = args.which.split(",")
    if "v1" in which:
        timed(v1, "front v1")
    if "v2" in which:
        timed(v2, f"front v2 (tile={args.tile}, rc={args.rc})")

    # value cross-check v1 vs v2 on a small slice
    if "check" in which:
        pf1 = pk.pack_enet_front(variables)
        pf2 = pk.pack_enet_front_w(variables)
        a1, m1 = pk.fused_front_stage1(image[:1], pf1,
                                       out_dtype=jnp.float32)
        a2, m2 = pk.fused_front_stage1_w(image[:1], pf2,
                                         tile_q=args.tile, rc=args.rc,
                                         out_dtype=jnp.float32)
        d = float(jnp.max(jnp.abs(a1 - a2)))
        dm = float(jnp.max(jnp.abs(m1 - m2)))
        log(f"  v1-vs-v2 max|dx1|={d:.3e} max|dmask|={dm:.3e}")


if __name__ == "__main__":
    sys.exit(main())
