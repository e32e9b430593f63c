#!/usr/bin/env python
"""Tile-size sweeps on the real TPU: the tail kernel's te (halo is 9
rows, so small te pays ~2x redundant compute) and the front kernel's
tile_q/rc. Isolated timings, relay-synced by fetching the scalar sum."""

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
    ap.add_argument("--tes", default="8,16,32")
    ap.add_argument("--tiles", default="")
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
        log(f"  {tag}: {(time.time() - t0) / args.iters * 1e3:.1f} ms")

    def upto_tail(v, img, te):
        pf = pk.pack_enet_front_w(v)
        x1, mask1 = pk.fused_front_stage1_w(img, pf,
                                            out_dtype=jnp.bfloat16)
        pm, meta = pk.pack_enet_mid_w(v)
        y, sw2 = pk.fused_mid_stage23_w(x1, pm, meta,
                                        out_dtype=jnp.bfloat16)
        pt = pk.pack_enet_tail(v, 19)
        return jnp.sum(pk.fused_tail_entropy_score(
            y, sw2, mask1, pt, 19, te=te))

    for te in (int(t) for t in args.tes.split(",") if t):
        timed(lambda v, im, te=te: upto_tail(v, im, te), f"full te={te}")

    for spec in (s for s in args.tiles.split(",") if s):
        tile, rc = (int(v) for v in spec.split(":"))

        def front_only(v, img, tile=tile, rc=rc):
            pf = pk.pack_enet_front_w(v)
            x1, mask1 = pk.fused_front_stage1_w(
                img, pf, tile_q=tile, rc=rc, out_dtype=jnp.bfloat16)
            return (jnp.sum(x1.astype(jnp.float32))
                    + jnp.sum(mask1.astype(jnp.float32)))
        timed(front_only, f"front tile={tile} rc={rc}")


if __name__ == "__main__":
    sys.exit(main())
