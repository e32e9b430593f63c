#!/usr/bin/env python
"""Time the fused tail kernel (stage4 + stage5 + Final + entropy) in
isolation on the real TPU, sweeping the row-tile ``te`` and the
Final+entropy row-chunk ``fc``. Inputs (stage-3 features, switches,
stage-1 mask) are produced once by the W-packed front+mid kernels, so
the timing isolates the tail. Synced by fetching the scalar scores."""

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
    ap.add_argument("--te", default="8,16")
    ap.add_argument("--fc", default="2,4,8,16")
    ap.add_argument("--upto", default="",
                    help="comma list of truncation points to time "
                         "(b40,s4,b50,b51,fdeconv,full) at the first "
                         "te/fc combo — per-stage attribution")
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

    @jax.jit
    def upstream(v, img):
        packed_f = pk.pack_enet_front_w(v)
        x1, mask1 = pk.fused_front_stage1_w(img, packed_f,
                                            out_dtype=jnp.bfloat16)
        packed_m, meta = pk.pack_enet_mid_w(v)
        y, sw2 = pk.fused_mid_stage23_w(x1, packed_m, meta,
                                        out_dtype=jnp.bfloat16)
        return y, sw2, mask1

    y, sw2, mask1 = jax.block_until_ready(upstream(variables, image))
    log(f"upstream done: y{tuple(y.shape)} sw2{tuple(sw2.shape)}")
    packed_t = pk.pack_enet_tail(variables, 19)

    def timed(te, fc, upto="full"):
        f = jax.jit(lambda v, yy, ss, mm: pk.fused_tail_entropy_score(
            yy, ss, mm, pk.pack_enet_tail(v, 19), 19, te=te, fc=fc,
            upto=upto))
        t0 = time.time()
        r = np.asarray(f(variables, y, sw2, mask1))
        log(f"  te={te} fc={fc} upto={upto}: compile+first "
            f"{time.time() - t0:.1f}s (mean {r.mean():.6f})")
        np.asarray(f(variables, y, sw2, mask1))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, y, sw2, mask1))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  te={te} fc={fc} upto={upto}: {dt:.1f} ms")
        return dt

    tes = [int(v) for v in args.te.split(",")]
    fcs = [int(v) for v in args.fc.split(",")]
    if args.upto:
        prev = 0.0
        for upto in args.upto.split(","):
            dt = timed(tes[0], fcs[0], upto)
            log(f"    delta {upto}: +{dt - prev:.1f} ms")
            prev = dt
        return
    results = {}
    for te in tes:
        for fc in fcs:
            if fc > te:
                continue
            results[(te, fc)] = timed(te, fc)
    best = min(results, key=results.get)
    log(f"best: te={best[0]} fc={best[1]} -> {results[best]:.1f} ms")


if __name__ == "__main__":
    sys.exit(main())
