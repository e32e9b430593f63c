#!/usr/bin/env python
"""Per-stage cost probe for the KERNELIZED scoring path on the real
TPU: cumulative prefixes of (front kernel -> XLA stage2 -> stage3 ->
stage4 -> decoder kernel), each jitted separately and synced by
fetching a small reduction. Complements tools/probe_score_stages.py
(which times the plain flax forward).
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import pallas_kernels as pk
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

    def upto(v, img, stage):
        packed_f = pk.pack_enet_front_w(v)
        x1, mask = pk.fused_front_stage1_w(img, packed_f,
                                           out_dtype=jnp.bfloat16)
        if stage == "front":
            return jnp.sum(x1.astype(jnp.float32)) + jnp.sum(
                mask.astype(jnp.float32))
        packed_m, meta = pk.pack_enet_mid_w(v)
        y, sw2 = pk.fused_mid_stage23_w(x1, packed_m, meta,
                                        out_dtype=jnp.bfloat16)
        if stage == "mid":
            return (jnp.sum(y.astype(jnp.float32))
                    + jnp.sum(sw2.astype(jnp.float32)))
        packed_t = pk.pack_enet_tail(v, 19)
        return jnp.sum(pk.fused_tail_entropy_score(
            y, sw2, mask, packed_t, 19))

    def full(v, img):
        return jnp.sum(model.fused_score(v, img, "entropy",
                                         use_pallas=True))

    def timed(fn, tag, prev):
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(f(variables, image))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(variables, image))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, image))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms (delta {dt - prev:.1f})")
        return dt

    prev = 0.0
    for st in ("front", "mid", "tail"):
        prev = timed(lambda v, im, st=st: upto(v, im, st), st, prev)
    timed(full, "full(fused_score)", prev)


if __name__ == "__main__":
    sys.exit(main())
