#!/usr/bin/env python
"""Per-stage cost probe for the ENet scoring forward on the real TPU.

Times cumulative prefixes of the scoring forward (each jitted
separately, synced by fetching a small reduction — through the axon
relay ``block_until_ready`` does not sync, see CLAUDE.md) and reports
per-stage deltas. Also dumps the compiled memory analysis of the full
fused score step so layout/padding blowups are visible.

Usage: python tools/probe_score_stages.py [--batch 16] [--hw 1024x2048]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


STAGES = ["initial", "stage1", "stage2", "stage3", "stage4", "stage5",
          "tail"]


def forward_upto(mdl, x, upto: str):
    """Replicates ENet.__call__ structure (models/enet.py:104-135) as
    cumulative prefixes; returns a tiny reduction to minimize fetch."""
    import jax.numpy as jnp

    h = mdl.Initial_(x, False)
    if upto == "initial":
        return jnp.sum(h, dtype=jnp.float32)
    h, sw1 = mdl.Bottleneck1_0(h, False)
    for b in mdl.stage1:
        h = b(h, False)
    if upto == "stage1":
        return jnp.sum(h, dtype=jnp.float32)
    h, sw2 = mdl.Bottleneck2_0(h, False)
    for b in mdl.stage2:
        h = b(h, False)
    if upto == "stage2":
        return jnp.sum(h, dtype=jnp.float32)
    for b in mdl.stage3:
        h = b(h, False)
    if upto == "stage3":
        return jnp.sum(h, dtype=jnp.float32)
    h = mdl.Bottleneck4_0(h, sw2, False)
    for b in mdl.stage4:
        h = b(h, False)
    if upto == "stage4":
        return jnp.sum(h, dtype=jnp.float32)
    h = mdl.Bottleneck5_0(h, sw1, False)
    h = mdl.Bottleneck5_1(h, False)
    if upto == "stage5":
        return jnp.sum(h, dtype=jnp.float32)
    raise ValueError(upto)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--stages", default=None,
                    help="comma list; default all")
    ap.add_argument("--memory", action="store_true",
                    help="print compiled memory analysis of full score")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ENet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, x0,
        training=False))(jax.random.PRNGKey(0))
    log(f"init: {time.time() - t0:.1f}s  device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.batch, h, w, 3)).astype(np.float32))

    def timed(fn, tag):
        t0 = time.time()
        np.asarray(fn(variables, image))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(fn(variables, image))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(fn(variables, image))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    wanted = (args.stages.split(",") if args.stages else STAGES)
    results = {}
    prev = 0.0
    for st in STAGES:
        if st not in wanted:
            continue
        if st == "tail":
            fn = jax.jit(lambda v, x: model.fused_score(
                v, x, "entropy", use_pallas=True))
        else:
            fn = jax.jit(lambda v, x, st=st: model.apply(
                v, x, st, method=functools.partial(forward_upto)))
        dt = timed(fn, st)
        results[st] = dt
        log(f"  -> delta {st}: {dt - prev:.1f} ms")
        prev = dt

    log("summary (cumulative ms): " + ", ".join(
        f"{k}={v:.1f}" for k, v in results.items()))

    if args.memory:
        fn = jax.jit(lambda v, x: model.fused_score(
            v, x, "entropy", use_pallas=True))
        mem = fn.lower(variables, image).compile().memory_analysis()
        log(f"memory analysis: {mem}")


if __name__ == "__main__":
    sys.exit(main())
