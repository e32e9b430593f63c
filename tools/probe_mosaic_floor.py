#!/usr/bin/env python
"""Mosaic scheduling floor for the W-packed kernel matmul streams.

docs/PERF.md §1 claims the residual gap between the front/mid/tail
kernels' ~23-27% issued-FLOP MXU utilization and the packed-domain
ceiling is "Mosaic scheduling, estimated ≤2×" — asserted, not
evidenced. This probe measures the floor directly: a Pallas kernel
that issues the SAME matmul stream shape as the front kernel's
dominant work — [R=1536, 128] x [128, 128] bf16, fp32 accumulate,
VMEM-resident operands, grid (N, H-tiles) like the real kernel — with
three schedules:

  indep   independent matmuls (same input each time): pure MXU issue
          rate, no dependencies — the absolute Mosaic ceiling for this
          shape
  chain   each matmul consumes the previous result (bf16 round-trip),
          the real kernels' dependency structure
  prelu   chain + a PReLU between matmuls, the real kernels' VPU
          interleave

Issued work is sized to the front kernel's measured total (~790 GFLOP
per batch-16 at 1024x2048, PERF.md §1: ~8x the 97 useful GFLOP), so
"achieved ms" compares directly against the front kernel's ~17 ms:
achieved(prelu) is the schedule floor for the real kernel's structure;
the gap front_kernel - prelu is what kernel restructuring could still
recover (DMA/pool/routing overheads).

Run: python tools/probe_mosaic_floor.py [--m 123 --iters 10]
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
    ap.add_argument("--rows", type=int, default=1536)
    ap.add_argument("--m", type=int, default=123,
                    help="matmuls per grid tile")
    ap.add_argument("--tiles", type=int, default=64,
                    help="grid size (front kernel: N=16 x 4 H-tiles)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--group", type=int, default=8,
                    help="pallas_call invocations per dispatch "
                         "(amortizes the ~28 ms relay round-trip)")
    ap.add_argument("--modes", default="indep,chain,prelu")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    R, M, T = args.rows, args.m, args.tiles
    flops = 2.0 * R * 128 * 128 * M * T
    log(f"device={jax.devices()[0]}, issued "
        f"{flops / 1e9:.0f} GFLOP/dispatch "
        f"({T} tiles x {M} matmuls x [{R},128]@[128,128])")

    def kernel(a_ref, w_ref, out_ref, *, mode):
        cur = a_ref[0]
        acc = None
        for _ in range(M):
            t = jnp.dot(cur, w_ref[...],
                        preferred_element_type=jnp.float32)
            if mode == "chain":
                cur = t.astype(a_ref.dtype)
            elif mode == "prelu":
                zero = jnp.zeros((), jnp.float32)
                cur = (jnp.maximum(t, zero)
                       + 0.25 * jnp.minimum(t, zero)).astype(a_ref.dtype)
            else:
                acc = t if acc is None else acc + t
        final = cur.astype(jnp.float32) if mode != "indep" else acc
        out_ref[0] = jnp.full((8, 128), jnp.sum(final), jnp.float32)

    rng = np.random.default_rng(0)
    G = args.group
    # unit-norm-ish so bf16 chains neither overflow nor denormal;
    # distinct per-group inputs so XLA can't CSE the grouped calls
    a = jnp.asarray(rng.normal(size=(G, T, R, 128)).astype(np.float32)
                    / 16.0).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)
                    / 16.0).astype(jnp.bfloat16)

    results = {}
    for mode in args.modes.split(","):
        f = pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
        )
        jf = jax.jit(lambda a, w, f=f: jnp.sum(jax.lax.map(
            lambda ai: jnp.sum(f(ai, w)[:, 0, 0]), a)))
        t0 = time.time()
        np.asarray(jf(a, w))
        log(f"  {mode}: compile+first {time.time() - t0:.1f}s")
        np.asarray(jf(a, w))
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            np.asarray(jf(a, w))
            times.append(time.time() - t0)
        dt = float(np.median(times)) / G
        tflops = flops / dt / 1e12
        results[mode] = (round(dt * 1e3, 2), round(tflops, 1))
        log(f"  {mode}: {dt * 1e3:.2f} ms/call (relay/G amortized) = "
            f"{tflops:.1f} TFLOP/s on issued work")
    print(results)


if __name__ == "__main__":
    sys.exit(main())
