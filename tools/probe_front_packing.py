#!/usr/bin/env python
"""Sized experiment: can a DIFFERENT packing beat the front kernel's
W-packing and open the >=400 img/s axis? (PERF.md §1 closed the
*scheduling* axis with the measured Mosaic floor; this probe closes —
or opens — the *packing* axis. Round-4 verdict item #5.)

The arithmetic being tested. The front's real channel counts are
C = 16..64; the v5e MXU wants BOTH matmul contraction (K) and output
(N) dims ~128. The candidate packings:

  W-pack (shipped)   K = N = P*C = 128 by packing P spatial columns;
                     conv column taps phase-mix inside the lifted
                     kernels, so only ~1/P of issued MACs are useful.
  tap-dense K        im2col-style: K = 9*C (taps dense in K, useful
                     fraction ~1) — but then N = C = 16..64 lanes, so
                     the MXU's 128-wide output side idles 128/C of the
                     time: the SAME tax moved from K to N.
  2-row x 4-col      rows into the packed dim: per image row-pair the
                     matmul row count halves while the (dr, dj) lifted
                     tap groups stay 9 — issued MACs are IDENTICAL to
                     P=8 (9 * Wq/4 * 128^2 per row-pair either way);
                     only the VPU shift mix changes, and the measured
                     floor already shows the VPU interleave is fully
                     overlapped (probe_mosaic_floor: chain 5.30 ms vs
                     chain+prelu 5.34).

So every repacking either keeps the 1/P tax (moved or not) or keeps
issued MACs constant — UNLESS the MXU runs narrow-N streams at better
than N/128 efficiency, which is the one empirical question left. This
probe measures it: equal USEFUL work issued as

  base    the shipped structure: M matmuls [R,128]x[128,128] bf16
          dependent chain (1/8 useful density in the lifted kernels)
  nside   tap-dense-K structure: M matmuls [8R,128]x[128,16] chains
          (dense K, narrow N; 8x the rows because spatial positions
          stay unpacked in sublanes)

Counting: per conv layer the W-pack issues 9 tap-matmuls [R,128]x
[128,128] (issued 9*R*128^2, useful 1/8 of that); the tap-dense form
issues ONE [8R,128]x[128,16] matmul (issued 8R*128*16 = R*128^2, all
useful) — 9x fewer issued MACs. It wins IF the MXU runs the narrow-N
(16-lane) stream at better than 1/9 of the wide stream's rate; the
expectation is ~1/8 (N=16 fills 16/128 output lanes), i.e. parity at
best, before paying the real im2col operand rebuild (modeled here by
a generous single broadcast per layer).

If nside's per-useful-FLOP wall clock >= base's, the packing axis is
CLOSED by measurement + arithmetic: >=400 img/s needs lower precision
(int8/fp8 front) or an algorithmic change (channel widening), not a
repacking. Run on the real TPU:
    python tools/probe_front_packing.py
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512,
                    help="packed matmul rows per tile (base mode); "
                         "nside uses 8x this")
    ap.add_argument("--m", type=int, default=108,
                    help="tap-matmuls per tile for base (layers x 9 "
                         "taps); nside runs m//9 dense matmuls")
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--modes", default="base,nside")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    R, M, T, G = args.rows, args.m, args.tiles, args.group

    layers = max(1, M // 9)
    # equal LAYER count, hence equal USEFUL work:
    #   base:  layers x 9 tap-matmuls [R,128]x[128,128], useful 1/8
    #   nside: layers x 1 dense matmul [8R,128]x[128,16], useful 1
    # (per layer both compute 8R outputs x 16 ch x 9 taps x 16 cin)
    useful = 2.0 * layers * 9 * R * 128 * 128 / 8 * T
    log(f"device={jax.devices()[0]}; {layers} layers/tile, useful "
        f"{useful / 1e9:.0f} GFLOP/dispatch-call, x{G} per dispatch")

    def base_kernel(a_ref, w_ref, out_ref):
        cur = a_ref[0]
        for _ in range(layers * 9):
            t = jnp.dot(cur, w_ref[...],
                        preferred_element_type=jnp.float32)
            cur = t.astype(a_ref.dtype)
        out_ref[0] = jnp.full((8, 128), jnp.sum(cur.astype(jnp.float32)),
                              jnp.float32)

    def nside_kernel(a_ref, w_ref, out_ref):
        # dense-K narrow-N chain: [8R,128] x [128,16] -> [8R,16];
        # the next layer's im2col re-widens K by taps — modeled here
        # as a single broadcast back to 128 lanes (generous to nside:
        # the real im2col pays 9 shifted lane placements per layer)
        cur = a_ref[0]
        for _ in range(layers):
            t = jnp.dot(cur, w_ref[...],
                        preferred_element_type=jnp.float32)  # [8R,16]
            cur = jnp.tile(t, (1, 8)).astype(a_ref.dtype)    # [8R,128]
        out_ref[0] = jnp.full((8, 128), jnp.sum(cur.astype(jnp.float32)),
                              jnp.float32)

    rng = np.random.default_rng(0)
    results = {}
    for mode in args.modes.split(","):
        rows = R if mode == "base" else 8 * R
        ncols = 128 if mode == "base" else 16
        a = jnp.asarray(rng.normal(size=(G, T, rows, 128)) / 16.0
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(128, ncols)) / 16.0
                        ).astype(jnp.bfloat16)
        kern = base_kernel if mode == "base" else nside_kernel
        f = pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, ncols), lambda i: (0, 0),
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
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(jf(a, w))
        dt = (time.time() - t0) / args.iters / G * 1e3
        tf = useful / (dt / 1e3) / 1e12
        results[mode] = dt
        log(f"  {mode}: {dt:.2f} ms/call -> {tf:.1f} useful TFLOP/s")

    if "base" in results and "nside" in results:
        verdict = ("nside SLOWER or equal -> packing axis CLOSED"
                   if results["nside"] >= 0.95 * results["base"]
                   else "nside FASTER -> tap-dense-K packing has "
                        "headroom")
        log(f"--- {verdict} (base {results['base']:.2f} ms vs nside "
            f"{results['nside']:.2f} ms at equal useful work) ---")
    return 0


if __name__ == "__main__":
    sys.exit(main())
