#!/usr/bin/env python
"""Isolate the fixed cost of the tail kernel's pallas_call: same tile
streams and grid as the real kernel, trivial body, with/without the
~41 constant operands — separates DMA-descriptor overhead from
compute. Run on the real TPU."""

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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--h8", type=int, default=128)
    ap.add_argument("--w8", type=int, default=256)
    ap.add_argument("--te", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--nconst", type=int, default=41)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from semanticsegmentationactivelearning_tpu.utils import cli
    cli.enable_compilation_cache()

    n, h8, w8, te = args.batch, args.h8, args.w8, args.te
    grid_h = h8 // te
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(n, h8, w8, 128))
                    .astype(np.float32)).astype(jnp.bfloat16)
    sw = jnp.asarray(rng.normal(size=(n, h8, w8, 64))
                     .astype(np.float32)).astype(jnp.bfloat16)
    m1 = jnp.asarray(rng.normal(size=(n, h8, w8, 256))
                     .astype(np.float32)).astype(jnp.bfloat16)
    # consts shaped like the real pack (mix of rows and matrices)
    consts = []
    for i in range(args.nconst):
        if i % 3 == 0:
            consts.append(jnp.asarray(
                rng.normal(size=(1, 256)).astype(np.float32)))
        elif i % 3 == 1:
            consts.append(jnp.asarray(
                rng.normal(size=(256, 256)).astype(np.float32)))
        else:
            consts.append(jnp.asarray(
                rng.normal(size=(4, 128, 256)).astype(np.float32)))

    def tile_at(ch, offs):
        return pl.BlockSpec(
            (1, te, w8, ch),
            lambda i, j, offs=offs: (
                i, jnp.clip(j + offs, 0, grid_h - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def body(*refs):
        yc = refs[1]
        out = refs[-1]
        i, j = pl.program_id(0), pl.program_id(1)
        out[i, j] = jnp.sum(yc[0].astype(jnp.float32))

    def run(with_consts, tag):
        cs = consts if with_consts else []
        f = jax.jit(lambda y, sw, m1, *cs: pl.pallas_call(
            body,
            grid=(n, grid_h),
            in_specs=[tile_at(128, -1), tile_at(128, 0),
                      tile_at(128, 1),
                      tile_at(64, -1), tile_at(64, 0), tile_at(64, 1),
                      tile_at(256, -1), tile_at(256, 0),
                      tile_at(256, 1)]
            + [const_spec(a) for a in cs],
            out_specs=pl.BlockSpec((n, grid_h), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n, grid_h), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(y, y, y, sw, sw, sw, m1, m1, m1, *cs).sum())
        t0 = time.time()
        np.asarray(f(y, sw, m1, *cs))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(y, sw, m1, *cs))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(y, sw, m1, *cs))
        log(f"  {tag}: {(time.time() - t0) / args.iters * 1e3:.1f} ms")

    run(False, f"9 tile streams, no consts (te={te})")
    run(True, f"9 tile streams + {args.nconst} consts (te={te})")


if __name__ == "__main__":
    sys.exit(main())
