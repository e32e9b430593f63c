#!/usr/bin/env python
"""Micro-probe: effective HBM cost of reading low-channel NHWC tensors
on the TPU, to guide layout choices for the scoring front-end.

Times single-dispatch reductions/convs and subtracts the measured null
dispatch overhead (~26ms through the axon relay). Run on the real TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.utils import cli
    cli.enable_compilation_cache()

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device: {dev}")

    def timeit(fn, *args, iters=8):
        f = jax.jit(fn)
        np.asarray(f(*args))  # compile
        np.asarray(f(*args))
        t0 = time.time()
        for _ in range(iters):
            np.asarray(f(*args))
        return (time.time() - t0) / iters * 1e3

    null = timeit(lambda x: jnp.sum(x), jnp.zeros((8, 8), jnp.float32))
    log(f"null dispatch: {null:.1f} ms")

    n, h, w = 16, 1024, 2048
    img = jnp.asarray(rng.uniform(size=(n, h, w, 3)).astype(np.float32))
    cases = {
        "sum image fp32 [16,1024,2048,3] (402MB compact)":
            (lambda x: jnp.sum(x), img),
        "sum image flat [16,1024,6144]":
            (lambda x: jnp.sum(x), img.reshape(n, h, w * 3)),
        "reshape img->[N,H,W*3] + sum":
            (lambda x: jnp.sum(x.reshape(n, h, w * 3)), img),
        "s2d4 pack [N,256,512,48] + sum":
            (lambda x: jnp.sum(
                x.reshape(n, h // 4, 4, w // 4, 4, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // 4, w // 4, 48)), img),
        "sum half bf16 [16,512,1024,16] (256MB compact)":
            (lambda x: jnp.sum(x.astype(jnp.float32)),
             jnp.asarray(rng.uniform(size=(n, 512, 1024, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)),
        "sum quarter bf16 [16,256,512,64] (256MB compact)":
            (lambda x: jnp.sum(x.astype(jnp.float32)),
             jnp.asarray(rng.uniform(size=(n, 256, 512, 64))
                         .astype(np.float32)).astype(jnp.bfloat16)),
        "sum quarter bf16 [16,256,512,16] (64MB compact)":
            (lambda x: jnp.sum(x.astype(jnp.float32)),
             jnp.asarray(rng.uniform(size=(n, 256, 512, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)),
    }
    for name, (fn, arg) in cases.items():
        dt = timeit(fn, arg)
        log(f"{name}: {dt:.1f} ms ({dt - null:.1f} net)")

    # conv variants for the Initial stage
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 13)).astype(np.float32) * .1)

    def conv_nhwc(x, k):
        return jnp.sum(jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
            "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            .astype(jnp.float32))

    dt = timeit(conv_nhwc, img, k)
    log(f"conv 3x3/s2 3->13 NHWC full-res: {dt:.1f} ms ({dt - null:.1f} net)")

    # packed: s2d(4) image then 2x2 conv 48->52 (the packed-initial form)
    img48 = (img.reshape(n, h // 4, 4, w // 4, 4, 3)
             .transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 48)
             .astype(jnp.bfloat16))
    img48 = jax.device_put(np.asarray(img48))
    k48 = jnp.asarray(rng.normal(size=(2, 2, 48, 52))
                      .astype(np.float32) * .1)

    def conv_packed(x, k):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            .astype(jnp.float32))

    dt = timeit(conv_packed, img48, k48)
    log(f"conv 2x2 48->52 on s2d4 quarter grid: {dt:.1f} ms "
        f"({dt - null:.1f} net)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
