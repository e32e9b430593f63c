#!/usr/bin/env python
"""Micro-probe for the ICNet SharedStem on the real TPU: times each
sub-op (conv1_1 s2, conv1_2, conv1_3, maxpool, res2 x3, res3_1)
standalone by applying bare ConvBN / ResBottleneck modules against the
matching SharedStem param subtrees, plus the branch-3 resize+tail for
context. Isolated timings ignore XLA cross-op fusion, so treat them as
a ranking, not an exact decomposition. Grouped over ``--group``
micro-batches per dispatch to amortize the ~26 ms relay overhead.
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
    from semanticsegmentationactivelearning_tpu.models.icnet import (
        ConvBN, ResBottleneck)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ICNet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    stem_p = variables["params"]["SharedStem"]
    stem_s = variables["batch_stats"]["SharedStem"]
    log(f"init done, device={jax.devices()[0]}")

    def sub_vars(name):
        return {"params": stem_p[name], "batch_stats": stem_s[name]}

    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timed(fn, tag, *shapes):
        xs = tuple(jnp.asarray(
            rng.uniform(size=(args.group, args.batch) + s)
            .astype(np.float32)).astype(bf16) for s in shapes)
        f = jax.jit(lambda *a: jax.lax.map(
            lambda row: jnp.sum(fn(*row).astype(jnp.float32)), a))
        t0 = time.time()
        np.asarray(f(*xs))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(*xs))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(*xs))
        dt = (time.time() - t0) / args.iters / args.group * 1e3
        log(f"  {tag}: {dt:.1f} ms/batch")
        return dt

    h2, w2 = h // 2, w // 2

    timed(lambda x: ConvBN(32, 3, strides=2, dtype=bf16).apply(
        sub_vars("conv1_1"), x, False),
        "conv1_1 (s2, 3->32)", (h2, w2, 3))
    timed(lambda x: ConvBN(32, 3, dtype=bf16).apply(
        sub_vars("conv1_2"), x, False),
        "conv1_2 (32->32)", (h2 // 2, w2 // 2, 32))
    timed(lambda x: ConvBN(64, 3, dtype=bf16).apply(
        sub_vars("conv1_3"), x, False),
        "conv1_3 (32->64)", (h2 // 2, w2 // 2, 32))

    import flax.linen as nn
    timed(lambda x: nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding="SAME"),
          "maxpool 3x3/s2", (h2 // 2, w2 // 2, 64))

    x8 = (h2 // 4, w2 // 4)
    timed(lambda x: ResBottleneck(128, dtype=bf16).apply(
        sub_vars("res2_1"), x, False),
        "res2_1 (64->128)", (*x8, 64))
    timed(lambda x: ResBottleneck(128, dtype=bf16).apply(
        sub_vars("res2_2"), x, False),
        "res2_2 (128)", (*x8, 128))
    timed(lambda x: ResBottleneck(256, strides=2, dtype=bf16).apply(
        sub_vars("res3_1"), x, False),
        "res3_1 (s2, ->256)", (*x8, 128))


if __name__ == "__main__":
    sys.exit(main())
