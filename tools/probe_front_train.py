#!/usr/bin/env python
"""Sub-block fwd+bwd attribution for the ENet FRONT in training mode.

tools/probe_train_bwd.py put ~67 ms of the ~166 ms batch-8 512x1024
train step in Initial+stage1 (grad prefixes). This probe splits that
across the three structural pieces by timing value_and_grad of
sum-of-outputs on cumulative standalone chains:

  ini     Initial                      @ [B,512,1024,3] -> [B,256,512,16]
  b10     + Bottleneck1_0 (downsample) -> [B,128,256,64]
  stage1  + 4x Bottleneck              -> [B,128,256,64]

Training semantics match the real step: BN batch statistics (mutable
batch_stats) and spatial dropout rngs are threaded.
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import blocks
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    class Front(nn.Module):
        upto: str
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, training: bool):
            x = blocks.Initial(16, dtype=self.dtype,
                               name="Initial")(x, training)
            if self.upto == "ini":
                return x
            x, sw = blocks.BottleneckDownsample(
                64, drop_rate=0.01, dtype=self.dtype,
                name="Bottleneck1_0")(x, training)
            if self.upto == "b10":
                return x
            for k in range(1, 5):
                x = blocks.Bottleneck(
                    64, drop_rate=0.01, dtype=self.dtype,
                    name=f"Bottleneck1_{k}")(x, training)
            return x

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.batch, h, w, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def timed(upto):
        model = Front(upto=upto, dtype=dtype)

        @jax.jit
        def init(key):
            return model.init({"params": key,
                               "dropout": jax.random.PRNGKey(0)},
                              jnp.zeros((1, h, w, 3), jnp.float32),
                              training=True)

        variables = init(jax.random.PRNGKey(0))
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def loss_fn(params, image, key):
            out, mutated = model.apply(
                {"params": params, "batch_stats": stats}, image,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            ssum = jax.tree.reduce(lambda a, b: a + jnp.sum(b),
                                   mutated["batch_stats"], 0.0)
            return jnp.sum(out.astype(jnp.float32)) + 0.0 * ssum

        @jax.jit
        def fn(params, image, key):
            val, grads = jax.value_and_grad(loss_fn)(params, image, key)
            gn = jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.square(
                    b.astype(jnp.float32))), grads, 0.0)
            return val + gn

        t0 = time.time()
        np.asarray(fn(params, image, key))
        log(f"  {upto}: compile+first {time.time() - t0:.1f}s")
        np.asarray(fn(params, image, key))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(fn(params, image, key))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {upto}: {dt:.1f} ms")
        return dt

    r = {}
    for upto in ("ini", "b10", "stage1"):
        r[upto] = timed(upto)
    log("--- deltas ---")
    log(f"  Initial:        {r['ini']:.1f} ms")
    log(f"  Bottleneck1_0:  {r['b10'] - r['ini']:.1f} ms")
    log(f"  B1_1..B1_4:     {r['stage1'] - r['b10']:.1f} ms")
    print({k: round(v, 1) for k, v in r.items()})


if __name__ == "__main__":
    main()
