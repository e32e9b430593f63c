#!/usr/bin/env python
"""A/B/C probe: can a W-packed, pure-XLA (autodiff-friendly) training
formulation of the ENet stage-1 bottleneck beat lax.conv?

tools/probe_front_train.py attributes the front's fwd+bwd cost; the
scoring kernels already proved W-packing (space-to-depth along W with
(col_phase, channel) lane layout) removes the low-channel lane-padding
tax for the forward. Training needs autodiff, so instead of Pallas this
probe expresses the SAME logical math as jnp matmuls + free reshapes:

  A standard  flax blocks.Bottleneck chain (lax.conv path)
  B unpacked  convs as 9 shifted [., cin] matmuls (no lax.conv)
  C packed    convs as 9 shifted [., P*cin] @ lifted-kernel matmuls on
              the W-packed layout (pallas_kernels._wpack_conv3 math);
              BN/PReLU run lane-full at P*C channels

All three compute identical values (checked at fp32 before timing);
the probe times value_and_grad of sum-of-outputs, training semantics
(batch-stat BN, no dropout so A/B/C share rng-free math).

Measured (2026-08-19, TPU v5e, batch 8 @128x256 C=64 P=8 bf16, ~28 ms
of relay fetch floor included in each):

  A flax lax.conv    49.7 ms
  B unpacked matmuls 39.9 ms   (~1.8x faster net of the floor)
  C W-packed         79.4 ms

B wins because the shifted matmuls skip XLA's low-channel conv
relayout temps while keeping true-FLOP matmuls. C LOSES in XLA-land —
unlike inside the Pallas scoring kernels — because the lifted
[P*ci, P*co] kernels are block-banded: the MXU multiplies the zero
bands too (P x the FLOPs), which dominates once ci >= 64, and the
pack/unpack reshapes around every 1x1 conv materialize lane-crossing
relayouts that a fused kernel would keep in VMEM. Consequence:
ops/shiftconv.py implements the TRAINING conv path as unpacked shifted
matmuls (variant B), and no packed training module exists.
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
    ap.add_argument("--hw", default="128x256")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--wpack", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import blocks
    from semanticsegmentationactivelearning_tpu.ops.pallas_kernels import (
        _wpack_conv3, _wpack_tile)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    C = args.channels
    P = args.wpack
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    class Chain(nn.Module):
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, training: bool):
            for k in range(args.blocks):
                x = blocks.Bottleneck(C, drop_rate=0.0, dtype=self.dtype,
                                      name=f"B{k}")(x, training)
            return x

    model = Chain(dtype=dtype)

    @jax.jit
    def init(key):
        return model.init({"params": key,
                           "dropout": jax.random.PRNGKey(0)},
                          jnp.zeros((1, h, w, C), jnp.float32),
                          training=True)

    variables = init(jax.random.PRNGKey(0))
    params = variables["params"]
    stats = variables["batch_stats"]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(args.batch, h, w, C))
                     .astype(np.float32))

    # ---- manual building blocks (shared by B and C) ----------------
    def bn_train(x, scale, bias, eps=1e-3, phases=1):
        # batch statistics per LOGICAL channel: packed layouts reduce
        # over the tiled phase axis too
        xf = x.astype(jnp.float32)
        m, ch = xf.shape[0] * xf.shape[1] * xf.shape[2], xf.shape[-1]
        flat = xf.reshape(-1, phases, ch // phases)
        mu = jnp.mean(flat, axis=(0, 1))
        var = jnp.mean(jnp.square(flat), axis=(0, 1)) - jnp.square(mu)
        if phases > 1:
            mu_t = _wpack_tile(mu, phases)
            var_t = _wpack_tile(var, phases)
            scale = _wpack_tile(scale, phases)
            bias = _wpack_tile(bias, phases)
        else:
            mu_t, var_t = mu, var
        y = (xf - mu_t) * (scale / jnp.sqrt(var_t + eps)) + bias
        return y.astype(x.dtype), (mu, var)

    def prelu(x, alpha, phases=1):
        if phases > 1:
            alpha = _wpack_tile(alpha, phases)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)

    def shift_rows(x, dy):
        if dy == 0:
            return x
        pad = [(0, 0)] * x.ndim
        if dy > 0:
            pad[1] = (dy, 0)
            return jnp.pad(x, pad)[:, :x.shape[1]]
        pad[1] = (0, -dy)
        return jnp.pad(x, pad)[:, -dy:]

    def shift_cols(x, dx):
        if dx == 0:
            return x
        pad = [(0, 0)] * x.ndim
        if dx > 0:
            pad[2] = (dx, 0)
            return jnp.pad(x, pad)[:, :, :x.shape[2]]
        pad[2] = (0, -dx)
        return jnp.pad(x, pad)[:, :, -dx:]

    def conv3_unpacked(x, kernel):
        n, hh, ww, cin = x.shape
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = shift_cols(shift_rows(x, -dy), -dx)
                t = jnp.dot(xs.reshape(-1, cin),
                            kernel[dy + 1, dx + 1].astype(x.dtype),
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc.reshape(n, hh, ww, -1).astype(x.dtype)

    def conv3_packed(xp, kernel):
        # xp [N, H, W/P, P*C]; lifted kernels [9, P*cin, P*cout],
        # (dy, dj) row-major with dj in (-1, 0, 1)
        lifted = _wpack_conv3(kernel, P).astype(xp.dtype)
        n, hh, wp, pc = xp.shape
        acc = None
        i = 0
        for dy in (-1, 0, 1):
            xr = shift_rows(xp, -dy)
            for dj in (-1, 0, 1):
                xs = shift_cols(xr, -dj)
                t = jnp.dot(xs.reshape(-1, pc), lifted[i],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
                i += 1
        return acc.reshape(n, hh, wp, pc).astype(xp.dtype)

    def bottleneck_manual(x, p, packed: bool):
        phases = P if packed else 1
        h_ = x

        # 1x1 conv: unpack to logical channels for the matmul, repack
        # (all free row-major reshapes)
        def conv1x1(xx, kern):
            if packed:
                n, hh, wp, pc = xx.shape
                un = xx.reshape(n, hh, wp * P, pc // P)
                y = jnp.dot(un.reshape(-1, un.shape[-1]),
                            kern.astype(xx.dtype),
                            preferred_element_type=jnp.float32)
                y = y.reshape(n, hh, wp * P, -1).astype(xx.dtype)
                return y.reshape(n, hh, wp, P * y.shape[-1])
            y = jnp.dot(xx.reshape(-1, xx.shape[-1]),
                        kern.astype(xx.dtype),
                        preferred_element_type=jnp.float32)
            return y.reshape(*xx.shape[:-1], -1).astype(xx.dtype)

        hh_ = conv1x1(h_, p["proj_conv"]["kernel"][0, 0])
        hh_, _ = bn_train(hh_, p["proj_bn"]["scale"], p["proj_bn"]["bias"],
                          phases=phases)
        hh_ = prelu(hh_, p["proj_prelu"]["alpha"], phases)

        if packed:
            hh_ = conv3_packed(hh_, p["conv"]["kernel"])
        else:
            hh_ = conv3_unpacked(hh_, p["conv"]["kernel"])
        hh_, _ = bn_train(hh_, p["conv_bn"]["scale"], p["conv_bn"]["bias"],
                          phases=phases)
        hh_ = prelu(hh_, p["conv_prelu"]["alpha"], phases)

        hh_ = conv1x1(hh_, p["exp_conv"]["kernel"][0, 0])
        hh_, _ = bn_train(hh_, p["exp_bn"]["scale"], p["exp_bn"]["bias"],
                          phases=phases)
        return prelu(hh_ + x, p["res_prelu"]["alpha"], phases)

    def chain_manual(x, params, packed: bool):
        if packed:
            n, hh, ww, c = x.shape
            x = x.astype(dtype).reshape(n, hh, ww // P, P * c)
        else:
            x = x.astype(dtype)
        for k in range(args.blocks):
            x = bottleneck_manual(x, params[f"B{k}"], packed)
        if packed:
            n, hh, wp, pc = x.shape
            x = x.reshape(n, hh, wp * P, pc // P)
        return x

    # ---- value check at fp32 ----------------------------------------
    if args.dtype == "fp32":
        ref, _ = model.apply({"params": params, "batch_stats": stats},
                             x0, training=True, mutable=["batch_stats"])
        for name, packed in (("B", False), ("C", True)):
            got = chain_manual(x0, params, packed)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            log(f"  variant {name} max|diff| vs flax: {err:.2e}")

    # ---- timing ------------------------------------------------------
    def timed(tag, fn):
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(f(params, x0))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(params, x0))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(params, x0))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    def grad_of(apply_fn):
        def loss(params, x):
            return jnp.sum(apply_fn(params, x).astype(jnp.float32))

        def fn(params, x):
            val, grads = jax.value_and_grad(loss)(params, x)
            return val + jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.square(
                    b.astype(jnp.float32))), grads, 0.0)

        return fn

    def flax_apply(params, x):
        out, _ = model.apply({"params": params, "batch_stats": stats},
                             x, training=True, mutable=["batch_stats"])
        return out

    r = {}
    r["A_flax"] = timed("A flax  fwd+bwd", grad_of(flax_apply))
    r["B_unpacked"] = timed(
        "B unpacked fwd+bwd",
        grad_of(lambda p, x: chain_manual(x, p, False)))
    r["C_packed"] = timed(
        "C packed  fwd+bwd",
        grad_of(lambda p, x: chain_manual(x, p, True)))
    print({k: round(v, 1) for k, v in r.items()})


if __name__ == "__main__":
    main()
