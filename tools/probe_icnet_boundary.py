#!/usr/bin/env python
"""Locate the ICNet CFF in-chain excess: kernel-output boundary or math.

tools/probe_icnet_cff.py measured the CFF segment at ~2.4 ms device
ISOLATED (random-array inputs) while the in-chain attribution
(tools/probe_icnet_kstages.py) charged the same stages +15.9 ms. The
only kernel-boundary input to the segment is ``f1`` (the front+stem
Pallas kernel's branch-1 output, consumed by CFF2's high branch) —
this probe times the full fused chain with ``f1`` swapped between:

  chain    f1 straight from the kernel (the shipped path)
  barrier  f1 through jax.lax.optimization_barrier (blocks layout
           propagation into/out of the custom call)
  extern   f1 fed as a SEPARATE device array input (no custom-call
           boundary at all — the isolated-probe condition)
  nocff2   stop at fused16 (CFF2 and its f1 consumption removed)

If extern ~= nocff2 + ~1.8ms while chain is much slower, the excess is
the f1 boundary relayout and the fix is packed-form consumption of f1,
not a CFF kernel.

Run: python tools/probe_icnet_boundary.py [--batch 16 --hw 1024x2048]
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
        _resize_bilinear)
    from semanticsegmentationactivelearning_tpu.ops import (
        pallas_kernels as pk)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    model = ICNet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.group, args.batch, h, w, 3)).astype(np.float32))
    f1_ext = jnp.asarray(rng.normal(size=(
        args.group, args.batch, h // 8, w // 8, 64)).astype(np.float32)
        / 8.0).astype(jnp.bfloat16)

    packed = pk.pack_icnet_front_stem(variables)

    from semanticsegmentationactivelearning_tpu.models.icnet import (
        _shift1d_clamped)

    def _up2_explicit(x):
        """Exact 2x bilinear (jax.image.resize semantics: half-pixel
        centers, edge clamp) as explicit polyphase taps + interleave —
        no gather/convolution lowering."""
        n, h, w, c = x.shape
        r0 = 0.25 * _shift1d_clamped(x, 1, -1) + 0.75 * x
        r1 = 0.75 * x + 0.25 * _shift1d_clamped(x, 1, 1)
        r = jnp.stack([r0, r1], axis=2).reshape(n, 2 * h, w, c)
        c0 = 0.25 * _shift1d_clamped(r, 2, -1) + 0.75 * r
        c1 = 0.75 * r + 0.25 * _shift1d_clamped(r, 2, 1)
        return jnp.stack([c0, c1], axis=3).reshape(n, 2 * h, 2 * w, c) \
            .astype(x.dtype)

    def seg(v, img, f1_in, mode):
        f1, stem1 = pk.fused_icnet_front_stem(
            img.astype(jnp.bfloat16), packed)
        if mode == "barrier":
            f1 = jax.lax.optimization_barrier(f1)
        elif mode == "extern":
            f1 = f1_in

        def run(m):
            f2 = m.stem.from_pool(stem1, False)
            f3 = _resize_bilinear(f2, (f2.shape[1] // 2,
                                       f2.shape[2] // 2))
            f3 = m.tail(f3.astype(jnp.bfloat16), False)
            fused16, _ = m.cff1(f3, f2, False)
            if mode == "nocff2":
                return fused16
            if mode == "phup":
                # CFF2 open-coded with the explicit polyphase upsample
                # (its low conv/high conv/relu reuse the real params)
                p = v["params"]["CFF2"]
                s = v["batch_stats"]["CFF2"]
                low_up = _up2_explicit(fused16)
                import flax.linen as fnn
                lw = p["low"]["conv"]["kernel"].astype(jnp.bfloat16)
                low_f = jax.lax.conv_general_dilated(
                    low_up, lw, (1, 1), "SAME", rhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                low_f = fnn.BatchNorm(
                    use_running_average=True, momentum=0.9,
                    epsilon=1e-3).apply(
                        {"params": p["low"]["bn"],
                         "batch_stats": s["low"]["bn"]}, low_f)
                hw_ = p["high"]["conv"]["kernel"].astype(jnp.bfloat16)
                high_f = jnp.einsum("nhwc,co->nhwo", f1, hw_[0, 0])
                high_f = fnn.BatchNorm(
                    use_running_average=True, momentum=0.9,
                    epsilon=1e-3).apply(
                        {"params": p["high"]["bn"],
                         "batch_stats": s["high"]["bn"]}, high_f)
                return jax.nn.relu(low_f + high_f)
            fused8, _ = m.cff2(fused16, f1, False)
            return fused8

        out = model.apply(v, method=run)
        return jnp.sum(out.astype(jnp.float32))

    def seg_phase1(v, img):
        """front..cff1, returning (fused16, f1)."""
        f1, stem1 = pk.fused_icnet_front_stem(
            img.astype(jnp.bfloat16), packed)

        def run(m):
            f2 = m.stem.from_pool(stem1, False)
            f3 = _resize_bilinear(f2, (f2.shape[1] // 2,
                                       f2.shape[2] // 2))
            f3 = m.tail(f3.astype(jnp.bfloat16), False)
            fused16, _ = m.cff1(f3, f2, False)
            return fused16

        return model.apply(v, method=run), f1

    def seg_phase2(v, fused16, f1):
        def run(m):
            fused8, _ = m.cff2(fused16, f1, False)
            return fused8

        return jnp.sum(model.apply(v, method=run).astype(jnp.float32))

    def timed(mode):
        if mode == "twomap":
            # two lax.map bodies in ONE jit: each map body is its own
            # scheduling scope, testing whether CFF2's in-chain excess
            # is cross-graph scheduling rather than input boundaries
            def two(v, imgs, _f1s):
                mids = jax.lax.map(
                    lambda im: seg_phase1(v, im), imgs)
                return jax.lax.map(
                    lambda ab: seg_phase2(v, ab[0], ab[1]), mids)

            f = jax.jit(two)
        else:
            f = jax.jit(lambda v, imgs, f1s: jax.lax.map(
                lambda ab: seg(v, ab[0], ab[1], mode), (imgs, f1s)))
        t0 = time.time()
        np.asarray(f(variables, image, f1_ext))
        log(f"  {mode}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(variables, image, f1_ext))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, image, f1_ext))
        dt = (time.time() - t0) / args.iters / args.group * 1e3
        log(f"  {mode}: {dt:.2f} ms/batch")
        return round(dt, 2)

    results = {m: timed(m)
               for m in ("chain", "phup")}
    print(results)


if __name__ == "__main__":
    sys.exit(main())
