#!/usr/bin/env python
"""ENet serving-path A/B on the real TPU: fully-kernelized predict
chain (W-packed front -> W-packed mid -> in-kernel-argmax tail,
``ENet.fused_predict``) vs the plain XLA forward + argmax.

Also the wide-input compile check for the predict tail: the ICNet
predict kernels hid a scoped-vmem stack OOM at w8=256 that the
small-image CLI tests never reached (fixed by a tile_h clamp, see
docs/PERF.md); this probe compiles and times the ENet tail's predict
mode at the same production shape.

Same timing discipline as tools/probe_icnet_predict.py:
device-resident inputs, grouped ``lax.map`` dispatch, sync via a
small per-class histogram fetch (identical overhead in both modes).

Run: python tools/probe_enet_predict.py [--batch 16 --hw 1024x2048]
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

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    nc = 19
    model = ENet(nc, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(
        args.group, args.batch, h, w, 3)).astype(np.float32))
    imgs = jax.block_until_ready(imgs)

    def build(mode):
        def one(v, img):
            if mode == "xla":
                logits = model.apply(v, img.astype(jnp.bfloat16),
                                     training=False)
                labels = jnp.argmax(logits, axis=-1)
            else:
                labels = model.fused_predict(v, img, use_pallas=True)
            oh = jax.nn.one_hot(labels.reshape(-1), nc, dtype=jnp.int32)
            return jnp.sum(oh, axis=0)

        return jax.jit(lambda v, a: jax.lax.map(
            lambda im: one(v, im), a))

    results = {}
    hists = {}
    for mode in ("xla", "fused"):
        f = build(mode)
        t0 = time.time()
        try:
            hists[mode] = np.asarray(f(variables, imgs))
        except Exception as e:
            log(f"  {mode}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200]}")
            results[mode] = "failed"
            continue
        log(f"  {mode}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(variables, imgs))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(variables, imgs))
        dt = (time.time() - t0) / args.iters / args.group * 1e3
        thr = args.batch / dt * 1e3
        log(f"  {mode}: {dt:.2f} ms/batch = {thr:.1f} img/s")
        results[mode] = {"ms_per_batch": round(dt, 2),
                         "img_per_s": round(thr, 1)}

    if "fused" in hists and "xla" in hists:
        tot = args.group * args.batch * h * w
        dd = np.abs(hists["fused"].astype(np.int64)
                    - hists["xla"].astype(np.int64)).sum()
        log(f"  fused-vs-xla histogram L1: {dd}/{tot} ({dd / tot:.2e})")
        results["hist_l1_frac"] = float(dd / tot)
    print(results)


if __name__ == "__main__":
    sys.exit(main())
