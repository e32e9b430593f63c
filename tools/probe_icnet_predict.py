#!/usr/bin/env python
"""ICNet serving-path A/B: CFF2-fused predict kernel vs composition.

The scoring twin of the CFF2+head fusion measured 63.3 -> 55.9
ms/batch (docs/PERF.md); this probe supplies the PREDICT numbers for
the same change — ``ICNet.fused_predict`` with ``fuse_cff2`` on
(cff2+head+argmax in one Pallas kernel) vs off (stem-kernel prefix +
XLA CFF2 + head8 kernel) vs the plain XLA forward+argmax the fallback
path serves.

Timing discipline (CLAUDE.md): device-resident input stack (fresh
uploads measure the relay's ~36 MB/s, not the model), grouped
``lax.map`` over --group micro-batches per dispatch (~26 ms relay
floor amortized), sync by fetching a small int32 histogram of the
labels rather than the [N,H,W] plane (128 MB/batch through the relay
would dominate everything).

Run: python tools/probe_icnet_predict.py [--batch 16 --hw 1024x2048]
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
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    nc = 19
    model = ICNet(nc, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, x0, training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(
        args.group, args.batch, h, w, 3)).astype(np.float32))
    imgs = jax.block_until_ready(imgs)  # device-resident before timing

    def build(mode):
        def one(v, img):
            if mode == "xla":
                logits = model.apply(v, img.astype(jnp.bfloat16),
                                     training=False)
                labels = jnp.argmax(logits, axis=-1)
            else:
                labels = model.fused_predict(
                    v, img, use_pallas=True, fuse_stem=True,
                    fuse_cff2=(mode == "fused"))
            # small fetch: per-class histogram (19 int32s)
            oh = jax.nn.one_hot(labels.reshape(-1), nc, dtype=jnp.int32)
            return jnp.sum(oh, axis=0)

        return jax.jit(lambda v, a: jax.lax.map(
            lambda im: one(v, im), a))

    results = {}
    hists = {}
    for mode in ("xla", "composed", "fused"):
        f = build(mode)
        t0 = time.time()
        try:
            hists[mode] = np.asarray(f(variables, imgs))
        except Exception as e:  # keep probing the other modes
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

    # histogram cross-check: kernel vs composed label agreement on the
    # same inputs (bf16 ties may flip a handful of pixels)
    if "fused" in hists and "composed" in hists:
        tot = args.group * args.batch * h * w
        dd = np.abs(hists["fused"].astype(np.int64)
                    - hists["composed"].astype(np.int64)).sum()
        log(f"  fused-vs-composed histogram L1: {dd}/{tot} "
            f"({dd / tot:.2e})")
        results["hist_l1_frac"] = float(dd / tot)
    print(results)


if __name__ == "__main__":
    sys.exit(main())
