#!/usr/bin/env python
"""Grouped tile-knob sweep for the W-packed ENet scoring kernels.

Times each kernel in isolation on the real TPU, grouped over several
micro-batches per dispatch (``jax.lax.map``) so the axon relay's ~26 ms
fixed dispatch overhead is amortized out of the per-batch numbers —
the same grouping the AL pool pass uses in production. Complements
``probe_tail_te.py`` (ungrouped, full-pipeline timings): use this one
to pick per-kernel tile defaults, that one to sanity-check the winner
end to end.

The work under test is the reference's pool-scoring forward
(active_learning.py:229-263) as decomposed into the fused front
(image -> stage 1), mid (stages 2/3), and tail (stage 4 + decoder +
entropy) kernels in ops/pallas_kernels.py.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--group", type=int, default=4,
                    help="micro-batches per dispatch")
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--which", default="front,mid,tail",
                    help="comma-set of kernels to sweep")
    ap.add_argument("--front-knobs", default="64:24,64:16,128:24,64:48",
                    help="tile_q:rc pairs")
    ap.add_argument("--mid-knobs", default="32,16,64", help="rc values")
    ap.add_argument("--tail-knobs", default="16:4,16:8,32:4",
                    help="te:fc pairs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import \
        pallas_kernels as pk
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    group, iters = args.group, args.iters
    model = ENet(19, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, x0,
        training=False))(jax.random.PRNGKey(0))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(group, args.batch, h, w, 3)).astype(np.float32))

    # stage inputs for the mid/tail sweeps, computed once with the
    # checked-in default knobs
    @jax.jit
    def mk_inputs(v, imgs):
        def one(img):
            pf = pk.pack_enet_front_w(v)
            x1, mask = pk.fused_front_stage1_w(img, pf,
                                               out_dtype=jnp.bfloat16)
            pm, meta = pk.pack_enet_mid_w(v)
            y, sw2 = pk.fused_mid_stage23_w(x1, pm, meta,
                                            out_dtype=jnp.bfloat16)
            return x1, mask, y, sw2
        return jax.lax.map(one, imgs)

    x1g, maskg, yg, sw2g = mk_inputs(variables, image)
    x1g, maskg, yg, sw2g = (jax.device_put(a) for a in
                            (x1g, maskg, yg, sw2g))
    np.asarray(jnp.sum(yg.astype(jnp.float32)))  # relay sync

    def timed(make_fn, tag):
        f = jax.jit(make_fn)
        try:
            t0 = time.time()
            np.asarray(f(variables))
            c = time.time() - t0
            np.asarray(f(variables))
            t0 = time.time()
            for _ in range(iters):
                np.asarray(f(variables))
            dt = (time.time() - t0) / iters / group * 1e3
            log(f"  {tag}: {dt:.2f} ms/batch (compile {c:.0f}s)")
            return dt
        except Exception as e:  # keep sweeping past a bad knob combo
            log(f"  {tag}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return float("inf")

    which = set(args.which.split(","))

    if "front" in which:
        log("front kernel (tile_q, rc):")
        for spec in (s for s in args.front_knobs.split(",") if s):
            tile_q, rc = (int(v) for v in spec.split(":"))

            def fn(v, tile_q=tile_q, rc=rc):
                pf = pk.pack_enet_front_w(v)

                def one(img):
                    x1, m = pk.fused_front_stage1_w(
                        img, pf, tile_q=tile_q, rc=rc,
                        out_dtype=jnp.bfloat16)
                    return (jnp.sum(x1.astype(jnp.float32))
                            + jnp.sum(m.astype(jnp.float32)))
                return jax.lax.map(one, image)
            timed(fn, f"tile_q={tile_q} rc={rc}")

    if "mid" in which:
        log("mid kernel (rc):")
        for rc in (int(v) for v in args.mid_knobs.split(",") if v):
            def fn(v, rc=rc):
                pm, meta = pk.pack_enet_mid_w(v)

                def one(x1):
                    y, sw = pk.fused_mid_stage23_w(
                        x1, pm, meta, rc=rc, out_dtype=jnp.bfloat16)
                    return (jnp.sum(y.astype(jnp.float32))
                            + jnp.sum(sw.astype(jnp.float32)))
                return jax.lax.map(one, x1g)
            timed(fn, f"rc={rc}")

    if "tail" in which:
        log("tail kernel (te, fc):")
        for spec in (s for s in args.tail_knobs.split(",") if s):
            te, fc = (int(v) for v in spec.split(":"))

            def fn(v, te=te, fc=fc):
                pt = pk.pack_enet_tail(v, 19)

                def one(arg):
                    y, sw2, m1 = arg
                    return pk.fused_tail_entropy_score(
                        y, sw2, m1, pt, 19, te=te, fc=fc)
                return jax.lax.map(one, (yg, sw2g, maskg))
            timed(fn, f"te={te} fc={fc}")


if __name__ == "__main__":
    sys.exit(main())
