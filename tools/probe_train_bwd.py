#!/usr/bin/env python
"""Backward-pass attribution for the ENet train step on the real TPU.

Times value_and_grad of sum-of-features at cumulative model prefixes
(training=True, dropout + batch-stats mutation, like the real step):

  front      Initial + stage 1            (return_stage1)
  stage4     + stage 2/3 + stage 4        (return_stage4)
  prelogits  + stage 5                    (return_pre_logits)
  full       + Final transpose conv       (logits)

plus two step variants isolating the step-minus-grad gap seen in
tools/probe_train_stages.py (~32 ms):

  step_noaux  the real train-step math but returning only (state, loss)
  step_nocm   full aux minus the confusion matrix / argmax

Deltas between prefixes attribute forward+backward cost per segment so
kernel/layout work lands where the time is.
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

    import jax
    import jax.numpy as jnp
    import optax

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import losses, metrics
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    num_classes = 19
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = ENet(num_classes=num_classes, dtype=dtype)
    hparams = {
        "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
        "learning_rate": 5e-4, "learning_rate_decay": 0.0,
        "optimizer": {"type": "Adam",
                      "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    }
    optimizer = optim.make_optimizer(hparams)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               (h, w))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.batch, h, w, 3)).astype(np.float32))
    label = jnp.asarray(rng.integers(
        0, num_classes, size=(args.batch, h, w)).astype(np.int32))
    mask = jnp.ones((args.batch, h, w), jnp.float32)
    key = jax.random.PRNGKey(1)

    def make_prefix_grad(**flags):
        def loss_fn(params, stats, image, key):
            out, mutated = model.apply(
                {"params": params, "batch_stats": stats}, image,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"], **flags)
            leaves = jax.tree.leaves(out)
            val = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            stats_sum = jax.tree.reduce(
                lambda a, b: a + jnp.sum(b), mutated["batch_stats"], 0.0)
            return val + 0.0 * stats_sum

        def fn(state, image, key):
            val, grads = jax.value_and_grad(loss_fn)(
                state.params, state.batch_stats, image, key)
            gn = jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.square(
                    b.astype(jnp.float32))), grads, 0.0)
            return val + gn

        return fn

    def make_step(with_aux: bool, with_confmat: bool):
        def loss_fn(params, stats, image, key):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": stats}, image,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            loss = losses.masked_softmax_cross_entropy(
                label, logits, mask, num_classes, 0.0, 0.0)
            cost = loss + losses.regularization_loss(params, 0.0, 2e-4)
            return cost, (loss, logits, mutated["batch_stats"])

        def step(state, image, key):
            (cost, (loss, logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       image, key)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            if not with_aux:
                return new_state, loss
            if with_confmat:
                pred = jnp.argmax(logits, axis=-1)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask)
            else:
                cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            return new_state, {"loss": loss, "cost": cost,
                               "confusion": cm}

        return step

    def timed(fn, tag, donate=False):
        f = jax.jit(fn, donate_argnums=(0,) if donate else ())
        t0 = time.time()
        out = f(state, image, key)
        np.asarray(jax.tree.leaves(out)[-1]).sum()
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(jax.tree.leaves(f(state, image, key))[-1]).sum()
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(jax.tree.leaves(f(state, image, key))[-1]).sum()
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    r = {}
    r["front"] = timed(make_prefix_grad(return_stage1=True), "grad front")
    r["stage4"] = timed(make_prefix_grad(return_stage4=True),
                        "grad stage4")
    r["prelogits"] = timed(make_prefix_grad(return_pre_logits=True),
                           "grad prelogits")
    r["full"] = timed(make_prefix_grad(), "grad full")

    def run_step(step, tag):
        f = jax.jit(step)
        t0 = time.time()
        s, aux = f(state, image, key)
        np.asarray(jax.tree.leaves(aux)[-1]).sum()
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            s, aux = f(s, image, key)
            np.asarray(jax.tree.leaves(aux)[-1]).sum()
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    r["step_noaux"] = run_step(make_step(False, False), "step noaux")
    r["step_nocm"] = run_step(make_step(True, False), "step nocm")
    r["step_full"] = run_step(make_step(True, True), "step full")

    log("--- fwd+bwd attribution (deltas) ---")
    log(f"  front (Initial+stage1):   {r['front']:.1f} ms")
    log(f"  stage2/3+4:               {r['stage4'] - r['front']:.1f} ms")
    log(f"  stage5:                   "
        f"{r['prelogits'] - r['stage4']:.1f} ms")
    log(f"  Final deconv:             {r['full'] - r['prelogits']:.1f} ms")
    log("--- step variants ---")
    log(f"  noaux vs nocm vs full: {r['step_noaux']:.1f} / "
        f"{r['step_nocm']:.1f} / {r['step_full']:.1f} ms")
    print({k: round(v, 1) for k, v in r.items()})


if __name__ == "__main__":
    main()
