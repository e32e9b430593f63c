#!/usr/bin/env python
"""A/B of train-step levers on the REAL (phase-logits) step, v5e.

tools/probe_train_bwd.py attributes the ~98 ms batch-8 512x1024 step
(incl. ~28 ms relay) to: front fwd+bwd ~16 ms device, stages 2/3+4
~17 ms, stage 5 + Final ~11 ms, CE+Adam ~9 ms, argmax+confusion ~16 ms.
This probe measures the candidate levers against that baseline using
``train.steps.make_train_step`` itself (so anything that wins ships by
flipping the same knobs):

  base     make_train_step defaults (phase logits, fp32 logits plane)
  rdots    remat="dots"  (save matmul outputs only; recompute the
           elementwise BN/PReLU/shift temporaries in the backward)
  rall     remat="all"   (recompute the whole forward)
  blg      ENet(fp32_logits=False): bf16 logits plane for CE/argmax
  blg_rdots  both
  nocm     local variant: confusion = zeros (in-step floor; the delta
           vs base is the real in-step metrics cost with phase logits)
  cmaux    local variant: argmax+confusion computed INSIDE loss_fn
           (next to the forward producing the logits)
  cmbf16   local variant: argmax over a bf16 view of the logits behind
           an optimization_barrier int8 pred

Run on the real TPU from the repo root:
    python tools/probe_train_levers.py --variants base,rdots,...
Env/args: --batch 8 --hw 512x1024 --iters 5 --dtype bf16.
Reference hot loop being optimized: train.py:319-341.
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
    ap.add_argument("--variants",
                    default="base,rdots,rall,blg,blg_rdots,nocm,cmaux,"
                            "cmbf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from semanticsegmentationactivelearning_tpu.models import ENet
    from semanticsegmentationactivelearning_tpu.ops import (losses,
                                                            metrics)
    from semanticsegmentationactivelearning_tpu.ops import nn as xops
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_train_step, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    num_classes = 19
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    hparams = {
        "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
        "learning_rate": 5e-4, "learning_rate_decay": 0.0,
        "optimizer": {"type": "Adam",
                      "kwargs": {"beta1": 0.9, "beta2": 0.99}},
        "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
        "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                    "multiscale": False},
    }
    optimizer = optim.make_optimizer(hparams)

    models = {}

    def get_model(fp32_logits=True):
        if fp32_logits not in models:
            models[fp32_logits] = ENet(num_classes=num_classes,
                                       dtype=dtype,
                                       fp32_logits=fp32_logits)
        return models[fp32_logits]

    state = create_train_state(get_model(), optimizer,
                               jax.random.PRNGKey(0), (h, w))
    log(f"init done, device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(
            size=(args.batch, h, w, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(
            0, num_classes, size=(args.batch, h, w)).astype(np.int32)),
        "mask": jnp.ones((args.batch, h, w), jnp.float32),
        "valid": jnp.ones((args.batch,), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    def make_local_step(cm_mode: str):
        """The make_train_step phase-logits math with the metrics pass
        swapped (cm_mode in none|aux|bf16); keep in sync with
        train/steps.py."""
        model = get_model()

        def loss_fn(params, stats, image, label, key):
            (logits, mutated) = model.apply(
                {"params": params, "batch_stats": stats}, image,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"], return_phase_logits=True)
            loss = losses.masked_softmax_cross_entropy(
                label, logits, mask_p, num_classes, 0.0, 0.0)
            cost = loss + losses.regularization_loss(params, 0.0, 2e-4)
            cm = None
            if cm_mode == "aux":
                pred = jnp.argmax(logits, axis=-1)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask_p)
            return cost, (loss, logits, mutated["batch_stats"], cm)

        label_p = xops.s2d_plane(batch["label"], 2)
        mask_p = xops.s2d_plane(batch["mask"], 2)

        def step(state, _batch, key):
            ((cost, (loss, logits, new_stats, aux_cm)),
             grads) = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, _batch["image"],
                label_p, key)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            if cm_mode == "none":
                cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            elif cm_mode == "aux":
                cm = aux_cm
            elif cm_mode == "bf16":
                pred = jnp.argmax(logits.astype(jnp.bfloat16), axis=-1)
                pred = jax.lax.optimization_barrier(
                    pred.astype(jnp.int8))
                cm = metrics.confusion_matrix(label_p, pred,
                                              num_classes, mask_p)
            else:
                raise ValueError(cm_mode)
            return new_state, {"loss": loss, "cost": cost,
                               "confusion": cm}

        return jax.jit(step)

    def build(variant: str):
        if variant == "base":
            return make_train_step(get_model(), optimizer, num_classes,
                                   hparams)
        if variant == "rdots":
            return make_train_step(get_model(), optimizer, num_classes,
                                   hparams, remat="dots")
        if variant == "rall":
            return make_train_step(get_model(), optimizer, num_classes,
                                   hparams, remat="all")
        if variant == "blg":
            return make_train_step(get_model(False), optimizer,
                                   num_classes, hparams)
        if variant == "blg_rdots":
            return make_train_step(get_model(False), optimizer,
                                   num_classes, hparams, remat="dots")
        if variant == "blg_rall":
            return make_train_step(get_model(False), optimizer,
                                   num_classes, hparams, remat="all")
        if variant.startswith("cm"):
            return make_local_step(variant[2:].lstrip("_") or "none")
        if variant == "nocm":
            return make_local_step("none")
        raise ValueError(variant)

    r = {}
    for variant in args.variants.split(","):
        step_fn = build(variant)
        # make_train_step donates arg 0: re-copy state per call
        s = jax.tree.map(jnp.copy, state)
        t0 = time.time()
        s, aux = step_fn(s, batch, key)
        np.asarray(aux["loss"]).sum()
        log(f"  {variant}: compile+first {time.time() - t0:.1f}s")
        times = []
        for _ in range(args.iters):
            s2 = jax.tree.map(jnp.copy, s)
            np.asarray(jax.tree.leaves(s2)[0]).ravel()[:1]  # sync copy
            t0 = time.time()
            s, aux = step_fn(s2, batch, key)
            np.asarray(aux["loss"]).sum()
            times.append(time.time() - t0)
        dt = float(np.median(times)) * 1e3
        r[variant] = round(dt, 1)
        log(f"  {variant}: {dt:.1f} ms (median of {args.iters})")
    print(r)


if __name__ == "__main__":
    main()
