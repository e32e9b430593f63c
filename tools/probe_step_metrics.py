#!/usr/bin/env python
"""In-step A/B of the train-step metrics pass on real hardware.

The XLA argmax+matmul confusion matrix is ~free in ISOLATION (31.9 ms
vs a 30.6 ms fetch floor at batch 8 512x1024), yet
tools/probe_train_bwd.py measured +23 ms when it runs inside the train
step — a scheduling/materialization artifact, not op cost. This probe
times the REAL train step (losses + Adam + aux) with the metrics pass
swapped between:

  none     confusion = zeros (floor)
  xla      jnp.argmax + metrics.confusion_matrix (one-hot matmuls),
           applied to the logits aux returned by value_and_grad
  scatter  jnp.argmax + scatter-add bincount (use_matmul=False)
  aux      same math as xla but computed INSIDE loss_fn, next to the
           forward that produces the logits, returned via has_aux —
           tests whether keeping the consumer in the forward graph
           (where the logits are a live bwd residual anyway) restores
           the fusion/scheduling the post-grad placement loses
  predonly argmax in-step, no one-hot loop (isolates the cost of a
           second logits consumer from the loop itself)
  labelcm  one-hot loop in-step on (label, label) with no logits
           dependency (isolates the loop's in-step cost)
  barrier  argmax -> int8 pred forced through an optimization_barrier
           before the loop, so the loop's layout choices cannot
           propagate into the logits buffer
  bf16     barrier variant with the argmax over a bf16 logits view
  flatadam the xla metrics path with the optimizer wrapped in
           optax.flatten (ONE fused buffer instead of ~300 leaves)

Negative result for the record (2026-08-19, TPU v5e): a Pallas fused
argmax+confusion kernel (one-hots built in VMEM, [C,T]@[T,C] MXU
contraction, no lane-padded HBM one-hot planes) measured 54.8 ms
ISOLATED vs XLA's 31.9, and 178.2 ms in-step vs XLA's 164.2 / floor
141.5 — strictly worse on both counts, so it was removed rather than
shipped (the [T,128-padded-C] logits read dominates and XLA already
fuses everything downstream of it).
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
    ap.add_argument("--variants", default="none,xla,aux")
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

    def make_step(variant: str):
        # "flatadam" A/Bs the optimizer applied over ONE flat buffer
        # (optax.flatten) against per-leaf Adam: ~300 tiny param leaves
        # cost ~2-4 unfusable kernel launches each inside the step.
        opt = (optax.flatten(optimizer) if variant == "flatadam"
               else optimizer)
        state0 = (state.replace(opt_state=opt.init(state.params))
                  if variant == "flatadam" else state)

        def loss_fn(params, stats, image, key):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": stats}, image,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            if variant == "lbarrier":
                # force ONE materialization of the logits plane and
                # feed every consumer (CE fwd/bwd, argmax) from it, so
                # XLA cannot choose per-consumer relayouts/recomputes
                logits = jax.lax.optimization_barrier(logits)
            loss = losses.masked_softmax_cross_entropy(
                label, logits, mask, num_classes, 0.0, 0.0)
            cost = loss + losses.regularization_loss(params, 0.0, 2e-4)
            if variant == "aux":
                pred = jnp.argmax(logits, axis=-1)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask)
            else:
                cm = None
            return cost, (loss, logits, mutated["batch_stats"], cm)

        def step(state, image, key):
            ((cost, (loss, logits, new_stats, aux_cm)),
             grads) = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       image, key)
            updates, new_opt = opt.update(grads, state.opt_state,
                                          state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            if variant == "none":
                cm = jnp.zeros((num_classes, num_classes), jnp.int32)
            elif variant in ("xla", "flatadam", "lbarrier"):
                pred = jnp.argmax(logits, axis=-1)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask)
            elif variant == "scatter":
                pred = jnp.argmax(logits, axis=-1)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask, use_matmul=False)
            elif variant == "aux":
                cm = aux_cm
            elif variant == "predonly":
                # argmax in-step, NO one-hot loop: isolates the cost of
                # the second logits consumer vs the matmul loop itself
                pred = jnp.argmax(logits, axis=-1)
                cm = (jnp.zeros((num_classes, num_classes), jnp.int32)
                      .at[0, 0].set(pred.sum().astype(jnp.int32)))
            elif variant == "labelcm":
                # one-hot matmul loop in-step but with NO logits
                # dependency: isolates the loop's in-step cost
                cm = metrics.confusion_matrix(label, label, num_classes,
                                              mask)
            elif variant == "barrier":
                # argmax -> int8 plane forced to materialize via an
                # optimization barrier before the one-hot loop, so any
                # layout/fusion choice for the loop cannot propagate
                # back into the logits buffer
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int8)
                pred = jax.lax.optimization_barrier(pred)
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask)
            elif variant == "bf16":
                # argmax over a bf16 view: halves the plane read; ties
                # broken identically for distinct logits
                pred = jnp.argmax(logits.astype(jnp.bfloat16), axis=-1)
                pred = jax.lax.optimization_barrier(pred.astype(jnp.int8))
                cm = metrics.confusion_matrix(label, pred, num_classes,
                                              mask)
            else:
                raise ValueError(variant)
            return new_state, {"loss": loss, "cost": cost,
                               "confusion": cm}

        return step, state0

    r = {}
    for variant in args.variants.split(","):
        step_fn, state0 = make_step(variant)
        f = jax.jit(step_fn)
        t0 = time.time()
        s, aux = f(state0, image, key)
        np.asarray(aux["confusion"]).sum()
        log(f"  {variant}: compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            s, aux = f(s, image, key)
            np.asarray(aux["confusion"]).sum()
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {variant}: {dt:.1f} ms")
        r[variant] = round(dt, 1)
    print(r)


if __name__ == "__main__":
    main()
