#!/usr/bin/env python
"""Stage cost decomposition for the TRAIN step on the real TPU.

Times, each as its own jitted function synced by fetching a small
scalar through the relay:

  fwd_eval   forward, training=False (the serving/eval cost)
  fwd_train  forward, training=True (batch-stats mutation + dropout)
  loss       fwd_train + masked CE + L2 regularization
  grad       value_and_grad of the loss (the fwd+bwd pair)
  step       the real make_train_step (adds Adam + confusion matrix)
  confmat    confusion matrix alone on random label/pred planes

The deltas attribute the 224 ms/step (batch 8 @ 512x1024, bf16,
tools/bench_train.py round 2) between forward, backward, optimizer and
metrics so optimization effort lands on the real bottleneck. Reference
hot loop being decomposed: one sess.run of train_op + metric updates
(/root/reference/train.py:319-341).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


HPARAMS = {
    "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
    "learning_rate": 5e-4, "learning_rate_decay": 0.0,
    "optimizer": {"type": "Adam",
                  "kwargs": {"beta1": 0.9, "beta2": 0.99}},
    "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
    "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                "multiscale": False},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--model", default="ENet")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--multiscale", action="store_true",
                    help="cascade/multiscale loss heads (the ICNet "
                         "production conf trains with the 1/0.4/0.4 "
                         "cascade guidance)")
    ap.add_argument("--optimizer", default=None,
                    help="override HPARAMS optimizer type (e.g. "
                         "Momentum for the icnet conf)")
    args = ap.parse_args()
    if args.multiscale:
        HPARAMS["softmax"]["multiscale"] = True
    if args.optimizer:
        HPARAMS["optimizer"] = {
            "type": args.optimizer,
            "kwargs": {"momentum": 0.9} if args.optimizer == "Momentum"
            else {}}

    import jax
    import jax.numpy as jnp

    from semanticsegmentationactivelearning_tpu.models import get_model
    from semanticsegmentationactivelearning_tpu.ops import losses, metrics
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, make_train_step, optim)
    from semanticsegmentationactivelearning_tpu.utils import cli

    cli.respect_platform_env()
    cli.enable_compilation_cache()
    h, w = (int(v) for v in args.hw.split("x"))
    num_classes = 19
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = get_model(args.model, num_classes, dtype=dtype)
    optimizer = optim.make_optimizer(HPARAMS)
    multiscale = bool(HPARAMS["softmax"]["multiscale"])
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               (h, w), multiscale=multiscale)
    log(f"init done, device={jax.devices()[0]}, "
        f"multiscale={multiscale}")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        size=(args.batch, h, w, 3)).astype(np.float32))
    label = jnp.asarray(rng.integers(
        0, num_classes, size=(args.batch, h, w)).astype(np.int32))
    mask = jnp.ones((args.batch, h, w), jnp.float32)
    key = jax.random.PRNGKey(1)

    def fwd_eval(state, image, key):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, training=False)
        return jnp.sum(logits)

    def fwd_train(state, image, key):
        logits, mutated = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, training=True, rngs={"dropout": key},
            mutable=["batch_stats"])
        stats = jax.tree.reduce(
            lambda a, b: a + jnp.sum(b), mutated["batch_stats"], 0.0)
        return jnp.sum(logits) + stats

    def loss_fn(params, stats, image, key):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats}, image,
            training=True, multiscale=multiscale, rngs={"dropout": key},
            mutable=["batch_stats"])
        if multiscale:
            _logits, heads = outputs
            loss = losses.multiscale_masked_softmax_cross_entropy(
                label, heads, mask, num_classes, 0.0, 0.0,
                scale_weights=getattr(model, "ms_loss_weights", None))
        else:
            loss = losses.masked_softmax_cross_entropy(
                label, outputs, mask, num_classes, 0.0, 0.0)
        cost = loss + losses.regularization_loss(params, 0.0, 2e-4)
        stats_sum = jax.tree.reduce(
            lambda a, b: a + jnp.sum(b), mutated["batch_stats"], 0.0)
        return cost, stats_sum

    def loss_only(state, image, key):
        cost, stats = loss_fn(state.params, state.batch_stats, image, key)
        return cost + stats

    def grad_fn(state, image, key):
        (cost, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   image, key)
        gn = jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
            grads, 0.0)
        return cost + stats + gn

    def confmat(state, image, key):
        pred = (jnp.sum(image, axis=-1) * 7).astype(jnp.int32) % num_classes
        return jnp.sum(metrics.confusion_matrix(label, pred, num_classes,
                                                mask))

    def timed(fn, tag):
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(f(state, image, key))
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s")
        np.asarray(f(state, image, key))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(f(state, image, key))
        dt = (time.time() - t0) / args.iters * 1e3
        log(f"  {tag}: {dt:.1f} ms")
        return dt

    results = {}
    for tag, fn in [("confmat", confmat), ("fwd_eval", fwd_eval),
                    ("fwd_train", fwd_train), ("loss", loss_only),
                    ("grad", grad_fn)]:
        results[tag] = timed(fn, tag)

    # the real step: donated state, re-fed each iteration
    step = make_train_step(model, optimizer, num_classes, HPARAMS)
    batch = {"image": image, "label": label, "mask": mask,
             "valid": jnp.ones((args.batch,), jnp.float32)}
    t0 = time.time()
    s, aux = step(state, batch, key)
    np.asarray(aux["loss"])
    log(f"  step: compile+first {time.time() - t0:.1f}s")
    s, aux = step(s, batch, key)
    np.asarray(aux["loss"])
    t0 = time.time()
    for _ in range(args.iters):
        s, aux = step(s, batch, key)
        np.asarray(aux["loss"])
    results["step"] = (time.time() - t0) / args.iters * 1e3
    log(f"  step: {results['step']:.1f} ms")

    log("--- attribution ---")
    log(f"  forward (train mode):   {results['fwd_train']:.1f} ms")
    log(f"  backward (grad-fwd):    "
        f"{results['grad'] - results['fwd_train']:.1f} ms")
    log(f"  loss overhead:          "
        f"{results['loss'] - results['fwd_train']:.1f} ms")
    log(f"  adam+confmat (step-grad): "
        f"{results['step'] - results['grad']:.1f} ms")
    log(f"  confmat alone:          {results['confmat']:.1f} ms")
    log(f"  train/eval fwd ratio:   "
        f"{results['fwd_train'] / results['fwd_eval']:.2f}")
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
