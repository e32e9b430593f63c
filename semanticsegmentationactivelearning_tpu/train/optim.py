"""Optimizer construction from the conf schema (reference:
train.py:136-150; ``hyperparams.optimizer`` block of C22).

TF kwargs names (beta1/beta2/epsilon/momentum/decay) are translated to
their optax equivalents; the inverse-time learning-rate decay matches
``tf.train.inverse_time_decay``: ``lr / (1 + rate * step/decay_steps)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import optax


def make_schedule(learning_rate: float, decay_rate: float,
                  decay_steps: int) -> Union[float, Callable]:
    if decay_rate <= 0.0:
        return learning_rate

    def schedule(step):
        return learning_rate / (1.0 + decay_rate * step / decay_steps)

    return schedule


def make_optimizer(hyperparams: Dict[str, Any],
                   steps_per_epoch: int = 1,
                   flatten: bool = True) -> optax.GradientTransformation:
    """``flatten=True`` (default) wraps the transformation in
    ``optax.flatten``: the update math runs over ONE raveled buffer
    instead of ~300 tiny parameter leaves, whose per-leaf unfusable
    kernels measured ~6 ms of the batch-8 512x1024 v5e train step
    (tools/probe_step_metrics.py ``flatadam``). The optimizer state
    pytree changes shape; ``checkpoint.restore_checkpoint`` converts
    per-leaf moments from older checkpoints into the raveled layout
    (and back) automatically, since both use ``jax.tree.flatten``
    leaf order. ``flatten=False`` keeps the per-leaf layout."""
    opt_conf = hyperparams.get("optimizer",
                               {"type": "Adam", "kwargs": {}})
    kwargs = dict(opt_conf.get("kwargs", {}))
    lr = make_schedule(hyperparams.get("learning_rate", 5e-4),
                       hyperparams.get("learning_rate_decay", 0.0),
                       max(steps_per_epoch, 1))
    kind = opt_conf.get("type", "Adam").lower()

    if kind == "adam":
        opt = optax.adam(lr,
                         b1=kwargs.get("beta1", 0.9),
                         b2=kwargs.get("beta2", 0.999),
                         eps=kwargs.get("epsilon", 1e-8))
    elif kind in ("sgd", "gradientdescent"):
        opt = optax.sgd(lr)
    elif kind == "momentum":
        opt = optax.sgd(lr, momentum=kwargs.get("momentum", 0.9),
                        nesterov=kwargs.get("use_nesterov", False))
    elif kind == "rmsprop":
        opt = optax.rmsprop(lr,
                            decay=kwargs.get("decay", 0.9),
                            momentum=kwargs.get("momentum", 0.0),
                            eps=kwargs.get("epsilon", 1e-10))
    elif kind == "adamw":
        opt = optax.adamw(lr,
                          b1=kwargs.get("beta1", 0.9),
                          b2=kwargs.get("beta2", 0.999),
                          weight_decay=kwargs.get("weight_decay", 1e-4))
    else:
        raise NotImplementedError(f"Optimizer {opt_conf.get('type')!r} "
                                  "not supported")
    return optax.flatten(opt) if flatten else opt
