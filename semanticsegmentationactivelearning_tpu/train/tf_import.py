"""Import the reference's TensorFlow checkpoints into this framework.

A user switching from the reference brings trained TF object-based
checkpoints: ``tf.train.Checkpoint(model=ENet(), epoch, step,
optimizer)`` saved per epoch (reference: train.py:226-229,
active_learning.py:441-444). This module converts one into the
rebuild's ``TrainState`` so training/AL/inference resume from it.

Checkpoint keys follow TF's object-path scheme, rooted at the
reference ENet's attribute names (reference: models/enet/enet.py:35-247
for the block attributes, models/enet/enet_modules.py:139-188,
366-524, 730-938, 1070-1292, 1294-1381 for the per-block weight
attribute names), e.g.::

    model/Bottleneck2_3/conv_kernel/0/.ATTRIBUTES/VARIABLE_VALUE
    model/Initial/variance/.ATTRIBUTES/VARIABLE_VALUE
    epoch/.ATTRIBUTES/VARIABLE_VALUE

Numerical layout mappings (the measured flax<->TF equivalences from
tests/test_model_parity.py):

- conv kernels are HWIO in both frameworks — copied directly;
- transpose-conv kernels are ``[H, W, out, in]`` in TF
  (tf.nn.conv2d_transpose) but ``[H, W, in, out]`` with flipped
  spatial taps in flax ``nn.ConvTranspose`` —
  ``flax = tf.transpose(0,1,3,2)[::-1, ::-1]``;
- BN: gamma->scale, beta->bias (params); mean->mean, variance->var
  (batch_stats);
- asymmetric 5x5 kernels: ``conv_kernel[0]`` (5x1, applied first,
  enet_modules.py:553-558) -> ``conv_col``; ``[1]`` (1x5) ->
  ``conv_row``;
- multiscale heads: ``model/loss_scale_weights/{i}`` (attached by the
  reference's train.py:121, created in losses.py:122-132, over
  endpoints b5_1/b4_2/b3_8 in that order) -> ``MultiscaleHead_{i}``.

Optimizer slot variables (``.OPTIMIZER_SLOT``) are intentionally NOT
imported — optax state is initialized fresh; a resumed run re-warms
Adam moments within a few steps. They are counted and logged.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"

# block-level attribute -> (collection, (module, leaf), transform)
_IDENTITY = lambda a: a  # noqa: E731


def _deconv_to_flax(k: np.ndarray) -> np.ndarray:
    """TF conv2d_transpose filter [H,W,out,in] -> flax ConvTranspose
    kernel [H,W,in,out] (see module docstring)."""
    return np.ascontiguousarray(
        np.transpose(k, (0, 1, 3, 2))[::-1, ::-1])


def _bn_entries(prefix_ref: str, bn_name: str):
    return {
        f"{prefix_ref}gamma": ("params", (bn_name, "scale"), _IDENTITY),
        f"{prefix_ref}beta": ("params", (bn_name, "bias"), _IDENTITY),
        f"{prefix_ref}mean": ("batch_stats", (bn_name, "mean"),
                              _IDENTITY),
        f"{prefix_ref}variance": ("batch_stats", (bn_name, "var"),
                                  _IDENTITY),
    }


def _block_attr_map(is_upsample: bool) -> Dict[str, Tuple]:
    """Bottleneck-family attribute map (enet_modules.py:366-524 plain,
    730-938 downsample, 1070-1292 upsample)."""
    m = {
        "proj_kernel": ("params", ("proj_conv", "kernel"), _IDENTITY),
        "proj_alpha": ("params", ("proj_prelu", "alpha"), _IDENTITY),
        "conv_alpha": ("params", ("conv_prelu", "alpha"), _IDENTITY),
        "exp_kernel": ("params", ("exp_conv", "kernel"), _IDENTITY),
        "residual_alpha": ("params", ("res_prelu", "alpha"),
                           _IDENTITY),
        # asymmetric pair: column (kx1) first, then row (1xk)
        "conv_kernel/0": ("params", ("conv_col", "kernel"), _IDENTITY),
        "conv_kernel/1": ("params", ("conv_row", "kernel"), _IDENTITY),
    }
    m.update(_bn_entries("proj_", "proj_bn"))
    m.update(_bn_entries("conv_", "conv_bn"))
    m.update(_bn_entries("exp_", "exp_bn"))
    if is_upsample:
        m["conv_kernel"] = ("params", ("deconv", "kernel"),
                            _deconv_to_flax)
        m["res_kernel"] = ("params", ("res_conv", "kernel"), _IDENTITY)
    else:
        m["conv_kernel"] = ("params", ("conv", "kernel"), _IDENTITY)
    return m


_INITIAL_MAP = {
    "kernel": ("params", ("conv", "kernel"), _IDENTITY),
    "alpha": ("params", ("prelu", "alpha"), _IDENTITY),
    **_bn_entries("", "bn"),
}

_FINAL_MAP = {
    "kernel": ("params", ("deconv", "kernel"), _deconv_to_flax),
}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def convert_reference_checkpoint(ckpt_path: str) -> dict:
    """Read a reference TF checkpoint (file prefix or directory) and
    return ``{"params", "batch_stats", "epoch", "step", "skipped"}``.

    Requires TensorFlow (offline tooling only — the framework itself
    never imports TF).
    """
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Importing reference checkpoints requires TensorFlow "
            "(offline tool dependency only)") from e

    import os
    if os.path.isdir(ckpt_path):
        latest = tf.train.latest_checkpoint(ckpt_path)
        if latest is None:
            raise FileNotFoundError(
                f"No TF checkpoint found in {ckpt_path}")
        ckpt_path = latest
    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()

    # upsample blocks are the ones with a residual 1x1 conv
    upsample_blocks = {
        key[len("model/"):].split("/")[0]
        for key in shapes
        if key.startswith("model/") and "/res_kernel/" in key}

    out = {"params": {}, "batch_stats": {}, "epoch": 0, "step": 0,
           "skipped": []}
    for key in sorted(shapes):
        if not key.endswith(_SUFFIX):
            out["skipped"].append(key)
            continue
        path = key[:-len(_SUFFIX)]
        if ".OPTIMIZER_SLOT" in path or path.startswith("optimizer"):
            out["skipped"].append(key)
            continue
        if path == "epoch":
            out["epoch"] = int(reader.get_tensor(key))
            continue
        if path == "step":
            out["step"] = int(reader.get_tensor(key))
            continue
        if path == "save_counter":
            out["save_counter"] = int(reader.get_tensor(key))
            continue
        if not path.startswith("model/"):
            out["skipped"].append(key)
            continue

        parts = path[len("model/"):].split("/")
        block, attr = parts[0], "/".join(parts[1:])
        if block == "loss_scale_weights":
            # heads live at the flax top level, not under a submodule
            _set(out["params"],
                 (f"MultiscaleHead_{attr}", "kernel"),
                 np.asarray(reader.get_tensor(key)))
            continue
        if block == "Initial":
            dest = _INITIAL_MAP.get(attr)
        elif block == "Final":
            dest = _FINAL_MAP.get(attr)
        elif block.startswith("Bottleneck"):
            dest = _block_attr_map(block in upsample_blocks).get(attr)
        else:
            dest = None
        if dest is None:
            out["skipped"].append(key)
            continue

        collection, leaf_path, transform = dest
        value = transform(np.asarray(reader.get_tensor(key)))
        _set(out[collection], (block,) + leaf_path, value)

    n_slots = sum(".OPTIMIZER_SLOT" in k for k in out["skipped"])
    logger.info(
        "Converted %s: %d params, %d batch stats, epoch=%d step=%d; "
        "skipped %d keys (%d optimizer slots — optax state starts "
        "fresh)", ckpt_path,
        len(jax_leaves(out["params"])),
        len(jax_leaves(out["batch_stats"])),
        out["epoch"], out["step"], len(out["skipped"]), n_slots)
    return out


def jax_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def _walk_leaves(tree, path=()):
    if isinstance(tree, dict):
        for key, val in tree.items():
            yield from _walk_leaves(val, path + (str(key),))
    else:
        yield path, tree


def merge_report(template, converted: dict) -> dict:
    """Account for every converted leaf against a ``TrainState``
    template: which would be DROPPED by the shape-checked merge
    (``checkpoint._merge_state_dicts`` iterates template keys only, so
    converted leaves missing from the template vanish silently without
    this check — e.g. MultiscaleHead_* weights against a conf without
    softmax.multiscale, or a whole ENet against an ICNet conf).

    Returns ``{"missing": [path...], "mismatched": [(path, src_shape,
    dst_shape)...], "merged": int}``.
    """
    import flax

    report = {"missing": [], "mismatched": [], "merged": 0}
    for collection in ("params", "batch_stats"):
        tdict = flax.serialization.to_state_dict(
            getattr(template, collection))
        for path, leaf in _walk_leaves(converted[collection]):
            node = tdict
            for part in path:
                if not isinstance(node, dict) or part not in node:
                    node = None
                    break
                node = node[part]
            name = collection + "/" + "/".join(path)
            if node is None:
                report["missing"].append(name)
            elif getattr(node, "shape", None) != leaf.shape:
                report["mismatched"].append(
                    (name, tuple(leaf.shape),
                     tuple(getattr(node, "shape", ()))))
            else:
                report["merged"] += 1
    return report


def to_train_state(converted: dict, template):
    """Merge a ``convert_reference_checkpoint`` result into a fresh
    ``TrainState`` (same partial-restore semantics as
    checkpoint.restore_checkpoint: shape-checked leaf-wise merge).
    Converted leaves the template can't absorb are logged as warnings;
    callers needing hard failure should check ``merge_report`` first
    (tools/import_reference_checkpoint.py does)."""
    import jax.numpy as jnp

    from .checkpoint import _merge_state_dicts
    import flax

    report = merge_report(template, converted)
    for name in report["missing"]:
        logger.warning("converted leaf %s has no destination in the "
                       "template model — DROPPED", name)
    for name, src, dst in report["mismatched"]:
        logger.warning("converted leaf %s shape %s does not match "
                       "template %s — DROPPED (template init kept)",
                       name, src, dst)
    params = _merge_state_dicts(
        flax.serialization.to_state_dict(template.params),
        converted["params"])
    batch_stats = _merge_state_dicts(
        flax.serialization.to_state_dict(template.batch_stats),
        converted["batch_stats"])
    return template.replace(
        params=flax.serialization.from_state_dict(template.params,
                                                  params),
        batch_stats=flax.serialization.from_state_dict(
            template.batch_stats, batch_stats),
        epoch=jnp.asarray(converted["epoch"], jnp.int32),
        step=jnp.asarray(converted["step"], jnp.int32))
