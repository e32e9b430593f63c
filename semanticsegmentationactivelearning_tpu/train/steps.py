"""Train/eval/score step builders.

The reference's graph-assembly + ``sess.run`` hot loop (train.py:91-352,
active_learning.py:203-328) collapses into three pure, jitted functions
over an explicit ``TrainState`` pytree:

- ``train_step``: forward (training=True) -> masked CE (+ multiscale,
  + L1/L2 regularization) -> Adam update; BatchNorm moving averages are
  threaded as ``batch_stats`` state; optional pseudo-labeling mixes
  high-confidence predictions into unlabelled examples exactly like
  active_learning.py:229-275.
- ``eval_step``: forward (training=False) -> batch confusion matrix.
  This replaces the reference's second network on GPU:1 plus the
  per-epoch weight-copy assign group (train.py:102-105, 259-265): with
  a single param pytree there is nothing to copy.
- ``score_step``: forward -> fused per-image mean confidence, the
  pool-ranking pass (active_learning.py:682-715).

All steps also consume a ``valid`` flag so padded tail batches are
excluded from loss/metrics while shapes stay static.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops import acquisition, losses, metrics
from ..ops import nn as xops


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray        # int32 scalar, the reference's local_step
    epoch: jnp.ndarray       # int32 scalar, the reference's epoch_step


def create_train_state(model, optimizer: optax.GradientTransformation,
                       rng: jax.Array, input_hw, channels: int = 3,
                       multiscale: bool = False) -> TrainState:
    """Initialize model + optimizer state (jitted: eager flax init is
    prohibitively slow through the TPU relay)."""

    @jax.jit
    def _init(key):
        dummy = jnp.zeros((1, input_hw[0], input_hw[1], channels),
                          jnp.float32)
        variables = model.init(
            {"params": key, "dropout": jax.random.PRNGKey(0)}, dummy,
            training=True, multiscale=multiscale)
        return variables

    variables = _init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32),
                      epoch=jnp.zeros((), jnp.int32))


def _mesh_shardings(mesh):
    """jit sharding kwargs for a step over a ``("data",)`` (or
    ``("data", "space")``) mesh: state and PRNG keys replicated, batch
    leaves sharded on the batch axis; with a ``space`` axis, NHWC
    image tensors are additionally width-sharded (XLA GSPMD inserts
    the per-convolution halo exchanges over ICI — the idiomatic TPU
    form of the reference-free spatial partitioning design, SURVEY.md
    §5 long-context analogue). With no mesh, plain single-device jit."""
    if mesh is None:
        return {}
    from ..parallel import mesh as pmesh
    out = {"repl": pmesh.replicated(mesh),
           "data": pmesh.data_sharded(mesh)}
    # batch on data, W on space: full-res images whose activations
    # exceed per-chip HBM split their spatial work across the mesh
    out["image"] = pmesh.image_sharded(mesh)
    return out


def make_train_step(model, optimizer: optax.GradientTransformation,
                    num_classes: int, hyperparams: Dict[str, Any],
                    pseudo_cfg: Optional[Dict[str, Any]] = None,
                    mesh=None, phase_logits: Optional[bool] = None,
                    steps_per_epoch: int = 1,
                    remat: Optional[str] = None,
                    _body_only: bool = False):
    """Build the jitted supervised (or pseudo-labeling) train step.

    :param hyperparams: the conf ``hyperparams`` block (C22 schema)
    :param pseudo_cfg:  ``{"measure": ..., "threshold": ...}`` enables
                        the AL pseudo-annotation path
    :param mesh:        optional ``("data",)`` mesh for SPMD data
                        parallelism: batch sharded over devices, params
                        replicated, gradient/metric reductions become
                        ICI psums inserted by XLA
    :param steps_per_epoch: the inverse-time LR decay's ``decay_steps``
                        (must match what ``optim.make_optimizer`` was
                        built with) so the step can report the decayed
                        ``learning_rate`` it is about to apply — the
                        reference exposed it as a per-iteration scalar
                        summary (train.py:167-176) and it is otherwise
                        unobservable inside the optax transformation
    :param remat:       rematerialization of the training forward for
                        the backward pass: ``None`` keeps XLA's default
                        residual saving; ``"dots"`` saves matmul/conv
                        outputs only (``jax.checkpoint`` with the
                        dots_with_no_batch_dims_saveable policy) so the
                        elementwise BN/PReLU/shift temporaries are
                        recomputed instead of round-tripping HBM;
                        ``"all"`` recomputes the whole forward
    :param phase_logits: consume the model's polyphase logits and
                        ``ops.nn.s2d_plane``-permuted labels/masks —
                        identical loss (mod fp32 reassociation) and
                        bit-identical confusion counts while the
                        full-res fp32 logits plane never materializes
                        (its d2s relayout measured +58 ms at batch 8
                        512x1024 on v5e). ``None`` = auto: on whenever
                        the model supports it and multiscale is off.
    """
    softmax_cfg = hyperparams.get("softmax", {})
    reg_cfg = hyperparams.get("weight_reg", {})
    multiscale = bool(softmax_cfg.get("multiscale", False))
    weight = float(softmax_cfg.get("loginverse_scaling", 0.0))
    label_smoothing = float(softmax_cfg.get("label_smoothing", 0.0))
    l1 = float(reg_cfg.get("L1", 0.0))
    l2 = float(reg_cfg.get("L2", 0.0))
    glorot_scaling = bool(reg_cfg.get("glorot_scaling", False))
    if phase_logits is None:
        phase_logits = getattr(model, "supports_phase_logits", False)
    factor = int(getattr(model, "phase_factor", 2))
    # under multiscale, phase logits compose only when the cascade loss
    # heads exclude the primary logits (ICNet; ENet's head[0] IS the
    # primary plane, so its multiscale CE needs the full-res form)
    use_phase = bool(phase_logits) and (
        not multiscale or getattr(model, "phase_with_multiscale", False))
    # phase CE (and phase-ordered label/pseudo mixing) only when the
    # primary head is the CE target; the multiscale cascade CE resizes
    # full-resolution labels per head, so there phase feeds metrics only
    phase_ce = use_phase and not multiscale
    from . import optim as _optim
    lr_schedule = _optim.make_schedule(
        hyperparams.get("learning_rate", 5e-4),
        hyperparams.get("learning_rate_decay", 0.0),
        max(int(steps_per_epoch), 1))

    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(in_shardings=(sh["repl"], sh["data"],
                                        sh["repl"]),
                          out_shardings=(sh["repl"], sh["repl"]))

    def step_body(state: TrainState, batch: Dict[str, jnp.ndarray],
                  key: jax.Array):
        image = batch["image"]          # distorted crop
        label = batch["label"]
        mask = batch["mask"] * batch["valid"][:, None, None]
        if phase_ce:
            # per-pixel consumers only: permute labels/masks into the
            # polyphase pixel order instead of d2s-ing the logits
            label = xops.s2d_plane(label, factor)
            mask = xops.s2d_plane(mask, factor)

        if pseudo_cfg is not None:
            # No-dropout forward on the raw crop with current weights +
            # running BN statistics (active_learning.py:231-233).
            pseudo_logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["image_raw"], training=False,
                **({"return_phase_logits": True} if phase_ce else {}))
            pseudo_label, pseudo_mask, _conf = acquisition.pseudo_annotate(
                pseudo_logits, pseudo_cfg["measure"], num_classes,
                pseudo_cfg["threshold"])
            # [:, None, None] broadcasts against either pixel order
            labelled = batch["labelled"][:, None, None]
            pseudo_mask = pseudo_mask * batch["valid"][:, None, None]
            label = jnp.where(labelled, label, pseudo_label)
            mask = jnp.where(labelled, mask, pseudo_mask)

        def fwd(params, image, key):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, training=True, multiscale=multiscale,
                rngs={"dropout": key}, mutable=["batch_stats"],
                **({"return_phase_logits": True} if use_phase else {}))

        if remat == "all":
            fwd = jax.checkpoint(fwd)
        elif remat == "dots":
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        elif remat is not None:
            raise ValueError(f"remat must be None|'dots'|'all', "
                             f"got {remat!r}")

        def loss_fn(params):
            outputs, mutated = fwd(params, image, key)
            if multiscale:
                logits, loss_heads = outputs
                loss = losses.multiscale_masked_softmax_cross_entropy(
                    label, loss_heads, mask, num_classes,
                    weight, label_smoothing,
                    scale_weights=getattr(model, "ms_loss_weights",
                                          None))
            else:
                logits = outputs
                loss = losses.masked_softmax_cross_entropy(
                    label, logits, mask, num_classes, weight,
                    label_smoothing)
            cost = loss + losses.regularization_loss(
                params, l1, l2, glorot_scaling)
            return cost, (loss, logits, mutated["batch_stats"])

        (cost, (loss, logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)

        if use_phase and not phase_ce:
            # multiscale metrics-only phase: the loss consumed the
            # full-res labels; permute a metrics view to match the
            # phase-ordered primary logits
            label_m = xops.s2d_plane(label, factor)
            mask_m = xops.s2d_plane(mask, factor)
        else:
            label_m, mask_m = label, mask
        if getattr(model, "dtype", jnp.float32) == jnp.bfloat16:
            # bf16 models: the fp32 logits are exact bf16 values (the
            # Final head computes in bf16, then upcasts), so the bf16
            # VIEW argmax is bit-identical while halving the plane read;
            # the barrier keeps the one-hot loop's layout choices from
            # propagating into the logits buffer (measured -4 ms on the
            # batch-8 512x1024 v5e step, tools/probe_train_levers.py
            # 'cmbf16')
            pred = jnp.argmax(logits.astype(jnp.bfloat16), axis=-1)
            pred = jax.lax.optimization_barrier(pred.astype(jnp.int8))
        else:
            pred = jnp.argmax(logits, axis=-1)
        conf_mat = metrics.confusion_matrix(label_m, pred, num_classes,
                                            mask_m)

        new_state = state.replace(params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        # the decayed LR this update applied (optax schedules index by
        # the pre-increment update count, which equals state.step here)
        lr = jnp.asarray(lr_schedule(state.step) if callable(lr_schedule)
                         else lr_schedule, jnp.float32)
        return new_state, {"loss": loss, "cost": cost,
                           "learning_rate": lr,
                           "confusion": conf_mat}

    if _body_only:
        return step_body
    return functools.partial(jax.jit, donate_argnums=(0,),
                             **jit_kwargs)(step_body)


def make_grouped_train_step(model, optimizer: optax.GradientTransformation,
                            num_classes: int, hyperparams: Dict[str, Any],
                            group: int, crop_hw, channels: int = 3,
                            pseudo_cfg: Optional[Dict[str, Any]] = None,
                            mesh=None,
                            phase_logits: Optional[bool] = None,
                            steps_per_epoch: int = 1,
                            stacked_inputs: bool = True):
    """``group`` SEQUENTIAL train steps — each with its own on-device
    augmentation — in ONE jit dispatch via ``lax.scan``.

    Through the TPU relay every dispatch pays a fixed ~26-28 ms
    round-trip (the same overhead the scoring path amortizes with
    ``make_pool_score_step``); a batch-8 512x1024 train step is ~60 ms
    of device compute, so per-step dispatch costs ~30% of the hot loop.
    Scanning ``group`` micro-steps in one call divides that fixed cost
    by ``group`` while computing EXACTLY the per-step math: the scan
    body is the same ``make_train_step`` body, fed by the same
    ``pipeline.augment_batch`` with the same key-split convention as
    the CLI loop (``jax.random.split(key)`` -> augment, dropout), so a
    grouped run's trajectory equals the ungrouped run's for the same
    per-step keys.

    Inputs: ``gbatch`` with a leading ``[group]`` axis on every leaf —
    ``stack`` uint8 ``[K, B, Hs, Ws, C(+1)]`` (H2D ships uint8, like
    the per-step loop), ``heights``/``widths`` int32 ``[K, B]``,
    ``valid`` float32 ``[K, B]`` and, with ``pseudo_cfg``, ``labelled``
    bool ``[K, B]`` — plus ``keys`` ``[K]`` PRNG keys. Returns
    ``(state, metrics)`` with metrics leaves stacked ``[K, ...]``
    (step-resolution scalars survive grouping).

    ``stacked_inputs=False`` builds the MULTI-HOST form: ``gbatch`` is
    a TUPLE of ``group`` per-batch dicts whose leaves are
    globally-sharded ``[B, ...]`` arrays (``parallel.batch_stream``'s
    multi-host output) — host code cannot stack process-spanning
    arrays, so ``jnp.stack`` runs INSIDE jit along a new leading axis
    with a ``P(None, "data")`` constraint, preserving each device's
    row ownership with zero communication (the same trick as
    ``make_group_score_step``). Identical math either way; exact
    parity across process counts is pinned by
    tests/test_multihost.py.

    Reference hot loop being amortized: train.py:319-341 (one
    ``sess.run`` per step)."""
    from ..data import pipeline
    body = make_train_step(model, optimizer, num_classes, hyperparams,
                           pseudo_cfg=pseudo_cfg, mesh=None,
                           phase_logits=phase_logits,
                           steps_per_epoch=steps_per_epoch,
                           _body_only=True)
    crop_hw = tuple(crop_hw)
    with_pseudo = pseudo_cfg is not None

    batch_keys = (("stack", "heights", "widths", "valid", "labelled")
                  if with_pseudo else
                  ("stack", "heights", "widths", "valid"))
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        gdata = NamedSharding(mesh, P(None, "data"))
        batch_in = {k: gdata for k in batch_keys} if stacked_inputs \
            else tuple([{k: sh["data"] for k in batch_keys}] * group)
        jit_kwargs = dict(
            in_shardings=(sh["repl"], batch_in, sh["repl"]),
            out_shardings=(sh["repl"], sh["repl"]))

    @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def grouped_train_step(state: TrainState, gbatch, keys):
        if not stacked_inputs:
            # tuple of globally-sharded [B,...] batches -> [K,B,...]
            # leaves; stacking on a NEW axis keeps every row on its
            # owning device (no comms), unlike a batch-axis concat
            gbatch = {k: jnp.stack([c[k] for c in gbatch])
                      for k in batch_keys}
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec \
                    as P
                gb_sharding = NamedSharding(mesh, P(None, "data"))
                gbatch = {k: jax.lax.with_sharding_constraint(
                    v, gb_sharding) for k, v in gbatch.items()}

        def scan_body(st, xs):
            b, key = xs
            k_aug, k_drop = jax.random.split(key)
            raw, image, label, mask = pipeline.augment_batch(
                b["stack"], b["heights"], b["widths"], k_aug,
                crop_hw=crop_hw, channels=channels)
            batch = {"image": image, "label": label, "mask": mask,
                     "valid": b["valid"]}
            if with_pseudo:
                batch["image_raw"] = raw
                batch["labelled"] = b["labelled"]
            return body(st, batch, k_drop)

        state, ms = jax.lax.scan(scan_body, state, (gbatch, keys))
        # per-step scalars keep the [group] axis (step-resolution
        # metrics survive grouping); confusion counts accumulate on
        # device — one [C,C] per dispatch instead of per step — but
        # ONLY when the per-dispatch pixel count provably fits int32
        # (shapes are static here); otherwise the [group,C,C] stack is
        # returned and ConfusionAccumulator sums it host-side in int64
        n_rows = keys.shape[0] * gbatch["valid"].shape[1]
        if n_rows * crop_hw[0] * crop_hw[1] < 2 ** 31:
            ms["confusion"] = jnp.sum(ms["confusion"], axis=0,
                                      dtype=jnp.int32)
        return state, ms

    return grouped_train_step


def make_eval_step(model, num_classes: int, mesh=None,
                   phase_logits: Optional[bool] = None):
    """Jitted evaluation step: logits -> argmax -> confusion matrix.

    Confusion counts are permutation-invariant, so models exposing
    polyphase logits are evaluated in that pixel order (no full-res
    fp32 logits plane; see ``make_train_step``). For phase-NATIVE
    models (ENet: the Final deconv computes the phase form, d2s merely
    permutes it) counts are bit-identical; for constructed-phase
    models (ICNet's ``_resize_bilinear_phase``) the phase plane is a
    different fp evaluation of the same interpolation, so argmax can
    flip at near-tie pixels — which is why ICNet ships with
    ``supports_phase_logits = False``."""
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(in_shardings=(sh["repl"], sh["data"]),
                          out_shardings=sh["repl"])
    if phase_logits is None:
        phase_logits = getattr(model, "supports_phase_logits", False)
    use_phase = bool(phase_logits)
    factor = int(getattr(model, "phase_factor", 2))

    @functools.partial(jax.jit, **jit_kwargs)
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], training=False,
            **({"return_phase_logits": True} if use_phase else {}))
        pred = jnp.argmax(logits, axis=-1)
        label = batch["label"]
        mask = batch["mask"] * batch["valid"][:, None, None]
        if use_phase:
            label = xops.s2d_plane(label, factor)
            mask = xops.s2d_plane(mask, factor)
        return metrics.confusion_matrix(label, pred, num_classes, mask)

    return eval_step


def make_predict_step(model, mesh=None):
    """Jitted forward -> argmax trainId predictions (image summaries;
    the reference colorized predictions in-graph, train.py:178-206).

    Models with polyphase logits argmax in that pixel order and
    depth-to-space only the int32 label plane (~75x fewer bytes than
    relayouting the fp32 logits)."""
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(in_shardings=(sh["repl"], sh["data"]),
                          out_shardings=sh["data"])
    use_phase = getattr(model, "supports_phase_logits", False)
    factor = int(getattr(model, "phase_factor", 2))

    @functools.partial(jax.jit, **jit_kwargs)
    def predict_step(state: TrainState, image: jnp.ndarray):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, training=False,
            **({"return_phase_logits": True} if use_phase else {}))
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return xops.d2s_plane(pred, factor) if use_phase else pred

    return predict_step


def _make_score_impl(model, num_classes: int, measure: str,
                     fused: bool = True, allow_pallas: bool = True,
                     spatial_mesh=None):
    """Un-jitted scoring body shared by the per-batch and pooled steps.

    ``allow_pallas=False`` forces the XLA chunked path — used under a
    mesh, where an unsharded Pallas custom call has no SPMD
    partitioning rule and would be replicated by the partitioner. On a
    2-D ``("data", "space")`` mesh, models exposing
    ``spatial_front_score`` (ENet) instead run their front kernel
    PER SHARD under ``jax.shard_map`` with explicit halo exchange
    (``spatial_mesh``), composing Pallas with the GSPMD-width-sharded
    XLA remainder."""
    use_fused = fused and getattr(model, "supports_fused_scoring", False)
    use_pallas = (allow_pallas and use_fused
                  and jax.default_backend() not in ("cpu",))
    use_spatial = (spatial_mesh is not None and use_fused
                   and hasattr(model, "spatial_front_score"))

    def score_impl(state: TrainState, image: jnp.ndarray):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if use_spatial:
            # interpret on CPU so the dryrun/CI exercise the sharded
            # kernel without TPU hardware
            return model.fused_score(
                variables, image, measure, use_pallas=False,
                spatial_mesh=spatial_mesh,
                interpret=jax.default_backend() == "cpu")
        if use_fused:
            # model-specific fused tail (ENet: chunked/Pallas deconv +
            # entropy; ICNet: chunked 4x upsample of the 1/4-res head)
            return model.fused_score(variables, image, measure,
                                     use_pallas=use_pallas)
        logits = model.apply(variables, image, training=False)
        return acquisition.mean_confidence(logits, measure, num_classes)

    return score_impl


def make_pool_score_step(model, num_classes: int, measure: str,
                         micro_batch: int, fused: bool = True,
                         mesh=None):
    """Jitted multi-micro-batch pool scorer.

    Scores ``[K*micro_batch, H, W, C]`` images in ONE dispatch by
    ``lax.map``-ing the forward over K micro-batches — memory stays
    bounded by one micro-batch while fixed per-dispatch overhead
    (measured ~26ms through the TPU relay) amortizes over the group.
    This is the AL ranking hot loop (active_learning.py:682-715).

    With a mesh, each micro-batch is sharded over the ``data`` axis so
    every chip scores ``micro_batch / n_devices`` images per map step.
    On a 2-D ``("data", "space")`` mesh the micro-batches are
    additionally width-sharded (GSPMD conv halo exchanges), so grouped
    dispatch composes with spatial scoring: the caller halves
    ``micro_batch`` to keep the live activation footprint the spatial
    mesh exists to bound unchanged.
    """
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(in_shardings=(sh["repl"], sh["image"]),
                          out_shardings=sh["data"])
    spatial = mesh is not None and "space" in mesh.axis_names
    # On a pure data mesh, run the scorer under shard_map: each device
    # scores its own rows, so the Pallas fused kernels (which have no
    # GSPMD partitioning rule) stay enabled — per-image scores need no
    # cross-device communication at all.
    data_only = (mesh is not None
                 and tuple(mesh.axis_names) == ("data",)
                 and micro_batch % mesh.shape["data"] == 0)
    score_impl = _make_score_impl(
        model, num_classes, measure, fused,
        allow_pallas=mesh is None or data_only,
        spatial_mesh=mesh if spatial else None)

    @functools.partial(jax.jit, **jit_kwargs)
    def pool_score(state: TrainState, images: jnp.ndarray):
        from jax.sharding import NamedSharding, PartitionSpec as P
        k = images.shape[0] // micro_batch
        chunks = images.reshape(k, micro_batch, *images.shape[1:])
        if data_only:
            def local(state, chunks):
                return jax.lax.map(lambda im: score_impl(state, im),
                                   chunks)
            # check_vma=False: pallas_call out_shapes carry no
            # varying-axis metadata, so the replication checker would
            # reject the fused kernels on a real multi-chip mesh
            scores = jax.shard_map(
                local, mesh=mesh, in_specs=(P(), P(None, "data")),
                out_specs=P(None, "data"),
                check_vma=False)(state, chunks)
            return scores.reshape(-1)
        if mesh is not None:
            spec = P(None, "data", None, "space") if spatial \
                else P(None, "data")
            chunks = jax.lax.with_sharding_constraint(
                chunks, NamedSharding(mesh, spec))
        scores = jax.lax.map(lambda im: score_impl(state, im), chunks)
        return scores.reshape(-1)

    return pool_score


def make_group_score_step(model, num_classes: int, measure: str,
                          group: int, mesh, fused: bool = True):
    """Grouped pool scorer for MULTI-HOST meshes: ``group`` loader
    batches -> ONE dispatch (amortizing the fixed per-dispatch
    overhead, ~26ms through the TPU relay), without ever concatenating
    process-spanning arrays on the host.

    ``make_pool_score_step`` concatenates buffered device batches
    host-side, which only works when every shard is addressable;
    across processes the batches instead arrive as a TUPLE of
    ``group`` globally-sharded ``[B, H, W, C]`` arrays. ``jnp.stack``
    along a NEW leading axis preserves each device's row ownership
    (``P(None, "data")`` — zero communication, unlike a batch-axis
    concatenate), and the per-device ``[group, B/n, ...]`` block is
    scored chunk-by-chunk under ``jax.shard_map`` — which also keeps
    the fused Pallas kernels enabled per shard (the custom call has no
    GSPMD partitioning rule). Requires a pure ``("data",)`` mesh.

    Returns ``group_score(state, chunks) -> [group, B]`` scores
    replicated over the mesh, row-aligned with each input batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    if tuple(mesh.axis_names) != ("data",):
        raise ValueError(
            "make_group_score_step needs a pure ('data',) mesh, got "
            f"{mesh.axis_names}")
    from ..parallel import mesh as pmesh
    score_impl = _make_score_impl(model, num_classes, measure, fused,
                                  allow_pallas=True)
    repl = pmesh.replicated(mesh)
    data = pmesh.data_sharded(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, tuple([data] * group)),
        out_shardings=repl)
    def group_score(state: TrainState, chunks):
        x = jnp.stack(chunks)          # [group, B, H, W, C], no comms
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, "data")))

        def local(state, xs):          # xs: [group, B/n, ...]
            return jax.lax.map(lambda im: score_impl(state, im), xs)

        # check_vma=False: see make_pool_score_step
        return jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(None, "data")),
            out_specs=P(None, "data"), check_vma=False)(state, x)

    return group_score


def make_embed_step(model, mesh=None):
    """Jitted pool-embedding step for diversity (core-set) selection:
    forward to the model's deepest shared features, global-average
    pooled to ``[B, D]`` (``return_embedding=True`` on the model).
    The embeddings feed ``ops.selection.k_center_greedy``; this is a
    capability the reference does not have (it only ranks per-image
    confidence scores, active_learning.py:682-715)."""
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(
            in_shardings=(sh["repl"], {"image": sh["image"]}),
            out_shardings=sh["data"])

    @functools.partial(jax.jit, **jit_kwargs)
    def embed_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return model.apply(variables, batch["image"], training=False,
                           return_embedding=True)

    return embed_step


def make_mc_score_step(model, num_classes: int, passes: int, mesh=None):
    """Jitted MC-dropout BALD pool scorer (acquisition measure
    ``"bald"``, a capability the reference does not have — its measures
    are the three deterministic ones, active_learning.py:240-260).

    Runs ``passes`` stochastic forwards with dropout active but
    BatchNorm frozen on running averages (the blocks apply dropout
    whenever a ``"dropout"`` rng is supplied, models/blocks.py), then
    scores per-image mean ``1 - I(y; w | x)/log C``
    (ops/acquisition.bald_confidence_map). The T passes batch onto the
    MXU via ``lax.map``; for pre-logits models (ENet) only half-res
    features are stacked and the T full-resolution probability maps
    stream through row chunks, never materializing in HBM.

    Returns ``mc_score_step(state, images, key) -> [B]`` — the key
    seeds the T dropout masks (fold_in per (image, pass)), so scores
    are deterministic given (state, images, key).

    Memory: scores are per-image independent, so the batch is
    ``lax.map``-ed one image at a time — the live T-pass feature stack
    is ``[T,1,H2,W2,cin]``, not ``[T,B,...]`` (low-channel NHWC can
    lane-pad up to 8x on TPU; a whole-batch stack at mc_passes=8,
    batch 8, 1024x2048 would exceed one v5e's HBM).
    """
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        jit_kwargs = dict(in_shardings=(sh["repl"], sh["image"],
                                        sh["repl"]),
                          out_shardings=sh["data"])
    use_features = getattr(model, "supports_pre_logits", False)
    # pure data mesh: run the per-image map device-locally under
    # shard_map (scanning a batch axis that GSPMD shards would gather
    # per iteration); the 2-D ("data","space") mesh stays on the GSPMD
    # path for its conv halo exchanges
    data_only = (mesh is not None
                 and tuple(mesh.axis_names) == ("data",))

    def mc_body(state: TrainState, images: jnp.ndarray,
                keys: jax.Array):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

        def score_one(args):
            image, img_key = args

            def one(t):
                rngs = {"dropout": jax.random.fold_in(img_key, t)}
                if use_features:
                    return model.apply(variables, image,
                                       training=False, rngs=rngs,
                                       return_pre_logits=True)
                return model.apply(variables, image, training=False,
                                   rngs=rngs)

            outs = jax.lax.map(one, jnp.arange(passes))
            if use_features:
                kernel = variables["params"]["Final"]["deconv"]["kernel"]
                return acquisition.chunked_deconv_bald_confidence(
                    outs, kernel, num_classes)
            return acquisition.mean_bald_confidence(outs, num_classes)

        scores = jax.lax.map(score_one, (images[:, None], keys))
        return scores.reshape(-1)

    @functools.partial(jax.jit, **jit_kwargs)
    def mc_score_step(state: TrainState, images: jnp.ndarray,
                      key: jax.Array):
        # per-image keys from the GLOBAL batch index, so scores are
        # identical with or without a mesh
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(images.shape[0]))
        if data_only:
            from jax.sharding import PartitionSpec as P
            return jax.shard_map(
                mc_body, mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"))(state, images, keys)
        return mc_body(state, images, keys)

    return mc_score_step


def make_score_step(model, num_classes: int, measure: str, mesh=None,
                    fused: bool = True):
    """Jitted pool-scoring step: forward + fused per-image mean
    confidence (the acquisition hot loop, active_learning.py:697-698).

    For models exposing pre-logits features (ENet), the classifier
    deconv + softmax + confidence + mean run chunked so full-resolution
    logits never materialize in HBM
    (acquisition.chunked_deconv_mean_confidence).

    With a 2-D ``("data", "space")`` mesh the input (and, propagated by
    GSPMD, every activation) is width-sharded over the ``space`` axis:
    XLA inserts the per-convolution halo exchanges, so full-resolution
    scoring whose activations exceed per-chip HBM spreads across chips
    — the spatial-partitioning design of SURVEY.md §5 (the reference
    coped by downscaling/cropping instead)."""
    sh = _mesh_shardings(mesh)
    jit_kwargs = {}
    if sh:
        # scores stay batch-sharded; the host gather assembles them
        jit_kwargs = dict(in_shardings=(sh["repl"], {"image": sh["image"]}),
                          out_shardings=sh["data"])
    # pure data mesh: shard_map keeps the Pallas kernels enabled (no
    # cross-device communication in per-image scoring); the 2-D
    # ("data","space") mesh stays on the GSPMD path for its conv halo
    # exchanges.
    data_only = (mesh is not None
                 and tuple(mesh.axis_names) == ("data",))
    spatial = mesh is not None and "space" in mesh.axis_names
    score_impl = _make_score_impl(
        model, num_classes, measure, fused,
        allow_pallas=mesh is None or data_only,
        spatial_mesh=mesh if spatial else None)

    @functools.partial(jax.jit, **jit_kwargs)
    def score_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if data_only:
            from jax.sharding import PartitionSpec as P
            # check_vma=False: see make_pool_score_step
            return jax.shard_map(
                score_impl, mesh=mesh, in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False)(state, batch["image"])
        return score_impl(state, batch["image"])

    return score_step
