#!/usr/bin/env python
"""Supervised training CLI (reference: train.py).

Same subcommands/flags/conf schema as the reference; the TF1 dual-tower
graph (train net on GPU:0, val net on GPU:1, per-epoch weight-copy,
train.py:97-105, 259-265) is replaced by one jitted train step and one
jitted eval step over a single param pytree. Validation runs after each
training epoch (the reference overlapped it with the *next* epoch's
training using the previous weights — same cadence, clearer semantics).

Per-epoch metrics go to ``{log_dir}/metrics.jsonl`` and checkpoints to
``{log_dir}/model-N.ckpt``.
"""

import glob
import json
import logging
import os
import sys

import numpy as np

from semanticsegmentationactivelearning_tpu.data import (device_prefetch,
                                                         loader, pipeline)
from semanticsegmentationactivelearning_tpu.models import get_model
from semanticsegmentationactivelearning_tpu.ops import metrics as xmetrics
from semanticsegmentationactivelearning_tpu.train import (
    checkpoint as ckpt, config as conf, create_train_state, make_eval_step,
    make_predict_step, make_train_step, optim)
from semanticsegmentationactivelearning_tpu.utils import cli, images

logger = logging.getLogger(__name__)


def _batch_stream(loader_, order, global_bs, mesh, sharding):
    """Per-host batch iterator (shared implementation:
    ``parallel.batch_stream``; the AL CLI uses the same helper)."""
    from semanticsegmentationactivelearning_tpu import parallel
    return parallel.batch_stream(loader_, order, global_bs, mesh,
                                 sharding=sharding)


def run_eval_epoch(eval_step, state, val_loader, crop_hw, num_classes,
                   desc="val", show_progress=True, sharding=None,
                   mesh=None, global_bs=None, channels=3):
    import numpy as _np
    acc = xmetrics.ConfusionAccumulator(num_classes)
    order = _np.arange(val_loader.count)
    gbs = global_bs if global_bs is not None else val_loader.batch_size
    batches = cli.progress(
        _batch_stream(val_loader, order, gbs, mesh, sharding),
        desc, show_progress, total=-(-val_loader.count // gbs))
    for b in batches:
        image, label, mask = pipeline.eval_batch(
            b["stack"], b["heights"], b["widths"], crop_hw=crop_hw,
            channels=channels)
        conf_mat = eval_step(state, {
            "image": image, "label": label, "mask": mask,
            "valid": b["valid"].astype(np.float32)})
        acc.update(conf_mat)
    return acc


def main(args):
    import jax

    cli.enable_compilation_cache(args.log_dir)
    # Multi-host (DCN): join the other processes before any jax op;
    # meshes below then span every host's devices.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from semanticsegmentationactivelearning_tpu import parallel
        parallel.initialize_distributed()
    nproc = jax.process_count()
    is_main = jax.process_index() == 0

    dataset = cli.make_dataset(args)
    params = args.params
    hparams = params["hyperparams"]
    in_hw = (params["network"]["input"]["height"],
             params["network"]["input"]["width"])
    batch_size = params["batch_size"]
    if batch_size % nproc:
        logger.error("batch_size %d not divisible by %d processes",
                     batch_size, nproc)
        return 1
    local_bs = batch_size // nproc  # rows this host decodes per batch

    # Record dirs come from the dataset's path accessors so coarse
    # Cityscapes training also sweeps train_extra/ (the reference added
    # each of get_train_paths' dirs to its InputStage, train.py:53-60)
    train_files = sorted(
        f for d in dataset.get_train_paths(args.data_dir)
        for f in glob.glob(os.path.join(d, "*.tfrecord")))
    val_files = sorted(
        f for d in (dataset.get_validation_paths(args.data_dir) or ())
        for f in glob.glob(os.path.join(d, "*.tfrecord")))
    if not train_files:
        logger.error("No training records under %s", args.data_dir)
        return 1
    # Extra modality channels (e.g. Freiburg NIR) stack after the RGB
    # planes, matching the reference decoder (input.py:265-269); its
    # --modalities train flag existed but was never wired through to
    # the dataset in main (reference train.py:30,466)
    modalities = tuple(m for m in (getattr(args, "modalities", None)
                                   or ())
                       if m not in ("rgb", "image"))
    train_loader = loader.RecordLoader(train_files, local_bs,
                                       min_hw=in_hw,
                                       modalities=modalities)
    in_channels = train_loader.channels
    val_loader = loader.RecordLoader(val_files, local_bs,
                                     min_hw=in_hw,
                                     modalities=modalities) \
        if val_files else None
    if modalities:
        logger.info("Stacking modalities %s -> %d input channels",
                    list(modalities), in_channels)
    train_batches = -(-len(train_files) // batch_size)
    logger.info("%d train / %d val examples", len(train_files),
                len(val_files))

    # Model + optimizer + state
    multiscale = bool(hparams["softmax"].get("multiscale", False))
    model_kwargs = {"drop_rates": tuple(hparams["dropout_rates"])}
    if params["network"].get("dtype") in ("bfloat16", "bf16"):
        import jax.numpy as jnp
        model_kwargs["dtype"] = jnp.bfloat16
    model = get_model(params["network"]["model"], dataset.num_classes,
                      **model_kwargs)
    optimizer = optim.make_optimizer(hparams, train_batches)
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, optimizer, rng, in_hw,
                               channels=in_channels,
                               multiscale=multiscale)

    # Restore (train.py:232-257): explicit -c path wins, else latest in
    # the log dir.
    restore_from = None
    if args.checkpoint is not None:
        restore_from = args.checkpoint
        if os.path.isdir(restore_from):
            restore_from = ckpt.latest_checkpoint(restore_from)
        if restore_from is None or not (
                os.path.exists(restore_from)
                or os.path.exists(restore_from + ckpt.CKPT_EXT)):
            logger.error("Checkpoint path \"%s\" is invalid.",
                         args.checkpoint)
            return 1
    elif ckpt.latest_checkpoint(args.log_dir) is not None:
        restore_from = ckpt.latest_checkpoint(args.log_dir)
    if restore_from:
        logger.info("Resuming from checkpoint \"%s\"", restore_from)
        state = ckpt.restore_checkpoint(restore_from, state)

    if is_main and not os.path.exists(
            os.path.join(args.log_dir, "config.json")):
        conf.dump_params(params, args.log_dir)

    # background checkpoint IO: the per-epoch device->host fetch +
    # write overlaps the next epoch's compute (seconds per epoch
    # through the TPU relay)
    manager = ckpt.CheckpointManager(args.log_dir, async_io=True)
    # metrics/checkpoints are replicated across hosts: only 0 writes
    writer = cli.MetricsWriter(args.log_dir, enabled=is_main,
                               tensorboard=getattr(args, "tensorboard",
                                                   False))
    # SPMD data parallelism over all local devices when the batch
    # divides evenly (the reference had no DP at all; SURVEY.md)
    mesh = None
    if jax.device_count() > 1 and batch_size % jax.device_count() == 0:
        from semanticsegmentationactivelearning_tpu.parallel import \
            make_mesh
        mesh = make_mesh()
        logger.info("Data-parallel over %d devices (%d host(s))",
                    jax.device_count(), nproc)
    if nproc > 1 and mesh is None:
        logger.error("Multi-host run needs batch_size divisible by the "
                     "global device count %d", jax.device_count())
        return 1
    train_step = make_train_step(model, optimizer, dataset.num_classes,
                                 hparams, mesh=mesh,
                                 steps_per_epoch=train_batches)
    # Grouped dispatch: scan `train_group` sequential steps (augment
    # included) in ONE jit call — identical trajectory, fixed
    # per-dispatch overhead (~27ms through the TPU relay) amortized
    # over the group (train.steps.make_grouped_train_step). Conf knob
    # `train_group`. Multi-host runs pass the globally-sharded batches
    # as a tuple (stacked inside jit, zero cross-host data movement)
    # and AOT-compile + barrier before the first collective executes.
    # Tail batches that don't fill a group run the per-step path.
    train_group = int(params.get("train_group", 1))
    grouped_step = None
    grouped_aot = [] if nproc > 1 else None
    if train_group > 1:
        from semanticsegmentationactivelearning_tpu.train import \
            make_grouped_train_step
        grouped_step = make_grouped_train_step(
            model, optimizer, dataset.num_classes, hparams,
            group=train_group, crop_hw=in_hw, channels=in_channels,
            mesh=mesh, steps_per_epoch=train_batches,
            stacked_inputs=nproc == 1)
        logger.info("Grouped training dispatch: %d steps/call",
                    train_group)
    eval_step = make_eval_step(model, dataset.num_classes, mesh=mesh)
    # double-buffered H2D upload of the uint8 stacks (pre-sharded over
    # the mesh) so transfer overlaps the in-flight step's compute
    stack_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        stack_sharding = NamedSharding(mesh, P("data"))
    # colorized input/label/prediction dumps (reference train.py:178-206)
    img_cfg = params.get("image_summaries") or {}
    img_cadence = int(img_cfg.get("cadence", 1))
    img_count = int(img_cfg.get("count", 2))
    # (single-host only: under multi-host the dump batch is host-local,
    # and a process-0-only collective would wedge the other hosts)
    predict_step = make_predict_step(model, mesh=mesh) \
        if img_cadence > 0 and nproc == 1 else None

    def dump_image_summaries(epoch):
        src, tag = (val_loader, "val") if val_loader is not None \
            else (train_loader, "train")
        b = next(iter(src.batches()))
        image, label, _mask = pipeline.eval_batch(
            b["stack"], b["heights"], b["widths"], crop_hw=in_hw,
            channels=in_channels)
        preds = np.asarray(predict_step(state, image))
        images.dump_summaries(
            args.log_dir, tag, epoch, np.asarray(image)[..., :3],
            np.asarray(label), preds, colormap=dataset.colormap,
            count=img_count, event_writer=writer.tb)

    aug_rng = np.random.default_rng(args.seed)
    order_rng = np.random.default_rng(args.seed + 1)
    _single_aot = []   # multi-host: per-step AOT compile happened
    # step-resolution scalar cadence (reference wrote loss/cost/LR
    # every iteration, train.py:167-176, 339-341); 0 disables
    summary_interval = int(params.get("summary_interval", 1))
    start_epoch = int(state.epoch)
    logger.info("Starting training loop at epoch %d...", start_epoch + 1)

    trace = cli.maybe_trace(getattr(args, "trace", None))
    trace.__enter__()
    for epoch in range(start_epoch + 1, params["epochs"] + 1):
        # --- train epoch ---
        acc = xmetrics.ConfusionAccumulator(dataset.num_classes)
        iter_buf = cli.StepScalarBuffer(("loss", "cost",
                                         "learning_rate"))
        step0 = int(state.step)
        order = order_rng.permutation(len(train_files))
        batches = cli.progress(
            _batch_stream(train_loader, order, batch_size, mesh,
                          stack_sharding),
            "train[%3d/%3d]" % (epoch, params["epochs"]),
            total=train_batches)
        def run_single(b, key):
            nonlocal state, train_step
            k_aug, k_drop = jax.random.split(key)
            _raw, image, label, mask = pipeline.augment_batch(
                b["stack"], b["heights"], b["widths"], k_aug,
                crop_hw=in_hw, channels=in_channels)
            step_batch = {
                "image": image, "label": label, "mask": mask,
                "valid": b["valid"].astype(np.float32)}
            if nproc > 1 and not _single_aot:
                _single_aot.append(True)
                # Compile before the first collective executes, then
                # barrier: the CPU Gloo rendezvous window (~30s) is far
                # shorter than a cold compile, so a host that compiles
                # slowly would otherwise wedge its peers. The persistent
                # compilation cache makes the real call below a fast
                # deserialize.
                from semanticsegmentationactivelearning_tpu import \
                    parallel
                # Keep the AOT executable and call IT from here on:
                # re-invoking the jit fn would re-lower and recompile on
                # a persistent-cache miss AFTER the barrier, re-creating
                # the compile skew the barrier absorbs. Shapes are
                # static (padded batches), so one executable serves the
                # whole run.
                train_step = train_step.lower(
                    state, step_batch, k_drop).compile()
                parallel.sync_processes("train-step-compiled")
            state, m = train_step(state, step_batch, k_drop)
            iter_buf.append(m)
            acc.update(m["confusion"])

        pending = []   # (batch, key) buffered toward one grouped call

        def run_pending():
            nonlocal state
            if not pending:
                return
            if grouped_step is not None \
                    and len(pending) == train_group:
                from semanticsegmentationactivelearning_tpu import \
                    parallel
                state = cli.dispatch_grouped_train(
                    pending, state, grouped_step, iter_buf, acc,
                    multihost=nproc > 1, aot_box=grouped_aot,
                    barrier=lambda: parallel.sync_processes(
                        "grouped-train-compiled"))
            else:
                # partial tail group (or grouping off): per-step path
                for b, key in pending:
                    run_single(b, key)
            pending.clear()

        for b in batches:
            step_seed = int(aug_rng.integers(0, 2 ** 31 - 1))
            pending.append((b, jax.random.PRNGKey(step_seed)))
            if len(pending) == (train_group if grouped_step is not None
                                else 1):
                run_pending()
        run_pending()
        scalars = iter_buf.flush()      # [n_steps, 3], one relay fetch
        train_metrics = acc.metrics()
        state = state.replace(epoch=state.epoch + 1)
        if summary_interval > 0:
            for i in range(0, scalars.shape[0], summary_interval):
                # step numbering: the i-th batch advanced the global
                # step to step0 + i + 1 (reference train.py:339-341)
                writer.write({
                    "split": "train_iter", "step": step0 + i + 1,
                    "epoch": epoch,
                    "loss": float(scalars[i, 0]),
                    "cost": float(scalars[i, 1]),
                    "learning_rate": float(scalars[i, 2])})
        writer.write({
            "split": "train", "epoch": epoch, "step": int(state.step),
            "loss": float(scalars[:, 0].mean()) if len(scalars)
            else float("nan"),
            "cost": float(scalars[:, 1].mean()) if len(scalars)
            else float("nan"),
            "learning_rate": float(scalars[-1, 2]) if len(scalars)
            else float("nan"),
            "mean_iou": float(train_metrics["MeanIoU"]),
            "pixel_accuracy": float(train_metrics["PixelAccuracy"]),
            # per-epoch raw confusion counts (the reference emitted the
            # matrix text summary each epoch, tensortools/metrics.py:
            # 92-153, train.py:178-206)
            "confusion": train_metrics["ConfusionMat"].tolist(),
        })

        # --- validation epoch ---
        if val_loader is not None:
            vacc = run_eval_epoch(eval_step, state, val_loader, in_hw,
                                  dataset.num_classes,
                                  desc="val[%3d]" % epoch,
                                  sharding=stack_sharding, mesh=mesh,
                                  global_bs=batch_size,
                                  channels=in_channels)
            vm = vacc.metrics()
            writer.write({
                "split": "val", "epoch": epoch, "step": int(state.step),
                "mean_iou": float(vm["MeanIoU"]),
                "pixel_accuracy": float(vm["PixelAccuracy"]),
                "class_iou": vm["ClassMeanIoU"].tolist(),
                "confusion": vm["ConfusionMat"].tolist(),
            })
            logger.info("epoch %d: val mIoU %.4f pixel-acc %.4f", epoch,
                        vm["MeanIoU"], vm["PixelAccuracy"])

        if is_main and predict_step is not None \
                and epoch % img_cadence == 0:
            dump_image_summaries(epoch)

        if is_main:
            manager.save("model", state)
    trace.__exit__(None, None, None)

    # Final standalone validation (train.py:354-374)
    if val_loader is not None:
        vacc = run_eval_epoch(eval_step, state, val_loader, in_hw,
                              dataset.num_classes, desc="final-val",
                              sharding=stack_sharding, mesh=mesh,
                              global_bs=batch_size,
                              channels=in_channels)
        vm = vacc.metrics()
        writer.write({
            "split": "final_val", "epoch": params["epochs"],
            "step": int(state.step),
            "mean_iou": float(vm["MeanIoU"]),
            "pixel_accuracy": float(vm["PixelAccuracy"]),
            "class_iou": vm["ClassMeanIoU"].tolist(),
            "confusion": vm["ConfusionMat"].tolist(),
        })
        logger.info("final val mIoU %.4f", vm["MeanIoU"])
    logger.info("Training successfully finished %d epochs",
                params["epochs"])
    manager.close()
    writer.close()
    return 0


if __name__ == "__main__":
    cli.setup_logging()
    args = cli.parse_dataset_args(sys.argv[0])
    with open(args.params, "r") as f:
        args.params = conf.load_params(args.params)
    logger.info("Running with following parameters:\n%s",
                json.dumps(args.params, sort_keys=True, indent=4))
    sys.exit(main(args))
