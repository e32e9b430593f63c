#!/usr/bin/env python
"""Active-learning CLI (reference: active_learning.py — the flagship).

Capability-identical host loop with a drop-in ``state.json`` schema
(active_learning.py:110-130):

    { "checkpoint": str|null, "iteration": int,
      "dataset": { "train": {"filenames", "labelled", "unlabelled",
                             "no_label"},
                   "val":   {"filenames"},
                   "test":  {"filenames"} } }

Per AL round: early-stopped training with pseudo-labeling (warm-up grace
+ no-improvement patience, 523-649), best-checkpoint commit on val mIoU
(618-635), test-set evaluation logged against the labelled-set size
(651-680), a fused pool-scoring pass (682-715), lowest-confidence
selection (or random draw for negative ``selection_size`` — the
*intended* behavior of the reference's 785-793 branch), an optional
human-annotation pause for truly-unlabelled examples (796-823), and a
state.json commit (842-854).

The TF graph/session/placeholder machinery is gone: one param pytree,
jitted steps, host-side numpy index sets.
"""

import glob
import itertools
import json
import logging
import os
import sys
import time

import numpy as np

from semanticsegmentationactivelearning_tpu.data import (loader, pipeline,
                                                         sampler)
from semanticsegmentationactivelearning_tpu import parallel
from semanticsegmentationactivelearning_tpu.models import get_model
from semanticsegmentationactivelearning_tpu.ops import metrics as xmetrics
from semanticsegmentationactivelearning_tpu.train import (
    checkpoint as ckpt, config as conf, create_train_state, make_eval_step,
    make_mc_score_step, make_pool_score_step, make_score_step,
    make_train_step, optim)
from semanticsegmentationactivelearning_tpu.utils import cli, images

logger = logging.getLogger(__name__)


def _write_state_json(state_filename, state):
    """Atomic state.json write (tmp + rename): a concurrent reader —
    e.g. a non-main process of a fresh multi-host start — must never
    see a truncated file."""
    tmp = state_filename + ".part"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=2)
    os.replace(tmp, state_filename)


def init_or_load_state(state_filename, args, alparams, rng, write=True):
    """Initialize or restore the AL bookkeeping
    (active_learning.py:73-142). ``write=False`` computes the state
    without persisting it (non-main processes of a multi-host run)."""
    if os.path.exists(state_filename):
        with open(state_filename) as f:
            return json.load(f)

    train_glob = os.path.join(args.data_dir, "train", "*.tfrecord")
    if args.dataset == "freiburg":
        test_glob = os.path.join(args.data_dir, "test", "*.tfrecord")
    else:
        # cityscapes/vistas: annotated val split serves as the test set
        test_glob = os.path.join(args.data_dir, "val", "*.tfrecord")

    train_val = np.sort(np.array(glob.glob(train_glob)))
    val_examples = train_val[:alparams["num_validation"]]
    train_examples = train_val[alparams["num_validation"]:]
    test_examples = np.sort(np.array(glob.glob(test_glob)))

    train_indices = np.arange(len(train_examples), dtype=np.int64)
    rng.shuffle(train_indices)

    initially_labelled = alparams["num_initially_labelled"]
    if initially_labelled < 0:
        initially_labelled = len(train_examples)

    no_label_indices = np.empty(0, dtype=np.int64)
    if args.unlabelled is not None:
        no_label_examples = sorted(
            glob.glob(os.path.join(args.unlabelled, "*.tfrecord")))
        no_label_indices = np.arange(
            len(train_examples),
            len(train_examples) + len(no_label_examples))
        train_examples = np.concatenate(
            (train_examples, np.array(no_label_examples)))
        train_indices = np.concatenate((train_indices, no_label_indices))

    labelled = train_indices[:initially_labelled]
    unlabelled = train_indices[initially_labelled:]

    state = {
        "checkpoint": None,
        "iteration": 0,
        "dataset": {
            "train": {
                "filenames": [str(f) for f in train_examples],
                "labelled": labelled.tolist(),
                "unlabelled": unlabelled.tolist(),
                "no_label": no_label_indices.tolist(),
            },
            "val": {"filenames": [str(f) for f in val_examples]},
            "test": {"filenames": [str(f) for f in test_examples]},
        },
    }
    if write:
        _write_state_json(state_filename, state)
    return state


def poll_human_annotations(to_annotate_indices, train_examples, logger):
    """Block until the user supplies annotated record files for the
    selected truly-unlabelled examples (active_learning.py:796-823).
    Uses a tkinter file dialog when available, else stdin paths."""
    # Guard against fixed-width unicode arrays truncating new paths.
    train_examples = np.asarray(train_examples, dtype=object)
    try:
        import tkinter
        import tkinter.filedialog
        tkinter.Tk().withdraw()
        have_tk = True
    except Exception:
        have_tk = False

    while len(to_annotate_indices) > 0:
        to_annotate = train_examples[to_annotate_indices]
        basenames = [os.path.basename(p) for p in to_annotate]
        logger.info("Please annotate the following examples:\n%s",
                    "\n".join(basenames))
        if have_tk:
            filenames = tkinter.filedialog.askopenfilename(
                multiple=1, filetypes=(("TFRecord", "*.tfrecord"),))
        else:
            line = input("Paths to annotated .tfrecord files "
                         "(space-separated): ")
            filenames = line.split()
        hit = []
        for filename in filenames:
            basename = os.path.basename(filename)
            idx = -1
            for i, candidate in enumerate(to_annotate):
                if str(candidate).endswith(basename):
                    idx = i
                    break
            if idx != -1:
                train_examples[to_annotate_indices[idx]] = filename
                hit.append(idx)
            else:
                logger.info("Unrecognized filepath: %s", filename)
        to_annotate_indices = np.delete(to_annotate_indices, hit)
    return train_examples


def main(args, logger):
    import jax

    cli.enable_compilation_cache(args.log_dir)
    # Multi-host (DCN): join the other processes before any jax op;
    # meshes below then span every host's devices. The AL host loop
    # runs IDENTICALLY on every process (same seeds -> same batches,
    # metrics are psum-replicated, selections deterministic); only
    # process 0 writes state.json/metrics/checkpoints, and the round's
    # best-checkpoint path is broadcast for the shared-filesystem
    # restore. The reference had no distributed story (SURVEY.md §5).
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        parallel.initialize_distributed()
    nproc = jax.process_count()
    is_main = jax.process_index() == 0

    params = args.params
    hparams = params["hyperparams"]
    alparams = params["active_learning"]
    state_filename = os.path.join(args.log_dir, "state.json")
    os.makedirs(args.log_dir, exist_ok=True)
    if is_main and not os.path.exists(
            os.path.join(args.log_dir, "config.json")):
        conf.dump_params(params, args.log_dir)

    dataset = cli.make_dataset(args)
    init_rng = np.random.default_rng(args.seed)
    # every process computes the identical state from the same seed;
    # only process 0 persists it
    state = init_or_load_state(state_filename, args, alparams, init_rng,
                               write=is_main)

    # dtype=object: fixed-width unicode arrays silently truncate longer
    # paths assigned later by poll_human_annotations, corrupting
    # state.json durably
    train_examples = np.array(state["dataset"]["train"]["filenames"],
                              dtype=object)
    val_examples = np.array(state["dataset"]["val"]["filenames"])
    test_examples = np.array(state["dataset"]["test"]["filenames"])
    labelled = np.array(state["dataset"]["train"]["labelled"],
                        dtype=np.int64)
    unlabelled = np.array(state["dataset"]["train"]["unlabelled"],
                          dtype=np.int64)
    no_label_indices = np.array(state["dataset"]["train"]["no_label"],
                                dtype=np.int64)

    if nproc > 1 and len(no_label_indices) > 0:
        # the human-annotation poll for -u selections is interactive
        # and cannot span hosts; fail BEFORE a round trains, not after
        raise RuntimeError(
            "truly-unlabelled examples (-u/--unlabelled-dir) need the "
            "interactive annotation poll, which cannot run multi-host; "
            "annotate offline and resume, or run single-host")

    labelled_flags = np.zeros(len(train_examples), dtype=bool)
    labelled_flags[labelled] = True

    in_hw = (params["network"]["input"]["height"],
             params["network"]["input"]["width"])
    batch_size = params["batch_size"]
    if batch_size % nproc:
        logger.error("batch_size %d not divisible by %d processes",
                     batch_size, nproc)
        return 1
    local_bs = batch_size // nproc  # rows this host decodes per batch

    train_sampler = sampler.IndexSampler(
        train_examples, rng=np.random.default_rng(args.seed + 1))
    # Extra modality channels (e.g. Freiburg NIR via `-m nir`) stack
    # after the RGB planes, matching the reference decoder
    # (tensortools/input.py:265-269) and train.py's plumbing.
    modalities = tuple(m for m in (getattr(args, "modalities", None)
                                   or ())
                       if m not in ("rgb", "image"))
    train_loader = loader.RecordLoader(train_examples, local_bs,
                                       min_hw=in_hw,
                                       modalities=modalities)
    in_channels = train_loader.channels
    if modalities:
        logger.info("Stacking modalities %s -> %d input channels",
                    list(modalities), in_channels)
    # Pool-ranking loader: same records, no label plane — acquisition
    # scoring never reads labels (reference pool pass sess.run's only
    # the image/logits tensors, active_learning.py:687-700), so the
    # ranking pass skips label decode, stack assembly and 1/(C+1) of
    # its H2D bytes. Reuses the train loader's scanned storage window.
    rank_loader = loader.RecordLoader(
        train_examples, local_bs, min_hw=in_hw,
        storage_hw=train_loader.storage_hw,
        channels=in_channels, modalities=modalities, with_label=False)
    # Mixed-size pools (Vistas ships native resolutions): bucket the
    # ranking pass into up to 3 storage windows so one oversized record
    # doesn't inflate every decode/stack/H2D in the pool
    # (loader.size_buckets). Conf knob active_learning.size_buckets:
    # "auto" (default) plans 3 and keeps them only when they save
    # >=15% stack bytes; an int forces that many; 0/1 disables.
    # Single-host only: the multi-host global batch layout assumes one
    # stream. The downstream crop shape is bucket-independent, so the
    # score/embed steps and grouped dispatch are untouched. (Crops are
    # per-example-keyed so deterministic-measure selections are
    # bucket-invariant; BALD's MC noise is keyed per dispatch, so
    # bucketing re-draws it — still deterministic per run.)
    rank_buckets = None
    bucket_conf = alparams.get("size_buckets", "auto")
    if nproc == 1 and bucket_conf not in (0, 1, False, None) \
            and train_loader.record_dims is not None:
        nb = 3 if bucket_conf == "auto" else int(bucket_conf)
        plan, saving = loader.size_buckets(
            train_loader.record_dims, nb, min_hw=in_hw)
        if len(plan) > 1:
            rank_buckets = [
                (idx, loader.RecordLoader(
                    train_examples, local_bs, storage_hw=hw,
                    channels=in_channels, modalities=modalities,
                    with_label=False))
                for idx, hw in plan]
            logger.info(
                "Pool scoring in %d size buckets (windows %s): %.0f%% "
                "fewer stack bytes than the global %s window",
                len(plan), [hw for _, hw in plan], 100 * saving,
                rank_loader.storage_hw)
    val_loader = loader.RecordLoader(val_examples, local_bs,
                                     min_hw=in_hw,
                                     modalities=modalities) \
        if len(val_examples) else None
    test_loader = loader.RecordLoader(test_examples, local_bs,
                                      min_hw=in_hw,
                                      modalities=modalities) \
        if len(test_examples) else None

    # Model / optimizer / state
    multiscale = bool(hparams["softmax"].get("multiscale", False))
    model_kwargs = {"drop_rates": tuple(hparams["dropout_rates"])}
    if params["network"].get("dtype") in ("bfloat16", "bf16"):
        import jax.numpy as jnp
        model_kwargs["dtype"] = jnp.bfloat16
    model = get_model(params["network"]["model"], dataset.num_classes,
                      **model_kwargs)
    # decay_steps = batches per epoch over the initially-labelled set
    # (the reference *intended* per-epoch inverse-time decay like
    # train.py but its `train_batches` was undefined in this file —
    # NameError whenever learning_rate_decay > 0, reference
    # active_learning.py:316-318; all shipped AL confs use 0.0)
    optimizer = optim.make_optimizer(
        hparams, -(-max(len(labelled), 1) // batch_size))
    tstate = create_train_state(model, optimizer,
                                jax.random.PRNGKey(args.seed), in_hw,
                                channels=in_channels,
                                multiscale=multiscale)

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
        logger.info("Resuming from checkpoint \"%s\"", restore_from)
        tstate = ckpt.restore_checkpoint(restore_from, tstate)
        if args.reinitialize_output:
            tstate = ckpt.reinitialize_final_layer(
                tstate, model, jax.random.PRNGKey(args.seed + 7), in_hw,
                channels=in_channels)
    elif state["checkpoint"] is not None:
        logger.info("Resuming from checkpoint \"%s\"",
                    state["checkpoint"])
        tstate = ckpt.restore_checkpoint(state["checkpoint"], tstate)

    # MC measures (BALD) are acquisition-only: pseudo-labeling needs a
    # per-pixel confidence in the *predicted label*, so it falls back
    # to the entropy measure when ranking uses mutual information
    from semanticsegmentationactivelearning_tpu.ops import (
        acquisition as acq)
    mc_measure = alparams["measure"] in acq.MC_MEASURES
    pseudo_measure = "entropy" if mc_measure else alparams["measure"]
    if mc_measure and not (getattr(model, "uses_dropout", False)
                           and any(model.drop_rates)):
        raise ValueError(
            f"measure {alparams['measure']!r} needs a model with "
            f"active dropout (MC sampling); "
            f"{params['network']['model']} has none")
    pseudo_cfg = {"measure": pseudo_measure,
                  "threshold": alparams["threshold"]}
    mesh = None
    if jax.device_count() > 1 and batch_size % jax.device_count() == 0:
        mesh = parallel.make_mesh()
        logger.info("Data-parallel over %d devices (%d host(s))",
                    jax.device_count(), nproc)
    if nproc > 1 and mesh is None:
        logger.error("Multi-host run needs batch_size divisible by the "
                     "global device count %d", jax.device_count())
        return 1
    def _barriered(step, tag):
        """Multi-host: AOT-compile on first call, then barrier, so a
        cold-compiling host can't blow its peers' Gloo rendezvous
        window (~30s) at the first collective — the same pattern the
        train step uses. The AOT executable is KEPT and invoked from
        then on (shapes are static: padded batches), because
        re-invoking the jit fn would re-lower and recompile on a
        persistent-cache miss AFTER the barrier, re-creating the
        compile skew the barrier absorbs. No-op single-process."""
        if nproc == 1:
            return step
        done = []

        def wrapped(*args):
            if not done:
                lower = getattr(step, "lower", None)
                done.append(lower(*args).compile()
                            if lower is not None else None)
                parallel.sync_processes(tag)
            compiled = done[0]
            if compiled is not None:
                try:
                    return compiled(*args)
                except TypeError:
                    # argument shapes/dtypes drifted from the lowered
                    # signature (e.g. a resized pool) — let jit handle
                    # the retrace; the barrier only matters first-call
                    return step(*args)
            return step(*args)
        return wrapped

    train_step = make_train_step(
        model, optimizer, dataset.num_classes, hparams,
        pseudo_cfg=pseudo_cfg, mesh=mesh,
        # decay_steps must match make_optimizer above so the reported
        # learning_rate is the one optax applies
        steps_per_epoch=-(-max(len(labelled), 1) // batch_size))
    eval_step = _barriered(
        make_eval_step(model, dataset.num_classes, mesh=mesh),
        "al-eval-compiled")
    # Scoring may engage a ("data","space") mesh when the per-chip HBM
    # estimate says full-width activations won't fit (GSPMD inserts the
    # per-conv halo exchanges; parallel.make_mesh_auto).
    score_mesh = mesh
    if mesh is not None:
        dtype_bytes = 2 if "dtype" in model_kwargs else 4
        auto = parallel.make_mesh_auto(batch_size, in_hw,
                                       dtype_bytes=dtype_bytes)
        if "space" in auto.axis_names:
            score_mesh = auto
            logger.info("Spatially-sharded scoring engaged: mesh %s",
                        dict(auto.shape))
    score_group = int(alparams.get("score_group", 4))
    pool_score_step = None
    if mc_measure:
        # BALD: the MC step lax.maps per image, so the grouped-dispatch
        # machinery drives it unchanged — a whole score_group of loader
        # batches concatenates into ONE dispatch (fixed per-call
        # overhead ~26ms through the relay amortizes over
        # score_group * batch * mc_passes forwards). The per-call MC
        # key is folded in per dispatch: deterministic per run.
        mc_passes = int(alparams.get("mc_passes", 8))
        logger.info("BALD acquisition: %d MC-dropout passes", mc_passes)
        mc_step = _barriered(
            make_mc_score_step(model, dataset.num_classes, mc_passes,
                               mesh=score_mesh), "al-mc-compiled")
        mc_rng = jax.random.PRNGKey(args.seed + 11)
        mc_calls = itertools.count()

        def score_step(tstate, batch):
            key = jax.random.fold_in(mc_rng, next(mc_calls))
            return mc_step(tstate, batch["image"], key)

        if score_group > 1:
            def pool_score_step(tstate, images):
                key = jax.random.fold_in(mc_rng, next(mc_calls))
                return mc_step(tstate, images, key)
    else:
        score_step = _barriered(
            make_score_step(model, dataset.num_classes,
                            alparams["measure"], mesh=score_mesh),
            "al-score-compiled")
        # Pool scoring groups several loader batches into one dispatch
        # (lax.map) to amortize fixed per-call overhead (~26ms through
        # the TPU relay); under a mesh each micro-batch stays
        # data-sharded. Under the spatial mesh the per-dispatch
        # micro-batch is HALVED so the live activation footprint the
        # mesh exists to bound stays constant while the dispatch count
        # still drops.
        if score_group > 1:
            if score_mesh is mesh:
                pool_score_step = make_pool_score_step(
                    model, dataset.num_classes, alparams["measure"],
                    micro_batch=batch_size, mesh=mesh)
            elif batch_size % 2 == 0:
                pool_score_step = make_pool_score_step(
                    model, dataset.num_classes, alparams["measure"],
                    micro_batch=batch_size // 2, mesh=score_mesh)

    # Selection strategy: "uncertainty" ranks per-image confidence
    # (the reference's only mode, active_learning.py:705-715);
    # "coreset" is a diversity extension — greedy k-center over pool
    # embeddings (ops/selection.k_center_greedy)
    selection_mode = alparams.get("selection", "uncertainty")
    if selection_mode not in ("uncertainty", "coreset"):
        raise ValueError(
            f"active_learning.selection must be 'uncertainty' or "
            f"'coreset', got {selection_mode!r}")
    embed_step = None
    if selection_mode == "coreset":
        from semanticsegmentationactivelearning_tpu.train import (
            make_embed_step)
        logger.info("Core-set (k-center greedy) selection enabled")
        embed_step = _barriered(make_embed_step(model, mesh=score_mesh),
                                "al-embed-compiled")

    group_score_step = None
    if nproc > 1:
        # host-side concat of process-spanning arrays is impossible, so
        # multi-host grouping stacks the buffered global batches INSIDE
        # jit instead (train.steps.make_group_score_step: leading-axis
        # stack keeps row ownership, per-host chunks scored under
        # shard_map). Data-only mesh, deterministic measures; the MC
        # (BALD) scorer keeps per-dispatch keys and stays ungrouped.
        pool_score_step = None
        if (score_group > 1 and not mc_measure
                and score_mesh is not None
                and tuple(score_mesh.axis_names) == ("data",)):
            from semanticsegmentationactivelearning_tpu.train import (
                make_group_score_step)
            group_score_step = _barriered(
                make_group_score_step(model, dataset.num_classes,
                                      alparams["measure"], score_group,
                                      score_mesh),
                "al-group-score-compiled")
            logger.info("Multi-host grouped pool dispatch: %d global "
                        "batches per dispatch", score_group)

    # background checkpoint IO: each epoch's cache() overlaps the next
    # epoch's compute (the TrainState fetch through the TPU relay costs
    # seconds); commit()/chdir() join the in-flight write first
    ckpt_manager = ckpt.CheckpointManager(args.log_dir, async_io=True)
    # metrics/checkpoints are replicated across hosts: only 0 writes
    writer = cli.MetricsWriter(args.log_dir, enabled=is_main,
                               tensorboard=getattr(args, "tensorboard",
                                                   False))
    aug_rng = np.random.default_rng(args.seed + 2)
    # base key for the per-round ranking passes (per-example crop
    # derivation in pipeline.score_batch_indexed)
    rank_key = jax.random.PRNGKey(args.seed + 13)
    # double-buffered H2D upload of the uint8 stacks (pre-sharded over
    # the mesh) so transfer overlaps the in-flight step's compute
    stack_sharding = parallel.data_sharded(mesh) if mesh is not None \
        else None

    def _stream(loader_, order=None, with_labelled=False):
        """Per-host batch stream (``parallel.batch_stream``):
        single-process -> double-buffered device_put; multi-host ->
        each host decodes its slice of every global chunk, stitched
        into one globally-sharded array. ``with_labelled`` also shards
        the per-row labelled flags (the pseudo-labeling input, derived
        host-side from the local indices)."""
        if order is None:
            order = np.arange(loader_.count)
        return parallel.batch_stream(
            loader_, order, batch_size, mesh, sharding=stack_sharding,
            extra_keys=("labelled",) if with_labelled else (),
            extra_fn=(lambda b: {"labelled": labelled_flags[b["index"]]})
            if with_labelled else None)

    def _rank_stream():
        """Full-pool batch stream + batch count for the ranking/
        embedding passes. With size buckets, per-bucket streams chain
        (ascending window size); every batch's global ``index`` rows
        keep the score scatter correct and the crop shape downstream
        is bucket-independent."""
        num_examples = len(train_examples)
        if rank_buckets is None:
            order = np.arange(num_examples)
            return (_stream(rank_loader, order),
                    -(-num_examples // batch_size))

        def chain():
            for idx, bucket_loader in rank_buckets:
                yield from parallel.batch_stream(
                    bucket_loader, idx, batch_size, None,
                    sharding=stack_sharding)
        total = sum(-(-len(idx) // batch_size)
                    for idx, _ in rank_buckets)
        return chain(), total

    if nproc > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        # per-image outputs (scores/embeddings) come back batch-sharded
        # across hosts; replicate (all-gather over DCN) so every
        # process fetches the full vector and selects identically
        _replicate = _barriered(
            jax.jit(lambda x: x,
                    out_shardings=NamedSharding(mesh, PartitionSpec())),
            "al-replicate-compiled")
    else:
        def _replicate(x):
            return x

    def _bcast_str(s, length=1024):
        """Broadcast a short string from process 0 (the committed
        checkpoint path for the shared-filesystem restore)."""
        if nproc == 1:
            return s
        from jax.experimental import multihost_utils
        b = (s or "").encode()
        if len(b) > length:
            raise ValueError(
                f"checkpoint path exceeds the {length}-byte broadcast "
                f"buffer: {s!r}")
        arr = np.zeros(length, np.uint8)
        arr[:len(b)] = np.frombuffer(b, np.uint8)
        out = np.asarray(multihost_utils.broadcast_one_to_all(arr))
        return bytes(out).rstrip(b"\x00").decode()

    # Pseudo-label image snapshots (reference wrote them as TB image
    # summaries every 100 epochs, active_learning.py:367-388).
    img_cfg = params.get("image_summaries") or {}
    pseudo_cadence = int(img_cfg.get("pseudo_cadence", 100))
    img_count = int(img_cfg.get("count", 2))

    def dump_pseudo_snapshot(tstate, epoch):
        from semanticsegmentationactivelearning_tpu.ops import acquisition
        order = train_sampler.epoch_order()[:batch_size]
        b = next(iter(train_loader.batches(order)))
        raw, _img, _lbl, _msk = pipeline.augment_batch(
            b["stack"], b["heights"], b["widths"], jax.random.PRNGKey(0),
            crop_hw=in_hw, channels=in_channels)

        @jax.jit
        def _pseudo(tstate, image):
            logits = model.apply(
                {"params": tstate.params,
                 "batch_stats": tstate.batch_stats}, image,
                training=False)
            lbl, msk, _conf = acquisition.pseudo_annotate(
                logits, pseudo_measure, dataset.num_classes,
                alparams["threshold"])
            return lbl, msk
        lbl, msk = _pseudo(tstate, raw)
        images.dump_summaries(
            args.log_dir, "pseudo-iter%d" % state["iteration"], epoch,
            np.asarray(raw)[..., :3],  # drop modality channels for PNG
            preds=np.asarray(lbl),
            masks=np.asarray(msk), colormap=dataset.colormap,
            count=img_count, event_writer=writer.tb)

    _compiled = []

    # step-resolution scalar cadence (reference wrote loss/cost/LR
    # every iteration, train.py:167-176); 0 disables
    summary_interval = int(params.get("summary_interval", 1))

    # Grouped training dispatch (train.steps.make_grouped_train_step):
    # identical trajectory, the fixed per-dispatch overhead amortized
    # over `train_group` scanned steps. Multi-host runs pass the
    # globally-sharded batches as a tuple (stacked inside jit, zero
    # cross-host data movement) and AOT-compile + barrier before the
    # first collective executes.
    train_group = int(params.get("train_group", 1))
    grouped_train = None
    grouped_aot = [] if nproc > 1 else None
    if train_group > 1:
        from semanticsegmentationactivelearning_tpu.train import (
            make_grouped_train_step)
        grouped_train = make_grouped_train_step(
            model, optimizer, dataset.num_classes, hparams,
            group=train_group, crop_hw=in_hw, channels=in_channels,
            pseudo_cfg=pseudo_cfg, mesh=mesh,
            steps_per_epoch=-(-max(len(labelled), 1) // batch_size),
            stacked_inputs=nproc == 1)
        logger.info("Grouped training dispatch: %d steps/call",
                    train_group)

    def run_train_epoch(tstate, epoch_desc):
        """One training epoch over the sampler's current set."""
        nonlocal train_step
        order = train_sampler.epoch_order()
        acc = xmetrics.ConfusionAccumulator(dataset.num_classes)
        iter_buf = cli.StepScalarBuffer(("loss", "cost",
                                         "learning_rate"))
        step0 = int(tstate.step)
        batches = cli.progress(
            _stream(train_loader, order, with_labelled=True),
            epoch_desc, total=-(-len(order) // batch_size))

        def row_labelled(b):
            return (b["labelled"] if "labelled" in b
                    else labelled_flags[b["index"]])

        def run_single(b, key):
            nonlocal tstate, train_step
            k_aug, k_drop = jax.random.split(key)
            raw, image, label, mask = pipeline.augment_batch(
                b["stack"], b["heights"], b["widths"], k_aug,
                crop_hw=in_hw, channels=in_channels)
            step_batch = {
                "image": image, "image_raw": raw, "label": label,
                "mask": mask, "labelled": row_labelled(b),
                "valid": b["valid"].astype(np.float32)}
            if nproc > 1 and not _compiled:
                # compile before the first collective executes, then
                # barrier, and keep the AOT executable: the CPU Gloo
                # rendezvous window (~30s) is far shorter than a cold
                # compile (train.py's first-step pattern)
                _compiled.append(True)
                train_step = train_step.lower(
                    tstate, step_batch, k_drop).compile()
                parallel.sync_processes("al-train-step-compiled")
            tstate, m = train_step(tstate, step_batch, k_drop)
            iter_buf.append(m)
            acc.update(m["confusion"])

        pending = []   # (batch, key) buffered toward one grouped call

        def run_pending():
            nonlocal tstate
            if not pending:
                return
            if grouped_train is not None \
                    and len(pending) == train_group:
                tstate = cli.dispatch_grouped_train(
                    pending, tstate, grouped_train, iter_buf, acc,
                    extra_row_fn=row_labelled, multihost=nproc > 1,
                    aot_box=grouped_aot,
                    barrier=lambda: parallel.sync_processes(
                        "al-grouped-train-compiled"))
            else:
                # partial tail group (or grouping off): per-step path
                for b, key in pending:
                    run_single(b, key)
            pending.clear()

        for b in batches:
            seed = int(aug_rng.integers(0, 2 ** 31 - 1))
            pending.append((b, jax.random.PRNGKey(seed)))
            if len(pending) == (train_group
                                if grouped_train is not None else 1):
                run_pending()
        run_pending()
        scalars = iter_buf.flush()      # [n_steps, 3], one relay fetch
        if summary_interval > 0:
            for i in range(0, scalars.shape[0], summary_interval):
                writer.write({
                    "split": "al_train_iter", "step": step0 + i + 1,
                    "round": state["iteration"],
                    "loss": float(scalars[i, 0]),
                    "cost": float(scalars[i, 1]),
                    "learning_rate": float(scalars[i, 2])})
        mean_loss = float(scalars[:, 0].mean()) if len(scalars) \
            else float("nan")
        return tstate, acc, mean_loss

    def run_eval(tstate, data_loader, desc):
        acc = xmetrics.ConfusionAccumulator(dataset.num_classes)
        batches = cli.progress(_stream(data_loader), desc,
                               total=-(-data_loader.count // batch_size))
        for b in batches:
            image, label, mask = pipeline.eval_batch(
                b["stack"], b["heights"], b["widths"], crop_hw=in_hw,
                channels=in_channels)
            acc.update(eval_step(tstate, {
                "image": image, "label": label, "mask": mask,
                "valid": b["valid"].astype(np.float32)}))
        return acc

    def train_loop(tstate, log_subdir):
        """Early-stopped AL training round
        (active_learning.py:523-649)."""
        grace = alparams.get("epochs/warm_up", 0)
        best_ckpt_path = state["checkpoint"]
        best_mean_iou = 0.0
        run_name = os.path.basename(log_subdir)
        no_improvement = 0
        while no_improvement < params["epochs"] or grace >= 0:
            grace -= 1
            tstate = tstate.replace(epoch=tstate.epoch + 1)
            epoch = int(tstate.epoch)
            tstate, tacc, mean_loss = run_train_epoch(
                tstate, "%s[%d] NIC=%d" % (run_name, epoch,
                                           no_improvement))
            val_miou = 0.0
            if val_loader is not None:
                vacc = run_eval(tstate, val_loader, "val[%d]" % epoch)
                val_miou = vacc.mean_iou
            writer.write({
                "split": "al_train", "round": state["iteration"],
                "epoch": epoch, "loss": mean_loss,
                "val_mean_iou": val_miou,
                "labelled": int(len(labelled)),
                "no_improvement": no_improvement,
                # per-epoch raw confusion counts (reference emitted the
                # matrix summary each epoch, tensortools/metrics.py:
                # 92-153)
                "confusion": tacc.metrics()["ConfusionMat"].tolist()})
            if (pseudo_cadence > 0 and state["iteration"] > 0
                    and nproc == 1
                    and epoch % pseudo_cadence == 0):
                # (single-host only: the snapshot batch is host-local
                # and its plain jit cannot consume sharded arrays)
                dump_pseudo_snapshot(tstate, epoch)
            if is_main:
                ckpt_manager.cache(tstate)
            improved = val_miou > best_mean_iou
            if improved or val_loader is None:
                # With no validation set every epoch commits, so a best
                # checkpoint always exists and the post-round restore
                # keeps (rather than discards) the round's training.
                # val_miou is psum-replicated, so every process takes
                # this branch in the same epochs; only 0 touches disk.
                best_mean_iou = max(best_mean_iou, val_miou)
                if is_main:
                    committed = ckpt_manager.commit(
                        os.path.join(log_subdir, "model"))
                    if committed != "":
                        best_ckpt_path = committed
            if improved:
                no_improvement = 0
            else:
                # Without a val signal this still terminates the round
                # after `epochs` post-warm-up epochs.
                no_improvement += 1
                if no_improvement >= params["epochs"] and grace < 0:
                    break
        if nproc > 1:
            # main finished writing; share the committed path for the
            # shared-filesystem restore below
            parallel.sync_processes("al-round-committed")
            best_ckpt_path = _bcast_str(best_ckpt_path or "") or None
        return tstate, best_ckpt_path

    def test_loop(tstate):
        """Test metrics keyed by labelled-set size
        (active_learning.py:651-680)."""
        acc = run_eval(tstate, test_loader,
                       "test[%d]" % len(labelled))
        m = acc.metrics()
        writer.write({
            "split": "al_test", "round": state["iteration"],
            "labelled": int(len(labelled)),
            "mean_iou": float(m["MeanIoU"]),
            "pixel_accuracy": float(m["PixelAccuracy"]),
            "class_iou": m["ClassMeanIoU"].tolist(),
            "confusion": m["ConfusionMat"].tolist()})
        logger.info("test @%d labelled: mIoU %.4f", len(labelled),
                    m["MeanIoU"])

    def rank_confidence(tstate):
        """Score the full pool; return lowest-confidence unlabelled
        examples (active_learning.py:682-715). Like the reference, the
        forward runs on the augment pipeline's *raw* (undistorted)
        crop — computed label-free via ``pipeline.score_batch`` over
        ``rank_loader`` (same crop/flip PRNG; scores are identical to
        the labelled path for the same seeds)."""
        num_examples = len(train_examples)
        confidence = np.zeros(num_examples, dtype=np.float32)
        order = np.arange(num_examples)
        stream, total = _rank_stream()
        batches = cli.progress(stream, "ranking[%d]" % len(labelled),
                               total=total)
        # multi-host: per-batch global (index, valid) reconstructed
        # host-side; scores come back replicated so every process
        # scatters — and selects — identically
        layouts = (loader.RecordLoader.global_batch_layout(
            order, batch_size, nproc) if nproc > 1 else None)
        import jax.numpy as jnp
        buf_raw, buf_idx, buf_valid = [], [], []
        # results stay on device until the very end: fetching a score
        # array syncs the relay, so resolving lazily lets every grouped
        # dispatch queue back-to-back
        pending = []

        def flush():
            if not buf_raw:
                return
            n_rows = sum(r.shape[0] for r in buf_raw)
            if pool_score_step is not None:
                # pad a short tail group by repeating the last
                # micro-batch: every dispatch then reuses the one
                # compiled group shape (a fresh shape costs a
                # multi-minute remote compile through the relay);
                # padded rows are cut before the valid-mask scatter
                while len(buf_raw) < score_group:
                    buf_raw.append(buf_raw[-1])
                scores = pool_score_step(
                    tstate, jnp.concatenate(buf_raw, axis=0))[:n_rows]
            elif group_score_step is not None:
                # multi-host grouped dispatch: tuple of global batches,
                # [group, B] replicated scores back (row-aligned);
                # padded tail chunks cut by the host-side slice below
                while len(buf_raw) < score_group:
                    buf_raw.append(buf_raw[-1])
                scores = group_score_step(tstate, tuple(buf_raw))
            else:
                scores = jnp.concatenate([
                    _replicate(score_step(tstate, {"image": r}))
                    for r in buf_raw])
            pending.append((scores, np.concatenate(buf_idx),
                            np.concatenate(buf_valid)))
            buf_raw.clear()
            buf_idx.clear()
            buf_valid.clear()

        pass_key = jax.random.fold_in(rank_key,
                                      int(state["iteration"]))
        for b in batches:
            # per-EXAMPLE crop keys: an example's crop/flip depend only
            # on (pass_key, global index), so scores are invariant to
            # how the pool is chunked (size buckets, grouped dispatch,
            # multi-host row layouts) and bit-identical across host
            # counts. Multi-host indices come from the replicated
            # global layout (identical on every process).
            if layouts is not None:
                gidx, gval = next(layouts)
                row_idx = np.maximum(gidx, 0)  # padding rows: any key
            else:
                gidx, gval = b["index"], b["valid"]
                row_idx = gidx
            raw = pipeline.score_batch_indexed(
                b["stack"], b["heights"], b["widths"], pass_key,
                row_idx, crop_hw=in_hw, channels=in_channels)
            buf_raw.append(raw)
            buf_idx.append(gidx)
            buf_valid.append(gval)
            if len(buf_raw) == score_group:
                flush()
        flush()
        for scores, idx, val in pending:
            # grouped multi-host scores arrive [group, B]; flatten and
            # trim the repeated tail padding to the real rows
            scores = np.asarray(scores).reshape(-1)[:len(idx)]
            confidence[idx[val]] = scores[val]

        unlabelled_conf = confidence[unlabelled]
        if len(unlabelled_conf) == 0:
            return np.empty(0, dtype=np.int64), unlabelled_conf
        selection_size = int(np.minimum(len(unlabelled),
                                        alparams["selection_size"]))
        idx = np.argpartition(unlabelled_conf,
                              np.minimum(selection_size,
                                         len(unlabelled_conf) - 1))
        return unlabelled[idx[:selection_size]], unlabelled_conf

    def rank_coreset(tstate):
        """Diversity acquisition: embed the full pool (global-average
        pooled deepest features), then greedy k-center picks the
        unlabelled examples farthest from the labelled set — batch
        coverage instead of pure-uncertainty clustering
        (ops/selection.k_center_greedy, Sener & Savarese 1708.00489).
        Returns (picked indices, per-unlabelled initial min distance
        to the labelled set — a coverage diagnostic)."""
        from semanticsegmentationactivelearning_tpu.ops import (
            selection as sel)
        import jax.numpy as jnp
        num_examples = len(train_examples)
        emb = None
        order = np.arange(num_examples)
        stream, total = _rank_stream()
        batches = cli.progress(stream, "embedding[%d]" % len(labelled),
                               total=total)
        layouts = (loader.RecordLoader.global_batch_layout(
            order, batch_size, nproc) if nproc > 1 else None)
        # embeddings stay on device until the very end (fetching syncs
        # the relay and would serialize the dispatch queue — same
        # pattern as rank_confidence above)
        pending = []
        pass_key = jax.random.fold_in(rank_key,
                                      int(state["iteration"]))
        for b in batches:
            # per-example crop keys; see rank_confidence
            if layouts is not None:
                gidx, gval = next(layouts)
                row_idx = np.maximum(gidx, 0)
            else:
                gidx, gval = b["index"], b["valid"]
                row_idx = gidx
            raw = pipeline.score_batch_indexed(
                b["stack"], b["heights"], b["widths"], pass_key,
                row_idx, crop_hw=in_hw, channels=in_channels)
            pending.append((
                _replicate(embed_step(tstate, {"image": raw})),
                gidx, gval))
        for e_dev, idx, val in pending:
            e = np.asarray(e_dev)
            if emb is None:
                emb = np.zeros((num_examples, e.shape[1]), np.float32)
            emb[idx[val]] = e[val]
        k = int(np.minimum(len(unlabelled), alparams["selection_size"]))
        if k <= 0 or emb is None:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        candidates = np.zeros(num_examples, dtype=bool)
        candidates[unlabelled] = True
        # Greedy picks are prefix-stable (pick i depends only on picks
        # < i), so always compile with the conf's fixed selection_size
        # and slice host-side: a shrinking final-round k would
        # otherwise bake a new static k into the jit signature and pay
        # a fresh multi-minute remote compile for a few matvecs.
        k_max = max(k, int(alparams["selection_size"]))
        picks, min_dist = sel.k_center_greedy(
            jnp.asarray(emb), jnp.asarray(labelled_flags),
            jnp.asarray(candidates), k_max)
        return (np.asarray(picks).astype(np.int64)[:k],
                np.asarray(min_dist)[unlabelled])

    iterations = alparams["iterations"]
    if iterations < 0:
        iterations = int(np.ceil(
            len(unlabelled) / float(abs(alparams["selection_size"]) or 1)))
        logger.info("Iteration count: %d", iterations)

    sel_rng = np.random.default_rng(args.seed + 3)
    while state["iteration"] < iterations:
        # Per-round phase wall clocks -> one "al_timing" record per
        # round (consumed by tools/bench_al_round.py; catches
        # between-phase stalls — checkpoint restore, host-side
        # selection — that the component benches can't see)
        _t_round0 = time.time()
        _phase_s = {}
        _labelled0 = int(len(labelled))

        # Step 1: train on the labelled set (+ pseudo-label sample)
        train_sampler.set_indices(labelled)
        if state["iteration"] == 0:
            log_subdir = os.path.join(args.log_dir, "pretrain")
        else:
            log_subdir = os.path.join(args.log_dir,
                                      "iter-%d" % state["iteration"])
            p = alparams["pseudo_labelling_proportion"]
            if p > 0:
                sample_size = int(len(labelled) * p / (1 - p))
                sample_size = int(np.minimum(sample_size,
                                             len(unlabelled)))
                train_sampler.set_sample_size(sample_size)
        os.makedirs(log_subdir, exist_ok=True)
        ckpt_manager.chdir(log_subdir)

        try:
            _t0 = time.time()
            tstate, checkpoint_path = train_loop(tstate, log_subdir)
            _phase_s["train"] = time.time() - _t0
        except KeyboardInterrupt:
            if ckpt_manager.latest_checkpoint != "":
                state["checkpoint"] = ckpt_manager.latest_checkpoint
            if is_main:
                _write_state_json(state_filename, state)
            raise

        # Reload the round's best checkpoint (active_learning.py:766-769)
        _t0 = time.time()
        if checkpoint_path:
            tstate = ckpt.restore_checkpoint(checkpoint_path, tstate)
        _phase_s["restore"] = time.time() - _t0

        # Step 2: test set metrics
        _t0 = time.time()
        if test_loader is not None and len(test_examples) > 0:
            test_loop(tstate)
        _phase_s["test"] = time.time() - _t0

        # Step 3: acquisition
        _t0 = time.time()
        train_sampler.set_indices(None)
        train_sampler.set_sample_size(0)
        if alparams["selection_size"] > 0:
            if selection_mode == "coreset":
                low_conf, min_dists = rank_coreset(tstate)
                # finite-only: with an empty center set the distances
                # are inf, which json.dump would emit as the non-JSON
                # literal `Infinity`
                finite = min_dists[np.isfinite(min_dists)]
                writer.write({
                    "split": "al_coreset", "round": state["iteration"],
                    "selected": int(len(low_conf)),
                    "min_dist_mean": float(finite.mean())
                    if len(finite) else None,
                    "min_dist_max": float(finite.max())
                    if len(finite) else None})
            else:
                low_conf, unlabelled_conf = rank_confidence(tstate)
                hist, edges = np.histogram(unlabelled_conf, bins=20,
                                           range=(0.0, 1.0))
                writer.write({
                    "split": "al_confidence",
                    "round": state["iteration"],
                    "histogram": hist.tolist(),
                    "bin_edges": edges.tolist(),
                    "mean": float(unlabelled_conf.mean())
                    if len(unlabelled_conf) else None})
        else:
            # Negative selection_size N: draw |N| at random — the
            # baseline config's intended semantics
            # (active_learning.py:785-793).
            draw = int(np.minimum(abs(alparams["selection_size"]),
                                  len(unlabelled)))
            low_conf = sel_rng.choice(unlabelled, draw, replace=False) \
                if draw > 0 else np.empty(0, dtype=np.int64)
        _phase_s["score_select"] = time.time() - _t0

        # Human annotation pause for truly-unlabelled selections
        to_annotate = no_label_indices[np.isin(no_label_indices,
                                               low_conf)]
        if len(to_annotate) > 0:
            if nproc > 1:
                raise RuntimeError(
                    "human-annotation polling (-u selections) is "
                    "interactive and cannot run multi-host; annotate "
                    "offline and resume, or run single-host")
            train_examples = poll_human_annotations(
                to_annotate, train_examples, logger)
        no_label_indices = no_label_indices[np.isin(
            no_label_indices, low_conf, invert=True)]

        if len(low_conf):
            logger.info("Moving following examples to labelled set:\n%s",
                        "\n".join(train_examples[low_conf].tolist()))
        labelled_flags[low_conf] = True

        # Step 4: state commit (active_learning.py:842-854)
        labelled = np.append(labelled, low_conf)
        unlabelled = unlabelled[np.isin(unlabelled, low_conf,
                                        assume_unique=True, invert=True)]
        state["dataset"]["train"]["filenames"] = train_examples.tolist()
        state["dataset"]["train"]["labelled"] = labelled.tolist()
        state["dataset"]["train"]["unlabelled"] = unlabelled.tolist()
        state["dataset"]["train"]["no_label"] = no_label_indices.tolist()
        writer.write({
            "split": "al_timing", "round": state["iteration"],
            "labelled": _labelled0,
            "round_s": round(time.time() - _t_round0, 3),
            **{f"{k}_s": round(v, 3) for k, v in _phase_s.items()}})
        state["iteration"] += 1
        state["checkpoint"] = checkpoint_path
        if is_main:
            _write_state_json(state_filename, state)
    ckpt_manager.close()
    writer.close()
    return 0


def _extra_args(parser):
    parser.add_argument(
        "-r", "--reinitialize-output-layer", action="store_true",
        dest="reinitialize_output", required=False,
        help="Reinitialize last layer of model (if checkpoint "
             "specified).")
    parser.add_argument(
        "-u", "--unlabelled-dir", type=str, default=None,
        dest="unlabelled", metavar="UNLABELLED_DIR",
        help="Path to directory containing only feature data.")


if __name__ == "__main__":
    cli.setup_logging()
    args = cli.parse_dataset_args(sys.argv[0], extra_optional=_extra_args)
    args.params = conf.load_params(args.params)
    sys.exit(main(args, logger))
