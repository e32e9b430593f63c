#!/usr/bin/env python
"""Inference CLI: checkpoint -> per-example prediction PNGs
(reference: inference.py).

Reads every ``.tfrecord`` under the dataset's test directory, runs the
jitted forward, and writes ``{output}/{id}.png`` with either the
dataset-id reverse embedding (default) or the colormap (``--color``).
Argmax and the LUT gather run on device; only the final uint8 map is
transferred (the reference encoded PNGs in-graph, inference.py:111-119 —
host PNG encode is the equivalent here).

``--output-size`` bilinearly resizes predictions, applying the resize to
the class probabilities before argmax (the reference resized the raw
logits and left its softmax dead, inference.py:96-98 — argmax-identical).
"""

import argparse
import json
import logging
import logging.config
import os
import sys

import numpy as np

from semanticsegmentationactivelearning_tpu import datasets
from semanticsegmentationactivelearning_tpu.data import example, loader
from semanticsegmentationactivelearning_tpu.models import get_model
from semanticsegmentationactivelearning_tpu.train import checkpoint as ckpt
from semanticsegmentationactivelearning_tpu.utils import cli

logger = logging.getLogger(__name__)


def make_predict_fn(model, state, lut, height, width, in_channels,
                    out_hw=None, mesh=None):
    """The jitted serving hot path: uint8 record stack -> uint8 label
    (or colormap) maps, cropped back to the record dims.

    On TPU the ENet forward runs the fully-kernelized predict chain
    (W-packed front -> W-packed mid -> in-kernel-argmax tail; full-res
    logits never hit HBM) when no resize is requested — softmax is
    monotone, so argmax(logits) equals the reference's
    argmax-after-softmax (reference inference.py:96-98) — and the input
    is RGB (the front kernel packs 3 channels).
    ``SSAL_FUSED_PREDICT=0`` forces the plain XLA forward (hardware
    A/B); ``=1`` forces the kernels even on CPU (Pallas interpret mode,
    so the e2e tests can drive this branch without a TPU).

    With a ``("data",)`` mesh the batch is sharded over devices and the
    body runs under ``jax.shard_map`` so the Pallas kernels (which have
    no GSPMD partitioning rule) stay enabled — each chip predicts its
    own images, no cross-device communication (same structure as
    ``train.steps.make_pool_score_step``'s data-only branch).

    Shared by the CLI and ``tools/bench_inference.py`` so the benchmark
    measures exactly what serving runs.
    """
    import jax
    import jax.numpy as jnp

    fused_env = os.environ.get("SSAL_FUSED_PREDICT", "").lower()
    applicable = (out_hw is None and in_channels == 3
                  and hasattr(model, "fused_predict"))
    if fused_env in ("0", "off"):
        use_fused = False
    elif fused_env in ("1", "on"):
        use_fused = applicable
    else:
        # per-model default: ENet's kernel chain is a 6.3x serving win
        # (its XLA forward can't even compile at batch 16); ICNet's
        # plain lax forward measured FASTER than its predict kernels
        # once the round-5 conv lowering landed (224.8 vs 180.5 img/s,
        # tools/probe_icnet_predict.py, docs/PERF.md)
        use_fused = (applicable
                     and jax.default_backend() not in ("cpu",)
                     and getattr(model, "fused_predict_default", True))
    fused_interpret = use_fused and jax.default_backend() == "cpu"

    def body(state, lut, stack):
        image = stack[..., :in_channels].astype(jnp.float32) / 255.0
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if use_fused:
            pred = model.fused_predict(variables, image,
                                       use_pallas=True,
                                       interpret=fused_interpret)
            return lut[pred[:, :height, :width]]
        logits = model.apply(variables, image, training=False)
        # crop divisor padding back to the record dims
        logits = logits[:, :height, :width]
        prob = jax.nn.softmax(logits, axis=-1)
        if out_hw is not None:
            prob = jax.image.resize(
                prob, (prob.shape[0], out_hw[0], out_hw[1],
                       prob.shape[-1]), method="bilinear")
        pred = jnp.argmax(prob, axis=-1)
        return lut[pred]  # uint8 [B,h,w] or [B,h,w,3]

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        # check_vma=False: pallas_call out_shapes carry no varying-axis
        # metadata, so the shard_map replication checker rejects the
        # fused kernels otherwise
        sharded = jax.shard_map(body, mesh=mesh,
                                in_specs=(P(), P(), P("data")),
                                out_specs=P("data"),
                                check_vma=False)

        @jax.jit
        def predict(stack):
            return sharded(state, lut, stack)
    else:
        @jax.jit
        def predict(stack):
            return body(state, lut, stack)

    return predict, use_fused


def main(args):
    import jax
    import jax.numpy as jnp

    cli.enable_compilation_cache()
    if args.dataset == "cityscapes":
        dataset = datasets.Cityscapes()
    elif args.dataset == "freiburg":
        dataset = datasets.Freiburg()
    elif args.dataset == "vistas":
        dataset = datasets.Vistas()
    else:
        raise NotImplementedError("Dataset \"%s\" not yet supported."
                                  % args.dataset)

    data_dir = args.data_dir
    if not os.path.isdir(data_dir):
        logger.error("Data dir %s does not exist", data_dir)
        return 1
    files = sorted(os.path.join(data_dir, f)
                   for f in os.listdir(data_dir)
                   if f.endswith(".tfrecord"))
    if not files:
        # accept a dataset root with a test/ subdir, like the reference's
        # get_test_paths usage (inference.py:72)
        test_dir = dataset.get_test_paths(data_dir)[0]
        if os.path.isdir(test_dir):
            files = sorted(os.path.join(test_dir, f)
                           for f in os.listdir(test_dir)
                           if f.endswith(".tfrecord"))
    if not files:
        logger.error("No .tfrecord files under %s", data_dir)
        return 1
    os.makedirs(args.output, exist_ok=True)

    # Peek dims from the first record (inference.py:75-83)
    height, width, channels = example.peek_dims(files[0])
    logger.info("Input records: %dx%dx%d, %d examples", height, width,
                channels, len(files))

    model_name = _resolve_model_name(args)
    logger.info("Model: %s", model_name)
    model = get_model(model_name, dataset.num_classes)
    # Pad the storage window up to the model's input-divisibility
    # requirement (ENet 8, ICNet 32); predictions are cropped back to
    # the record dims before writing.
    div = getattr(model, "input_divisor", 1)
    store_hw = (-(-height // div) * div, -(-width // div) * div)
    # extra modality planes (`-m nir ...`) stack after RGB, matching
    # the train-time decoder — a checkpoint trained with modalities
    # needs the same input channel count here or restore would keep a
    # shape-mismatched (random) stem
    modalities = tuple(m for m in (getattr(args, "modalities", None)
                                   or ())
                       if m not in ("rgb", "image"))
    rec_loader = loader.RecordLoader(files, args.batch_size,
                                     storage_hw=store_hw,
                                     modalities=modalities,
                                     with_label=False)
    in_channels = rec_loader.channels
    if modalities:
        logger.info("Stacking modalities %s -> %d input channels",
                    list(modalities), in_channels)

    # Build + restore state (params/batch_stats only are used)
    from semanticsegmentationactivelearning_tpu.train import (
        create_train_state, optim)
    state = create_train_state(
        model, optim.make_optimizer({}), jax.random.PRNGKey(0),
        store_hw, channels=in_channels)
    logger.info("Loading checkpoint %s", args.ckpt)
    state = ckpt.restore_checkpoint(args.ckpt, state)
    logger.info("Checkpoint loaded")

    out_hw = tuple(args.size) if args.size is not None else None
    if args.color:
        lut = jnp.asarray(dataset.colormap)          # [256,3] uint8
    else:
        lut = jnp.asarray(dataset.embedding_reversed)
        if lut.ndim != 1:
            # color-coded datasets reverse-embed to their colormap
            lut = jnp.asarray(dataset.colormap)

    # multi-chip serving: shard each batch over a ("data",) mesh (one
    # image per chip at batch 8 on a v5e-8); the Pallas kernels run
    # per-shard under shard_map
    from semanticsegmentationactivelearning_tpu import parallel
    mesh = None
    if jax.device_count() > 1 \
            and args.batch_size % jax.device_count() == 0:
        mesh = parallel.make_mesh()
        logger.info("Data-parallel serving over %d devices",
                    jax.device_count())
    predict, use_fused = make_predict_fn(model, state, lut, height,
                                         width, in_channels, out_hw,
                                         mesh=mesh)
    if use_fused:
        logger.info("Fused Pallas predict chain enabled")
    stack_sharding = parallel.data_sharded(mesh) if mesh is not None \
        else None

    # overlap the next batch's H2D upload with the in-flight predict
    # (same measured win as the train/AL loops: the relay serializes
    # fresh-host-numpy uploads behind compute otherwise)
    from semanticsegmentationactivelearning_tpu.data import (
        device_prefetch, png_writer)
    batches = device_prefetch.device_prefetch(
        rec_loader.batches(), sharding=stack_sharding)
    written = []
    # PNG encode + disk write run on a background thread (native libpng
    # pool when csrc/ is built) so they overlap the next batch's predict
    # — the reference got the same overlap by encoding in-graph under
    # sess.run (inference.py:111-119)
    # Live viewer: runs in a separate process CONCURRENTLY with the
    # prediction loop, watching the shared path list (the reference's
    # PlotThread in a multiprocessing.Process, inference.py:32-59,
    # 137-142); results are browsable while long runs keep writing.
    view_proc = None
    view_paths = None
    if args.view:
        import multiprocessing
        mp = multiprocessing.get_context("spawn")  # no forked jax state
        view_manager = mp.Manager()
        view_paths = view_manager.list()
        # daemon: an exception in the predict loop must not leave the
        # interpreter blocked at exit joining a busy-waiting child
        view_proc = mp.Process(target=_view_process, args=(view_paths,),
                               daemon=True)
        view_proc.start()

    with png_writer.AsyncPngWriter() as writer:
        for b in cli.progress(batches, "inference",
                              total=rec_loader.num_batches()):
            out = np.asarray(predict(b["stack"]))
            paths = []
            for j in range(len(out)):
                if not b["valid"][j]:
                    paths.append(None)
                    continue
                file_id = os.path.basename(
                    str(rec_loader.filenames[b["index"][j]]))
                file_id = file_id.replace(".tfrecord", "")
                path = os.path.join(args.output, file_id + ".png")
                paths.append(path)
                written.append(path)
                logger.info("Writing processed sample %s", file_id)
            writer.submit(paths, out)
            if view_paths is not None:
                view_paths.extend(p for p in paths if p is not None)
    logger.info("Inference successfully finished (%d files).",
                len(written))

    if view_proc is not None:
        if len(view_paths) == 0:
            # nothing was ever written: the child is still in its
            # wait-for-first-image loop and would never exit
            view_proc.terminate()
        else:
            view_proc.join()
    return 0


def _resolve_model_name(args):
    """Model family for the checkpoint: the ``--model`` flag, else the
    ``network.model`` recorded in the training run's ``config.json``
    (dumped next to — or one level above — the checkpoint), else ENet.
    The reference hardcoded its only model (inference.py:93)."""
    if args.model:
        return args.model
    start = args.ckpt
    if not os.path.isdir(start):
        start = os.path.dirname(os.path.abspath(start))
    for d in (start, os.path.dirname(start)):
        cfg = os.path.join(d, "config.json")
        if os.path.exists(cfg):
            try:
                with open(cfg) as fp:
                    name = json.load(fp).get("network", {}).get("model")
            except (ValueError, OSError):
                continue
            if name:
                return name
    logger.info("No config.json found near checkpoint; assuming ENet")
    return "ENet"


def _view_process(filepaths):
    """Viewer child-process body: wait for the first prediction to land
    (the reference's PlotThread busy-waited the same way,
    inference.py:50-52), then start the key-nav figure over the shared
    — still growing — path list."""
    import time

    while len(filepaths) == 0:
        time.sleep(0.1)
    try:
        _view(filepaths)
    except Exception:  # headless hosts: no display is non-fatal
        logging.getLogger(__name__).exception("viewer exited")


def _view(filepaths):
    """matplotlib key-nav viewer (reference: inference.py:32-59) over a
    possibly still-growing path list; reads of a PNG the async writer
    has not flushed yet are retried."""
    import time

    import matplotlib.pyplot as plt

    state = {"idx": 0}
    fig = plt.figure()
    ax = fig.gca()

    def show():
        path = filepaths[state["idx"]]
        for _ in range(50):
            try:
                img = plt.imread(path)
                break
            except (OSError, ValueError):
                time.sleep(0.1)  # async writer still flushing
        else:
            return
        ax.imshow(img)
        ax.set_xlabel(os.path.basename(path))
        fig.canvas.draw()

    def on_key(event):
        if event.key == "left":
            state["idx"] = (state["idx"] - 1) % len(filepaths)
        elif event.key == "right":
            state["idx"] = (state["idx"] + 1) % len(filepaths)
        show()

    fig.canvas.mpl_connect("key_press_event", on_key)
    show()
    plt.show()


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", type=str, dest="ckpt",
                        required=True, help="Path to checkpoint file.")
    parser.add_argument("-d", "--data-dir", type=str, dest="data_dir",
                        required=True,
                        help="Path to dataset test set directory.")
    parser.add_argument("-o", "--output", type=str, dest="output",
                        required=True,
                        help="Output directory to store prediction maps.")
    parser.add_argument("-t", "--dataset", type=str, dest="dataset",
                        required=True,
                        help="Dataset type: {cityscapes, freiburg, "
                             "vistas}.")
    parser.add_argument("-m", "--model", type=str, default=None,
                        dest="model", required=False,
                        help="Model family of the checkpoint; defaults "
                             "to the network.model in the config.json "
                             "next to the checkpoint, else ENet.")
    parser.add_argument("-s", "--output-size", type=int, nargs=2,
                        dest="size", required=False, default=None,
                        help="Size of the output images.")
    parser.add_argument("--color", action="store_true", required=False,
                        default=False, dest="color")
    parser.add_argument("--modalities", type=str, nargs="+",
                        default=[], dest="modalities", required=False,
                        help="Extra record modalities stacked after "
                             "RGB (must match training, e.g. "
                             "nir_gray).")
    parser.add_argument("-b", "--batch-size", type=int, default=1,
                        dest="batch_size", required=False,
                        help="Images per predict dispatch (default 1 "
                             "matches the reference's batch-1 "
                             "pipeline; on TPU larger batches "
                             "amortize the dispatch overhead — 16 "
                             "measured best at 1024x2048, see "
                             "docs/PERF.md serving tables).")
    parser.add_argument("--view", action="store_true", default=False,
                        dest="view", help="Interactive result viewer.")
    return parser.parse_args(argv)


if __name__ == "__main__":
    cli.setup_logging()
    sys.exit(main(parse_arguments()))
