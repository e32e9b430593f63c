#!/usr/bin/env python
"""Convert a reference TensorFlow checkpoint into this framework's
checkpoint format.

The reference saves ``tf.train.Checkpoint(model, epoch, step,
optimizer)`` per epoch (reference: train.py:226-229, 352); this tool
rewrites one as a ``TrainState`` checkpoint directory that the train/
AL/inference CLIs restore with ``-c`` — the migration path for users
bringing trained reference models. Optimizer slots start fresh (see
semanticsegmentationactivelearning_tpu/train/tf_import.py).

Usage:
    python tools/import_reference_checkpoint.py \
        --tf-checkpoint /ref/logs/model-42 \
        -t cityscapes -p conf/enet_cityscapes_pretrain.json -o out_dir
"""

import argparse
import logging
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402

from semanticsegmentationactivelearning_tpu import datasets  # noqa: E402
from semanticsegmentationactivelearning_tpu.train import (  # noqa: E402
    checkpoint as ckpt, config as cfg, optim, steps, tf_import)
from semanticsegmentationactivelearning_tpu.utils import cli  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--tf-checkpoint", required=True,
                        help="TF checkpoint prefix (e.g. logs/model-42)"
                             " or a directory containing one")
    parser.add_argument("-t", "--dataset-type", required=True,
                        choices=["cityscapes", "freiburg", "vistas",
                                 "generic"],
                        help="Dataset the model was trained on "
                             "(sets num_classes)")
    parser.add_argument("-p", "--parameters", required=True,
                        help="Conf JSON matching the reference run "
                             "(network/input/hyperparams)")
    parser.add_argument("-o", "--output", required=True,
                        help="Output checkpoint directory")
    parser.add_argument("--modality-channels", type=int, default=3,
                        help="Input channels (3 unless multi-modal)")
    parser.add_argument("--num-classes", type=int, default=None,
                        help="Override the dataset's class count "
                             "(required for -t generic)")
    parser.add_argument("--allow-partial", action="store_true",
                        help="Proceed even if some converted weights "
                             "have no destination in the target model "
                             "(wrong conf/dataset otherwise aborts)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cli.respect_platform_env()
    params = cfg.load_params(args.parameters)
    dataset = datasets.get_dataset(args.dataset_type)
    net = params["network"]
    hparams = params["hyperparams"]
    multiscale = bool(hparams.get("softmax", {}).get("multiscale"))

    num_classes = args.num_classes or getattr(dataset, "num_classes",
                                              None)
    if num_classes is None:
        parser.error("-t generic requires --num-classes")

    from semanticsegmentationactivelearning_tpu import models
    model = models.get_model(
        net.get("model", "ENet"), num_classes,
        drop_rates=tuple(hparams["dropout_rates"]))
    optimizer = optim.make_optimizer(hparams)
    template = steps.create_train_state(
        model, optimizer, jax.random.PRNGKey(0),
        (net["input"]["height"], net["input"]["width"]),
        channels=args.modality_channels, multiscale=multiscale)

    converted = tf_import.convert_reference_checkpoint(
        args.tf_checkpoint)
    # refuse to emit a "successful" checkpoint that silently dropped
    # trained weights (e.g. conf without softmax.multiscale against a
    # multiscale checkpoint, or a wrong -t/--num-classes head shape)
    report = tf_import.merge_report(template, converted)
    dropped = report["missing"] + [p for p, _, _ in report["mismatched"]]
    if dropped:
        for name in dropped[:10]:
            logging.error("unmergeable converted weight: %s", name)
        if len(dropped) > 10:
            logging.error("... and %d more", len(dropped) - 10)
        if not args.allow_partial:
            parser.error(
                "%d of %d converted weights have no destination in "
                "the target model — the conf/-t/--num-classes "
                "probably don't match the checkpoint. Re-run with "
                "--allow-partial to import anyway."
                % (len(dropped), len(dropped) + report["merged"]))
        logging.warning("--allow-partial: continuing; %d weights "
                        "keep fresh initialization", len(dropped))
    state = tf_import.to_train_state(converted, template)

    manager = ckpt.CheckpointManager(args.output)
    if "save_counter" in converted:
        manager.set_save_counter(converted["save_counter"] - 1)
    path = manager.save("model", state)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
