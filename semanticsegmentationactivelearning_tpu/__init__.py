"""TPU-native semantic segmentation & active-learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``alfrunesiq/SemanticSegmentationActiveLearning`` (TF1 research stack;
see SURVEY.md for the full structural analysis). The compute path is
pure-functional JAX compiled for TPU; the runtime around it (record IO,
ETL, host data loading, checkpointing, the active-learning state
machine) is host-side Python with optional C++ acceleration.

Subpackages
-----------
datasets   Dataset metadata: label tables, trainId embeddings, colormaps,
           on-disk file discovery (reference: datasets/*.py).
data       Record IO (TFRecord-compatible), offline ETL, the host loader
           and the jit-compiled augmentation pipeline
           (reference: tensortools/{tfrecord,input}.py, generate_dataset.py).
models     ENet and ICNet as flax modules built from fused TPU-friendly
           blocks (reference: models/enet/*, models/icnet/* [stub]).
ops        Pure-function kernels: PReLU, pool/unpool, spatial dropout,
           losses, streaming confusion-matrix metrics, fused acquisition
           scoring (reference: models/util/extra_ops.py,
           tensortools/{losses,metrics}.py, active_learning.py:229-263).
parallel   Device-mesh construction and sharding policy (the reference had
           none; its only parallelism was a 2-GPU train/val split,
           train.py:97-105).
train      Train/eval step builders, optimizer conf, checkpoint manager,
           config handling (reference: train.py, tensortools/checkpoint_manager.py).
utils      Logging and small host-side helpers.
"""

__version__ = "0.1.0"
