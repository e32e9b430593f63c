"""Device-mesh parallelism: DP sharding + multi-host (DCN) plumbing in
``mesh.py``, spatial partitioning for full-resolution inference in
``spatial.py``."""

from .mesh import (batch_stream, check_batch_divisible,
                   data_sharded,
                   estimate_score_hbm, image_sharded,
                   initialize_distributed, make_global_batch, make_mesh,
                   make_mesh_auto, process_shard, replicated,
                   sync_processes)

__all__ = ["make_mesh", "make_mesh_auto", "replicated", "data_sharded",
           "image_sharded", "check_batch_divisible",
           "initialize_distributed", "process_shard",
           "make_global_batch", "estimate_score_hbm", "sync_processes",
           "batch_stream"]
