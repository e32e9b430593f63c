"""Device-mesh parallelism: DP sharding now, spatial partitioning for
full-resolution inference in ``spatial.py``."""

from .mesh import (check_batch_divisible, data_sharded, make_mesh,
                   replicated)

__all__ = ["make_mesh", "replicated", "data_sharded",
           "check_batch_divisible"]
