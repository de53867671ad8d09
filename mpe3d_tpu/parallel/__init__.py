"""Device mesh + sharding helpers."""

from mpe3d_tpu.parallel.mesh import (data_sharding, make_mesh,  # noqa: F401
                                     pad_to_multiple, replicate, replicated,
                                     shard_batch)
