"""Model families: GAT matcher + MLP lifter (pure-pytree modules)."""

from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher,  # noqa: F401
                                  init_matcher, matcher_num_params)
from mpe3d_tpu.models.mlp import (apply_lifter, init_lifter,  # noqa: F401
                                  lifter_num_params)
