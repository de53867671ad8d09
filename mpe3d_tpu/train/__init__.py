"""Training: dataset builders, pjit data-parallel trainers, checkpoints."""

from mpe3d_tpu.train.checkpoint import (checkpoint_exists,  # noqa: F401
                                        load_checkpoint, save_checkpoint,
                                        wait_for_async_saves)
from mpe3d_tpu.train.lifter import train_lifter  # noqa: F401
from mpe3d_tpu.train.lifter_data import (build_lifter_dataset,  # noqa: F401
                                         build_lifter_dataset_from_files)
from mpe3d_tpu.train.matcher import train_matcher  # noqa: F401
from mpe3d_tpu.train.matcher_data import build_matcher_scenes  # noqa: F401
