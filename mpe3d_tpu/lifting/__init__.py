"""3D lifting: input packing + self-supervised reprojection loss."""

from mpe3d_tpu.lifting.loss import reprojection_error, reprojection_loss  # noqa: F401
from mpe3d_tpu.lifting.pack import (apply_camera_dropout,  # noqa: F401
                                    pack_error_input, pack_lifter_input)
