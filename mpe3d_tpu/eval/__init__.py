"""Evaluation: metric libraries + runners mirroring the reference scripts."""

from mpe3d_tpu.eval.clustering import (adjusted_rand_index,  # noqa: F401
                                       clustering_report,
                                       homogeneity_completeness_v)
from mpe3d_tpu.eval.pose_metrics import PoseEvalAccumulator  # noqa: F401
from mpe3d_tpu.eval.runners import (run_pose_metrics,  # noqa: F401
                                    run_reprojection_error, run_sm_metrics,
                                    run_sm_metrics_without_gt)
from mpe3d_tpu.eval.timing import TimingAccumulator  # noqa: F401
