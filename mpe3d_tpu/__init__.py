"""mpe3d_tpu — TPU-native multi-person 3D pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gnns4hri/3D_multi_pose_estimator (Rodriguez-Criado et al., MVA 2024):

  * cross-view skeleton matching with a graph attention network
    (reference: skeleton_matching/gat2.py, graph_generator.py)
  * self-supervised multi-view 3D lifting with an MLP trained on a
    reprojection loss (reference: pose_estimator/train_pose_estimator.py)
  * a classical DLT triangulation backend
    (reference: utils/pose_estimator_utils.py:52-75)

Design stance: the reference's dynamic Python graphs + DGL sparse kernels
become fixed-shape, masked, jit-compiled tensor programs; geometry is
vmapped jax-numpy; training is pjit data-parallel over a device mesh.
"""

__version__ = "0.1.0"

from mpe3d_tpu.config import PANOPTIC, ARPLAB, RigConfig, get_rig  # noqa: F401
