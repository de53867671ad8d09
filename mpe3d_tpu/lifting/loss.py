"""Self-supervised multi-view reprojection loss.

TPU-native re-implementation of the reference's ``compute_error``
(reference: pose_estimator/train_pose_estimator.py:69-102): the predicted 3D
pose (decameters → ×10 metres) is projected into every camera (world→camera
4×4, perspective divide, radial distortion, K) and L1-compared against the
observed raw pixels, masked by per-(camera, joint) validity; the per-sample
scalar error is the sum over joints and cameras, and the training loss is
MSE(error, 0) (reference :216-218).

The reference loops 18 joints × C cameras in python; here it is one
vectorized projection over [B, C, J] — a single fused XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe3d_tpu.geometry.camera import CameraRig, project_points


def reprojection_error(pred: jnp.ndarray, error_input: jnp.ndarray,
                       rig: CameraRig, n_joints: int) -> jnp.ndarray:
    """Per-sample summed 2D reprojection error.

    pred: [B, J*3] MLP output in decameters.
    error_input: [B, C*J*4] raw-pixel loss features ([valid, x, y, prob]).
    rig: full rig (camera_names order — the loss projects into *all*
    cameras, reference :77).
    Returns [B] summed |Δu|+|Δv| over valid (camera, joint) pairs.
    """
    B = pred.shape[0]
    C = rig.n_cameras
    J = n_joints
    pts_w = pred.reshape(B, J, 3) * 10.0                         # metres
    err_in = error_input.reshape(B, C, J, 4)

    # project: [B, C, J, 2] — broadcast cameras over batch and joints.
    # min_depth keeps the loss finite when an untrained network puts a
    # joint on a camera plane (grad-clip then recovers).
    pix = project_points(pts_w[:, None, :, :], rig.T_wc[None, :, None],
                         rig.K[None, :, None], rig.dist[None, :, None],
                         min_depth=1e-4)
    coords = err_in[..., 1:3]
    valid = (err_in[..., 0] >= 0.5).astype(pred.dtype)           # [B, C, J]
    l1 = jnp.sum(jnp.abs(coords - pix), axis=-1) * valid
    # cap per-term error far beyond any real pixel scale: the radial model
    # diverges polynomially outside the image, and err² must stay finite in
    # fp32 for grad-clip to recover pathological early-training samples
    l1 = jnp.minimum(l1, 1e5)
    return jnp.sum(l1, axis=(1, 2))


def reprojection_loss(pred: jnp.ndarray, error_input: jnp.ndarray,
                      rig: CameraRig, n_joints: int) -> jnp.ndarray:
    """MSE of the summed per-sample error against zero (reference :216-218)."""
    err = reprojection_error(pred, error_input, rig, n_joints)
    return jnp.mean(err * err)
