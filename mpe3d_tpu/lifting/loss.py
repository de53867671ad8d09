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

Beyond parity, ``reprojection_loss`` offers two better-conditioned variants
(``kind=``):

* ``"reference"`` (default) — MSE of the per-sample *summed* L1 error,
  ``mean_B (Σ_{c,j} |Δu|+|Δv|)²``.  Its gradient w.r.t. each pixel residual
  is ``2·(Σ|e|)·sign(r)`` — the magnitude is a *sample-level constant*, so
  near convergence every joint keeps receiving full-size sign updates and
  the fit stalls in a noise ball (measured: the converged MLP sits at ~2×
  the MPJPE of the DLT prior it is fed, on both rigs —
  scripts/diag_lifter_prior.py).
* ``"per_term"`` — masked mean of squared per-term residuals
  ``Δu²+Δv²``: the gradient is proportional to each residual, and the
  optimum is the reprojection least-squares fit (what DLT computes),
  learned with the MLP's robustness to partial views.
* ``"huber"`` — per-coordinate Huber with ``huber_delta`` px: per_term's
  conditioning with L1's robustness to outlier detections (ghosts, wrong
  biggest-skeleton picks in the training data).

Adam's per-parameter scale invariance makes the reference lr (1e-4) valid
for all three despite their very different magnitudes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe3d_tpu.geometry.camera import CameraRig, project_points


def _reprojection_residuals(pred: jnp.ndarray, error_input: jnp.ndarray,
                            rig: CameraRig, n_joints: int):
    """Per-term pixel residuals.  Returns (d [B, C, J, 2], valid [B, C, J])."""
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
    # cap per-coordinate error far beyond any real pixel scale: the radial
    # model diverges polynomially outside the image, and squared terms must
    # stay finite in fp32 for grad-clip to recover pathological
    # early-training samples
    d = jnp.clip(coords - pix, -1e5, 1e5)
    return d, valid


def reprojection_error(pred: jnp.ndarray, error_input: jnp.ndarray,
                       rig: CameraRig, n_joints: int) -> jnp.ndarray:
    """Per-sample summed 2D reprojection error.

    pred: [B, J*3] MLP output in decameters.
    error_input: [B, C*J*4] raw-pixel loss features ([valid, x, y, prob]).
    rig: full rig (camera_names order — the loss projects into *all*
    cameras, reference :77).
    Returns [B] summed |Δu|+|Δv| over valid (camera, joint) pairs.
    """
    d, valid = _reprojection_residuals(pred, error_input, rig, n_joints)
    l1 = jnp.sum(jnp.abs(d), axis=-1) * valid
    l1 = jnp.minimum(l1, 1e5)
    return jnp.sum(l1, axis=(1, 2))


def reprojection_loss(pred: jnp.ndarray, error_input: jnp.ndarray,
                      rig: CameraRig, n_joints: int,
                      kind: str = "reference",
                      huber_delta: float = 10.0) -> jnp.ndarray:
    """Scalar training loss — see the module docstring for the variants."""
    if kind == "reference":
        # MSE of the summed per-sample error against zero (reference :216-218)
        err = reprojection_error(pred, error_input, rig, n_joints)
        return jnp.mean(err * err)

    d, valid = _reprojection_residuals(pred, error_input, rig, n_joints)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    if kind == "per_term":
        sq = jnp.sum(d * d, axis=-1) * valid                     # [B, C, J]
        return jnp.sum(sq) / denom
    if kind == "huber":
        a = jnp.abs(d)
        h = jnp.where(a <= huber_delta, 0.5 * a * a,
                      huber_delta * (a - 0.5 * huber_delta))
        return jnp.sum(jnp.sum(h, axis=-1) * valid) / denom
    raise ValueError(f"kind must be 'reference', 'per_term' or 'huber', "
                     f"got {kind!r}")
