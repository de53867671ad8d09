"""Lifter input packing — the 14-numbers-per-(camera, joint) feature builder.

TPU-native re-implementation of the reference's ``PoseEstimatorDataset``
feature engineering (reference: utils/pose_estimator_dataset_from_json.py:
146-236 list/training path, :237-289 dict/inference path).  Instead of
per-person python object churn + OpenCV calls, the whole packer is pure jax
over fixed-shape buffers and is vmapped over persons (and frames).

Feature layout per (used camera, joint) — flattened C-order [C, J, 14]:

  [0]      wire 'valid' flag
  [1]      (x − W/2) / (W/2)                     normalized pixel x
  [2]      (y − H/2) / (H/2)                     normalized pixel y
  [3]      detector probability
  [4:7]    camera origin in world / 10
  [7:10]   undistorted pixel ray rotated to world / 10   (rotation only)
  [10]     triangulated prior available
  [11:14]  coarse DLT-triangulated 3D / 10       (same point in every camera)

Reference quirks reproduced deliberately (bit-parity with its semantics):
  * The training path only packs joints whose wire valid flag is ≥ 1
    (reference :194), while the inference path packs every listed joint
    (reference :268-278) — selected with ``require_valid``.
  * The triangulated prior skips joint id 0: the reference gates on
    ``pos[0] > 0.`` (:75) where ``pos[0]`` is the *joint id*, so the nose
    never contributes a prior.  Controlled with ``skip_joint0_prior``.

The loss-side "error input" is 4 numbers per (camera, joint) of *raw* pixels
(reference :181-184): [valid, x_pix, y_pix, prob].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from mpe3d_tpu.geometry.camera import (CameraRig, cam_centers_world,
                                       project_points,
                                       undistorted_rays_world)
from mpe3d_tpu.geometry.triangulate import (triangulate_irls,
                                            triangulate_mean,
                                            triangulate_median_filtered)


def pack_error_input(kp: jnp.ndarray, valid: jnp.ndarray, prob: jnp.ndarray,
                     observed: jnp.ndarray) -> jnp.ndarray:
    """Loss-side raw-pixel features (reference:
    pose_estimator_dataset_from_json.py:181-184).

    kp: [C, J, 2] raw pixels; valid/prob/observed: [C, J].
    Returns [C*J*4] flat (C-order), zeros where not observed.
    """
    m = observed.astype(kp.dtype)
    feats = jnp.stack([valid * m, kp[..., 0] * m, kp[..., 1] * m, prob * m],
                      axis=-1)                                   # [C, J, 4]
    return feats.reshape(-1)


def pack_lifter_input(kp: jnp.ndarray, valid: jnp.ndarray, prob: jnp.ndarray,
                      observed: jnp.ndarray, rig: CameraRig,
                      image_size: Tuple[float, float],
                      require_valid: bool = False,
                      skip_joint0_prior: bool = True,
                      prior: str = "mean",
                      prior_gate_px: Optional[float] = None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the MLP input for ONE person from its per-used-camera skeleton.

    kp: [C, J, 2] raw pixels; valid/prob: [C, J]; observed: [C, J] bool —
    joint listed in the wire dict.  ``rig`` must already be restricted to the
    used cameras, in used-camera order.

    Returns (net_input [C*J*14] flat, include [C, J]) where ``include`` is the
    per-slot packing mask (useful to reconstruct reference 'flags').

    ``prior`` selects the triangulation behind fields 10-13: ``"mean"``
    (default) is the reference-exact mean over all camera pairs
    (get_3D_from_triangulation, reference :63-101); ``"median"`` is the
    median-outlier-rejected variant the classical 3D *backend* uses
    (reference pose_estimator_utils.py:52-75).  Opt into "median" on rigs
    with near-degenerate camera pairs — the ARP Lab's two robot cameras sit
    11.5 cm apart, and that pair's wild triangulations poison the plain
    mean (measured on synthetic ARP frames: 23.7 mm mean-prior vs 14.0 mm
    median-prior MPJPE; scripts/diag_lifter_prior.py).  Train and infer with
    the SAME setting — it changes the input distribution.

    ``prior_gate_px`` (inference-time extension, no reference counterpart):
    drop the triangulated prior of any joint whose prior reprojects more
    than this many pixels (masked MEDIAN over the packed observations —
    robust to a single confident outlier detection, which would otherwise
    fire the gate on a good prior) from its own 2D evidence — the quality-
    column residual idea (pipeline.pose_quality_px), applied to the PRIOR
    instead of the output.  Rationale: the residual-prior lifter follows its prior, and
    out-of-distribution scenes (people near the cameras) produce rare
    catastrophically-wrong triangulations that are cheap to detect (prior
    residual vs true prior 3D error correlates 0.80 at spread 2.1 where
    in-distribution it is 0.05) and poison the mean error.  Zeroing the
    gated joints' fields 10-13 is exactly the ``apply_prior_dropout``
    training augmentation pattern, so a prior-dropout-trained checkpoint
    falls back gracefully (measured: packed MPJPE 20.0 → 14.0 mm at
    spread 2.1 = the 3D-error-oracle gate, unchanged at 3.7 mm in
    distribution; scripts/diag_prior_gate.py).  None = exact reference
    semantics.
    """
    C, J, _ = kp.shape
    W, H = image_size
    include = observed & (valid >= 1.0) if require_valid else observed
    m = include.astype(kp.dtype)[..., None]                      # [C, J, 1]

    # fields 0-3
    nx = (kp[..., 0:1] - W / 2.0) / (W / 2.0)
    ny = (kp[..., 1:2] - H / 2.0) / (H / 2.0)
    f03 = jnp.concatenate([valid[..., None], nx, ny, prob[..., None]],
                          axis=-1) * m                           # [C, J, 4]

    # fields 4-6: camera origin in world / 10 (reference :190,208)
    centers = cam_centers_world(rig.T_cw)                        # [C, 3]
    f46 = jnp.broadcast_to(centers[:, None, :] / 10.0, (C, J, 3)) * m

    # fields 7-9: undistorted ray, rotation-only to world, / 10 (reference :204-209)
    rays = undistorted_rays_world(kp, rig.K[:, None], rig.dist[:, None],
                                  rig.T_cw[:, None])             # [C, J, 3]
    f79 = rays / 10.0 * m

    # fields 10-13: triangulated prior, same point in every camera block
    # (reference :212-217).  Gate: joint listed (any valid value) AND joint
    # id > 0 (the reference's pos[0] > 0 quirk).
    tri_obs = observed.astype(kp.dtype)
    if skip_joint0_prior:
        joint_gate = (jnp.arange(J) > 0).astype(kp.dtype)
        tri_obs = tri_obs * joint_gate[None, :]
    if prior == "mean":
        tri_xyz, tri_ok = triangulate_mean(kp, tri_obs, rig)     # [J,3], [J]
    elif prior == "median":
        tri_xyz, tri_ok = triangulate_median_filtered(kp, tri_obs, rig)
    elif prior == "irls":
        tri_xyz, tri_ok = triangulate_irls(kp, tri_obs, rig)
    else:
        raise ValueError(
            f"prior must be 'mean', 'median' or 'irls', got {prior!r}")
    if prior_gate_px is not None:
        # reproject the prior into every packed camera and reject joints
        # whose masked MEDIAN residual exceeds the gate (see docstring).
        # Median, not mean: one confident outlier detection inflates the
        # mean residual of a perfectly good (median-filtered) prior and
        # fired the gate exactly where the prior was doing its job —
        # measured on the outlier A/B: mean-gate 16.55 mm vs ungated
        # 13.55 mm at outlier_rate 0.07; a wrong-everywhere prior still
        # trips the median.  Masked median: invalid cameras sort to +inf
        # and the element at index ceil(nv/2)-1 is the lower median.
        pix = project_points(tri_xyz[None], rig.T_wc[:, None],
                             rig.K[:, None], rig.dist[:, None],
                             min_depth=1e-4)                     # [C, J, 2]
        mg = m[..., 0]                                           # [C, J]
        d = jnp.linalg.norm(jnp.clip(kp - pix, -1e5, 1e5), axis=-1)
        nv = jnp.sum(mg, axis=0)                                 # [J]
        ds = jnp.sort(jnp.where(mg > 0, d, jnp.inf), axis=0)     # [C, J]
        idx = jnp.maximum(jnp.ceil(nv / 2.0) - 1, 0).astype(jnp.int32)
        resid = jnp.take_along_axis(ds, idx[None, :], axis=0)[0]  # [J]
        tri_ok = tri_ok & ~((nv > 0) & (resid > prior_gate_px))
    okf = tri_ok.astype(kp.dtype)[:, None]                       # [J, 1]
    f10 = jnp.broadcast_to(okf[None, :, :], (C, J, 1))
    f1113 = jnp.broadcast_to((tri_xyz * okf / 10.0)[None], (C, J, 3))

    net = jnp.concatenate([f03, f46, f79, f10, f1113], axis=-1)  # [C, J, 14]
    return net.reshape(-1), include


def pack_slot_fields09(kp: jnp.ndarray, valid: jnp.ndarray,
                       prob: jnp.ndarray, observed: jnp.ndarray,
                       rig: CameraRig, image_size: Tuple[float, float]
                       ) -> jnp.ndarray:
    """Per-(camera, slot) lifter-input fields 0-9, prior fields zeroed.

    The whole-frame kernel (ops/frame_kernel.py) precomputes the
    observation-dependent feature fields for EVERY detection slot before
    the kernel runs, then gathers the decoded person's slots in-kernel
    (the person-independent part of :func:`pack_lifter_input` — same
    formulas, so gather-then-pack ≡ pack-then-gather pointwise; the
    person-dependent triangulated prior fields 10-13 stay zero here and
    are filled in-kernel).

    kp: [C, S, J, 2] raw pixels; valid/prob: [C, S, J]; observed:
    [C, S, J] bool.  ``rig`` restricted to the used cameras.
    Returns [C, S, J, 14] float32.
    """
    C, S, J, _ = kp.shape
    W, H = image_size
    m = observed.astype(kp.dtype)[..., None]                     # [C, S, J, 1]

    nx = (kp[..., 0:1] - W / 2.0) / (W / 2.0)
    ny = (kp[..., 1:2] - H / 2.0) / (H / 2.0)
    f03 = jnp.concatenate([valid[..., None], nx, ny, prob[..., None]],
                          axis=-1) * m                           # [C, S, J, 4]
    centers = cam_centers_world(rig.T_cw)                        # [C, 3]
    f46 = jnp.broadcast_to(centers[:, None, None, :] / 10.0,
                           (C, S, J, 3)) * m
    rays = undistorted_rays_world(kp, rig.K[:, None, None],
                                  rig.dist[:, None, None],
                                  rig.T_cw[:, None, None])       # [C, S, J, 3]
    f79 = rays / 10.0 * m
    zeros4 = jnp.zeros((C, S, J, 4), kp.dtype)
    return jnp.concatenate([f03, f46, f79, zeros4], axis=-1)


def apply_camera_dropout(net_input: jnp.ndarray, cam_keep: jnp.ndarray,
                         n_joints: int) -> jnp.ndarray:
    """Zero feature fields 0-9 of dropped cameras, keep the triangulated
    prior fields 10-13 (reference:
    pose_estimator_dataset_from_json.py:219-229).

    net_input: [..., C*J*14]; cam_keep: [..., C] 0/1.
    """
    shape = net_input.shape
    C = cam_keep.shape[-1]
    x = net_input.reshape(*shape[:-1], C, n_joints, 14)
    field_is_obs = (jnp.arange(14) < 10).astype(net_input.dtype)  # [14]
    keep = cam_keep[..., :, None, None]                           # [..., C, 1, 1]
    x = x * (keep * field_is_obs + (1.0 - field_is_obs))
    return x.reshape(shape)


def apply_prior_dropout(net_input: jnp.ndarray, joint_keep: jnp.ndarray,
                        n_joints: int) -> jnp.ndarray:
    """Zero the triangulated-prior fields 10-13 of dropped joints (all
    cameras — the prior is a per-joint copy), keeping observation fields
    0-9.

    Augmentation extension (no reference counterpart): exposes the lifter —
    in particular the residual-prior head — to prior-less joints during
    training, the situation wide scenes with partial visibility create at
    inference.  ``joint_keep``: [..., J] 0/1.
    """
    shape = net_input.shape
    J = n_joints
    x = net_input.reshape(*shape[:-1], -1, J, 14)
    field_is_prior = (jnp.arange(14) >= 10).astype(net_input.dtype)  # [14]
    keep = joint_keep[..., None, :, None]                   # [..., 1, J, 1]
    x = x * (1.0 - field_is_prior * (1.0 - keep))
    return x.reshape(shape)
