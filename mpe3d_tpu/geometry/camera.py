"""Pinhole-camera geometry as pure, vmappable jax-numpy.

TPU-native replacement for the reference's OpenCV/torch geometry helpers:

  * ``project_points``     ≙ world→pixel projection with radial distortion
    (reference: pose_estimator/train_pose_estimator.py:74-99,
     utils/pose_estimator_utils.py:44-50)
  * ``full_distort``       ≙ radial+tangential projection used by the
    Panoptic toolbox (reference: panoptic_conversor/panutils.py:4-27)
  * ``undistort_points``   ≙ cv2.undistortPoints — fixed-iteration Newton /
    fixed-point inversion of the distortion model
  * ``pixel_rays_world``   ≙ back-projected pixel rays K⁻¹·pix rotated to the
    world frame (reference: skeleton_matching/graph_generator.py:481-490)

Everything is written point-wise over the last axis and broadcasts over any
leading batch axes, so callers vmap/shard freely.  All math runs in float32;
there are no data-dependent shapes, so every function jits.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import RigConfig


class CameraRig(NamedTuple):
    """Dense calibration buffers for a multi-camera rig.

    Replaces the reference's pickled pytransform3d TransformManager +
    per-camera python lists (reference: skeleton_matching/graph_generator.py:32-52)
    with stacked arrays indexed by camera.

    Fields are **host numpy** arrays on purpose: calibration is a compile-time
    constant of every jitted program, and numpy leaves are inlined as HLO
    literals when captured.  (Captured *device* arrays become hidden
    per-call parameters, which the axon TPU tunnel executes ~1000× slower —
    measured 27 ms vs 0.03 µs per call.)  When calibration must be traced —
    the ``optimise_matrices`` training path — pass a jnp-leaved CameraRig as
    a function argument instead.
    """

    K: np.ndarray       # [C, 3, 3] intrinsics
    K_inv: np.ndarray   # [C, 3, 3]
    T_wc: np.ndarray    # [C, 4, 4] world(root) -> camera ("direct" transform)
    T_cw: np.ndarray    # [C, 4, 4] camera -> world ("inverse" transform)
    dist: np.ndarray    # [C, 5] OpenCV order (k1, k2, p1, p2, k3)
    image_size: np.ndarray  # [2] (width, height), float32

    @property
    def n_cameras(self) -> int:
        return self.K.shape[0]

    def select(self, idx) -> "CameraRig":
        """Sub-rig with cameras ``idx`` (tuple/array of indices)."""
        idx = np.asarray(idx)
        return CameraRig(self.K[idx], self.K_inv[idx], self.T_wc[idx],
                         self.T_cw[idx], self.dist[idx], self.image_size)


def intrinsics_from_rig_config(rig: RigConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Build [C,3,3] K matrices and [C,5] distortion (OpenCV order) from a
    RigConfig (reference: utils/pose_estimator_utils.py:17-30,39-41 and
    pose_estimator_dataset_from_json.py:45)."""
    C = rig.n_cameras
    K = np.zeros((C, 3, 3), np.float32)
    K[:, 0, 0] = rig.fx
    K[:, 1, 1] = rig.fy
    K[:, 0, 2] = rig.cx
    K[:, 1, 2] = rig.cy
    K[:, 2, 2] = 1.0
    dist = np.stack([rig.kd0, rig.kd1, rig.p1, rig.p2, rig.kd2], axis=1)
    return K, dist.astype(np.float32)


def make_rig(K: np.ndarray, dist: np.ndarray, T_wc: np.ndarray,
             image_size: Tuple[float, float]) -> CameraRig:
    K = np.asarray(K, np.float32)
    T_wc = np.asarray(T_wc, np.float32)
    return CameraRig(
        K=K,
        K_inv=np.linalg.inv(K).astype(np.float32),
        T_wc=T_wc,
        T_cw=np.linalg.inv(T_wc.astype(np.float64)).astype(np.float32),
        dist=np.asarray(dist, np.float32),
        image_size=np.asarray(image_size, np.float32),
    )


# ---------------------------------------------------------------------------
# distortion
# ---------------------------------------------------------------------------


def radial_distort(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Radial-only distortion of normalized coords, matching the reference's
    ``apply_distortion`` which ignores the tangential terms
    (reference: utils/pose_estimator_utils.py:44-50).

    xy: [..., 2] normalized image coordinates; dist: [..., 5] OpenCV order.
    """
    k1, k2, k3 = dist[..., 0:1], dist[..., 1:2], dist[..., 4:5]
    r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    f = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    return xy * f


def full_distort(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Radial + tangential distortion (OpenCV model; reference:
    panoptic_conversor/panutils.py:4-27)."""
    k1, k2, p1, p2, k3 = (dist[..., i: i + 1] for i in range(5))
    x, y = xy[..., 0:1], xy[..., 1:2]
    r2 = x * x + y * y
    f = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xt = x * f + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = y * f + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.concatenate([xt, yt], axis=-1)


def normalize_pixels(pix: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized (distorted) image coordinates via K⁻¹ (no
    distortion removal).  pix: [..., 2]; K: [..., 3, 3]."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (pix[..., 0] - cx) / fx
    y = (pix[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def undistort_points(pix: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 10) -> jnp.ndarray:
    """cv2.undistortPoints equivalent: normalized *undistorted* coordinates.

    Fixed-point iteration identical in structure to OpenCV's: start from the
    distorted normalized point and repeatedly divide out the radial factor /
    subtract the tangential displacement.  ``iters=10`` converges well past
    float32 resolution for the reference rigs (OpenCV uses 5).

    pix: [..., 2] pixel coords; K: [..., 3, 3]; dist: [..., 5] OpenCV order.
    Returns [..., 2] normalized undistorted coordinates.
    """
    xd = normalize_pixels(pix, K)
    k1, k2, p1, p2, k3 = (dist[..., i: i + 1] for i in range(5))

    x = xd
    for _ in range(iters):
        xx, yy = x[..., 0:1], x[..., 1:2]
        r2 = xx * xx + yy * yy
        f = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * xx * yy + p2 * (r2 + 2.0 * xx * xx)
        dy = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * xx * yy
        x = (xd - jnp.concatenate([dx, dy], axis=-1)) / f
    return x


# ---------------------------------------------------------------------------
# projection / rays
# ---------------------------------------------------------------------------


def _hom_transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a [..,4,4] homogeneous transform to [..,3] points -> [..,3].
    Leading axes broadcast pointwise.  The 3-element contraction is an
    EXPLICIT broadcast multiply-sum: exact fp32 on the VPU — the einsum
    (precision="highest") form lowered these tiny contractions onto the
    MXU as multi-pass 128×128-padded matmuls, measured >10× slower at
    serving shapes (geometry/triangulate.py round-3 note)."""
    return (jnp.sum(T[..., :3, :3] * pts[..., None, :], axis=-1)
            + T[..., :3, 3])


def project_points(pts_w: jnp.ndarray, T_wc: jnp.ndarray, K: jnp.ndarray,
                   dist: jnp.ndarray, tangential: bool = False,
                   min_depth: float = 0.0) -> jnp.ndarray:
    """World 3D points -> pixel coordinates.

    Matches the reference training-loss projection chain: world→camera 4×4,
    perspective divide, radial distortion, K (reference:
    pose_estimator/train_pose_estimator.py:74-99).  With ``tangential=True``
    it matches the Panoptic toolbox's full model
    (reference: panoptic_conversor/panutils.py:4-27).

    ``min_depth > 0`` makes the perspective divide sign-preservingly safe —
    used by the *training* loss so an early network that puts a joint on a
    camera plane yields a huge finite error instead of NaN (the reference
    has the same hazard and simply crashes).

    pts_w: [..., 3]; T_wc/K/dist broadcast against the leading axes.
    """
    pc = _hom_transform(T_wc, pts_w)                       # [..., 3] camera frame
    z = pc[..., 2:3]
    if min_depth > 0.0:
        z = jnp.where(jnp.abs(z) < min_depth,
                      jnp.where(z < 0, -min_depth, min_depth), z)
    xy = pc[..., :2] / z                                   # perspective divide
    xy = full_distort(xy, dist) if tangential else radial_distort(xy, dist)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def cam_centers_world(T_cw: jnp.ndarray) -> jnp.ndarray:
    """Camera origin in world frame: T_cw @ [0,0,0,1] — i.e. the translation
    column (reference: skeleton_matching/graph_generator.py:52)."""
    return T_cw[..., :3, 3]


def pixel_rays_world(pix: jnp.ndarray, K_inv: jnp.ndarray,
                     T_cw: jnp.ndarray) -> jnp.ndarray:
    """Raw (distorted) pixel back-projection ray rotated into world frame.

    The matcher's alt-3 features use the *raw* pixel, not the undistorted one
    (reference: skeleton_matching/graph_generator.py:481-490): ray = R_cw ·
    (K⁻¹ · [u, v, 1]).

    pix: [..., 2]; K_inv: [..., 3, 3]; T_cw: [..., 4, 4].  Returns [..., 3].
    """
    ones = jnp.ones_like(pix[..., :1])
    ph = jnp.concatenate([pix, ones], axis=-1)              # [..., 3]
    v = jnp.sum(K_inv * ph[..., None, :], axis=-1)          # exact fp32 VPU
    return jnp.sum(T_cw[..., :3, :3] * v[..., None, :], axis=-1)


def undistorted_rays_world(pix: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
                           T_cw: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Undistorted pixel ray rotated to world (rotation only).

    The lifter's input features use the *undistorted* normalized point with a
    homogeneous [x, y, 1, 0] vector — translation suppressed — so only the
    rotation applies (reference: utils/pose_estimator_dataset_from_json.py:204-209).
    """
    xn = undistort_points(pix, K, dist, iters=iters)        # [..., 2]
    ones = jnp.ones_like(xn[..., :1])
    v = jnp.concatenate([xn, ones], axis=-1)
    return jnp.sum(T_cw[..., :3, :3] * v[..., None, :], axis=-1)


def save_rig_npz(path: str, rig: CameraRig) -> None:
    """Persist a CameraRig as a flat npz — used for the calibration refined
    by ``optimise_matrices`` training (reference train_pose_estimator.py:8,
    148-154 refines the transforms but never persists them; here the
    co-adapted rig ships next to the checkpoint so inference can pair the
    MLP with the calibration it was trained against)."""
    np.savez(path, **{f: np.asarray(getattr(rig, f))
                      for f in CameraRig._fields})


def load_rig_npz(path: str) -> CameraRig:
    """Inverse of :func:`save_rig_npz`."""
    with np.load(path) as d:
        return CameraRig(**{f: d[f] for f in CameraRig._fields})
