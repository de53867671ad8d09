"""Reprojection-error evaluation for datasets without 3D ground truth.

≙ reference test/reprojection_error.py:89-107,351-431: project estimated 3D
poses (MLP or triangulation backend, optionally GT) into every camera with
the full distortion model and report per-camera mean/median pixel error
against the observed 2D joints.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.geometry.camera import CameraRig, project_points


def reprojection_pixel_errors(poses: np.ndarray, kp: np.ndarray,
                              observed: np.ndarray, rig: CameraRig
                              ) -> List[List[float]]:
    """Per-camera pixel errors of projected poses vs observations.

    poses: [P, J, 3] metres world; kp: [P, C, J, 2] observed raw pixels per
    matched person/camera; observed: [P, C, J] bool.
    Returns per-camera python lists of per-joint |error| values.
    """
    P, J, _ = poses.shape
    C = rig.n_cameras
    if P == 0:
        return [[] for _ in range(C)]
    pix = np.asarray(project_points(
        jnp.asarray(poses)[:, None], rig.T_wc[None, :, None],
        rig.K[None, :, None], rig.dist[None, :, None], tangential=True))
    err = np.linalg.norm(pix - kp, axis=-1)            # [P, C, J]
    out: List[List[float]] = [[] for _ in range(C)]
    for c in range(C):
        sel = observed[:, c, :]
        out[c] = err[:, c, :][sel].tolist()
    return out


def per_camera_stats(errors: List[List[float]]) -> Dict[str, List[float]]:
    mean = [float(np.mean(e)) if e else float("nan") for e in errors]
    median = [float(np.median(e)) if e else float("nan") for e in errors]
    return {"mean_px": mean, "median_px": median}
