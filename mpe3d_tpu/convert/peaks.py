"""Heatmap peak detection + sub-pixel refinement in pure jax.

TPU-native replacement for the trt_pose CUDA plugins the reference uses in
its conversor (reference: panoptic_conversor/get_joints_from_panoptic_model.py:
57-72 → trt_pose.plugins.find_peaks / refine_peaks):

  * ``find_peaks``: a cell is a peak iff it is ≥ every value in its
    (2w+1)² window AND above the threshold; up to ``max_peaks`` per channel.
  * ``refine_peaks``: sub-pixel position as the confidence-weighted centroid
    of the window around each peak, returned normalized to [0, 1] with a
    +0.5 pixel-center offset (trt_pose convention — the reference converts
    back with ``peak * (W, H)``, get_joints_from_panoptic_model.py:257-266).

Fixed shapes throughout: local-max via a max-pool compare (one reduce_window)
and top-k selection, so the whole parser jits and vmaps over channels/batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def find_peaks(cmap: jnp.ndarray, threshold: float = 0.15,
               window: int = 5, max_peaks: int = 100
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cmap: [J, H, W] heatmaps.

    Returns (counts [J], peaks [J, max_peaks, 2] int32 (row, col), invalid
    slots = -1), ordered by confidence descending.
    """
    J, H, W = cmap.shape
    w = window // 2
    pooled = jax.lax.reduce_window(
        cmap, -jnp.inf, jax.lax.max, (1, 2 * w + 1, 2 * w + 1),
        (1, 1, 1), ((0, 0), (w, w), (w, w)))
    is_peak = (cmap >= pooled) & (cmap > threshold)           # [J, H, W]

    flat_val = jnp.where(is_peak, cmap, -jnp.inf).reshape(J, H * W)
    vals, idx = jax.lax.top_k(flat_val, max_peaks)            # [J, K]
    ok = jnp.isfinite(vals)
    rows = jnp.where(ok, idx // W, -1)
    cols = jnp.where(ok, idx % W, -1)
    counts = jnp.sum(ok.astype(jnp.int32), axis=1)
    return counts, jnp.stack([rows, cols], axis=-1).astype(jnp.int32)


def refine_peaks(peaks: jnp.ndarray, cmap: jnp.ndarray,
                 window: int = 5) -> jnp.ndarray:
    """Confidence-weighted centroid refinement.

    peaks: [J, K, 2] int (row, col); cmap: [J, H, W].
    Returns normalized [J, K, 2] (x=col/W, y=row/H) float coords with the
    trt_pose +0.5 cell-center offset; invalid peaks give coords < 0.
    """
    J, H, W = cmap.shape
    wr = window // 2
    off = jnp.arange(-wr, wr + 1)
    dr, dc = jnp.meshgrid(off, off, indexing="ij")            # [w, w]

    def one(joint_cmap, joint_peaks):
        def one_peak(rc):
            r0, c0 = rc[0], rc[1]
            # border samples clamp to the image edge (trt_pose behaviour)
            rr = jnp.clip(r0 + dr, 0, H - 1)
            cc = jnp.clip(c0 + dc, 0, W - 1)
            v = joint_cmap[rr, cc]
            wsum = jnp.maximum(jnp.sum(v), 1e-12)
            ry = (jnp.sum(v * (r0 + dr)) / wsum + 0.5) / H
            cx = (jnp.sum(v * (c0 + dc)) / wsum + 0.5) / W
            return jnp.where(r0 < 0, -1.0, jnp.stack([cx, ry]))
        return jax.vmap(one_peak)(joint_peaks)

    return jax.vmap(one)(cmap, peaks)
