"""Skeleton-matching graph as fixed-shape tensors (alt-3 reformulation).

The reference builds a dynamic DGL graph per frame: one "head" node per
(camera, skeleton) with 902-dim features, one "edge-node" per cross-camera
head pair with 5 'link' edges, plus self-loops (reference:
skeleton_matching/graph_generator.py:444-508 features, :627-656 edge-nodes,
:813-876 test graphs).  Here the graph is a *static* topology over padded
slots — every (camera, slot) is a potential head, every cross-camera slot
pair is a potential edge-node — with presence masks.  The whole matcher
becomes one jit-compiled tensor program with zero per-frame host work beyond
buffer fill.

Head-node feature layout (alt-3; reference :128-140, :471-505):
  [0] head one-hot   [1] edge_node one-hot (0 for heads)
  then per (matching camera, joint), 10 numbers — only the head's own camera
  block is filled:
    i = (x − W/2)/(W/2),  j = (H/2 − y)/(H/2)   ← y is *flipped* (unlike the
                                                   lifter features)
    valid, prob
    line_p = camera origin in world (NOT scaled)
    line_v = R_cw · K⁻¹ · [x, y, 1]  (raw pixel back-projection, no
             undistortion; reference :481-490)

Edge-node features are the edge_node one-hot only (reference :627-631).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.geometry.camera import CameraRig, cam_centers_world, pixel_rays_world


class PairTopology(NamedTuple):
    """Static matcher topology for (C cameras × S skeleton slots).

    Heads are indexed h = c*S + s.  Edge-nodes enumerate all cross-camera
    slot pairs in (c1<c2, s1, s2) order: E = C·(C−1)/2 · S².  The incidence
    matrices turn segment aggregation into MXU matmuls.
    """

    n_cameras: int
    n_slots: int
    e1: np.ndarray       # [E] head index of endpoint 1 (int32)
    e2: np.ndarray       # [E] head index of endpoint 2
    cam1: np.ndarray     # [E] camera of endpoint 1
    cam2: np.ndarray     # [E] camera of endpoint 2
    inc1: np.ndarray     # [E, H] one-hot of e1 (float32)
    inc2: np.ndarray     # [E, H] one-hot of e2

    @property
    def n_heads(self) -> int:
        return self.n_cameras * self.n_slots

    @property
    def n_pairs(self) -> int:
        return len(self.e1)


def build_topology(n_cameras: int, n_slots: int) -> PairTopology:
    """Enumerate the static candidate-pair topology.

    Pair order matches the reference's test-graph construction: outer loop
    camera pairs (c1 < c2), inner loops skeleton slots of each camera
    (reference: graph_generator.py:854-864).
    """
    H = n_cameras * n_slots
    e1, e2, cam1, cam2 = [], [], [], []
    for c1 in range(n_cameras):
        for c2 in range(c1 + 1, n_cameras):
            for s1 in range(n_slots):
                for s2 in range(n_slots):
                    e1.append(c1 * n_slots + s1)
                    e2.append(c2 * n_slots + s2)
                    cam1.append(c1)
                    cam2.append(c2)
    e1 = np.asarray(e1, np.int32)
    e2 = np.asarray(e2, np.int32)
    E = len(e1)
    inc1 = np.zeros((E, H), np.float32)
    inc2 = np.zeros((E, H), np.float32)
    inc1[np.arange(E), e1] = 1.0
    inc2[np.arange(E), e2] = 1.0
    return PairTopology(n_cameras, n_slots, e1, e2,
                        np.asarray(cam1, np.int32), np.asarray(cam2, np.int32),
                        inc1, inc2)


def head_features(kp: jnp.ndarray, valid: jnp.ndarray, prob: jnp.ndarray,
                  observed: jnp.ndarray, present: jnp.ndarray,
                  rig: CameraRig, image_size: Tuple[float, float],
                  alt: str = "3") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alt-3 (default) or alt-2 head-node features for every (camera, slot).

    kp: [C, S, J, 2] raw pixels; valid/prob: [C, S, J]; observed: [C, S, J]
    (joint listed in the wire dict); present: [C, S] (slot occupied).
    ``rig`` must be restricted to the matching cameras, in matching order.

    alt='3': 10 numbers per (cam, joint) incl. world rays (reference
    graph_generator.py:128-140); alt='2': the 4 image-space numbers only
    (i, j, valid, prob — reference :121-127).

    Returns (feats [H, 2 + C*J*{10,4}], head_mask [H]) with H = C*S.
    """
    C, S, J, _ = kp.shape
    W, H_img = image_size
    m = observed.astype(kp.dtype)[..., None]                     # [C, S, J, 1]

    ni = (kp[..., 0:1] - W / 2.0) / (W / 2.0)
    nj = (H_img / 2.0 - kp[..., 1:2]) / (H_img / 2.0)            # flipped y
    if alt == "2":
        per_joint = jnp.concatenate(
            [ni, nj, valid[..., None], prob[..., None]], axis=-1) * m
    else:
        centers = cam_centers_world(rig.T_cw)                    # [C, 3]
        line_p = jnp.broadcast_to(centers[:, None, None, :], (C, S, J, 3))
        line_v = pixel_rays_world(kp, rig.K_inv[:, None, None],
                                  rig.T_cw[:, None, None])       # [C, S, J, 3]
        per_joint = jnp.concatenate(
            [ni, nj, valid[..., None], prob[..., None], line_p, line_v],
            axis=-1) * m                                         # [C, S, J, 10]

    # Scatter each head's block into its own camera section of the flat
    # C*J*10 feature vector: build [C, S, C*J*10] where block c is non-zero
    # only at camera index c.
    npj = per_joint.shape[-1]                                    # 10 or 4
    flat = per_joint.reshape(C, S, J * npj)                      # [C, S, J*npj]
    eye = jnp.eye(C, dtype=kp.dtype)                             # [C, C]
    blocks = jnp.einsum("cd,csf->csdf", eye, flat,
                        precision="highest")               # [C,S,C,J*10]
    blocks = blocks.reshape(C * S, C * J * npj)

    one_hot = jnp.concatenate(
        [jnp.ones((C * S, 1), kp.dtype), jnp.zeros((C * S, 1), kp.dtype)],
        axis=-1)
    feats = jnp.concatenate([one_hot, blocks], axis=-1)
    head_mask = present.reshape(C * S).astype(kp.dtype)
    return feats * head_mask[:, None], head_mask


def edge_node_features(n_pairs: int, feat_dim: int,
                       dtype=np.float32) -> np.ndarray:
    """Edge-node features: the 'edge_node' one-hot only (reference :627-631).

    Returned as host numpy so it inlines as an HLO literal when captured
    (see geometry.camera.CameraRig docstring for why that matters)."""
    f = np.zeros((n_pairs, feat_dim), dtype)
    f[:, 1] = 1.0
    return f


def pair_mask_from_present(present: jnp.ndarray, topo: PairTopology
                           ) -> jnp.ndarray:
    """pair valid ⇔ both endpoint slots occupied.  present: [C, S]."""
    flat = present.reshape(-1).astype(jnp.float32)
    return flat[jnp.asarray(topo.e1)] * flat[jnp.asarray(topo.e2)]


def pair_ray_distances(kp: jnp.ndarray, shared: jnp.ndarray,
                       rig: CameraRig, topo: PairTopology) -> jnp.ndarray:
    """Triangulation-consistency distance per candidate pair (metres).

    For each cross-camera candidate pair, back-project every joint the two
    skeletons share into world rays (same raw-pixel rays the alt-3 features
    use, graph_generator.py:481-490) and take the mean closest-approach
    distance between the two rays.  A true cross-view match of the same
    person gives millimetre-scale distances (bounded by detector noise);
    two different people give tens of centimetres — a geometric signal the
    GAT's saturated scores cannot express.  Framework extension (no
    reference counterpart): used only to ORDER the greedy decode, see
    ``decode_person_proposals(order_scores=...)``.

    kp: [C, S, J, 2] raw pixels; shared: [C, S, J] per-joint usability
    (valid & observed); ``rig`` restricted to the matching cameras.
    Returns d: [E]; pairs with no shared joints get a large sentinel
    (1e3) so they rank behind geometrically-confirmed pairs.
    """
    C, S, J, _ = kp.shape
    # static host-side gathers (rig/topology are host numpy → HLO literals)
    centers = np.asarray(cam_centers_world(np.asarray(rig.T_cw)))  # [C, 3]
    rays = pixel_rays_world(kp, rig.K_inv[:, None, None],
                            rig.T_cw[:, None, None])             # [C, S, J, 3]
    flat_rays = rays.reshape(C * S, J, 3)
    flat_ok = shared.reshape(C * S, J).astype(kp.dtype)
    e1, e2 = jnp.asarray(topo.e1), jnp.asarray(topo.e2)
    v1, v2 = flat_rays[e1], flat_rays[e2]                        # [E, J, 3]
    p1 = jnp.asarray(centers[np.asarray(topo.cam1)])[:, None, :]  # [E, 1, 3]
    p2 = jnp.asarray(centers[np.asarray(topo.cam2)])[:, None, :]
    both = flat_ok[e1] * flat_ok[e2]                             # [E, J]

    dp = p2 - p1                                                 # [E, 1, 3]
    n = jnp.cross(v1, v2)                                        # [E, J, 3]
    nn = jnp.linalg.norm(n, axis=-1)
    d_skew = jnp.abs(jnp.sum(dp * n, -1)) / jnp.maximum(nn, 1e-9)
    # (near-)parallel rays: perpendicular distance of the baseline to v1
    v1n = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-9)
    perp = dp - jnp.sum(dp * v1n, -1, keepdims=True) * v1n
    d = jnp.where(nn > 1e-6, d_skew, jnp.linalg.norm(perp, axis=-1))

    cnt = jnp.sum(both, -1)
    mean_d = jnp.sum(d * both, -1) / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt > 0, mean_d, jnp.asarray(1e3, kp.dtype))
