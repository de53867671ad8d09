"""Graph alternative '1': one node per joint + body-skeleton edges.

TPU-native re-implementation of the reference's alt-1 graphs (reference:
skeleton_matching/graph_generator.py:283-397 construction, :108-211 feature /
relation vocabularies).  Per (camera, skeleton): one 'head' node plus one
node per valid joint, connected by the body-relation vocabulary (bones,
left↔right pairs, head↔joint edges, self-loops, inverses); cross-camera
edge-nodes connect heads exactly like alt-3 (:627-656).  The GAT itself is
relation-agnostic (rel_type/norm are stored but never consumed,
gat2.py:50-88), so only the edge SET matters.

Static-shape formulation: node ids are
    heads        h = c*S + s                   ∈ [0, H)
    joints       H + h*J + j                   ∈ [H, H + H*J)
    edge-nodes   H + H*J + k                   ∈ [H + H*J, N)
with a fixed edge list built once per (C, S, J, format) and per-edge runtime
weights (0 = absent) from node liveness — the alt-1 analog of alt-3's
presence masks.  Attention is a masked per-destination segment softmax
(``jax.ops.segment_max/sum``), numerically identical to DGL ``edge_softmax``
over the instantiated sub-graph.

Reference quirk reproduced deliberately: BODY_PARTS_ABBREVIATION maps BOTH
ears to 're' (graph_generator.py:152-153), so ``id_by_type['re']`` is the
last-processed valid ear and the other ear node ends up with no incident
edges at all.  Statically that becomes ear edges instantiated for both ears
with a "suppressor" mask: the left-ear variant is live only when the right
ear is absent.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import JOINT_NAMES_BY_FORMAT, MatcherConfig
from mpe3d_tpu.matching.features import PairTopology
# same 'edge_node' one-hot layout as alt-3 — one definition, re-exported
# under the alt-1 name
from mpe3d_tpu.matching.features import \
    edge_node_features as alt1_edge_node_features  # noqa: F401

# reference graph_generator.py:100-106 (verbatim vocabulary, incl. the
# left_ear → 're' aliasing quirk)
_BODY_PARTS_ABBREVIATION = {
    "nose": "n", "neck": "ne", "right_shoulder": "rs", "right_elbow": "rel",
    "right_hand": "rha", "left_shoulder": "ls", "left_elbow": "lel",
    "left_hand": "lha", "hip": "hi", "right_hip": "rhip", "right_knee": "rk",
    "right_ankle": "ra", "left_hip": "lhip", "left_knee": "lk",
    "left_ankle": "la", "right_eye": "rey", "left_eye": "ley",
    "right_ear": "re", "left_ear": "re", "left_foot_ball": "lfb",
    "left_toes": "lto", "left_heel": "lhe", "right_foot_ball": "rfb",
    "right_toes": "rto", "right_heel": "rhe", "right_wrist": "rw",
    "left_wrist": "lw",
}

# reference graph_generator.py:144-149 / :78-82
_BODY_RELS = {
    "COCO": {"s_el", "el_w", "s_hip", "hip_k", "k_a", "n_e", "n_ne", "ne_s",
             "n_ey"},
    "BODY_25": {"e_ey", "n_ey", "n_ne", "ne_s", "s_el", "el_ha", "ne_hi",
                "hi_hip", "hip_k", "k_a", "a_he", "a_fb", "fb_to"},
}
_BODY_PARTS = {
    "COCO": {"e", "ey", "n", "s", "el", "w", "hip", "k", "a", "ne"},
    "BODY_25": {"e", "ey", "n", "s", "el", "hi", "hip", "ha", "he", "k", "a",
                "ne", "fb", "to"},
}


def alt1_relations(joint_format: str) -> List[str]:
    """The alt-1 relation vocabulary (reference graph_generator.py:153-205)."""
    rels: set = set()
    for r in _BODY_RELS.get(joint_format, set()):
        a, b = r.split("_")
        if a == "n":
            if b == "ne":
                rels.add(r)
            else:
                rels.add(f"n_r{b}")
                rels.add(f"n_l{b}")
        elif a == "ne":
            if b == "hi":
                rels.add(r)
            else:
                rels.add(f"ne_r{b}")
                rels.add(f"ne_l{b}")
        elif a == "hi":
            rels.add(f"hi_r{b}")
            rels.add(f"hi_l{b}")
        else:
            rels.add(f"r{a}_r{b}")
            rels.add(f"l{a}_l{b}")
    for p in _BODY_PARTS.get(joint_format, set()):
        if p == "n":
            rels.update({"h_n", "n_n"})
        elif p == "ne":
            rels.update({"h_ne", "ne_ne"})
        elif p == "hi":
            rels.update({"h_hi", "hi_hi"})
        else:
            rels.update({f"r{p}_l{p}", f"r{p}_r{p}", f"l{p}_l{p}",
                         f"h_r{p}", f"h_l{p}"})
    for r in list(rels):
        a, b = r.split("_")
        rels.add(f"{b}_{a}")
    rels.update({"h_h", "link", "link_link"})
    return sorted(rels)


def _abbr_candidates(joint_format: str) -> Dict[str, List[int]]:
    """abbr token -> joint indices in wire-key order (later index wins when
    an abbr is aliased — the reference's dict-overwrite semantics)."""
    cands: Dict[str, List[int]] = {}
    for idx, name in enumerate(JOINT_NAMES_BY_FORMAT[joint_format]):
        cands.setdefault(_BODY_PARTS_ABBREVIATION[name], []).append(idx)
    return cands


def _resolve(tok: str, cands: Dict[str, List[int]]
             ) -> List[Tuple[Optional[int], Optional[int]]]:
    """Instances of a relation endpoint: [(joint_idx_or_None_for_head,
    suppressor_joint_idx_or_None)].  A suppressed instance is live only when
    the later-keyed (higher-priority) joint of the same abbr is absent."""
    if tok == "h":
        return [(None, None)]
    out = []
    lst = cands.get(tok, [])
    for i, j in enumerate(lst):
        sup = lst[i + 1] if i + 1 < len(lst) else None
        out.append((j, sup))
    return out


class Alt1Topology(NamedTuple):
    """Static alt-1 graph over (C cameras × S slots × J joints + E pairs)."""

    n_cameras: int
    n_slots: int
    n_joints: int
    n_pairs: int
    src: np.ndarray        # [Et] int32 global node ids
    dst: np.ndarray        # [Et]
    sup1: np.ndarray       # [Et] suppressor node id for src (-1: none)
    sup2: np.ndarray       # [Et] suppressor node id for dst (-1: none)
    pair_idx: np.ndarray   # [Et] pair index for link edges (-1: intra)
    to_head: np.ndarray    # [Et] bool: link edge with a head destination

    @property
    def n_heads(self) -> int:
        return self.n_cameras * self.n_slots

    @property
    def n_nodes(self) -> int:
        return self.n_heads * (1 + self.n_joints) + self.n_pairs

    @property
    def edge_node_offset(self) -> int:
        return self.n_heads * (1 + self.n_joints)


def build_alt1_topology(topo: PairTopology, n_joints: int,
                        joint_format: str = "COCO") -> Alt1Topology:
    """Static edge list: per-slot body graph + per-pair link edges."""
    C, S, J = topo.n_cameras, topo.n_slots, n_joints
    H = C * S
    cands = _abbr_candidates(joint_format)
    rels = alt1_relations(joint_format)

    # intra-skeleton pattern relative to one head slot:
    # (src_joint|None=head, dst_joint|None=head, sup_src, sup_dst)
    pattern: List[Tuple[Optional[int], Optional[int],
                        Optional[int], Optional[int]]] = [(None, None, None, None)]  # h_h
    for rel in rels:
        if rel in ("h_h", "link", "link_link"):
            continue
        a, b = rel.split("_")
        for j1, s1 in _resolve(a, cands):
            for j2, s2 in _resolve(b, cands):
                pattern.append((j1, j2, s1, s2))

    src, dst, sup1, sup2, pair_idx, to_head = [], [], [], [], [], []

    def jid(h: int, j: Optional[int]) -> int:
        return h if j is None else H + h * J + j

    for h in range(H):
        for (j1, j2, s1, s2) in pattern:
            src.append(jid(h, j1))
            dst.append(jid(h, j2))
            sup1.append(-1 if s1 is None else jid(h, s1))
            sup2.append(-1 if s2 is None else jid(h, s2))
            pair_idx.append(-1)
            to_head.append(False)

    en0 = H * (1 + J)
    for k in range(topo.n_pairs):
        en = en0 + k
        h1, h2 = int(topo.e1[k]), int(topo.e2[k])
        # the reference's 5 link edges (graph_generator.py:627-651)
        for s, d, th in ((h1, en, False), (en, h1, True),
                         (h2, en, False), (en, h2, True), (en, en, False)):
            src.append(s)
            dst.append(d)
            sup1.append(-1)
            sup2.append(-1)
            pair_idx.append(k)
            to_head.append(th)

    return Alt1Topology(C, S, J, topo.n_pairs,
                        np.asarray(src, np.int32), np.asarray(dst, np.int32),
                        np.asarray(sup1, np.int32), np.asarray(sup2, np.int32),
                        np.asarray(pair_idx, np.int32),
                        np.asarray(to_head, bool))


def alt1_feature_dim(n_joints: int, n_cameras: int) -> int:
    """['head','edge_node'] + joint one-hots + camera one-hots +
    [i, j, valid2D, probability] + [n_joints]  (reference FEATURES['1'],
    graph_generator.py:119-120)."""
    return 2 + n_joints + n_cameras + 4 + 1


def alt1_node_features(kp: jnp.ndarray, valid: jnp.ndarray, prob: jnp.ndarray,
                       observed: jnp.ndarray, present: jnp.ndarray,
                       image_size: Tuple[float, float],
                       joint_format: str = "COCO"
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alt-1 features for every node (reference :319-386).

    kp: [C, S, J, 2] raw pixels; valid/prob/observed: [C, S, J];
    present: [C, S].  Returns (feats [N, F], node_live [N]) where the
    edge-node rows of node_live are left at 1 (their liveness is the pair
    mask, applied by the caller)."""
    C, S, J, _ = kp.shape
    H = C * S
    W, Himg = image_size
    dt = kp.dtype
    F = alt1_feature_dim(J, C)
    neck = JOINT_NAMES_BY_FORMAT[joint_format].index("neck")

    live_j = (observed.astype(dt) * (valid > 0.5).astype(dt)
              * present.astype(dt)[..., None])                   # [C, S, J]
    ni = (kp[..., 0] - W / 2.0) / (W / 2.0)                      # [C, S, J]
    nj = (Himg / 2.0 - kp[..., 1]) / (Himg / 2.0)                # flipped y
    cam_eye = jnp.eye(C, dtype=dt)                               # [C, C]
    cam_blk = jnp.broadcast_to(cam_eye[:, None, :], (C, S, C))   # [C, S, C]
    pres = present.astype(dt)

    # --- head rows [C, S, F] --------------------------------------------
    njoints_feat = live_j.sum(-1) / J                            # [C, S]
    neck_live = live_j[..., neck]
    zeros_oh = jnp.zeros((C, S, 1 + J), dt)                      # edge_node+joints
    head_rows = jnp.concatenate([
        jnp.ones((C, S, 1), dt),                                 # 'head'
        zeros_oh,
        cam_blk,
        (ni[..., neck] * neck_live)[..., None],
        (nj[..., neck] * neck_live)[..., None],
        neck_live[..., None],                                    # valid2D
        (prob[..., neck] * neck_live)[..., None],
        njoints_feat[..., None],
    ], axis=-1) * pres[..., None]                                # [C, S, F]

    # --- joint rows [C, S, J, F] ----------------------------------------
    joint_oh = jnp.broadcast_to(jnp.eye(J, dtype=dt)[None, None],
                                (C, S, J, J))
    jrows = jnp.concatenate([
        jnp.zeros((C, S, J, 2), dt),                             # head/edge_node
        joint_oh,
        jnp.broadcast_to(cam_blk[:, :, None, :], (C, S, J, C)),
        ni[..., None], nj[..., None],
        jnp.ones((C, S, J, 1), dt),                              # valid2D
        prob[..., None],
        jnp.zeros((C, S, J, 1), dt),                             # n_joints
    ], axis=-1) * live_j[..., None]                              # [C, S, J, F]

    # joint node id H + h*J + j with h = c*S + s: a (C, S, J) reshape is
    # exactly that order
    feats_hj = jnp.concatenate([head_rows.reshape(H, F),
                                jrows.reshape(H * J, F)])
    live = jnp.concatenate([pres.reshape(H), live_j.reshape(H * J)])
    return feats_hj, live




def apply_matcher_alt1(params: Dict, feats: jnp.ndarray, node_live: jnp.ndarray,
                       pair_mask: jnp.ndarray, topo1: Alt1Topology,
                       cfg: MatcherConfig,
                       pair_softmax_weight: jnp.ndarray = None,
                       dropout_key=None) -> jnp.ndarray:
    """Run the GAT stack over the alt-1 edge list; sigmoid scores [E].

    feats: [n_nodes, F] — head+joint rows (``alt1_node_features``) followed
    by the edge-node rows (``alt1_edge_node_features``).
    Same parameter pytree as ``models.gat.apply_matcher`` (init with
    ``init_matcher(cfg)`` where cfg.in_dim = alt1_feature_dim).  Semantics
    per layer match the reference exactly: fc1→LeakyReLU→fc2 projection,
    per-edge logits LeakyReLU(a_l·z_src + a_r·z_dst), per-destination
    softmax over live in-edges, attention-weighted sum (gat2.py:50-88).
    ``pair_softmax_weight`` [E] reproduces training-graph pair duplication
    on the edge-node→head link edges (see models/gat.py docstring).
    ``dropout_key`` enables train-mode cfg.feat_drop/attn_drop;
    ``cfg.residual`` adds the reference shortcut on every layer but the
    first (gat2.py:27-34,69-75,101-135) — same semantics as
    ``models.gat.apply_matcher``.
    """
    from mpe3d_tpu.models.gat import _dropout, _layer_dims, _residual_val

    N = topo1.n_nodes
    src = jnp.asarray(topo1.src)
    dst = jnp.asarray(topo1.dst)
    dt = feats.dtype

    pair_w = pair_mask if pair_softmax_weight is None else pair_softmax_weight
    # per-edge weight: both endpoints live, suppressors dead, edge-node→head
    # link edges carry the duplication multiplicity
    lv = jnp.concatenate([node_live.astype(dt),
                          (pair_mask > 0).astype(dt)])           # [N]
    sup1 = jnp.asarray(topo1.sup1)
    sup2 = jnp.asarray(topo1.sup2)
    w = lv[src] * lv[dst] \
        * jnp.where(sup1 >= 0, 1.0 - lv[jnp.maximum(sup1, 0)], 1.0) \
        * jnp.where(sup2 >= 0, 1.0 - lv[jnp.maximum(sup2, 0)], 1.0)
    pidx = jnp.asarray(topo1.pair_idx)
    th = jnp.asarray(topo1.to_head)
    w = jnp.where(th, pair_w[jnp.maximum(pidx, 0)], w)           # [Et]

    mm = lambda a, b: jnp.dot(a, b, precision="highest",
                              preferred_element_type=jnp.float32)

    def proj(layer, x, nh, d_out):
        h2 = mm(x, layer["w1"])
        if "b1" in layer:
            h2 = h2 + layer["b1"]
        h2 = jax.nn.leaky_relu(h2, cfg.alpha)
        z = mm(h2, layer["w2"])
        if "b2" in layer:
            z = z + layer["b2"]
        return z.reshape(-1, nh, d_out)

    x = feats
    dims = _layer_dims(cfg)
    n_layers = len(dims)
    dead = w <= 0
    for l, (d_in, d_out, nh) in enumerate(dims):
        layer = params["layers"][l]
        lkey = None
        if dropout_key is not None and (cfg.feat_drop > 0.0
                                        or cfg.attn_drop > 0.0):
            dropout_key, lkey = jax.random.split(dropout_key)
        if lkey is not None and cfg.feat_drop > 0.0:
            kf, lkey = jax.random.split(lkey)
            x = _dropout(kf, x, cfg.feat_drop)
        z = proj(layer, x, nh, d_out)                            # [N, nh, d]
        a1 = jnp.einsum("nhd,hd->nh", z, layer["attn_l"],
                        precision="highest")
        a2 = jnp.einsum("nhd,hd->nh", z, layer["attn_r"],
                        precision="highest")
        logits = jax.nn.leaky_relu(a1[src] + a2[dst], cfg.alpha)  # [Et, nh]
        neg = jnp.asarray(-jnp.inf, logits.dtype)
        masked = jnp.where(dead[:, None], neg, logits)
        m = jax.ops.segment_max(masked, dst, num_segments=N)     # [N, nh]
        m = jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0))
        ex = jnp.where(dead[:, None], 0.0,
                       jnp.exp(logits - m[dst])) * w[:, None]    # [Et, nh]
        denom = jax.ops.segment_sum(ex, dst, num_segments=N)     # [N, nh]
        if lkey is not None and cfg.attn_drop > 0.0:
            # attn_drop on normalised edge_softmax coefficients, aggregated
            # without renormalisation (gat2.py:63-68,83-88)
            coef = ex / jnp.maximum(denom[dst], 1e-30)           # [Et, nh]
            ka, lkey = jax.random.split(lkey)
            coef = _dropout(ka, coef, cfg.attn_drop)
            out = jax.ops.segment_sum(
                (coef[..., None] * z[src]).reshape(-1, nh * d_out), dst,
                num_segments=N).reshape(N, nh, d_out)
        else:
            num = jax.ops.segment_sum(
                (ex[..., None] * z[src]).reshape(-1, nh * d_out), dst,
                num_segments=N).reshape(N, nh, d_out)
            out = jnp.where(denom[..., None] > 0, num
                            / jnp.maximum(denom[..., None], 1e-30), 0.0)
        if cfg.residual and l > 0:
            out = out + _residual_val(layer, x, nh, d_out)
        if l < n_layers - 1:
            x = jax.nn.leaky_relu(out.reshape(N, nh * d_out), cfg.hidden_slope)
        else:
            x = out.reshape(N)
    return jax.nn.sigmoid(x[topo1.edge_node_offset:])
