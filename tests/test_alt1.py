"""Graph alternative '1' (per-joint nodes + body-relation edges).

``apply_matcher_alt1`` is validated against an independent naive
re-derivation of the reference's graph construction
(skeleton_matching/graph_generator.py:283-397): nodes/edges are built with
python dicts exactly like ``initializeWithAlternative1`` (including the
id_by_type abbreviation-overwrite quirk for the ears), then run through the
naive edge-list GAT from test_models.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import (JOINT_NAMES_BY_FORMAT, PANOPTIC, MatcherConfig)
from mpe3d_tpu.matching.alt1 import (_BODY_PARTS_ABBREVIATION,
                                     alt1_edge_node_features,
                                     alt1_feature_dim, alt1_node_features,
                                     alt1_relations, apply_matcher_alt1,
                                     build_alt1_topology)
from mpe3d_tpu.matching.features import build_topology
from mpe3d_tpu.models.gat import init_matcher
from test_models import _naive_gat_layer


def test_alt1_feature_dim():
    assert alt1_feature_dim(18, 5) == 30          # COCO Panoptic
    assert PANOPTIC.matcher_feature_dim_alt("1") == 30
    assert alt1_feature_dim(25, 6) == 38          # BODY_25 ARP-lab-like


def test_alt1_relations_vocabulary():
    rels = alt1_relations("COCO")
    # structural anchors of the reference vocabulary
    for r in ("h_h", "link", "link_link", "h_n", "n_n", "rs_rel", "lel_ls",
              "n_re", "re_n", "rhip_lhip"):
        assert r in rels, r
    # the aliased left-ear token exists in the vocabulary but can never
    # resolve (reference quirk: both ears abbreviate to 're')
    assert "h_le" in rels
    assert _BODY_PARTS_ABBREVIATION["left_ear"] == "re"
    # deterministic (sorted) order
    assert rels == sorted(rels)


# ---------------------------------------------------------------------------
# naive reference construction
# ---------------------------------------------------------------------------


def _naive_alt1_graph(kp, valid, prob, observed, present, image_size,
                      joint_format):
    """Nodes + edges + features exactly like initializeWithAlternative1 +
    merge_graphs + add_edge_node_to_graph (single edge-node per pair)."""
    C, S, J, _ = kp.shape
    W, Himg = image_size
    names = JOINT_NAMES_BY_FORMAT[joint_format]
    rels = alt1_relations(joint_format)
    F = alt1_feature_dim(J, C)
    neck = names.index("neck")

    feats, edges = [], []
    head_of = {}                 # (c, s) -> naive head node id
    n = 0
    for c in range(C):
        for s in range(S):
            if not present[c, s]:
                continue
            live = [j for j in range(J)
                    if observed[c, s, j] and valid[c, s, j] > 0.5]
            head = n
            head_of[(c, s)] = head
            fh = np.zeros(F)
            fh[0] = 1.0                                  # 'head'
            fh[2 + J + c] = 1.0                          # camera one-hot
            fh[-1] = len(live) / J                       # n_joints
            if neck in live:
                fh[-5] = (kp[c, s, neck, 0] - W / 2) / (W / 2)
                fh[-4] = (Himg / 2 - kp[c, s, neck, 1]) / (Himg / 2)
                fh[-3] = 1.0
                fh[-2] = prob[c, s, neck]
            feats.append(fh)
            edges.append((head, head))                   # h_h
            n += 1
            id_by_type = {"h": head}
            for j in live:                               # wire-key order
                fj = np.zeros(F)
                fj[2 + j] = 1.0
                fj[2 + J + c] = 1.0
                fj[-5] = (kp[c, s, j, 0] - W / 2) / (W / 2)
                fj[-4] = (Himg / 2 - kp[c, s, j, 1]) / (Himg / 2)
                fj[-3] = 1.0
                fj[-2] = prob[c, s, j]
                feats.append(fj)
                id_by_type[_BODY_PARTS_ABBREVIATION[names[j]]] = n
                n += 1
            live_ids = {j: head + 1 + i for i, j in enumerate(live)}
            for rel in rels:
                if rel in ("h_h", "link"):
                    continue
                t1, t2 = rel.split("_")
                if t1 in id_by_type and t2 in id_by_type:
                    edges.append((id_by_type[t1], id_by_type[t2]))
            del live_ids

    pairs = []
    match_pairs = []
    for c1 in range(C):
        for c2 in range(c1 + 1, C):
            for s1 in range(S):
                for s2 in range(S):
                    match_pairs.append((c1, s1, c2, s2))
    for (c1, s1, c2, s2) in match_pairs:
        if (c1, s1) not in head_of or (c2, s2) not in head_of:
            pairs.append(None)
            continue
        fe = np.zeros(F)
        fe[1] = 1.0
        feats.append(fe)
        en = n
        h1, h2 = head_of[(c1, s1)], head_of[(c2, s2)]
        edges += [(h1, en), (en, h1), (h2, en), (en, h2), (en, en)]
        pairs.append(en)
        n += 1
    return np.stack(feats), edges, pairs


def _naive_alt1_scores(params, feats, edges, pairs, cfg):
    x = feats
    dims = []
    d_in = cfg.in_dim
    for l in range(len(cfg.hidden)):
        dims.append((d_in, cfg.hidden[l], cfg.heads[l]))
        d_in = cfg.hidden[l] * cfg.heads[l]
    dims.append((d_in, cfg.n_classes, 1))
    for l, (din, dout, nh) in enumerate(dims):
        out = _naive_gat_layer(params["layers"][l], x, edges, nh, dout,
                               cfg.alpha)
        if l < len(dims) - 1:
            x = np.where(out > 0, out, cfg.hidden_slope * out).reshape(
                len(x), nh * dout)
        else:
            x = out.reshape(len(x))
    return {k: 1.0 / (1.0 + np.exp(-x[en]))
            for k, en in enumerate(pairs) if en is not None}


@pytest.mark.parametrize("drop_right_ear", [False, True])
def test_alt1_matches_naive_reference_graph(drop_right_ear):
    """Static masked alt-1 program == explicit reference-style graph, incl.
    the ear-aliasing suppressor path."""
    C, S, J = 3, 2, 18
    cfg = MatcherConfig(in_dim=alt1_feature_dim(J, C), hidden=(6, 4),
                        heads=(2, 2))
    rng = np.random.default_rng(1)
    kp = rng.uniform(50, 900, size=(C, S, J, 2))
    prob = rng.uniform(0.5, 1.0, size=(C, S, J))
    valid = (rng.random((C, S, J)) > 0.15).astype(np.float64)
    observed = rng.random((C, S, J)) > 0.1
    present = np.array([[1, 1], [1, 0], [1, 1]], bool)
    if drop_right_ear:
        valid[:, :, 4] = 0.0       # right ear absent → left ear gets edges
    else:
        valid[:, :, 3] = 1.0       # both ears live → left ear isolated
        valid[:, :, 4] = 1.0
        observed[:, :, 3] = True
        observed[:, :, 4] = True
    img = (1920.0, 1080.0)

    topo = build_topology(C, S)
    topo1 = build_alt1_topology(topo, J, "COCO")
    pm = (present.reshape(-1)[topo.e1] & present.reshape(-1)[topo.e2]
          ).astype(np.float64)

    jax.config.update("jax_enable_x64", True)
    try:
        params = init_matcher(jax.random.PRNGKey(5), cfg)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), params)
        feats_hj, live = alt1_node_features(
            jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
            jnp.asarray(observed), jnp.asarray(present), img, "COCO")
        feats = jnp.concatenate([
            feats_hj, jnp.asarray(alt1_edge_node_features(
                topo.n_pairs, cfg.in_dim, np.float64))])
        got = np.asarray(apply_matcher_alt1(params, feats, live,
                                            jnp.asarray(pm), topo1, cfg))
    finally:
        jax.config.update("jax_enable_x64", False)

    nfeats, nedges, npairs = _naive_alt1_graph(
        kp, valid, prob, observed, present, img, "COCO")
    naive = _naive_alt1_scores(jax.tree_util.tree_map(np.asarray, params),
                               nfeats, nedges, npairs, cfg)
    assert naive, "no live pairs in test construction"
    for k, v in naive.items():
        assert np.isclose(got[k], v, atol=1e-10), (k, got[k], v)


def test_alt1_pipeline_end_to_end(panoptic_rig):
    """Pipeline + fused program run with graph_alternative='1'."""
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_cfg = dataclasses.replace(PANOPTIC, graph_alternative="1")
    mcfg = MatcherConfig(in_dim=rig_cfg.matcher_feature_dim_alt("1"),
                         hidden=(8,), heads=(2,))
    pipe = PoseEstimationPipeline(rig_cfg, panoptic_rig,
                                  init_matcher(jax.random.PRNGKey(0), mcfg),
                                  mcfg, backend="triangulation",
                                  slot_buckets=(4,), person_buckets=(8,),
                                  threshold=0.05)
    noise = SceneNoise(spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(rig_cfg, panoptic_rig, 2, n_people=(2, 2),
                             seed=4, noise=noise, with_gt=False)
    fa = parse_frame(frames[0], rig_cfg, max_skeletons=4)
    staged = pipe(fa)
    fused = pipe.infer_fused(fa)
    assert staged.poses.shape[1:] == (18, 3)
    assert fused.scores.shape == staged.scores.shape


def test_alt1_training_learns(panoptic_rig):
    """A few alt-1 training epochs reduce the scene MSE."""
    from mpe3d_tpu.config import MatcherTrainConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames)
    from mpe3d_tpu.matching.features import build_topology as bt
    from mpe3d_tpu.train.matcher import train_matcher
    from mpe3d_tpu.train.matcher_data import build_matcher_scenes

    rig_cfg = dataclasses.replace(PANOPTIC, graph_alternative="1")
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    files = [generate_single_person_frames(rig_cfg, panoptic_rig, 30,
                                           seed=s, noise=noise)
             for s in (0, 1)]
    topo = bt(rig_cfg.n_matching_cameras, 4)
    scenes = build_matcher_scenes(files, rig_cfg, topo, limit=60, seed=0)
    dev = build_matcher_scenes(files, rig_cfg, topo, limit=20, seed=1)
    cfg = MatcherConfig(in_dim=rig_cfg.matcher_feature_dim_alt("1"),
                        hidden=(8, 8), heads=(2, 2))
    tcfg = MatcherTrainConfig(epochs=10, batch_size=16, eval_every=2,
                              patience=10, lr=2e-3)
    res = train_matcher(scenes, dev, rig_cfg, panoptic_rig, topo, cfg, tcfg)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
