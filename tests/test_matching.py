"""Tests for alt-3 feature construction and the person-proposal decoder."""

import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.geometry.camera import cam_centers_world
from mpe3d_tpu.matching.decode import decode_person_proposals, single_camera_bypass
from mpe3d_tpu.matching.features import (build_topology, head_features,
                                         pair_mask_from_present)


def test_topology_counts():
    topo = build_topology(5, 10)
    assert topo.n_heads == 50
    assert topo.n_pairs == 10 * 100
    assert np.all(topo.e1 // 10 == topo.cam1)
    assert np.all(topo.e2 // 10 == topo.cam2)
    assert np.all(topo.cam1 < topo.cam2)
    # incidence one-hots
    assert np.all(topo.inc1.sum(1) == 1)
    assert np.all(topo.inc1[np.arange(topo.n_pairs), topo.e1] == 1)


def test_head_features_layout(panoptic_rig):
    C, S, J = 5, 2, 18
    rng = np.random.default_rng(1)
    kp = rng.uniform(0, 1000, (C, S, J, 2)).astype(np.float32)
    valid = np.ones((C, S, J), np.float32)
    prob = np.full((C, S, J), 0.8, np.float32)
    observed = np.ones((C, S, J), bool)
    observed[0, 0, 3] = False
    present = np.ones((C, S), bool)
    present[1, 1] = False
    W, H = PANOPTIC.image_width, PANOPTIC.image_height

    feats, mask = head_features(jnp.asarray(kp), jnp.asarray(valid),
                                jnp.asarray(prob), jnp.asarray(observed),
                                jnp.asarray(present), panoptic_rig, (W, H))
    F = np.asarray(feats)
    assert F.shape == (C * S, 2 + C * J * 10)
    assert np.asarray(mask).tolist() == present.reshape(-1).astype(float).tolist()

    # head one-hot set, edge one-hot clear (for present heads)
    assert np.all(F[present.reshape(-1), 0] == 1.0)
    assert np.all(F[:, 1] == 0.0)
    # absent head fully zero
    assert np.all(F[1 * S + 1] == 0.0)

    # head (c=2, s=1): only camera-2 block non-zero
    h = 2 * S + 1
    blocks = F[h, 2:].reshape(C, J, 10)
    assert np.all(blocks[[0, 1, 3, 4]] == 0.0)
    b = blocks[2]
    assert np.allclose(b[:, 0], (kp[2, 1, :, 0] - W / 2) / (W / 2), atol=1e-5)
    assert np.allclose(b[:, 1], (H / 2 - kp[2, 1, :, 1]) / (H / 2), atol=1e-5)
    assert np.allclose(b[:, 2], 1.0)
    assert np.allclose(b[:, 3], 0.8)
    centers = np.asarray(cam_centers_world(panoptic_rig.T_cw))
    assert np.allclose(b[:, 4:7], centers[2], atol=1e-5)   # NOT scaled by 10
    # unobserved joint zeroed
    h0 = 0
    blocks0 = F[h0, 2:].reshape(C, J, 10)
    assert np.all(blocks0[0, 3] == 0.0)

    # pair mask respects presence
    topo = build_topology(C, S)
    pm = np.asarray(pair_mask_from_present(jnp.asarray(present), topo))
    absent_head = 1 * S + 1
    for k in range(topo.n_pairs):
        expect = 0.0 if absent_head in (topo.e1[k], topo.e2[k]) else 1.0
        assert pm[k] == expect


def _scores_for(topo, wanted, base=0.9):
    """Score array with `wanted` dict {(h1, h2): score}, rest 0."""
    s = np.zeros(topo.n_pairs, np.float32)
    for (a, b), v in wanted.items():
        k = np.nonzero((topo.e1 == a) & (topo.e2 == b))[0]
        assert len(k) == 1
        s[k[0]] = v
    return s


def test_decode_two_persons_three_cameras():
    topo = build_topology(3, 2)     # heads: c*2+s
    # person A: (0,0),(1,0),(2,0) → heads 0,2,4 ; person B: (0,1),(1,1),(2,1)
    scores = _scores_for(topo, {
        (0, 2): 0.99, (0, 4): 0.98, (2, 4): 0.97,
        (1, 3): 0.96, (1, 5): 0.95, (3, 5): 0.94,
        (0, 3): 0.40,                       # below threshold
    })
    persons = decode_person_proposals(scores, np.ones(topo.n_pairs), topo)
    assert persons.shape == (2, 3)
    got = {tuple(p) for p in persons.tolist()}
    assert got == {(0, 0, 0), (1, 1, 1)}


def test_decode_camera_conflict_resolved_by_score():
    topo = build_topology(3, 2)
    # head 0 strongly matches head 2 (cam1 slot0); head 3 (cam1 slot1) also
    # claims head 0 with lower score → must be rejected (one head per camera)
    scores = _scores_for(topo, {(0, 2): 0.99, (0, 3): 0.90})
    persons = decode_person_proposals(scores, np.ones(topo.n_pairs), topo)
    assert persons.shape == (1, 3)
    assert persons[0].tolist() == [0, 0, -1]


def test_decode_min_views_filters():
    topo = build_topology(3, 2)
    scores = _scores_for(topo, {(0, 2): 0.99})
    assert decode_person_proposals(scores, np.ones(topo.n_pairs), topo,
                                   min_views=3).shape == (0, 3)
    assert decode_person_proposals(scores, np.ones(topo.n_pairs), topo,
                                   min_views=2).shape == (1, 3)


def test_decode_merge_clusters_disjoint_only():
    topo = build_topology(4, 1)     # one slot per camera: heads 0..3
    # two clusters {0,1} and {2,3} then a link 1-2 merges them (disjoint cams)
    scores = _scores_for(topo, {(0, 1): 0.99, (2, 3): 0.98, (1, 2): 0.97})
    persons = decode_person_proposals(scores, np.ones(topo.n_pairs), topo)
    assert persons.shape == (1, 4)
    assert persons[0].tolist() == [0, 0, 0, 0]


def test_decode_respects_pair_mask():
    topo = build_topology(3, 2)
    scores = _scores_for(topo, {(0, 2): 0.99, (1, 3): 0.98})
    mask = np.ones(topo.n_pairs, np.float32)
    k = np.nonzero((topo.e1 == 1) & (topo.e2 == 3))[0][0]
    mask[k] = 0.0
    persons = decode_person_proposals(scores, mask, topo)
    assert persons.shape == (1, 3)
    assert persons[0].tolist() == [0, 0, -1]


def test_single_camera_bypass():
    present = np.array([[True, False, True]])
    persons = single_camera_bypass(present)
    assert persons.tolist() == [[0], [2]]


def test_pair_ray_distances_separates_people(panoptic_rig):
    """True cross-view matches get ~mm ray distances; cross-person pairs of
    people ~1 m apart get ~m distances (the geometric rerank signal)."""
    from mpe3d_tpu.data.synthetic import scene_center
    from mpe3d_tpu.geometry.camera import project_points
    from mpe3d_tpu.matching.features import pair_ray_distances

    rig = panoptic_rig
    C = len(np.asarray(rig.K))
    S, J = 2, 18
    center = scene_center(rig)
    rng = np.random.default_rng(3)
    people = np.stack([center + rng.normal(0, 0.25, (J, 3)),
                       center + np.array([1.2, 0, 0.3])
                       + rng.normal(0, 0.25, (J, 3))])   # [2, J, 3]

    kp = np.zeros((C, S, J, 2), np.float32)
    for c in range(C):
        for s in range(S):
            kp[c, s] = np.asarray(project_points(
                jnp.asarray(people[s]), rig.T_wc[c], rig.K[c], rig.dist[c]))
    shared = np.ones((C, S, J), np.float32)
    topo = build_topology(C, S)
    d = np.asarray(pair_ray_distances(jnp.asarray(kp), jnp.asarray(shared),
                                      rig, topo))
    same = (topo.e1 % S) == (topo.e2 % S)
    assert d[same].max() < 0.02          # noiseless projections → ~0
    assert d[~same].min() > 0.15         # different people → far rays

    # no shared joints → sentinel
    shared0 = shared.copy()
    shared0[0, 0] = 0.0
    d0 = np.asarray(pair_ray_distances(jnp.asarray(kp), jnp.asarray(shared0),
                                       rig, topo))
    first_cam0 = (topo.cam1 == 0) & (topo.e1 % S == 0)
    assert np.all(d0[first_cam0] == 1e3)


def test_decode_order_scores_flip():
    """order_scores reorders the greedy merge without changing eligibility:
    an ambiguous competitor with the higher raw score loses to the
    geometrically-confirmed pair."""
    topo = build_topology(2, 2)
    scores = np.zeros(topo.n_pairs, np.float32)
    pm = np.ones(topo.n_pairs, np.float32)

    def pidx(s1, s2):
        return int(np.nonzero((topo.e1 == s1) & (topo.e2 == 2 + s2))[0][0])

    scores[pidx(0, 0)] = 0.90          # the correct match
    scores[pidx(0, 1)] = 0.95          # saturated impostor wins raw order
    persons = decode_person_proposals(scores, pm, topo, min_views=2)
    assert persons.tolist() == [[0, 1]]           # impostor merged

    order = scores.copy()
    order[pidx(0, 0)] = 0.89           # small geometric penalty
    order[pidx(0, 1)] = 0.35           # large geometric penalty
    persons = decode_person_proposals(scores, pm, topo, min_views=2,
                                      order_scores=order)
    assert persons.tolist() == [[0, 0]]           # geometry wins

    # device decoder agrees
    from mpe3d_tpu.matching.decode_device import decode_person_proposals_device
    dp, dmask = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, 2,
        order_scores=jnp.asarray(order))
    dp = np.asarray(dp)[np.asarray(dmask)]
    assert dp.tolist() == [[0, 0]]


def test_geo_rescue_eligibility(panoptic_rig):
    """geo_rescue lifts under-scored but geometrically-consistent pairs over
    the decode threshold; geometrically-inconsistent pairs stay put."""
    from mpe3d_tpu.data.synthetic import scene_center
    from mpe3d_tpu.geometry.camera import project_points
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig = panoptic_rig
    C = len(np.asarray(rig.K))
    S, J = 2, 18
    center = scene_center(rig)
    rng = np.random.default_rng(4)
    people = np.stack([center + rng.normal(0, 0.25, (J, 3)),
                       center + np.array([1.0, 0.2, 0.1])
                       + rng.normal(0, 0.25, (J, 3))])
    kp = np.zeros((C, S, J, 2), np.float32)
    for c in range(C):
        for s in range(S):
            kp[c, s] = np.asarray(project_points(
                jnp.asarray(people[s]), rig.T_wc[c], rig.K[c], rig.dist[c]))
    ones = np.ones((C, S, J), np.float32)

    pipe = PoseEstimationPipeline(PANOPTIC, rig, None, None,
                                  geo_rescue=0.2, geo_rescue_dist=0.05)
    topo = build_topology(C, S)
    scores = np.full(topo.n_pairs, 0.35, np.float32)  # all below 0.5
    eff, order = pipe._geo_decode_scores(
        jnp.asarray(scores), jnp.asarray(kp), jnp.asarray(ones),
        jnp.asarray(ones.astype(bool)), topo)
    eff = np.asarray(eff)
    same = (topo.e1 % S) == (topo.e2 % S)
    assert np.all(eff[same] > pipe.threshold)       # rescued
    assert np.all(eff[~same] == scores[~same])      # untouched
    assert order is None                            # rerank off

    # both off → identity
    pipe0 = PoseEstimationPipeline(PANOPTIC, rig, None, None)
    eff0, order0 = pipe0._geo_decode_scores(
        jnp.asarray(scores), jnp.asarray(kp), jnp.asarray(ones),
        jnp.asarray(ones.astype(bool)), topo)
    assert order0 is None and np.all(np.asarray(eff0) == scores)


def test_cpython_set2_order_matches_real_sets():
    """The endpoint-role emulation == real CPython set iteration for every
    small-int pair (the reference reads pair endpoints as list({h1, h2});
    matching/decode.py::_cpython_set2_order)."""
    from mpe3d_tpu.matching.decode import _cpython_set2_order

    for x in range(64):
        for y in range(64):
            if x == y:
                continue
            s = set()
            s.add(x)
            s.add(y)
            assert tuple(_cpython_set2_order(x, y)) == tuple(s), (x, y)
