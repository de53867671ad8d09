"""On-device decode == host decode, over randomized score fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.matching.decode import decode_person_proposals
from mpe3d_tpu.matching.decode_device import decode_person_proposals_device
from mpe3d_tpu.matching.features import build_topology


def _person_sets(persons: np.ndarray) -> set:
    """Order-insensitive comparison form: frozensets of (camera, slot)."""
    out = set()
    for p in persons:
        out.add(frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0))
    return out


@pytest.mark.parametrize("seed", range(20))
def test_device_decode_matches_host_random(seed):
    topo = build_topology(4, 3)
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0, 1, topo.n_pairs).astype(np.float32)
    present = rng.random((4, 3)) < 0.8
    pm = (present.reshape(-1)[topo.e1]
          & present.reshape(-1)[topo.e2]).astype(np.float32)

    host = decode_person_proposals(scores, pm, topo, min_views=2)
    dev_p, dev_m = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=2)
    dev = np.asarray(dev_p)[np.asarray(dev_m)]
    assert _person_sets(host) == _person_sets(dev), (
        f"host={host}, dev={dev}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_decode_ties_and_thresholds(seed):
    """Scores straddling the threshold; duplicates (ties) exercise the
    stable sort path."""
    topo = build_topology(3, 2)
    rng = np.random.default_rng(seed + 100)
    scores = rng.choice([0.1, 0.49, 0.51, 0.7, 0.7, 0.9],
                        topo.n_pairs).astype(np.float32)
    pm = np.ones(topo.n_pairs, np.float32)
    host = decode_person_proposals(scores, pm, topo, min_views=2)
    dev_p, dev_m = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=2)
    dev = np.asarray(dev_p)[np.asarray(dev_m)]
    assert _person_sets(host) == _person_sets(dev)


def test_device_decode_min_views():
    topo = build_topology(3, 2)
    scores = np.zeros(topo.n_pairs, np.float32)
    k = np.nonzero((topo.e1 == 0) & (topo.e2 == 2))[0][0]
    scores[k] = 0.9
    pm = np.ones(topo.n_pairs, np.float32)
    p3, m3 = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=3)
    assert int(np.asarray(m3).sum()) == 0
    p2, m2 = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=2)
    assert int(np.asarray(m2).sum()) == 1
    assert np.asarray(p2)[0].tolist() == [0, 0, -1]


def test_device_decode_quirk_forgotten_camera_stays_forgotten():
    """After a quirk merge forgets a cluster's cameras, an EXTENSION via a
    forgotten-camera member must not re-add that camera to the cluster set
    (reference skeleton_matching_utils.py:85-99 appends only the OTHER
    endpoint's camera) — a later head from the forgotten camera is then
    accepted by the reference/host decode, and the device path must agree.
    Engineered chain: {cam0,cam1} merges {cam2,cam3} (cams 2,3 forgotten),
    extends via the cam2 member to cam4, then attaches a second cam2 head.
    """
    S, C = 2, 5
    topo = build_topology(C, S)

    def head(cam, slot):
        return cam * S + slot

    def pair_idx(h1, h2):
        k = np.nonzero(((topo.e1 == h1) & (topo.e2 == h2))
                       | ((topo.e1 == h2) & (topo.e2 == h1)))[0]
        assert len(k) == 1
        return int(k[0])

    scores = np.zeros(topo.n_pairs, np.float32)
    chain = [(head(0, 0), head(1, 0), 0.99),   # cluster1 {cam0, cam1}
             (head(2, 0), head(3, 0), 0.95),   # cluster2 {cam2, cam3}
             (head(0, 0), head(2, 0), 0.90),   # merge: cams 2,3 forgotten
             (head(2, 0), head(4, 0), 0.85),   # extend via cam2 member
             (head(1, 0), head(2, 1), 0.80)]   # second cam2 head attaches
    for h1, h2, s in chain:
        scores[pair_idx(h1, h2)] = s
    pm = np.ones(topo.n_pairs, np.float32)

    host = decode_person_proposals(scores, pm, topo, min_views=2)
    dev_p, dev_m = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=2)
    dev = np.asarray(dev_p)[np.asarray(dev_m)]
    assert _person_sets(host) == _person_sets(dev), (
        f"host={host}, dev={dev}")
    # the final edge really was accepted: camera 2 ends at the SECOND head
    # (slot 1, last-writer-wins over ascending head ids)
    assert len(host) == 1 and host[0][2] == 1, host


@pytest.mark.parametrize("seed", range(6))
def test_device_decode_matches_host_panoptic_dense(seed):
    """Panoptic-shaped topology (5 cams x 6 slots, 360 pairs) at a low
    threshold — nearly every pair is eligible, so the greedy loop performs
    the maximum number of merges/rejections.  This is the configuration
    the dense one-hot loop body is optimised for; equivalence with the
    host decoder must hold through the rewrite."""
    topo = build_topology(5, 6)
    rng = np.random.default_rng(1000 + seed)
    scores = rng.uniform(0, 1, topo.n_pairs).astype(np.float32)
    present = rng.random((5, 6)) < 0.9
    pm = (present.reshape(-1)[topo.e1]
          & present.reshape(-1)[topo.e2]).astype(np.float32)

    host = decode_person_proposals(scores, pm, topo, min_views=2,
                                   threshold=0.05)
    dev_p, dev_m = decode_person_proposals_device(
        jnp.asarray(scores), jnp.asarray(pm), topo, min_views=2,
        threshold=0.05)
    dev = np.asarray(dev_p)[np.asarray(dev_m)]
    assert _person_sets(host) == _person_sets(dev)
