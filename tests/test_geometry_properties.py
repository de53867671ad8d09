"""Property-based geometry tests (hypothesis): random rigs and poses.

Complements the fixed-case tests in test_geometry.py with randomized
project→undistort→triangulate roundtrips and decode invariants.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.data.synthetic import synthetic_ring_rig
from mpe3d_tpu.geometry.camera import project_points, undistort_points
from mpe3d_tpu.geometry.triangulate import triangulate_mean
from mpe3d_tpu.matching.decode import decode_person_proposals
from mpe3d_tpu.matching.features import build_topology

RIG = synthetic_ring_rig(PANOPTIC, seed=3)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.floats(0.3, 1.5))
def test_project_triangulate_roundtrip(seed, spread):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-spread, spread, (6, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.2, 1.6, 6)       # keep points in the arena
    pix = np.asarray(project_points(
        jnp.asarray(pts)[None], RIG.T_wc[:, None], RIG.K[:, None],
        RIG.dist[:, None], tangential=True))    # [C, 6, 2]
    xyz, ok = triangulate_mean(jnp.asarray(pix), jnp.ones(pix.shape[:2]),
                               RIG)
    assert bool(np.asarray(ok).all())
    err = np.linalg.norm(np.asarray(xyz) - pts, axis=-1)
    assert err.max() < 5e-3, err.max()          # sub-5mm on clean pixels


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_undistort_inverts_distortion(seed):
    rng = np.random.default_rng(seed)
    c = rng.integers(0, RIG.n_cameras)
    pts = rng.uniform(-0.8, 0.8, (20, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 1.5, 20)
    pix = np.asarray(project_points(jnp.asarray(pts), RIG.T_wc[c], RIG.K[c],
                                    RIG.dist[c], tangential=True))
    xn = np.asarray(undistort_points(jnp.asarray(pix), RIG.K[c], RIG.dist[c]))
    # undistorted normalized coords must match the pinhole ray of the point
    pc = pts @ RIG.T_wc[c][:3, :3].T + RIG.T_wc[c][:3, 3]
    expected = pc[:, :2] / pc[:, 2:3]
    assert np.abs(xn - expected).max() < 2e-4


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_decode_invariants(seed):
    """Any score field decodes into camera-consistent ≥min_views clusters."""
    rng = np.random.default_rng(seed)
    C = int(rng.integers(2, 5))
    S = int(rng.integers(1, 4))
    topo = build_topology(C, S)
    scores = rng.uniform(0, 1, topo.n_pairs).astype(np.float32)
    pm = (rng.random(topo.n_pairs) < 0.8).astype(np.float32)
    persons = decode_person_proposals(scores, pm, topo, min_views=2)
    used = set()
    for p in persons:
        members = [(c, int(s)) for c, s in enumerate(p) if s >= 0]
        assert len(members) >= 2                        # min_views
        assert len({c for c, _ in members}) == len(members)  # ≤1 per camera
        for m in members:
            assert m not in used                        # disjoint persons
            used.add(m)
