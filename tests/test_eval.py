"""Tests for the metric libraries (clustering vs sklearn, MPJPE/AP)."""

import numpy as np
import pytest

from mpe3d_tpu.eval.clustering import (adjusted_rand_index, clustering_report,
                                       homogeneity_completeness_v)
from mpe3d_tpu.eval.pose_metrics import (PoseEvalAccumulator, best_permutation,
                                         pose_error_table)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_clustering_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 40
    true = rng.integers(0, 5, n)
    pred = rng.integers(0, 6, n)
    assert np.isclose(adjusted_rand_index(true, pred),
                      sklearn_metrics.adjusted_rand_score(true, pred))
    h, c, v = homogeneity_completeness_v(true, pred)
    hs, cs, vs = sklearn_metrics.homogeneity_completeness_v_measure(true, pred)
    assert np.isclose(h, hs) and np.isclose(c, cs) and np.isclose(v, vs)


def test_clustering_perfect():
    rep = clustering_report([0, 0, 1, 1, 2], [5, 5, 7, 7, 9])
    assert all(np.isclose(v, 1.0) for v in rep.values())


def test_best_permutation_simple():
    err = np.array([[0.1, 5.0], [5.0, 0.2]])
    assert best_permutation(err) == [0, 1]
    err = np.array([[5.0, 0.1], [0.2, 5.0]])
    assert best_permutation(err) == [1, 0]


def test_best_permutation_more_gt_than_results():
    # 3 GT, 1 result: permutation indices ≥ R mean unmatched
    err = np.array([[3.0], [0.5], [2.0]])
    p = best_permutation(err)
    assert len(p) == 3
    assert p[1] == 0          # GT 1 takes the only result


def test_pose_eval_perfect_predictions():
    rng = np.random.default_rng(0)
    acc = PoseEvalAccumulator(used_joints=range(18))
    for _ in range(10):
        gt = rng.normal(size=(3, 18, 3)).astype(np.float32)
        acc.update(gt, np.ones((3, 18), bool), np.ones(3, bool), gt.copy())
    s = acc.summary()
    assert s["mpjpe_mm"] < 1e-3
    assert s["mAP"] > 99.0
    assert s["mR"] > 99.0


def test_pose_eval_mixed_quality():
    rng = np.random.default_rng(0)
    acc = PoseEvalAccumulator(used_joints=range(18))
    for _ in range(20):
        gt = rng.normal(size=(2, 18, 3)).astype(np.float32)
        pred = gt + rng.normal(0, 0.03, gt.shape)   # ~5 cm mean error
        acc.update(gt, np.ones((2, 18), bool), np.ones(2, bool), pred)
    s = acc.summary()
    assert 20 < s["mpjpe_mm"] < 120
    aps = s["ap_per_threshold"]
    assert aps["150"]["ap"] > aps["25"]["ap"]       # monotone-ish in threshold


def test_pose_eval_invalid_gt_discounted():
    gt = np.zeros((1, 18, 3), np.float32)
    acc = PoseEvalAccumulator(used_joints=range(18))
    acc.update(gt, np.ones((1, 18), bool), np.zeros(1, bool), gt.copy())
    assert acc.n_matched == 0
    assert acc.n_gt == 0          # reference discounts invalid GT

    table = pose_error_table(gt, np.ones((1, 18), bool), gt.copy(), range(18))
    assert table.shape == (1, 1) and table[0, 0] == 0.0


def test_best_permutation_hungarian_matches_exhaustive():
    """Above the exhaustive cutoff the Hungarian path must reach the same
    minimal total error (and identical assignment when unique), and a
    12-person frame must evaluate fast."""
    import itertools
    import time

    from mpe3d_tpu.eval.pose_metrics import best_permutation

    rng = np.random.default_rng(0)
    # compare totals on sizes straddling the cutoff
    for G, R in [(3, 5), (5, 3), (6, 6), (7, 5), (5, 8), (9, 9)]:
        t = rng.random((G, R))
        perm = best_permutation(t)
        total = sum(t[g, r] for g, r in enumerate(perm) if r < R)
        # brute-force optimum
        if G <= R:
            cand = itertools.permutations(range(R), G)
        else:
            cand = itertools.permutations(range(G), G)
        best = min(sum(t[g, r] for g, r in enumerate(p) if r < R)
                   for p in cand)
        assert abs(total - best) < 1e-12, (G, R)
        assert len(set(perm)) == G          # distinct assignment
    # crowded frame: milliseconds, not minutes
    t12 = rng.random((12, 12))
    t0 = time.perf_counter()
    perm = best_permutation(t12)
    assert time.perf_counter() - t0 < 0.1
    assert sorted(perm) == list(range(12))


def test_dedup_ground_truth():
    """data/frames.py::dedup_ground_truth — duplicated GT rows (the wire
    GT-duplication artifact) are dropped, first occurrence in file order
    wins; already-unique GT passes through unchanged (same object)."""
    from mpe3d_tpu.data.frames import FrameGroundTruth, dedup_ground_truth

    rng = np.random.default_rng(0)
    a = rng.normal(size=(18, 3)).astype(np.float32)
    b = rng.normal(size=(18, 3)).astype(np.float32)
    gt3d = np.stack([a, b, a])               # row 2 duplicates row 0
    gt = FrameGroundTruth(gt3d,
                          np.ones((3, 18), bool),
                          np.array([True, True, False]),
                          "trackera")
    out = dedup_ground_truth(gt)
    assert out.gt3d.shape[0] == 2
    np.testing.assert_array_equal(out.gt3d[0], a)
    np.testing.assert_array_equal(out.gt3d[1], b)
    assert out.person_valid.tolist() == [True, True]   # first wins
    assert out.camera == "trackera"

    unique = FrameGroundTruth(np.stack([a, b]), np.ones((2, 18), bool),
                              np.ones(2, bool), "trackera")
    assert dedup_ground_truth(unique) is unique
