"""End-to-end integration tests on synthetic scenes.

Strategy (SURVEY.md §4): the triangulation 3D backend needs no training, so
the full frame→poses path (parse → matcher features → decode → lift →
metrics) is tested with an *oracle matcher* (scores = construction labels);
the learned components get separate training smoke tests in test_training.py.
"""

import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.eval.runners import run_pose_metrics, run_sm_metrics
from mpe3d_tpu.matching.features import pair_mask_from_present
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.pipeline import PoseEstimationPipeline


class OraclePipeline(PoseEstimationPipeline):
    """Pipeline whose matcher scores are computed from GT person identity:
    two heads match iff their per-camera GT entries coincide (synthetic
    frames attach person-aligned GT lists)."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._frame_gt_labels = None

    def set_frame(self, frame_dict):
        labels = {}
        for mi, cam in enumerate(self.rig_config.used_cameras_skeleton_matching):
            if cam not in frame_dict or len(frame_dict[cam]) < 4:
                continue
            for slot, joints in enumerate(frame_dict[cam][3]):
                key = tuple(sorted((k, tuple(np.round(v, 3)))
                                   for k, v in joints.items() if k != "-1"))
                labels[(mi, slot)] = key
        self._frame_gt_labels = labels

    def match(self, frame):
        S = self._bucket(max(1, int(
            frame.present[np.asarray(self.match_idx)].sum(axis=1).max())))
        topo = self.topology(S)
        present = frame.present[np.asarray(self.match_idx), :S]
        pm = np.asarray(pair_mask_from_present(present, topo))
        scores = np.zeros(topo.n_pairs, np.float32)
        for k in range(topo.n_pairs):
            if pm[k] < 0.5:
                continue
            h1, h2 = int(topo.e1[k]), int(topo.e2[k])
            a = self._frame_gt_labels.get((h1 // S, h1 % S))
            b = self._frame_gt_labels.get((h2 // S, h2 % S))
            scores[k] = 0.9 if (a is not None and a == b) else 0.1
        return scores, pm, topo, S


@pytest.fixture(scope="module")
def synthetic_world(panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02,
                       spurious_rate=0.0, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, n_frames=12,
                             n_people=(2, 3), seed=3, noise=noise)
    return frames


def test_parse_roundtrip(synthetic_world):
    fa = parse_frame(synthetic_world[0], PANOPTIC)
    assert fa.kp.shape == (5, 10, 18, 2)
    assert fa.present.any()
    gt = parse_frame_gt(synthetic_world[0], PANOPTIC)
    assert gt is not None
    assert gt.gt3d.shape[1] == 18
    assert gt.person_valid.all()


def test_e2e_triangulation_backend(panoptic_rig, synthetic_world):
    """Oracle matching + DLT lifting lands within a few cm of GT."""
    pipe = OraclePipeline(PANOPTIC, panoptic_rig, None, MatcherConfig(),
                          backend="triangulation")

    class FrameAwarePipe:
        def __getattr__(self, k):
            return getattr(pipe, k)

    acc_frames = []
    for f in synthetic_world:
        pipe.set_frame(f)
        acc_frames.append(f)
    # run metrics frame-by-frame so set_frame stays in sync
    results = []
    for f in synthetic_world:
        pipe.set_frame(f)
        r = run_pose_metrics([f], PANOPTIC, pipe, datastep=1)
        if r["n_frames"]:
            results.append(r)
    assert results, "no frames evaluated"
    mpjpe = np.nanmean([r["mpjpe_mm"] for r in results])
    assert mpjpe < 60.0, mpjpe      # noisy pixels ≈ a few cm of 3D error
    recall = np.mean([r["mR"] for r in results])
    assert recall > 60.0


def test_e2e_triangulation_irls_variant(panoptic_rig, synthetic_world):
    """tri_variant='irls' drives the classical backend through the
    Huber-IRLS all-view solve (triangulate_irls) end-to-end and must land
    at least as close to GT as the reference-exact median variant on
    noisy multi-person frames (the diag shows it strictly better at the
    population level; equal is allowed per-sample)."""
    res = {}
    for variant in ("median", "irls"):
        pipe = OraclePipeline(PANOPTIC, panoptic_rig, None, MatcherConfig(),
                              backend="triangulation", tri_variant=variant)
        vals = []
        for f in synthetic_world:
            pipe.set_frame(f)
            r = run_pose_metrics([f], PANOPTIC, pipe, datastep=1)
            if r["n_frames"]:
                vals.append(r["mpjpe_mm"])
        res[variant] = float(np.nanmean(vals))
    assert res["irls"] < 60.0, res
    assert res["irls"] <= res["median"] * 1.05, res   # no regression


def test_e2e_sm_metrics_oracle(panoptic_rig, synthetic_world):
    pipe = OraclePipeline(PANOPTIC, panoptic_rig, None, MatcherConfig())
    scores_all = []
    for f in synthetic_world:
        pipe.set_frame(f)
        r = run_sm_metrics([f], PANOPTIC, pipe, datastep=1)
        if r["n_frames"]:
            scores_all.append(r["ari"])
    assert scores_all
    assert np.mean(scores_all) > 0.95    # oracle scores → near-perfect ARI


def test_e2e_untrained_matcher_runs(panoptic_rig, synthetic_world):
    """The real (untrained) matcher path executes end-to-end."""
    import jax
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    pipe = PoseEstimationPipeline(PANOPTIC, panoptic_rig, params, cfg,
                                  backend="triangulation",
                                  slot_buckets=(4,), person_buckets=(8,))
    fa = parse_frame(synthetic_world[0], PANOPTIC, max_skeletons=4)
    out = pipe(fa)
    assert out.poses.shape[1:] == (18, 3)
    assert out.scores.shape[0] == pipe.topology(4).n_pairs


def test_generator_spread_and_camera_guard(panoptic_rig):
    """spread ranges sample per frame; min_cam_dist keeps people away from
    cameras (the wide-volume training-data knobs)."""
    import numpy as np

    from mpe3d_tpu.data.synthetic import generate_frames

    cam_pos = np.asarray(panoptic_rig.T_cw)[:, :3, 3]

    def min_cam_distance(frames):
        m = np.inf
        cam = PANOPTIC.camera_names[0]
        for f in frames:
            for g in f[cam][3]:
                c = np.mean([v for k, v in g.items() if k != "-1"],
                            axis=0) / 100.0
                m = min(m, float(np.linalg.norm(cam_pos - c[None],
                                                axis=1).min()))
        return m

    free = generate_frames(PANOPTIC, panoptic_rig, 30, n_people=(2, 3),
                           seed=5, spread=(0.8, 2.0))
    guarded = generate_frames(PANOPTIC, panoptic_rig, 30, n_people=(2, 3),
                              seed=5, spread=(0.8, 2.0), min_cam_dist=1.2)
    assert min_cam_distance(guarded) >= 1.2
    assert min_cam_distance(free) < min_cam_distance(guarded)

    # wider spread really spreads people (person-center spread grows)
    def mean_pair_dist(frames):
        ds = []
        cam = PANOPTIC.camera_names[0]
        for f in frames:
            cs = [np.mean([v for k, v in g.items() if k != "-1"], axis=0)
                  for g in f[cam][3]]
            ds += [np.linalg.norm(np.asarray(a) - np.asarray(b))
                   for i, a in enumerate(cs) for b in cs[i + 1:]]
        return float(np.mean(ds))

    narrow = generate_frames(PANOPTIC, panoptic_rig, 30, n_people=(2, 3),
                             seed=5, spread=1.0)
    assert mean_pair_dist(free) > mean_pair_dist(narrow) * 1.1


def test_generator_outlier_noise(panoptic_rig):
    """SceneNoise.outlier_rate injects confident large mislocalisations:
    within one projection call the Gaussian draws align, so the displaced
    fraction and magnitudes are directly measurable; valid/prob stay 1."""
    import numpy as np

    from mpe3d_tpu.data.synthetic import project_person

    person = np.zeros((18, 3))
    person[:, 0] = np.linspace(-0.3, 0.3, 18)
    person[:, 2] = np.linspace(0.0, 1.7, 18)

    clean_noise = SceneNoise(pixel_sigma=0.0, joint_dropout=0.0)
    dirty_noise = SceneNoise(pixel_sigma=0.0, joint_dropout=0.0,
                             outlier_rate=0.25, outlier_px=40.0)

    deltas, flags = [], []
    for trial in range(60):
        pc, vc = project_person(person, panoptic_rig, trial % 5, PANOPTIC,
                                np.random.default_rng(trial), clean_noise)
        pd, vd = project_person(person, panoptic_rig, trial % 5, PANOPTIC,
                                np.random.default_rng(trial), dirty_noise)
        both = vc & vd   # a displaced pixel may leave the image bounds
        deltas.append(np.linalg.norm(pc - pd, axis=-1)[both])
    deltas = np.concatenate(deltas)
    hit = deltas > 1e-9
    assert 0.15 < hit.mean() < 0.35, hit.mean()     # ≈ outlier_rate
    assert deltas[hit].min() >= 10.0 - 1e-6         # at least 10 px away
    assert deltas[hit].max() <= 40.0 + 1e-6         # bounded by outlier_px

    # wire format keeps the displaced joints fully valid and confident
    import json as _json
    frames = generate_frames(PANOPTIC, panoptic_rig, 5, n_people=(1, 1),
                             seed=7, noise=dirty_noise)
    for f in frames:
        for entry in f.values():
            for sk in _json.loads(entry[0]):
                for v in sk.values():
                    assert v[3] == 1 and v[4] == 1.0


def test_tri_variant_live_mutation_retraces(panoptic_rig, synthetic_world):
    """Mutating tri_variant on a live triangulation-backend pipeline must
    retrace the staged lift program (regression: _lift_fn's per-instance
    cache was keyed only on prior_gate_px, so the stale median program
    kept serving after the CLI/test attribute-mutation pattern)."""
    import jax
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    pipe = PoseEstimationPipeline(PANOPTIC, panoptic_rig, params, cfg,
                                  backend="triangulation", threshold=0.05,
                                  slot_buckets=(4,), person_buckets=(8,))
    fa = parse_frame(synthetic_world[0], PANOPTIC, max_skeletons=4)
    out_median = np.asarray(pipe(fa).poses)
    pipe.tri_variant = "irls"
    out_irls = np.asarray(pipe(fa).poses)
    assert out_median.shape == out_irls.shape and len(out_median)
    # under detector noise the variants genuinely differ — identical
    # outputs would mean the cached median program was reused
    assert float(np.max(np.abs(out_median - out_irls))) > 1e-7
