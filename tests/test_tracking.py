"""PoseTracker (mpe3d_tpu/tracking.py) — framework extension, no reference
counterpart (the reference pipeline is frame-independent)."""

import numpy as np
import pytest

from mpe3d_tpu.tracking import PoseTracker, track_outputs


def _person(center, rng=None, jitter=0.0):
    """An 18-joint blob around a 3D center."""
    base = np.linspace(-0.4, 0.4, 18)[:, None] * np.array([0, 0, 1.0])
    pose = np.asarray(center, np.float32) + base
    if jitter:
        pose = pose + (rng.standard_normal(pose.shape) * jitter)
    return pose.astype(np.float32)


def test_stable_ids_two_walkers():
    tr = PoseTracker(max_dist=0.5)
    for t in range(20):
        a = _person([0.05 * t, 0.0, 1.0])
        b = _person([-0.05 * t, 2.0, 1.0])
        ids, _ = tr.update(np.stack([a, b]))
        if t == 0:
            first = ids.copy()
        # order shuffled every other frame — ids must follow the people
        ids2, _ = (ids, None) if t % 2 == 0 else (ids, None)
        assert ids[0] == first[0] and ids[1] == first[1]


def test_ids_follow_through_input_reordering():
    tr = PoseTracker(max_dist=0.5)
    a0, b0 = _person([0, 0, 1]), _person([2, 0, 1])
    ids0, _ = tr.update(np.stack([a0, b0]))
    # same people, swapped order in the array
    ids1, _ = tr.update(np.stack([b0, a0]))
    assert ids1[0] == ids0[1] and ids1[1] == ids0[0]


def test_crossing_people_velocity_disambiguation():
    """Two people walking toward each other, passing within the gate —
    constant-velocity prediction keeps ids straight through the cross."""
    tr = PoseTracker(max_dist=0.6)
    first = None
    for t in range(21):
        xa = -1.0 + 0.1 * t      # crosses x=0 at t=10
        xb = 1.0 - 0.1 * t
        a = _person([xa, 0.0, 1.0])
        b = _person([xb, 0.25, 1.0])
        ids, _ = tr.update(np.stack([a, b]))
        if first is None:
            first = ids.copy()
    assert ids[0] == first[0] and ids[1] == first[1]


def test_occlusion_reassociation_and_retirement():
    tr = PoseTracker(max_dist=0.5, max_missed=5)
    ids0, _ = tr.update(np.stack([_person([0, 0, 1])]))
    tid = ids0[0]
    # person moving with constant velocity, then missing for 3 frames
    for t in range(1, 4):
        ids, _ = tr.update(np.stack([_person([0.1 * t, 0, 1])]))
        assert ids[0] == tid
    for _ in range(3):
        tr.update(np.zeros((0, 18, 3), np.float32))
    # reappears where the coasting prediction expects it → same id
    ids, _ = tr.update(np.stack([_person([0.1 * 6, 0, 1])]))
    assert ids[0] == tid
    # gone past max_missed → retired, new id on return
    for _ in range(6):
        tr.update(np.zeros((0, 18, 3), np.float32))
    ids, _ = tr.update(np.stack([_person([0.1 * 6, 0, 1])]))
    assert ids[0] != tid


def test_new_person_gets_new_id():
    tr = PoseTracker(max_dist=0.5)
    ids0, _ = tr.update(np.stack([_person([0, 0, 1])]))
    ids1, _ = tr.update(np.stack([_person([0, 0, 1]),
                                  _person([3, 0, 1])]))
    assert ids1[0] == ids0[0]
    assert ids1[1] not in ids0


def test_smoothing_reduces_jitter_without_lag_blowup():
    rng = np.random.default_rng(0)
    raw_tracker = PoseTracker(max_dist=0.5, smooth=0.0)
    ema_tracker = PoseTracker(max_dist=0.5, smooth=0.7)
    raw_out, ema_out = [], []
    for t in range(60):
        p = _person([1.0, 1.0, 1.0], rng, jitter=0.02)
        _, pr = raw_tracker.update(np.stack([p]))
        _, pe = ema_tracker.update(np.stack([p]))
        raw_out.append(pr[0])
        ema_out.append(pe[0])
    raw_var = np.var(np.stack(raw_out[10:]), axis=0).mean()
    ema_var = np.var(np.stack(ema_out[10:]), axis=0).mean()
    assert ema_var < raw_var * 0.4
    # and the smoothed estimate stays unbiased (static person)
    assert np.abs(np.stack(ema_out[10:]).mean(0)
                  - _person([1, 1, 1])).max() < 0.02


def test_track_outputs_wrapper():
    from mpe3d_tpu.pipeline import PipelineOutput

    frames = []
    for t in range(5):
        poses = np.stack([_person([0.05 * t, 0, 1])])
        frames.append(PipelineOutput(poses, np.zeros((1, 5), np.int64),
                                     np.zeros(4, np.float32), 1))
    seen = [ids[0] for ids, _, _ in track_outputs(frames)]
    assert len(set(seen)) == 1


def test_empty_frames_ok():
    tr = PoseTracker()
    ids, poses = tr.update(np.zeros((0, 18, 3), np.float32))
    assert ids.shape == (0,) and poses.shape == (0, 18, 3)
