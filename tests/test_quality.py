"""Per-pose quality column (pipeline.pose_quality_px) — framework
extension, no reference counterpart: mean reprojection residual of each
output pose against its own assigned 2D observations, computed inside the
fused program."""

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline, pose_quality_px


def _pipe(panoptic_rig, backend="triangulation"):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0, backend=backend)


def test_quality_low_for_true_poses_triangulation(panoptic_rig):
    """DLT poses reproject near the detector noise floor; padding rows
    (no observations) carry the -1 sentinel and are cropped."""
    pipe = _pipe(panoptic_rig)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02,
                       spurious_rate=0.0, camera_dropout=0.0)
    checked = 0
    # single-person ghost-free frames: any decode association is the
    # correct person (the untrained test matcher mis-associates multi-
    # person frames and merges ghosts — both of which the quality column
    # correctly flags at 30-330 px, see test_quality_flags_corrupted_pose)
    # spread 1.2: keep people in the well-conditioned capture volume (the
    # default ~2.4 m disc puts them at the dome edge, where grazing-angle
    # projections legitimately blow up the residual)
    for f in generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(1, 1),
                             seed=21, noise=noise, with_gt=False,
                             spread=1.2):
        out = pipe.infer_fused(parse_frame(f, PANOPTIC, max_skeletons=4))
        if not len(out.poses):
            continue
        assert out.quality.shape == (len(out.poses),)
        ok = out.quality[out.quality >= 0]
        if len(ok):
            assert float(np.median(ok)) < 6.0, out.quality
            checked += 1
    assert checked > 0


def test_quality_flags_corrupted_pose(panoptic_rig):
    """A pose displaced by 30 cm scores an order of magnitude worse than
    the true pose against the same observations."""
    pipe = _pipe(panoptic_rig)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.0)
    f = generate_frames(PANOPTIC, panoptic_rig, 1, n_people=(2, 2),
                        seed=22, noise=noise, with_gt=False)[0]
    fa = parse_frame(f, PANOPTIC, max_skeletons=4)
    out = pipe.infer_fused(fa)
    assert len(out.poses) > 0
    kp, valid, prob, observed = pipe.gather_person_obs(fa, out.persons)
    q_true = np.asarray(pose_quality_px(
        jnp.asarray(out.poses), jnp.asarray(kp), jnp.asarray(valid),
        jnp.asarray(observed), pipe.used_rig))
    q_bad = np.asarray(pose_quality_px(
        jnp.asarray(out.poses + 0.3), jnp.asarray(kp), jnp.asarray(valid),
        jnp.asarray(observed), pipe.used_rig))
    sel = q_true >= 0
    assert (q_bad[sel] > 4 * q_true[sel]).all(), (q_true, q_bad)


def test_quality_consistent_between_paths(panoptic_rig):
    """Fused, staged (__call__) and batched paths report the same column."""
    pipe = _pipe(panoptic_rig)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03)
    frames = [parse_frame(f, PANOPTIC, max_skeletons=4)
              for f in generate_frames(PANOPTIC, panoptic_rig, 3,
                                       n_people=(1, 2), seed=23,
                                       noise=noise, with_gt=False)]
    batched = pipe.infer_batch(frames, slots=4)
    for fa, b in zip(frames, batched):
        fu = pipe.infer_fused(fa)
        st = pipe(fa)
        np.testing.assert_allclose(fu.quality, b.quality, atol=1e-4)
        if len(st.poses) == len(fu.poses):
            np.testing.assert_allclose(np.sort(st.quality),
                                       np.sort(fu.quality), atol=1e-3)


def test_quality_empty_frame(panoptic_rig):
    from mpe3d_tpu.data.frames import FrameArrays

    pipe = _pipe(panoptic_rig)
    C, S, J = PANOPTIC.n_cameras, 4, PANOPTIC.n_joints
    fa = FrameArrays(np.zeros((C, S, J, 2), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), bool),
                     np.zeros((C, S), bool),
                     np.zeros(C, np.float32))
    out = pipe.infer_fused(fa)
    assert len(out.poses) == 0 and len(out.quality) == 0


def test_slot_bucket_larger_than_parse_slots(panoptic_rig):
    """A slot bucket above the parse-time slot dim pads with empty slots
    instead of feeding short arrays into the S-slot topology (clipped
    gathers would silently alias slots)."""
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames

    pipe = _pipe(panoptic_rig)                # slot_buckets=(4,)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.0)
    f = generate_frames(PANOPTIC, panoptic_rig, 1, n_people=(2, 2),
                        seed=24, noise=noise, with_gt=False)[0]
    wide = pipe.infer_fused(parse_frame(f, PANOPTIC, max_skeletons=4))
    narrow = pipe.infer_fused(parse_frame(f, PANOPTIC, max_skeletons=2))
    assert len(narrow.poses) and len(wide.poses)
    np.testing.assert_allclose(narrow.poses, wide.poses, atol=1e-5)
    np.testing.assert_array_equal(narrow.persons, wide.persons)
    # and the batched path takes the same guard
    nb = pipe.infer_batch([parse_frame(f, PANOPTIC, max_skeletons=2)],
                          slots=4)[0]
    np.testing.assert_allclose(nb.poses, narrow.poses, atol=1e-5)


def test_fused_warmup_compiles_serving_path(panoptic_rig):
    pipe = _pipe(panoptic_rig)
    pipe.warmup(fused=True)     # must not raise; compiles submit_fused path
