"""Graph alternative '2' + BODY_25 format support."""

import dataclasses

import jax
import numpy as np

from mpe3d_tpu.config import PANOPTIC, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.pipeline import PoseEstimationPipeline


def test_alt2_feature_dims():
    assert PANOPTIC.matcher_feature_dim_alt("3") == 902
    assert PANOPTIC.matcher_feature_dim_alt("2") == 2 + 5 * 18 * 4 == 362


def test_alt2_pipeline_runs(panoptic_rig):
    rig_cfg = dataclasses.replace(PANOPTIC, graph_alternative="2")
    mcfg = MatcherConfig(in_dim=rig_cfg.matcher_feature_dim_alt("2"),
                         hidden=(8,), heads=(2,))
    pipe = PoseEstimationPipeline(rig_cfg, panoptic_rig,
                                  init_matcher(jax.random.PRNGKey(0), mcfg),
                                  mcfg, backend="triangulation",
                                  slot_buckets=(4,), person_buckets=(8,),
                                  threshold=0.05)
    noise = SceneNoise(spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(rig_cfg, panoptic_rig, 2, n_people=(2, 2),
                             seed=4, noise=noise, with_gt=False)
    out = pipe.infer_fused(parse_frame(frames[0], rig_cfg, max_skeletons=4))
    assert out.poses.shape[1:] == (18, 3)


def _body25_cfg():
    # meaningful BODY_25 accuracy joints: head/arms/hips/legs (foot points
    # and hip center excluded like the reference excludes eyes/ears on COCO)
    return dataclasses.replace(
        PANOPTIC, joint_format="BODY_25",
        used_joints=(0, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14))


def test_body25_end_to_end_oracle(panoptic_rig):
    """Full frame→poses→metrics path in BODY_25 format (the reference's
    FORMAT='BODY_25' switch, parameters.py:3-10): synthetic 25-joint people,
    oracle matching, DLT lifting, MPJPE within noise bounds."""
    from test_e2e import OraclePipeline

    from mpe3d_tpu.eval.runners import run_pose_metrics

    rig_cfg = _body25_cfg()
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02,
                       spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(rig_cfg, panoptic_rig, 6, n_people=(2, 3),
                             seed=5, noise=noise)
    pipe = OraclePipeline(rig_cfg, panoptic_rig, None,
                          MatcherConfig(in_dim=rig_cfg.matcher_feature_dim),
                          backend="triangulation")
    results = []
    for f in frames:
        pipe.set_frame(f)
        r = run_pose_metrics([f], rig_cfg, pipe, datastep=1)
        if r["n_frames"]:
            results.append(r)
    assert results
    mpjpe = np.nanmean([r["mpjpe_mm"] for r in results])
    assert mpjpe < 60.0, mpjpe
    assert np.mean([r["mR"] for r in results]) > 60.0


def test_body25_fused_pipeline_runs(panoptic_rig):
    """The fused single-program path handles the 25-joint format."""
    rig_cfg = _body25_cfg()
    mcfg = MatcherConfig(in_dim=rig_cfg.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    pipe = PoseEstimationPipeline(rig_cfg, panoptic_rig,
                                  init_matcher(jax.random.PRNGKey(0), mcfg),
                                  mcfg, backend="triangulation",
                                  slot_buckets=(4,), person_buckets=(8,),
                                  threshold=0.05)
    noise = SceneNoise(spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(rig_cfg, panoptic_rig, 2, n_people=(2, 2),
                             seed=6, noise=noise, with_gt=False)
    out = pipe.infer_fused(parse_frame(frames[0], rig_cfg, max_skeletons=4))
    assert out.poses.shape[1:] == (25, 3)


def test_body25_config_dims():
    rig_cfg = dataclasses.replace(PANOPTIC, joint_format="BODY_25")
    assert rig_cfg.n_joints == 25
    assert rig_cfg.lifter_input_dim == 5 * 25 * 14
    assert rig_cfg.matcher_feature_dim == 2 + 5 * 25 * 10
    # parser obeys the joint count
    frame = {"trackera": ['[{"20": [20, 5.0, 6.0, 1, 0.9]}]', 0.0,
                          "no_image"]}
    fa = parse_frame(frame, rig_cfg, max_skeletons=2)
    assert fa.kp.shape == (5, 2, 25, 2)
    assert fa.in_view[0, 0, 20]
