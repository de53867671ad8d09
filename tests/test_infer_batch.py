"""Batched fused inference == per-frame fused inference."""

import jax
import numpy as np

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline


def test_infer_batch_matches_single(panoptic_rig):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    lcfg = LifterConfig(widths=(64,))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.05, camera_dropout=0.05)
    frames = [parse_frame(f, PANOPTIC, max_skeletons=4)
              for f in generate_frames(PANOPTIC, panoptic_rig, 6,
                                       n_people=(1, 3), seed=9, noise=noise,
                                       with_gt=False)]
    batched = pipe.infer_batch(frames, slots=4)
    assert len(batched) == len(frames)
    for f, b in zip(frames, batched):
        s = pipe.infer_fused(f)
        assert len(s.persons) == len(b.persons)
        assert np.array_equal(np.sort(s.persons, axis=0),
                              np.sort(b.persons, axis=0))
        assert np.allclose(np.sort(s.poses.ravel()),
                           np.sort(b.poses.ravel()), atol=1e-4)

    # pipelined streaming yields the same results, in order
    streamed = list(pipe.infer_stream(frames, depth=2))
    assert len(streamed) == len(frames)
    for st, f in zip(streamed, frames):
        s = pipe.infer_fused(f)
        assert len(st.persons) == len(s.persons)
        assert np.allclose(st.poses, s.poses, atol=1e-5)

    # multi-chip data-parallel batch (frames sharded over the 8 virtual
    # devices, 6 frames pad to 8) matches the single-device batch
    from mpe3d_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = pipe.infer_batch(frames, slots=4, mesh=mesh)
    assert len(sharded) == len(frames)
    for a, b in zip(batched, sharded):
        assert len(a.persons) == len(b.persons)
        assert np.allclose(a.poses, b.poses, atol=1e-5)
        assert np.allclose(a.scores, b.scores, atol=1e-5)
