"""Round-robin multi-device serving (pipeline.enable_multi_device_serving):
frame-level device parallelism — params replicated per chip, successive
submit_fused dispatches land on different devices, results identical to
single-device and strictly ordered.  Runs on the 8-virtual-CPU-device mesh
(conftest)."""

import jax
import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline


def _pipe(panoptic_rig, backend="mlp"):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0, backend=backend)


@pytest.fixture(scope="module")
def frames(panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03)
    return [parse_frame(f, PANOPTIC, max_skeletons=4)
            for f in generate_frames(PANOPTIC, panoptic_rig, 8,
                                     n_people=(1, 2), seed=41,
                                     noise=noise, with_gt=False)]


def test_round_robin_uses_all_devices(panoptic_rig, frames):
    pipe = _pipe(panoptic_rig)
    n = pipe.enable_multi_device_serving()
    assert n == len(jax.local_devices()) and n >= 2
    used = set()
    tickets = [pipe.submit_fused(f) for f in frames]
    for _, out in tickets:
        (dev,) = out[0].devices()
        used.add(dev)
    assert len(used) == min(n, len(frames))
    for t in tickets:
        pipe.collect_fused(t)


def test_multi_device_matches_single_device(panoptic_rig, frames):
    pipe = _pipe(panoptic_rig)
    single = [pipe.infer_fused(f) for f in frames]
    pipe.enable_multi_device_serving()
    multi = list(pipe.infer_stream(frames, depth=6))
    assert len(multi) == len(single)
    for s, m in zip(single, multi):
        np.testing.assert_allclose(s.poses, m.poses, atol=1e-5)
        np.testing.assert_array_equal(s.persons, m.persons)
        np.testing.assert_allclose(s.quality, m.quality, atol=1e-5)


def test_explicit_device_subset(panoptic_rig, frames):
    pipe = _pipe(panoptic_rig, backend="triangulation")
    devs = jax.local_devices()[:2]
    assert pipe.enable_multi_device_serving(devices=devs) == 2
    outs = list(pipe.infer_stream(frames[:4], depth=4))
    assert len(outs) == 4
    for o in outs:
        assert len(o.poses) == len(o.quality)


def test_server_over_multi_device(panoptic_rig):
    """The serving front-end composes with round-robin device dispatch."""
    import json

    from mpe3d_tpu.serve import PoseServer

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.0)
    wire = generate_frames(PANOPTIC, panoptic_rig, 6, n_people=(1, 1),
                           seed=42, noise=noise, with_gt=False, spread=1.2)
    pipe = _pipe(panoptic_rig, backend="triangulation")
    n = pipe.enable_multi_device_serving()
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2 * n)
    out = []
    server.handle_stream([json.dumps(f) for f in wire] +
                         ['{"cmd": "stats"}'], out.append)
    recs = [json.loads(l) for l in out]
    assert [r["seq"] for r in recs[:-1]] == list(range(len(wire)))
    assert recs[-1]["frames"] == len(wire) and recs[-1]["errors"] == 0


def test_batch_round_robin_uses_all_devices(panoptic_rig, frames):
    """submit_batch round-robins across serving devices (the serve
    --multi-device --batch-window composition) and stays result-identical
    to the single-device batch path, pad frames included."""
    pipe = _pipe(panoptic_rig)
    single = pipe.infer_batch(frames)
    n = pipe.enable_multi_device_serving()
    tickets = [pipe.submit_batch(frames[i:i + 2], pad_to=3)
               for i in range(0, len(frames), 2)]
    used = set()
    for _, out in tickets:
        (dev,) = out[0].devices()
        used.add(dev)
    assert len(used) == min(n, len(tickets))
    multi = [o for t in tickets for o in pipe.collect_batch(t)]
    assert len(multi) == len(single)
    for s, m in zip(single, multi):
        np.testing.assert_allclose(s.poses, m.poses, atol=1e-5)
        np.testing.assert_array_equal(s.persons, m.persons)
        np.testing.assert_allclose(s.quality, m.quality, atol=1e-5)


def test_multi_device_with_int8_serving(panoptic_rig, frames):
    """Quantized (int8) serving params are a custom pytree; they must
    replicate per device and round-robin identically to single-device."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0, backend="mlp", serve_dtype="int8")
    single = [pipe.infer_fused(f) for f in frames[:4]]
    pipe.enable_multi_device_serving()
    multi = list(pipe.infer_stream(frames[:4], depth=4))
    for s, m in zip(single, multi):
        np.testing.assert_allclose(s.poses, m.poses, atol=1e-5)
        np.testing.assert_array_equal(s.persons, m.persons)
