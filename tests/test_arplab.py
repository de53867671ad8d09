"""ARP Lab rig (6 cameras incl. robot-mounted) end-to-end sanity —
the reference's second environment (parameters.py:79-123)."""

import os

import jax
import numpy as np
import pytest

from mpe3d_tpu.config import ARPLAB, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                      synthetic_ring_rig)
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline


@pytest.fixture(scope="module")
def arp_rig():
    ref = "/root/reference/tm_arp.pickle"
    if os.path.exists(ref):
        from mpe3d_tpu.geometry.calib_io import rig_from_files
        return rig_from_files(ARPLAB, ref)
    return synthetic_ring_rig(ARPLAB)


def test_arplab_dims():
    assert ARPLAB.n_cameras == 6
    assert ARPLAB.lifter_input_dim == 6 * 18 * 14 == 1512
    assert ARPLAB.matcher_feature_dim == 2 + 6 * 18 * 10 == 1082


def test_arplab_reference_calibration_loads(arp_rig):
    assert arp_rig.n_cameras == 6
    # camera origins are finite and distinct
    centers = np.asarray(arp_rig.T_cw[:, :3, 3])
    assert np.isfinite(centers).all()
    assert len(np.unique(np.round(centers, 3), axis=0)) == 6


def test_arplab_fused_pipeline(arp_rig):
    mcfg = MatcherConfig(in_dim=ARPLAB.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    lcfg = LifterConfig(in_dim=ARPLAB.lifter_input_dim,
                        out_dim=ARPLAB.n_joints * 3, widths=(64,))
    pipe = PoseEstimationPipeline(
        ARPLAB, arp_rig, init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(2,), person_buckets=(4,), threshold=0.05)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02,
                       spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(ARPLAB, arp_rig, 3, n_people=(1, 2), seed=2,
                             noise=noise, with_gt=False)
    for f in frames:
        fa = parse_frame(f, ARPLAB, max_skeletons=2)
        out = pipe.infer_fused(fa)
        assert out.poses.shape[1:] == (18, 3)
