"""Trainer-LEVEL golden parity vs the reference's own training loop
(round-2 VERDICT item 2).

The per-step golden tests (test_golden_reference.py) prove packer/loss/
forward parity; this proves the TRAINERS match: the reference's own
dataset + MLP + compute_error driven by a faithful mirror of its loop
(reference: pose_estimator/train_pose_estimator.py:184-282) vs our
production ``train_lifter`` — identical data (packed by the reference's
PoseEstimatorDataset), identical init (the torch init imported through
convert.torch_import), deterministic batch order (shuffle off both
sides).  Per-epoch train losses must track step-for-step (measured
deviation 4e-6 rel; asserted at 1e-3 to absorb device-count variance —
the suite runs data-parallel over 8 virtual devices).

The longer shuffled-convergence A/B (final packed MPJPE of both stacks)
is scripts/trainer_parity_ab.py --converge; its result is folded into
RESULTS.md.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
TM = os.path.join(REF, "tm_panoptic.pickle")

pytestmark = pytest.mark.skipif(not os.path.exists(TM),
                                reason="reference fixtures unavailable")


def _load_ab_module():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "trainer_parity_ab.py")
    spec = importlib.util.spec_from_file_location("trainer_parity_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lifter_trainer_matches_reference_training_loop(panoptic_rig):
    import torch

    from mpe3d_tpu.config import PANOPTIC, LifterTrainConfig
    from mpe3d_tpu.convert.torch_import import load_reference_lifter
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames)
    from mpe3d_tpu.train.lifter import train_lifter

    ab = _load_ab_module()
    epochs, batch = 2, 32
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.08,
                       spurious_rate=0.0, camera_dropout=0.1)
    frames = generate_single_person_frames(PANOPTIC, panoptic_rig, 64,
                                           seed=11, noise=noise)
    net, err = ab.pack_with_reference_dataset(frames)
    n = len(net) // batch * batch
    net, err = net[:n], err[:n]
    assert n >= batch

    torch.manual_seed(58008)
    with ab._RefModules():
        from mlp import PoseEstimatorMLP
        mlp0 = PoseEstimatorMLP(input_dimensions=net.shape[1],
                                output_dimensions=54)
    init_path = "/tmp/test_trainer_parity_init.pt"
    torch.save(mlp0.state_dict(), init_path)
    init_params, lifter_cfg = load_reference_lifter(init_path)

    ref_losses, _ = ab.reference_training_run(
        (net, err), epochs, batch, 1e-4, False, init_path,
        log=lambda s: None)

    tcfg = LifterTrainConfig(epochs=epochs, batch_size=batch, lr=1e-4,
                             eval_every=1, patience=10**9,
                             loss="reference", shuffle=False,
                             save_rel_improve=0.0, seed=58008)
    res = train_lifter(net, err, net, err, PANOPTIC, panoptic_rig,
                       lifter_cfg, tcfg, params=init_params,
                       log=lambda s: None)
    our_losses = [h["train_loss"] for h in res.history]

    assert len(our_losses) >= epochs and len(ref_losses) == epochs
    rel = [abs(a - b) / max(abs(a), 1e-9)
           for a, b in zip(ref_losses, our_losses)]
    assert max(rel) < 1e-3, (ref_losses, our_losses)
    # and training actually trained (not comparing two no-ops)
    assert ref_losses[-1] < 0.95 * ref_losses[0]
