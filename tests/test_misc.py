"""Smaller utilities: convert-torch CLI, JSONL logger, viewer remap."""

import json
import os

import numpy as np
import pytest

from mpe3d_tpu.utils.logging import JsonlLogger


def test_jsonl_logger(tmp_path, capsys):
    path = str(tmp_path / "log.jsonl")
    log = JsonlLogger(path, run="test")
    log.event("train_step", epoch=1, loss=0.25)
    log("plain message")          # trainer-callback form
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["kind"] == "train_step"
    assert lines[0]["loss"] == 0.25
    assert lines[0]["run"] == "test"
    assert lines[1]["kind"] == "log"
    out = capsys.readouterr().out
    assert "train_step" in out and "loss=0.25" in out


def test_viewer_remap_axes():
    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.viz.viewer import remap_axes

    poses = np.arange(6, dtype=np.float32).reshape(1, 2, 3)
    out = remap_axes(poses, PANOPTIC)
    # PANOPTIC: X=coord0, Y=coord2, Z=−coord1 (parameters.py:77)
    assert np.allclose(out[0, 0], [0.0, 2.0, -1.0])


def test_convert_torch_cli(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from mpe3d_tpu.cli import main

    dims = [1260, 3072, 3072, 2048, 2048, 1024, 1024, 1024, 1024, 54]
    layers = [nn.Flatten()]
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(nn.Linear(a, b))
        if i < len(dims) - 2:
            layers.append(nn.LeakyReLU(0.1))
    net = nn.Sequential(*layers)
    src = str(tmp_path / "pose_estimator.pytorch")
    torch.save({"model_state_dict": net.state_dict()}, src)

    md = str(tmp_path / "models")
    main(["convert-torch", "--lifter", src, "--modelsdir", md])
    capsys.readouterr()
    assert os.path.exists(md + "/pose_estimator.npz")

    # load_models picks up the converted checkpoint
    from mpe3d_tpu.cli import load_models
    from mpe3d_tpu.config import PANOPTIC
    mparams, mcfg, lparams, lcfg, lifter_prior = load_models(md, PANOPTIC)
    assert lcfg.in_dim == 1260
    assert lparams["layers"][0]["w"].shape == (1260, 3072)
    assert lifter_prior == "mean"  # torch imports carry no prior meta

def test_viewer_track_and_quality_overlay(tmp_path):
    """render_sequence accepts stable-id colours + quality labels (the
    tracking/quality extensions) and still writes the GIF."""
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.viz.viewer import render_sequence

    rng = np.random.default_rng(0)
    J = PANOPTIC.n_joints
    frames = [rng.normal(size=(2, J, 3)).astype(np.float32)
              for _ in range(2)]
    ids = [np.array([4, 7]), np.array([4, 7])]
    quals = [np.array([1.2, -1.0]), np.array([0.9, 33.0])]
    out = str(tmp_path / "seq.gif")
    path = render_sequence(frames, PANOPTIC, out,
                           frames_track_ids=ids, frames_quality=quals,
                           fps=2)
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 1000
