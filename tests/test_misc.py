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


def test_html_viewer_writes_selfcontained_file(tmp_path):
    """write_html_viewer embeds a parseable JSON payload (poses, GT, ids,
    quality, cameras) in one dependency-free HTML file — the interactive
    counterpart of the reference's pyqtgraph window."""
    import json
    import re

    import numpy as np

    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.viz.html_viewer import write_html_viewer
    from mpe3d_tpu.viz.viewer import remap_axes

    rng = np.random.default_rng(1)
    J = PANOPTIC.n_joints
    frames = [rng.normal(size=(2, J, 3)).astype(np.float32)
              for _ in range(3)]
    gts = [rng.normal(size=(2, J, 3)).astype(np.float32) for _ in range(3)]
    ids = [np.array([4, 7])] * 3
    quals = [np.array([1.25, -1.0])] * 3
    cams = rng.normal(size=(5, 3))
    out = str(tmp_path / "viewer.html")
    path = write_html_viewer(frames, PANOPTIC, out, frames_gt=gts,
                             frames_track_ids=ids, frames_quality=quals,
                             camera_centers=cams, fps=4)
    text = open(path).read()
    assert "<canvas" in text and "requestAnimationFrame" in text
    m = re.search(r"const D=(\{.*?\});\n", text, re.S)
    assert m, "payload not found"
    data = json.loads(m.group(1))
    assert len(data["frames"]) == 3
    assert len(data["frames"][0]["p"]) == 2
    assert len(data["frames"][0]["p"][0]) == J
    assert data["frames"][0]["id"] == [4, 7]
    assert data["frames"][0]["q"] == [1.2, -1.0]
    assert "g" in data["frames"][0] and len(data["cams"]) == 5
    assert data["axes"] == [lbl for lbl, _ in PANOPTIC.axes_3d]
    # payload poses are in display space (axis remap applied)
    want = np.round(remap_axes(frames[1].astype(np.float64), PANOPTIC), 3)
    np.testing.assert_allclose(np.array(data["frames"][1]["p"]), want)


def test_html_viewer_empty_frames(tmp_path):
    """Frames with zero detected people serialise as empty lists."""
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.viz.html_viewer import write_html_viewer

    out = write_html_viewer([np.zeros((0, 18, 3))], PANOPTIC,
                            str(tmp_path / "empty.html"))
    assert '"p":[]' in open(out).read()


def test_transformset_unreachable_frame_keyerror_not_recursion():
    """A mistyped/unreachable frame must raise KeyError — the multi-hop
    composition is visited-set bounded (an unbounded mutual recursion
    previously RecursionError'd, uncatchable by the KeyError handlers)."""
    from mpe3d_tpu.geometry.calib_io import TransformSet

    I = np.eye(4)
    ts = TransformSet({("root", "c1"): I, ("root", "c2"): I})
    with pytest.raises(KeyError):
        ts.get_transform("root", "typo_cam")
    # multi-hop still composes: c1 -> c2 through root
    np.testing.assert_allclose(ts.get_transform("c1", "c2"), I)


def test_transformset_json_roundtrip_spaces_and_legacy():
    from mpe3d_tpu.geometry.calib_io import TransformSet

    T = np.diag([1.0, 2.0, 3.0, 1.0])
    ts = TransformSet({("root", "cam 1"): T})      # name WITH a space
    rt = TransformSet.from_json(ts.to_json())
    np.testing.assert_allclose(rt.get_transform("root", "cam 1"), T)
    # legacy dict format still loads
    legacy = json.dumps({"root trackera": np.eye(4).tolist()})
    old = TransformSet.from_json(legacy)
    np.testing.assert_allclose(old.get_transform("root", "trackera"),
                               np.eye(4))


def test_html_viewer_hostile_title_and_short_gt(tmp_path):
    """A '</script>' in the title must not break the payload, and a GT
    list shorter than the frame list must not crash the export."""
    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.viz.html_viewer import write_html_viewer

    frames = [np.random.default_rng(0).normal(size=(1, 18, 3)),
              np.random.default_rng(1).normal(size=(1, 18, 3))]
    out = str(tmp_path / "v.html")
    write_html_viewer(frames, PANOPTIC, out,
                      frames_gt=[frames[0]],              # shorter than frames
                      title="a</script><b>&.json")
    text = open(out).read()
    assert "</script><b>" not in text      # escaped in markup AND payload
    assert text.count("</script>") == text.count("<script")
