"""Conversor tests: PoseResNet torch parity, peak finding, association,
and a full fake-sequence conversion to the wire format."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpe3d_tpu.convert.peaks import find_peaks, refine_peaks
from mpe3d_tpu.convert.pose_resnet import (apply_pose_resnet,
                                           init_pose_resnet,
                                           load_torch_pose_resnet)


def test_pose_resnet_shapes():
    params = init_pose_resnet(jax.random.PRNGKey(0), n_joints=18)
    x = jnp.zeros((1, 128, 192, 3))      # small input, same 1/4 law
    y = apply_pose_resnet(params, x)
    assert y.shape == (1, 32, 48, 18)


def _torch_pose_resnet(n_joints=18):
    """The simple-baselines architecture rebuilt in torch for parity
    (reference spec: panoptic_conversor/pose_resnet.py — ResNet-50 trunk +
    3 deconv + 1×1 head)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride, downsample):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idn)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, (n, w) in enumerate(zip([3, 4, 6, 3], [64, 128, 256, 512])):
                blocks = []
                for bi in range(n):
                    stride = 2 if (li > 0 and bi == 0) else 1
                    down = None
                    if bi == 0:
                        down = nn.Sequential(
                            nn.Conv2d(cin, w * 4, 1, stride, bias=False),
                            nn.BatchNorm2d(w * 4))
                    blocks.append(Bottleneck(cin, w, stride, down))
                    cin = w * 4
                setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
            dec = []
            for _ in range(3):
                dec += [nn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                        nn.BatchNorm2d(256), nn.ReLU(inplace=True)]
                cin = 256
            self.deconv_layers = nn.Sequential(*dec)
            self.final_layer = nn.Conv2d(256, n_joints, 1)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            return self.final_layer(self.deconv_layers(x))

    return Net()


def test_pose_resnet_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    net = _torch_pose_resnet().eval()
    # randomize BN stats so inference-form parity is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    path = str(tmp_path / "pose_resnet50_panoptic.pth.tar")
    torch.save({"state_dict": net.state_dict()}, path)

    params = load_torch_pose_resnet(path)
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(apply_pose_resnet(params, jnp.asarray(x)))
    got_nchw = got.transpose(0, 3, 1, 2)
    assert got_nchw.shape == ref.shape
    assert np.allclose(got_nchw, ref, atol=2e-3), np.abs(got_nchw - ref).max()


def test_find_refine_peaks():
    H, W = 64, 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    truth = [(20.3, 40.6), (50.8, 70.2)]
    cmap = np.zeros((2, H, W), np.float32)
    for j, (r, c) in enumerate(truth):
        cmap[j] = np.exp(-((yy - r) ** 2 + (xx - c) ** 2) / (2 * 1.5 ** 2))
    counts, peaks = find_peaks(jnp.asarray(cmap), threshold=0.15,
                               window=5, max_peaks=10)
    assert np.asarray(counts).tolist() == [1, 1]
    norm = np.asarray(refine_peaks(peaks, jnp.asarray(cmap), window=5))
    for j, (r, c) in enumerate(truth):
        x, y = norm[j, 0]
        assert abs(x * W - 0.5 - c) < 0.15, (j, x * W, c)
        assert abs(y * H - 0.5 - r) < 0.15, (j, y * H, r)


def test_find_peaks_multiple_and_threshold():
    cmap = np.zeros((1, 32, 32), np.float32)
    cmap[0, 5, 5] = 0.9
    cmap[0, 20, 25] = 0.5
    cmap[0, 28, 3] = 0.1    # below threshold
    counts, peaks = find_peaks(jnp.asarray(cmap), threshold=0.15,
                               window=5, max_peaks=4)
    assert int(counts[0]) == 2
    got = {tuple(p) for p in np.asarray(peaks)[0, :2].tolist()}
    assert got == {(5, 5), (20, 25)}


def test_association():
    from mpe3d_tpu.convert.panoptic import associate

    projected = {7: {0: [0, 100.0, 100.0, 1, 1], 5: [5, 200.0, 150.0, 1, 1]}}
    detected = {0: [[103.0, 101.0], [400.0, 400.0]], 5: [[500.0, 500.0]]}
    out = associate(projected, detected, max_dist=25.0)
    assert 7 in out
    assert out[7][0][1:3] == [103.0, 101.0]
    assert 5 not in out[7]          # nearest is 420px away


@pytest.fixture
def fake_sequence(tmp_path):
    """Minimal on-disk Panoptic sequence: 2 cameras, 2 frames, 1 body."""
    cv2 = pytest.importorskip("cv2")
    seq = tmp_path / "160906_fake1"
    (seq / "hdImgs" / "00_03").mkdir(parents=True)
    (seq / "hdImgs" / "00_06").mkdir(parents=True)
    (seq / "hdPose3d_stage1_coco19").mkdir()

    cams = []
    rng = np.random.default_rng(0)
    for node, yaw in ((3, 0.0), (6, 1.2)):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        t = -R @ np.array([300.0 * s, -20.0, -300.0 * c])  # cm
        cams.append({
            "panel": 0, "node": node, "name": f"00_{node:02d}",
            "resolution": [1920, 1080],
            "K": [[1400.0, 0.0, 960.0], [0.0, 1400.0, 540.0], [0, 0, 1.0]],
            "R": R.tolist(), "t": [[float(v)] for v in t],
            "distCoef": [0.0, 0.0, 0.0, 0.0, 0.0],
        })
    with open(seq / "calibration_160906_fake1.json", "w") as f:
        json.dump({"cameras": cams}, f)

    joints19 = []
    for i in range(19):
        joints19 += [float(rng.uniform(-30, 30)),
                     float(rng.uniform(-90, 30)),
                     float(rng.uniform(-30, 30)), 1.0]
    for fid in ("00000100", "00000101"):
        with open(seq / "hdPose3d_stage1_coco19" /
                  f"body3DScene_{fid}.json", "w") as f:
            json.dump({"bodies": [{"id": 0, "joints19": joints19}]}, f)
        img = np.zeros((64, 96, 3), np.uint8)
        for node in (3, 6):
            cv2.imwrite(str(seq / "hdImgs" / f"00_{node:02d}" /
                            f"00_{node:02d}_{fid}.jpg"), img)
    return str(seq)


def test_convert_sequence_wire_format(fake_sequence, tmp_path, monkeypatch):
    """Full conversion with a stub detector that returns noisy projections —
    outputs must parse as wire frames with aligned GT."""
    import itertools

    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.convert import panoptic as pano
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt

    cams = pano.load_calibration(fake_sequence)
    with open(os.path.join(fake_sequence, "hdPose3d_stage1_coco19",
                           "body3DScene_00000100.json")) as f:
        bodies = json.load(f)["bodies"]

    class StubDetector:
        """Returns noisy GT projections — cameras arrive in sorted node
        order per frame, matching convert_sequence's iteration."""

        def __init__(self):
            self._nodes = itertools.cycle([3, 6])
            self._rng = np.random.default_rng(1)

        def __call__(self, image, resolution):
            cam = cams[(0, next(self._nodes))]
            projected, _ = pano.project_gt_people(bodies, cam)
            out = {}
            for kps in projected.values():
                for j, v in kps.items():
                    out.setdefault(j, []).append(
                        [v[1] + self._rng.normal(0, 1),
                         v[2] + self._rng.normal(0, 1)])
            return out

    det = StubDetector()

    out = pano.convert_sequence(fake_sequence, det, nodes=(3, 6),
                                multi=True, out_dir=str(tmp_path))
    with open(out) as f:
        frames = json.load(f)
    assert len(frames) == 2
    rig2 = PANOPTIC  # names trackera/trackerb exist in the preset
    fa = parse_frame(frames[0], rig2, max_skeletons=4,
                     cameras=("trackera", "trackerb"))
    assert fa.present[:2].any()
    gt = parse_frame_gt(frames[0], rig2)
    assert gt is not None and gt.person_valid.all()

    # tm files written and loadable
    from mpe3d_tpu.geometry.calib_io import load_transform_manager
    ts = load_transform_manager(str(tmp_path / "tm_160906_fake1.pickle"))
    T = ts.get_transform("root", "trackera")
    assert T.shape == (4, 4)

    # single-person format
    out_s = pano.convert_sequence(fake_sequence, det, nodes=(3, 6),
                                  multi=False, out_dir=str(tmp_path))
    with open(out_s) as f:
        sp = json.load(f)
    assert len(sp) == 2              # one entry per (person, frame)
    assert all(len(e[next(iter(e))]) == 3 for e in sp)   # no GT element


def test_convert_sequence_extra_dirs_and_node_order(fake_sequence, tmp_path):
    """Camera dirs OUTSIDE `nodes` must be skipped, and tracker names must
    follow the `nodes` order (the same mapping the transform set uses) —
    a full 31-camera hdImgs download previously shifted every name."""
    import itertools

    from mpe3d_tpu.convert import panoptic as pano

    # distractor dir not in nodes, sorted FIRST — would previously steal
    # the 'trackera' name
    os.makedirs(os.path.join(fake_sequence, "hdImgs", "00_01"))

    cams = pano.load_calibration(fake_sequence)
    with open(os.path.join(fake_sequence, "hdPose3d_stage1_coco19",
                           "body3DScene_00000100.json")) as f:
        bodies = json.load(f)["bodies"]

    class StubDetector:
        def __init__(self):
            self._nodes = itertools.cycle([3, 6])

        def __call__(self, image, resolution):
            cam = cams[(0, next(self._nodes))]
            projected, _ = pano.project_gt_people(bodies, cam)
            return {j: [[v[1], v[2]]] for kps in projected.values()
                    for j, v in kps.items()}

    # REVERSED node order: trackera must be node 6 in BOTH the frames and
    # the transform set
    out = pano.convert_sequence(fake_sequence, StubDetector(),
                                nodes=(6, 3), multi=True,
                                out_dir=str(tmp_path))
    with open(out) as f:
        frames = json.load(f)
    assert set(frames[0].keys()) == {"trackera", "trackerb"}

    from mpe3d_tpu.geometry.calib_io import load_transform_manager
    ts = load_transform_manager(str(tmp_path / "tm_160906_fake1.pickle"))
    T_a = ts.get_transform("root", "trackera")
    R6 = np.asarray(cams[(0, 6)]["R"])
    np.testing.assert_allclose(T_a[:3, :3], R6, atol=1e-12)
