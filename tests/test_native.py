"""Native C++ frame parser == python parser, plus a speed sanity check."""

import json
import time

import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.data.frames import parse_frame, parse_frames_batch
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.native import load_library, parse_frames_native


@pytest.fixture(scope="module")
def wire_text(panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.1,
                       spurious_rate=0.2, camera_dropout=0.1)
    frames = generate_frames(PANOPTIC, panoptic_rig, 40, n_people=(1, 4),
                             seed=3, noise=noise, with_gt=True)
    return json.dumps(frames).encode(), frames


def test_native_builds():
    assert load_library() is not None, "g++ build failed"


def test_native_matches_python(wire_text):
    text, frames = wire_text
    out = parse_frames_native(text, PANOPTIC.camera_names, 10, 18)
    assert out is not None
    kp, valid, prob, in_view, present, ts = out
    assert len(kp) == len(frames)
    for f, frame in enumerate(frames):
        ref = parse_frame(frame, PANOPTIC, 10)
        assert np.array_equal(present[f], ref.present), f
        assert np.array_equal(in_view[f], ref.in_view), f
        assert np.allclose(kp[f], ref.kp, atol=1e-4), f
        assert np.allclose(valid[f], ref.valid), f
        assert np.allclose(prob[f], ref.prob, atol=1e-6), f
        assert np.allclose(ts[f], ref.timestamp, atol=1e-6), f


def test_parse_frames_batch_fallback(wire_text):
    text, frames = wire_text
    fast = parse_frames_batch(text, PANOPTIC, use_native=True)
    slow = parse_frames_batch(text, PANOPTIC, use_native=False)
    assert len(fast) == len(slow) == len(frames)
    for a, b in zip(fast, slow):
        assert np.allclose(a.kp, b.kp, atol=1e-4)
        assert np.array_equal(a.present, b.present)


def test_native_edge_cases():
    # empty file, empty frame, empty skeleton list, unknown camera, ID key
    cases = [
        b"[]",
        b"[{}]",
        b'[{"trackera": ["[]", 1.5, "no_image"]}]',
        b'[{"nosuchcam": ["[{\\"0\\": [0, 1, 2, 1, 0.5]}]", 1.0]}]',
        b'[{"trackera": ["[{\\"ID\\": 7, \\"3\\": [3, 10.0, 20.0, 1, 0.9]}]",'
        b' 2.5, "no_image", [{"0": [1,2,3], "-1": [0,0,0]}]]}]',
    ]
    for text in cases:
        out = parse_frames_native(text, PANOPTIC.camera_names, 4, 18)
        assert out is not None, text
        ref = [parse_frame(f, PANOPTIC, 4) for f in json.loads(text)]
        kp, valid, prob, in_view, present, ts = out
        assert len(kp) == len(ref)
        for f in range(len(ref)):
            assert np.array_equal(present[f], ref[f].present), text
            assert np.allclose(kp[f], ref[f].kp), text
            assert np.allclose(ts[f], ref[f].timestamp), text


def test_native_speedup(wire_text):
    text, frames = wire_text
    if load_library() is None:
        pytest.skip("no native lib")
    t0 = time.perf_counter()
    for _ in range(3):
        parse_frames_native(text, PANOPTIC.camera_names, 10, 18)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        [parse_frame(f, PANOPTIC, 10) for f in json.loads(text)]
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)


def test_native_count_frames(wire_text):
    from mpe3d_tpu.native import count_frames_native
    text, frames = wire_text
    assert count_frames_native(text) == len(frames)
    assert count_frames_native(b"[]") == 0
    assert count_frames_native(b"[{}, {}]") == 2
    # braces inside strings must not be counted
    assert count_frames_native(b'[{"a": ["{\\"0\\": [1]}", 1.0]}]') == 1


def test_native_gt_matches_python(wire_text):
    """with_gt=True path == parse_frame_gt on every frame (best-camera
    selection, cm→m scaling, '-1' markers)."""
    from mpe3d_tpu.data.frames import parse_frame_gt
    text, frames = wire_text
    fas, gts = parse_frames_batch(text, PANOPTIC, with_gt=True,
                                  use_native=True)
    assert len(fas) == len(gts) == len(frames)
    n_gt = 0
    for f, frame in enumerate(frames):
        ref = parse_frame_gt(frame, PANOPTIC)
        assert (gts[f] is None) == (ref is None)
        if ref is None:
            continue
        n_gt += 1
        assert gts[f].camera == ref.camera
        assert np.allclose(gts[f].gt3d, ref.gt3d, atol=1e-6)
        assert np.array_equal(gts[f].gt_valid, ref.gt_valid)
        assert np.array_equal(gts[f].person_valid, ref.person_valid)
    assert n_gt > 0


def test_native_large_file_exact_allocation(tmp_path, panoptic_rig):
    """A ~100 MB recording parses without pathological memory (round-1 fix:
    the old len//4 frame cap would have tried to allocate ~380 GB)."""
    import resource

    from mpe3d_tpu.data.frames import parse_frames_file

    frames = generate_frames(PANOPTIC, panoptic_rig, 50, n_people=(3, 6),
                             seed=11, with_gt=True)
    text = json.dumps(frames)
    reps = max(1, 100_000_000 // len(text))
    p = tmp_path / "big.json"
    with open(p, "w") as f:
        f.write("[")
        inner = text[1:-1]
        for r in range(reps):
            if r:
                f.write(",")
            f.write(inner)
        f.write("]")
    size = p.stat().st_size
    assert size >= 90_000_000, size
    n_expected = 50 * reps
    fas, gts = parse_frames_file(str(p), PANOPTIC, with_gt=True)
    assert len(fas) == n_expected
    assert sum(g is not None for g in gts) > 0
    # peak RSS stays within a small multiple of the buffer size
    # (buffers ≈ n_frames * ~60 KB incl GT; the file itself is ~100 MB)
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert peak_kb < 8_000_000, f"peak RSS {peak_kb} KB"


def test_native_gt_tiebreak_file_order():
    """Tied GT counts with file key order ≠ rig order: both paths pick the
    FIRST camera in FILE order (reference metrics_from_model.py:128-140
    iterates frame.items() and keeps on strictly-greater)."""
    import json

    from mpe3d_tpu.data.frames import parse_frame_gt

    cams = list(PANOPTIC.camera_names)
    sk = json.dumps([{"0": [0, 100.0, 100.0, 1, 0.9]}])
    gt_a = [{"0": [10.0, 20.0, 30.0], "-1": [0, 0, 0]}]
    gt_b = [{"0": [40.0, 50.0, 60.0], "-1": [0, 0, 0]}]
    # reversed rig order in the file; cams[-1] and cams[0] tie at 1 entry
    frame = {cams[-1]: [sk, 0.0, "no_image", gt_b],
             cams[0]: [sk, 0.0, "no_image", gt_a]}
    text = json.dumps([frame]).encode()

    ref = parse_frame_gt(frame, PANOPTIC)
    assert ref.camera == cams[-1]          # first in FILE order
    fas, gts = parse_frames_batch(text, PANOPTIC, with_gt=True,
                                  use_native=True)
    assert gts[0] is not None
    assert gts[0].camera == ref.camera
    assert np.allclose(gts[0].gt3d, ref.gt3d, atol=1e-6)


def test_native_gt_no_truncation_on_crowded_frames():
    """A GT list longer than the default 16-person cap (e.g. the wire
    GT-duplication artifact) must not be silently truncated: the native
    path re-parses with an exact cap and matches python."""
    import json

    from mpe3d_tpu.data.frames import parse_frame_gt

    cams = list(PANOPTIC.camera_names)
    sk = json.dumps([{"0": [0, 100.0, 100.0, 1, 0.9]}])
    n_people = 23
    gt = [{"0": [float(10 * p), 20.0, 30.0], "-1": [0, 0, 0]}
          for p in range(n_people)]
    frame = {cams[0]: [sk, 0.0, "no_image", gt]}
    text = json.dumps([frame]).encode()

    ref = parse_frame_gt(frame, PANOPTIC)
    assert ref.gt3d.shape[0] == n_people
    fas, gts = parse_frames_batch(text, PANOPTIC, with_gt=True,
                                  use_native=True)
    assert gts[0] is not None
    assert gts[0].gt3d.shape[0] == n_people
    assert np.allclose(gts[0].gt3d, ref.gt3d, atol=1e-6)
    assert np.array_equal(gts[0].gt_valid, ref.gt_valid)
    assert np.array_equal(gts[0].person_valid, ref.person_valid)


def test_native_gt_strictness_matches_python():
    """GT dicts the python path rejects (non-numeric joint key; an
    in-range joint with fewer than 3 coordinates) must not parse to
    different arrays natively — the native parser fails them, and the
    python fallback raises, on BOTH paths."""
    import json

    cams = list(PANOPTIC.camera_names)
    sk = json.dumps([{"0": [0, 100.0, 100.0, 1, 0.9]}])
    for bad_gt in ([{"x": [1.0, 2.0, 3.0]}],        # non-numeric key
                   [{"0": [1.0, 2.0]}]):            # 2-coordinate triple
        frame = {cams[0]: [sk, 0.0, "no_image", bad_gt]}
        text = json.dumps([frame]).encode()
        for use_native in (True, False):
            with pytest.raises(ValueError):
                parse_frames_batch(text, PANOPTIC, with_gt=True,
                                   use_native=use_native)


def test_native_differential_fuzz():
    """Randomized differential fuzz: generator-driven wire frames with
    hostile content (unicode escapes, non-rig cameras, odd joint ids,
    missing/extra entry elements, big GT lists) must parse identically to
    the python path — the C++ parser consumes untrusted JSON."""
    import json

    rng = np.random.default_rng(2026)
    cams = list(PANOPTIC.camera_names)

    def rand_skeletons():
        n = int(rng.integers(0, 4))
        out = []
        for _ in range(n):
            joints = {}
            if rng.random() < 0.3:
                joints["ID"] = int(rng.integers(0, 99))
            for j in rng.choice(25, size=rng.integers(0, 8), replace=False):
                joints[str(int(j))] = [int(j),
                                       float(rng.normal(500, 300)),
                                       float(rng.normal(300, 200)),
                                       int(rng.integers(0, 2)),
                                       float(rng.random())]
            out.append(joints)
        return json.dumps(out)

    frames = []
    for _ in range(40):
        frame = {}
        for cam in rng.permutation(cams + ["ghost_cam", "weirdé"]):
            if rng.random() < 0.3:
                continue
            entry = [rand_skeletons()]
            if rng.random() < 0.8:
                entry.append(float(rng.random() * 1e6))
            if rng.random() < 0.7:
                entry.append("no_image")
            # GT rides rig cameras only: a non-rig camera with the largest
            # GT list is the documented native/python contract divergence
            # (data/frames.py best-camera comment)
            if cam in cams and len(entry) == 3 and rng.random() < 0.6:
                gt = []
                for _p in range(int(rng.integers(0, 20))):
                    person = {str(int(j)): [float(x) for x in
                                            rng.normal(0, 100, 3)]
                              for j in rng.choice(20, size=3, replace=False)}
                    if rng.random() < 0.5:
                        person["-1"] = [0, 0, 0]
                    gt.append(person)
                entry.append(gt)
            frame[str(cam)] = entry
        frames.append(frame)
    text = json.dumps(frames).encode()

    out = parse_frames_native(text, PANOPTIC.camera_names, 6, 18,
                              with_gt=True)
    assert out is not None
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
    kp, valid, prob, in_view, present, ts = out[:6]
    gts_native = parse_frames_batch(text, PANOPTIC, max_skeletons=6,
                                    with_gt=True, use_native=True)[1]
    for f, frame in enumerate(frames):
        ref = parse_frame(frame, PANOPTIC, 6)
        assert np.allclose(kp[f], ref.kp), f
        assert np.allclose(valid[f], ref.valid), f
        assert np.allclose(prob[f], ref.prob), f
        assert np.array_equal(present[f], ref.present), f
        ref_gt = parse_frame_gt(frame, PANOPTIC)
        if ref_gt is None:
            assert gts_native[f] is None, f
        else:
            # native caps GT persons at 16; compare the common prefix
            P = len(gts_native[f].gt3d)
            assert gts_native[f].camera == ref_gt.camera, f
            assert np.allclose(gts_native[f].gt3d, ref_gt.gt3d[:P],
                               atol=1e-5), f


def test_format_result_native_matches_python():
    """The C++ response serializer emits the same record as serve.py's
    python dict path: identical keys/order, ints exact, floats equal to
    their rounded-decimal counterparts (poses 4 dp, quality 2 dp,
    latency 3 dp)."""
    import json

    import numpy as np

    from mpe3d_tpu.native import format_result_native, load_library

    if load_library() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    poses = (rng.standard_normal((3, 18, 3)) * 2).astype(np.float32)
    quality = (rng.random(3) * 40).astype(np.float32)
    ids = np.array([5, 2, 9], np.int32)

    line = format_result_native(7, poses, quality=quality, track_ids=ids,
                                dropped=2, latency_ms=1.23456)
    assert line is not None and line.endswith("\n")
    rec = json.loads(line)
    py = {"seq": 7, "dropped_low_quality": 2, "n_persons": 3,
          "track_ids": ids.tolist(), "quality_px": quality.round(2).tolist(),
          "poses_m": poses.round(4).tolist(), "latency_ms": round(1.23456, 3)}
    assert list(rec.keys()) == list(py.keys())
    assert rec["seq"] == 7 and rec["n_persons"] == 3
    assert rec["track_ids"] == py["track_ids"]
    assert rec["dropped_low_quality"] == 2
    np.testing.assert_allclose(rec["quality_px"], py["quality_px"], atol=1e-6)
    np.testing.assert_allclose(rec["poses_m"], py["poses_m"], atol=1e-6)
    assert abs(rec["latency_ms"] - py["latency_ms"]) < 1e-6

    # minimal record: no ids/quality/drops; empty poses
    line0 = format_result_native(0, np.zeros((0, 18, 3), np.float32))
    rec0 = json.loads(line0)
    assert rec0 == {"seq": 0, "n_persons": 0, "poses_m": [],
                    "latency_ms": 0.0}

    # non-finite values refuse (python fallback handles them)
    bad = poses.copy()
    bad[0, 0, 0] = np.nan
    assert format_result_native(1, bad) is None


def test_native_hostile_nesting_fails_cleanly():
    """A deeply-nested JSON value must fail the native parse (rc != 0 →
    python fallback), NOT overflow the C stack: skip_value is
    depth-bounded at 512 (native/frameparse.cpp)."""
    from mpe3d_tpu.native import load_library, parse_frames_native
    if load_library() is None:
        pytest.skip("native library unavailable")
    depth = 5000
    bad = ('[{"trackera": ["[]", 0.0, "no_image", []], "junk": '
           + "[" * depth + "]" * depth + "}]").encode()
    assert parse_frames_native(bad, ["trackera"], 4, 18) is None
