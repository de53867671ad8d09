"""Serving front-end (mpe3d_tpu/serve.py) — line protocol, ordering,
control commands, error recovery, TCP transport.  Framework extension: the
reference's live path (test/show_results_from_model.py) replays recorded
files in-process only."""

import json
import socket
import threading

import jax
import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline
from mpe3d_tpu.serve import PoseServer, serve_tcp


@pytest.fixture(scope="module")
def pipe(panoptic_rig):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0, backend="triangulation")


@pytest.fixture(scope="module")
def wire_frames(panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02)
    return generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(1, 1),
                           seed=31, noise=noise, with_gt=False, spread=1.2)


def run_lines(server, lines):
    out = []
    server.handle_stream(lines, out.append)
    return [json.loads(l) for l in out]


def test_serve_basic_ordering(pipe, wire_frames):
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    lines = [json.dumps(f) for f in wire_frames]
    recs = run_lines(server, lines)
    assert [r["seq"] for r in recs] == list(range(len(wire_frames)))
    for r in recs:
        assert r["n_persons"] >= 1
        assert len(r["poses_m"]) == r["n_persons"]
        assert len(r["quality_px"]) == r["n_persons"]
        assert r["latency_ms"] > 0
    assert server.frames_served == len(wire_frames)


def test_serve_control_and_errors(pipe, wire_frames):
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=3)
    lines = [json.dumps(wire_frames[0]),
             '{"cmd": "ping"}',
             'not json at all',
             json.dumps(wire_frames[1]),
             '{"cmd": "stats"}',
             '[1, 2, 3]',
             '{"cmd": "close"}',
             json.dumps(wire_frames[2])]     # after close: never served
    recs = run_lines(server, lines)
    # strict ordering: control responses flush in-flight frames first
    assert recs[0]["seq"] == 0 and "poses_m" in recs[0]
    assert recs[1] == {"pong": True}
    assert "error" in recs[2] and recs[2]["seq"] == 1
    assert recs[3]["seq"] == 2 and "poses_m" in recs[3]
    assert recs[4]["frames"] == 2 and recs[4]["errors"] == 1
    assert "error" in recs[5]
    assert recs[6]["closed"] is True
    assert len(recs) == 7
    assert server.frames_served == 2 and server.errors == 2


def test_serve_tracking_ids_stable(pipe, wire_frames):
    from mpe3d_tpu.tracking import PoseTracker

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        tracker=PoseTracker(max_dist=0.5))
    # generate_frames yields temporally-independent frames; a repeated
    # frame is a static person the tracker must keep under one id
    recs = run_lines(server, [json.dumps(wire_frames[0])] * 4)
    ids = [r["track_ids"] for r in recs]
    assert all(len(i) >= 1 for i in ids)
    # the single person keeps one id across the sequence
    flat = {i[0] for i in ids}
    assert len(flat) == 1


def test_serve_matches_infer_fused(pipe, wire_frames):
    """The server's poses are exactly the fused pipeline's poses."""
    from mpe3d_tpu.data.frames import parse_frame

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    recs = run_lines(server, [json.dumps(f) for f in wire_frames])
    for f, r in zip(wire_frames, recs):
        ref = pipe.infer_fused(parse_frame(f, PANOPTIC, max_skeletons=4))
        np.testing.assert_allclose(np.asarray(r["poses_m"]),
                                   np.asarray(ref.poses).round(4),
                                   atol=1e-4)


def test_serve_tcp_roundtrip(pipe, wire_frames):
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    ready = []
    t = threading.Thread(target=serve_tcp,
                         args=(server, "127.0.0.1", 0, ready), daemon=True)
    t.start()
    for _ in range(100):
        if ready:
            break
        import time
        time.sleep(0.05)
    srv = ready[0]
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=30) as s:
            f = s.makefile("rw")
            for w in wire_frames[:2]:
                f.write(json.dumps(w) + "\n")
            f.write('{"cmd": "close"}\n')
            f.flush()
            recs = [json.loads(f.readline()) for _ in range(3)]
        assert recs[0]["seq"] == 0 and recs[1]["seq"] == 1
        assert recs[0]["n_persons"] >= 1
        assert recs[2]["closed"] is True and recs[2]["frames"] == 2
    finally:
        srv.shutdown()
        t.join(timeout=10)


def test_serve_tcp_concurrent_clients_tracker_isolation(pipe, wire_frames):
    """--max-clients > 1: concurrent connections are served in parallel
    with per-stream seq counters and per-stream trackers.  Both clients
    stream a static person; with isolated trackers each sees track id 0
    on every frame (a shared tracker would hand the second stream's
    person a different id, or churn ids as the interleaved updates fight
    over the same track)."""
    from mpe3d_tpu.serve import serve_tcp
    from mpe3d_tpu.tracking import PoseTracker

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        tracker_factory=lambda: PoseTracker(max_dist=0.5))
    ready = []
    t = threading.Thread(
        target=serve_tcp, args=(server, "127.0.0.1", 0, ready),
        kwargs={"max_clients": 2}, daemon=True)
    t.start()
    for _ in range(100):
        if ready:
            break
        import time
        time.sleep(0.05)
    srv = ready[0]

    import queue
    results: "queue.Queue" = queue.Queue()
    barrier = threading.Barrier(2, timeout=60)

    def client(frame, n=4):
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=60) as s:
            f = s.makefile("rw")
            barrier.wait()   # both connections open before either streams
            for _ in range(n):
                f.write(json.dumps(frame) + "\n")
                f.flush()
            f.write('{"cmd": "close"}\n')
            f.flush()
            results.put([json.loads(f.readline()) for _ in range(n + 1)])

    threads = [threading.Thread(target=client, args=(wire_frames[i],),
                                daemon=True) for i in range(2)]
    try:
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
            assert not th.is_alive(), "client wedged"
        for _ in range(2):
            recs = results.get(timeout=10)
            frames_recs, closed = recs[:-1], recs[-1]
            assert [r["seq"] for r in frames_recs] == list(range(4))
            for r in frames_recs:
                assert r["n_persons"] >= 1
                # fresh tracker per stream: the static person is id 0
                assert r["track_ids"][0] == 0
        assert closed["closed"] is True
        assert server.frames_served == 8 and server.errors == 0
    finally:
        srv.shutdown()
        t.join(timeout=10)


def test_serve_reconnect_gets_fresh_tracker(pipe, wire_frames):
    """Serial reconnects to the same (single-client) server also start
    from a fresh tracker when a factory is supplied."""
    from mpe3d_tpu.serve import serve_tcp
    from mpe3d_tpu.tracking import PoseTracker

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        tracker_factory=lambda: PoseTracker(max_dist=0.5))
    ready = []
    t = threading.Thread(target=serve_tcp,
                         args=(server, "127.0.0.1", 0, ready), daemon=True)
    t.start()
    for _ in range(100):
        if ready:
            break
        import time
        time.sleep(0.05)
    srv = ready[0]
    try:
        for _ in range(2):   # two sequential sessions
            with socket.create_connection(("127.0.0.1", srv.port),
                                          timeout=30) as s:
                f = s.makefile("rw")
                f.write(json.dumps(wire_frames[0]) + "\n")
                f.write('{"cmd": "close"}\n')
                f.flush()
                rec = json.loads(f.readline())
                assert rec["track_ids"][0] == 0   # ids restart per stream
                json.loads(f.readline())          # closed line
    finally:
        srv.shutdown()
        t.join(timeout=10)


def test_serve_quality_gate(pipe, wire_frames):
    """The gate drops exactly the poses whose quality exceeds the
    threshold (the untrained test matcher emits ghost proposals at
    30-300 px alongside the real person at the ~1-4 px noise floor), it
    runs before tracking, and -1 (unjudgeable) poses are kept."""
    GATE = 15.0
    lines = [json.dumps(f) for f in wire_frames]

    plain = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=1)
    base = run_lines(plain, lines)

    from mpe3d_tpu.tracking import PoseTracker
    gated = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=1,
                       tracker=PoseTracker(max_dist=0.5),
                       quality_gate=GATE)
    recs = run_lines(gated, lines)

    total_dropped = 0
    for b, r in zip(base, recs):
        qb = np.asarray(b["quality_px"])
        keep = (qb < 0) | (qb <= GATE)
        # gated output = ungated output filtered by the threshold
        assert r["n_persons"] == int(keep.sum())
        np.testing.assert_allclose(r["quality_px"], qb[keep], atol=1e-6)
        if (~keep).any():
            assert r["dropped_low_quality"] == int((~keep).sum())
        else:
            assert "dropped_low_quality" not in r
        # ghosts never reached the tracker
        assert len(r["track_ids"]) == r["n_persons"]
        total_dropped += int((~keep).sum())
    # the scenario actually exercises the gate (ghost proposals exist)
    assert total_dropped >= 1
    assert gated.dropped_low_quality == total_dropped
    # every survivor is a real person at the noise floor
    for r in recs:
        assert r["n_persons"] >= 1


def test_serve_sync_request_response(pipe, wire_frames):
    """A synchronous client (send one frame, wait for its response before
    sending anything else) must get the response while the server is
    blocked on input — the collector thread flushes ready results."""
    import queue

    in_q = queue.Queue()
    out_q = queue.Queue()

    def lines():
        while True:
            line = in_q.get()
            if line is None:
                return
            yield line

    t = threading.Thread(
        target=lambda: PoseServer(pipe, PANOPTIC, max_skeletons=4,
                                  depth=3).handle_stream(lines(), out_q.put),
        daemon=True)
    t.start()
    for i, f in enumerate(wire_frames[:3]):
        in_q.put(json.dumps(f))
        rec = json.loads(out_q.get(timeout=60))   # no more input yet!
        assert rec["seq"] == i and "poses_m" in rec
    in_q.put('{"cmd": "close"}')
    assert json.loads(out_q.get(timeout=60))["closed"] is True
    in_q.put(None)
    t.join(timeout=30)
    assert not t.is_alive()


def test_parse_line_native_matches_python(pipe, wire_frames):
    """The server's fast-path line parser (C++ on raw bytes) produces the
    identical FrameArrays as json.loads + parse_frame — including the
    per-camera timestamps."""
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.native import load_library

    if load_library() is None:
        pytest.skip("native parser unavailable — fast path untestable")
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    for f in wire_frames:
        line = json.dumps(f)
        fa_fast = server._parse_line(line)
        fa_py = parse_frame(json.loads(line), PANOPTIC, 4)
        for name in ("kp", "valid", "prob", "in_view", "present",
                     "timestamp"):
            np.testing.assert_array_equal(getattr(fa_fast, name),
                                          getattr(fa_py, name))
    assert server._native_misses["n"] == 0   # the fast path ran


def test_control_cmd_anywhere_in_object(pipe, wire_frames):
    """JSON member order is insignificant: a control object whose "cmd"
    key is not first must still be answered as a control response, not
    silently served as an empty frame."""
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    recs = run_lines(server, [json.dumps(wire_frames[0]),
                              '{"id": 7, "cmd": "stats"}',
                              '{"cmd": "close"}'])
    assert "poses_m" in recs[0]
    assert recs[1]["frames"] == 1          # stats, not an empty frame
    assert recs[2]["closed"] is True
    assert server.frames_served == 1


def test_client_disconnect_mid_stream_does_not_wedge(pipe, wire_frames):
    """A write failure (client gone: BrokenPipe on TCP, closed stdout)
    must not kill the collector thread — a dead collector would leave
    queued frames un-task_done()d and the final drain()/q.join() would
    deadlock the server forever."""
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    wrote = []

    def write(s):
        if wrote:
            raise BrokenPipeError("client went away")
        wrote.append(s)

    lines = [json.dumps(f) for f in wire_frames] * 3   # > depth frames
    t = threading.Thread(target=server.handle_stream,
                         args=(iter(lines), write), daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "handle_stream wedged after client disconnect"
    assert len(wrote) == 1                 # served until the pipe broke


def test_frame_containing_cmd_substring_is_served(pipe, wire_frames):
    """Classification sends any line containing '"cmd"' down the slow
    path; a real frame that merely CONTAINS the substring (no top-level
    "cmd" key) must still be submitted, not rejected."""
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    frame = dict(wire_frames[0])
    frame["note"] = 'client metadata mentioning "cmd" in a string'
    recs = run_lines(server, [json.dumps(frame)])
    assert recs[0].get("error") is None, recs[0]
    assert "poses_m" in recs[0] and recs[0]["n_persons"] >= 1
    assert server.errors == 0 and server.frames_served == 1


def test_malformed_joint_payloads_get_error_responses(pipe, wire_frames):
    """The native fast path must not be more lenient than python: a
    non-numeric joint key or a short joint value list is answered with an
    error line, never served as a silently-corrupted pose."""
    good = json.dumps(wire_frames[0])
    cam = [k for k in wire_frames[0]
           if isinstance(wire_frames[0][k], list)][0]

    bad_key = json.loads(good)
    skels = json.loads(bad_key[cam][0])
    skels[0]["x5"] = [5, 100.0, 200.0, 1, 0.9]
    bad_key[cam][0] = json.dumps(skels)

    bad_len = json.loads(good)
    skels = json.loads(bad_len[cam][0])
    first = next(k for k in skels[0] if k != "ID")
    skels[0][first] = skels[0][first][:4]
    bad_len[cam][0] = json.dumps(skels)

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    recs = run_lines(server, [json.dumps(bad_key), json.dumps(bad_len),
                              good])
    assert "error" in recs[0], recs[0]
    assert "error" in recs[1], recs[1]
    assert "poses_m" in recs[2]            # still serving afterwards
    assert server.errors == 2


def test_list_encoded_skeletons_parse_identically(pipe, wire_frames):
    """parse_frame supports skeletons sent as a raw JSON list (not an
    embedded string); the fast path must agree on that variant too."""
    from mpe3d_tpu.data.frames import parse_frame

    f = json.loads(json.dumps(wire_frames[0]))
    for cam in f:
        if isinstance(f[cam], list) and isinstance(f[cam][0], str):
            f[cam][0] = json.loads(f[cam][0])   # list-encoded variant
    line = json.dumps(f)
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    fa = server._parse_line(line)
    ref = parse_frame(json.loads(line), PANOPTIC, 4)
    np.testing.assert_array_equal(fa.kp, ref.kp)
    np.testing.assert_array_equal(fa.present, ref.present)


def test_native_backoff_after_consecutive_misses(pipe, wire_frames,
                                                 monkeypatch):
    """When the native parser keeps failing on a client's frames, the
    server falls back to python permanently instead of paying a failed
    scan on every line of a long-lived session."""
    import mpe3d_tpu.data.frames as frames_mod

    calls = {"n": 0}

    def failing(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated native failure")

    monkeypatch.setattr(frames_mod, "parse_frames_batch", failing)
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4)
    line = json.dumps(wire_frames[0])
    ref = server._parse_line(line)          # python fallback still works
    for _ in range(10):
        server._parse_line(line)
    assert server._native_misses["n"] >= 3
    assert calls["n"] == 3                  # backoff: no further attempts
    assert len(ref.kp)


def test_serve_protocol_fuzz(pipe, wire_frames):
    """Randomized (seeded) interleaving of frames, control commands, blank
    lines and garbage: responses keep contiguous seq order, every frame
    line gets exactly one response, and the counters reconcile."""
    rng = np.random.default_rng(58008)
    lines, expect_frames, expect_errors = [], 0, 0
    for _ in range(60):
        r = rng.random()
        if r < 0.5:
            lines.append(json.dumps(wire_frames[rng.integers(
                len(wire_frames))]))
            expect_frames += 1
        elif r < 0.6:
            lines.append('{"cmd": "ping"}')
        elif r < 0.7:
            lines.append('{"cmd": "stats"}')
        elif r < 0.78:
            lines.append("")                      # blank: ignored
        elif r < 0.86:
            lines.append("garbage {{{")           # bad json
            expect_errors += 1
        elif r < 0.94:
            lines.append('[{"not": "an object"}]')
            expect_errors += 1
        else:
            lines.append('{"cmd": "nope"}')       # unknown cmd
            expect_errors += 1
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=3)
    recs = run_lines(server, lines)
    seqs = [r["seq"] for r in recs if "seq" in r]
    assert seqs == sorted(seqs) == list(range(len(seqs)))
    served = [r for r in recs if "poses_m" in r]
    errored = [r for r in recs if "error" in r]
    assert len(served) == expect_frames == server.frames_served
    assert len(errored) == expect_errors == server.errors


def test_serve_dtype_auto_policy():
    """--serve-dtype auto never silently selects int8: the measured v5e
    ladder (fp32 629 / bf16 268 / int8 499 µs, chain4 dec_def logs) shows
    the pallas dequant overhead outweighs the HBM bytes it saves at
    serving shapes, so int8 stays opt-in (HBM capacity, not speed)."""
    from mpe3d_tpu.cli import resolve_auto_serve_dtype
    from mpe3d_tpu.config import LifterConfig

    res = LifterConfig(residual_prior=True)
    absol = LifterConfig(residual_prior=False)
    for cfg in (res, absol):
        for backend in ("tpu", "cpu"):
            for prec in (None, "default", "highest"):
                assert resolve_auto_serve_dtype(cfg, backend, prec) is None


def test_serve_subcommand_opts_into_auto_int8():
    """Only the serve subcommand carries the serve_auto_int8 default —
    eval/infer keep the bit-identical pipeline default under 'auto'."""
    from mpe3d_tpu.cli import make_parser

    ap = make_parser()
    serve_args = ap.parse_args(["serve", "--modelsdir", "x"])
    assert getattr(serve_args, "serve_auto_int8", False) is True
    infer_args = ap.parse_args(["infer", "--modelsdir", "x",
                                "--testfiles", "y", "--out", "z"])
    assert getattr(infer_args, "serve_auto_int8", False) is False


def test_hostile_nested_lines_answered_not_fatal(pipe, wire_frames):
    """Deeply-nested JSON (native parser depth-bounds it; python json
    raises RecursionError) must produce an error RESPONSE on both the
    frame path and the control path — never kill the reader thread."""
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    # deep enough that python json.loads raises RecursionError (measured
    # threshold ~2e4); the native parser depth-bounds at 512 either way
    deep = "[" * 200_000 + "]" * 200_000
    lines = [
        f'{{"x": {deep}}}',                       # frame-shaped hostile line
        json.dumps(wire_frames[0]),
        f'{{"cmd": "ping", "x": {deep}}}',        # control-shaped hostile line
        json.dumps(wire_frames[1]),
    ]
    recs = run_lines(server, lines)
    assert "error" in recs[0]
    assert recs[1]["n_persons"] >= 1            # still serving after error
    assert "error" in recs[2]
    assert recs[3]["n_persons"] >= 1
    assert server.frames_served == 2


# ---------------------------------------------------------------------------
# micro-batching (batch_window > 1)
# ---------------------------------------------------------------------------

def test_serve_batched_matches_unbatched(pipe, wire_frames):
    lines = [json.dumps(f) for f in wire_frames]
    base = run_lines(PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2),
                     list(lines))
    batched = run_lines(
        PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                   batch_window=3, batch_linger_ms=50.0), list(lines))
    assert [r["seq"] for r in batched] == [r["seq"] for r in base]
    for a, b in zip(base, batched):
        assert a["n_persons"] == b["n_persons"]
        np.testing.assert_allclose(a["poses_m"], b["poses_m"], atol=1e-3)


def test_serve_batched_linger_flush(pipe, wire_frames):
    """A partial window must flush after batch_linger_ms, not wait for the
    window to fill: feed frames through a generator that blocks after the
    first line until the response for it has arrived."""
    import queue as _q

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        batch_window=4, batch_linger_ms=20.0)
    got = _q.Queue()
    responses = []

    def write(line):
        responses.append(json.loads(line))
        got.put(1)

    def lines():
        yield json.dumps(wire_frames[0])
        # block until the linger flush served frame 0 (would deadlock
        # forever if a partial window waited for more input)
        got.get(timeout=30)
        yield json.dumps(wire_frames[1])

    server.handle_stream(lines(), write)
    assert [r["seq"] for r in responses] == [0, 1]
    assert all("poses_m" in r for r in responses)


def test_serve_batched_control_ordering(pipe, wire_frames):
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        batch_window=4, batch_linger_ms=10_000.0)
    lines = [json.dumps(wire_frames[0]), json.dumps(wire_frames[1]),
             '{"cmd": "stats"}', json.dumps(wire_frames[2])]
    recs = run_lines(server, lines)
    # stats must flush the partial window first (strict ordering)
    assert recs[0]["seq"] == 0 and recs[1]["seq"] == 1
    assert recs[2]["frames"] == 2 and recs[2]["batch_window"] == 4
    assert recs[3]["seq"] == 2 and "poses_m" in recs[3]


def test_serve_batched_partial_finish_failure_one_response_per_seq(
        pipe, wire_frames):
    """A host-side failure on ONE frame of a batch (tracker/format) must
    produce exactly one response per seq — the old handler re-emitted
    error lines for seqs it had already answered (review finding)."""

    class ExplodingTracker:
        calls = 0

        def update(self, poses):
            ExplodingTracker.calls += 1
            if ExplodingTracker.calls == 2:
                raise RuntimeError("tracker blew up on frame 1")
            import numpy as np
            return np.arange(len(poses)), poses

    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2,
                        batch_window=3, batch_linger_ms=50.0,
                        tracker=ExplodingTracker())
    recs = run_lines(server, [json.dumps(f) for f in wire_frames[:3]])
    assert [r["seq"] for r in recs] == [0, 1, 2]   # one line per seq
    assert "poses_m" in recs[0] and "poses_m" in recs[2]
    assert "error" in recs[1] and "tracker blew up" in recs[1]["error"]


def test_serve_batched_submit_failure_keeps_fifo_order(
        pipe, wire_frames, monkeypatch):
    """When submit_batch fails for batch B while batch A's responses are
    still queued, B's error lines must come out AFTER A's responses (the
    strict-ordering contract; the old path emitted them immediately)."""
    import time as _time

    orig_submit = pipe.submit_batch
    orig_collect = pipe.collect_batch
    n_sub = {"n": 0}

    def submit(frames, pad_to=None):
        n_sub["n"] += 1
        if n_sub["n"] == 2:
            raise RuntimeError("device rejected batch")
        return orig_submit(frames, pad_to=pad_to)

    def collect(ticket):
        _time.sleep(0.4)     # hold batch A in the collector while batch
        return orig_collect(ticket)  # B's submit fails in the reader

    monkeypatch.setattr(pipe, "submit_batch", submit)
    monkeypatch.setattr(pipe, "collect_batch", collect)
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=4,
                        batch_window=2, batch_linger_ms=10_000.0)
    recs = run_lines(server, [json.dumps(wire_frames[i % len(wire_frames)])
                              for i in range(4)])
    assert [r["seq"] for r in recs] == [0, 1, 2, 3]
    assert "poses_m" in recs[0] and "poses_m" in recs[1]
    assert "error" in recs[2] and "error" in recs[3]


def test_serve_tcp_non_utf8_line_answered_not_fatal(pipe, wire_frames):
    """A mis-encoded/binary line must get an error response and the
    connection must keep serving (the old generator raised
    UnicodeDecodeError into socketserver and closed silently)."""
    server = PoseServer(pipe, PANOPTIC, max_skeletons=4, depth=2)
    ready = []
    t = threading.Thread(target=serve_tcp,
                         args=(server, "127.0.0.1", 0, ready), daemon=True)
    t.start()
    for _ in range(100):
        if ready:
            break
        import time
        time.sleep(0.05)
    srv = ready[0]
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=30) as s:
            s.sendall(b"\xff\xfe{garbage\n")
            s.sendall((json.dumps(wire_frames[0]) + "\n").encode())
            s.sendall(b'{"cmd": "close"}\n')
            f = s.makefile("r")
            recs = [json.loads(f.readline()) for _ in range(3)]
        assert recs[0]["seq"] == 0 and "error" in recs[0]
        assert recs[1]["seq"] == 1 and "poses_m" in recs[1]
        assert recs[2]["closed"] is True
    finally:
        srv.shutdown()
        t.join(timeout=10)


# ---------------------------------------------------------------------------
# Hot weight reload ({"cmd": "reload"} / pipeline.reload_weights) — framework
# extension: the reference loads weights once at process start.


@pytest.fixture()
def mlp_pipe(panoptic_rig):
    """A small MLP-backend pipeline (reload must swap LIFTER outputs, which
    the module-scoped triangulation `pipe` never uses)."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
        decode_top_k=0)


def _first_poses(server, wire_frames):
    recs = run_lines(server, [json.dumps(wire_frames[0])])
    assert "poses_m" in recs[0], recs[0]
    return np.asarray(recs[0]["poses_m"])


def test_reload_weights_swaps_pipeline_outputs(mlp_pipe, wire_frames):
    """Same-architecture reload changes outputs without rebuilding the
    pipeline; shape/structure mismatches are rejected atomically."""
    from mpe3d_tpu.data.frames import parse_frame

    fa = parse_frame(wire_frames[0], PANOPTIC, max_skeletons=4)
    before = np.asarray(mlp_pipe(fa).poses)
    lcfg = LifterConfig(widths=(64, 64))
    mlp_pipe.reload_weights(
        lifter_params=init_lifter(jax.random.PRNGKey(99), lcfg))
    after = np.asarray(mlp_pipe(fa).poses)
    assert not np.allclose(before, after)

    # same weights back in -> same outputs (jit caches stayed warm)
    mlp_pipe.reload_weights(
        lifter_params=init_lifter(jax.random.PRNGKey(1), lcfg))
    again = np.asarray(mlp_pipe(fa).poses)
    np.testing.assert_allclose(again, before, atol=1e-6)

    # wrong widths -> ValueError, serving state untouched
    with pytest.raises(ValueError, match="shape|structure"):
        mlp_pipe.reload_weights(lifter_params=init_lifter(
            jax.random.PRNGKey(2), LifterConfig(widths=(32,))))
    np.testing.assert_allclose(np.asarray(mlp_pipe(fa).poses), before,
                               atol=1e-6)


def test_reload_weights_reapplies_serve_dtype(panoptic_rig):
    """A bf16-serving pipeline must cast reloaded trees the same way it
    cast the construction-time tree."""
    import jax.numpy as jnp

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), serve_dtype=jnp.bfloat16)

    def check(params):
        # weight matrices bf16; biases stay fp32 (cast_lifter_weights)
        assert all(l["w"].dtype == jnp.bfloat16 for l in params["layers"])
        assert all(l["b"].dtype == jnp.float32 for l in params["layers"])

    check(pipe.lifter_params)
    pipe.reload_weights(lifter_params=init_lifter(jax.random.PRNGKey(5),
                                                  lcfg))
    check(pipe.lifter_params)


def test_reload_weights_rereplicates_multi_device(mlp_pipe):
    """With multi-device serving enabled, a reload must replace the
    per-device replicas (old tuple identity must not survive)."""
    n = mlp_pipe.enable_multi_device_serving()
    assert n >= 2   # conftest forces 8 virtual CPU devices
    old = mlp_pipe._serve_params
    mlp_pipe.reload_weights(lifter_params=init_lifter(
        jax.random.PRNGKey(7), LifterConfig(widths=(64, 64))))
    assert mlp_pipe._serve_params is not old
    assert len(mlp_pipe._serve_params) == n


def test_serve_reload_cmd_roundtrip(mlp_pipe, wire_frames, tmp_path):
    """The reload control command: frames before/after are served by
    old/new weights, errors leave the old weights serving."""
    from mpe3d_tpu.train.checkpoint import save_checkpoint

    lcfg = LifterConfig(widths=(64, 64))
    good = tmp_path / "good"
    good.mkdir()
    save_checkpoint(str(good / "pose_estimator"),
                    init_lifter(jax.random.PRNGKey(42), lcfg),
                    meta={"prior": "mean",
                          "lifter_config": {"widths": [64, 64]}})
    badprior = tmp_path / "badprior"
    badprior.mkdir()
    save_checkpoint(str(badprior / "pose_estimator"),
                    init_lifter(jax.random.PRNGKey(43), lcfg),
                    meta={"prior": "median",
                          "lifter_config": {"widths": [64, 64]}})

    server = PoseServer(mlp_pipe, PANOPTIC, max_skeletons=4, depth=2)
    frame = json.dumps(wire_frames[0])
    recs = run_lines(server, [
        frame,
        json.dumps({"cmd": "reload", "modelsdir": str(good)}),
        frame,
        json.dumps({"cmd": "reload", "modelsdir": str(tmp_path / "nope")}),
        json.dumps({"cmd": "reload", "modelsdir": str(badprior)}),
        json.dumps({"cmd": "reload"}),
        frame,
    ])
    assert recs[0]["seq"] == 0 and "poses_m" in recs[0]
    assert recs[1] == {"reloaded": True, "modelsdir": str(good),
                       "matcher": False, "lifter": True}
    assert recs[2]["seq"] == 1 and "poses_m" in recs[2]
    assert not np.allclose(np.asarray(recs[0]["poses_m"]),
                           np.asarray(recs[2]["poses_m"]))
    assert "reload failed" in recs[3]["error"]
    assert "prior" in recs[4]["error"]
    assert "reload failed" in recs[5]["error"]
    # still serving with the good reload's weights after the failures
    assert recs[6]["seq"] == 2 and "poses_m" in recs[6]
    np.testing.assert_allclose(np.asarray(recs[6]["poses_m"]),
                               np.asarray(recs[2]["poses_m"]), atol=1e-6)


def test_reload_weights_requantizes_int8(panoptic_rig):
    """An int8-serving pipeline re-quantizes + prepads reloaded fp32
    trees exactly like construction did (ops/quant_matmul serving)."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), serve_dtype="int8")

    def q_layers(params):
        return [l for l in params["layers"] if "wq" in l]

    n_q = len(q_layers(pipe.lifter_params))
    assert n_q >= 1
    pipe.reload_weights(lifter_params=init_lifter(jax.random.PRNGKey(9),
                                                  lcfg))
    assert len(q_layers(pipe.lifter_params)) == n_q


def test_serve_reload_rejects_architecture_mismatch(mlp_pipe, wire_frames,
                                                    tmp_path):
    """A shape-compatible but semantically different checkpoint (e.g.
    residual_prior=True at the same widths) must be REJECTED by reload —
    leaf shapes are identical, so only the meta-reconstructed config can
    catch it; serving it through the old apply function would shift
    every pose by the packed prior."""
    from mpe3d_tpu.train.checkpoint import save_checkpoint

    lcfg_res = LifterConfig(widths=(64, 64), residual_prior=True)
    badarch = tmp_path / "badarch"
    badarch.mkdir()
    save_checkpoint(str(badarch / "pose_estimator"),
                    init_lifter(jax.random.PRNGKey(44), lcfg_res),
                    meta={"prior": "mean",
                          "lifter_config": {"widths": [64, 64],
                                            "residual_prior": True}})
    server = PoseServer(mlp_pipe, PANOPTIC, max_skeletons=4, depth=2)
    frame = json.dumps(wire_frames[0])
    recs = run_lines(server, [
        frame,
        json.dumps({"cmd": "reload", "modelsdir": str(badarch)}),
        frame,
    ])
    before = np.asarray(recs[0]["poses_m"])
    assert "architecture" in recs[1]["error"]
    # old weights still serving, bit-identical
    np.testing.assert_allclose(np.asarray(recs[2]["poses_m"]), before,
                               atol=0)
