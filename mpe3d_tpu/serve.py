"""Long-lived pose-serving front-end (production deployment surface).

The reference's closest surface is the live viewer
(``test/show_results_from_model.py:78-374``), which replays a *recorded*
file inside a Qt/OpenGL window on the inference host.  This module serves
the same frame→poses loop as a process boundary instead: a client streams
wire-format frames (the reference's recorded-JSON schema, one frame per
line) over stdio or TCP and receives one JSON result line per frame —
poses, stable track ids, and the per-pose quality column.

Protocol: newline-delimited JSON, strictly ordered.

  request line   one wire-format frame dict
                 (``{"camera_id": [[skeletons...], timestamp], ...}``)
                 or a control object ``{"cmd": "ping"|"stats"|"close"}``
                 or ``{"cmd": "reload", "modelsdir": "…"}`` (hot weight
                 swap from a checkpoint dir — see ``reload_from_dir``)
  response line  ``{"seq": n, "n_persons": P, "poses_m": [...],
                 "quality_px": [...], "track_ids": [...],
                 "latency_ms": x}`` (track_ids only when tracking is on);
                 malformed inputs get ``{"seq": n, "error": "..."}``
                 and the server keeps serving.

TPU-shaped design: frames are dispatched ahead through
``PoseEstimationPipeline.submit_fused`` with a bounded in-flight depth —
the device round trip (one fused program per frame, ~25 ms through the
axon relay, ~0.1 ms direct-attached) overlaps client I/O and host
parse/format work, so steady-state throughput is one frame per round
trip regardless of link latency, exactly like ``infer_stream``.  Control
commands flush the in-flight window first, so responses never reorder.
"""

from __future__ import annotations

import json
import socketserver
import sys
import time
from typing import Optional

from mpe3d_tpu.data.frames import parse_frame


def quality_keep_mask(quality, gate: float):
    """Which poses survive a quality gate: residual within ``gate`` px, or
    -1 (no observation to judge by — kept conservatively).  Single source
    of the gate semantics for both the CLI ``infer`` path and the server."""
    return (quality < 0) | (quality <= gate)


def gate_and_track(poses, quality, gate=None, tracker=None, persons=None):
    """The shared output epilogue for every serving surface (PoseServer,
    CLI ``infer``, CLI ``show-results``): drop poses whose quality column
    exceeds ``gate`` — BEFORE tracking, so ghosts never spawn tracks —
    then update the (optional) tracker.

    Returns ``(poses, quality, persons, track_ids, n_dropped)``; quality/
    persons/track_ids are None when not supplied/enabled.  NB: quality
    describes the RAW pipeline pose; with tracker smoothing the returned
    poses are EMA-blended and their own residual differs slightly."""
    import numpy as np

    poses = np.asarray(poses)
    dropped = 0
    if gate is not None and quality is not None:
        quality = np.asarray(quality)
        keep = quality_keep_mask(quality, gate)
        if not keep.all():
            dropped = int((~keep).sum())
            poses, quality = poses[keep], quality[keep]
            if persons is not None:
                persons = np.asarray(persons)[keep]
    ids = None
    if tracker is not None:
        ids, poses = tracker.update(poses)
    return poses, quality, persons, ids, dropped


class PoseServer:
    """Drive a :class:`PoseEstimationPipeline` over a line-oriented stream.

    ``depth`` is the in-flight dispatch window (1 = fully synchronous).
    ``tracker`` is an optional :class:`mpe3d_tpu.tracking.PoseTracker`;
    it is updated strictly in frame order at collect time.
    """

    def __init__(self, pipe, rig_config, max_skeletons: int = 10,
                 depth: int = 3, tracker=None, tracker_factory=None,
                 quality_gate: Optional[float] = None,
                 batch_window: int = 1, batch_linger_ms: float = 5.0):
        self.pipe = pipe
        self.rig_config = rig_config
        self.max_skeletons = max_skeletons
        self.depth = max(1, int(depth))
        # Micro-batching (batch_window > 1): consecutive frames group into
        # ONE batched dispatch (pipeline.submit_batch, padded to the window
        # so one executable serves every fill level).  B frames per
        # dispatch amortize the lifter weight stream — the dominant
        # on-device cost — and, through remote relays, the per-dispatch
        # round trip.  A partial window flushes after ``batch_linger_ms``
        # so a paced (e.g. camera-rate) stream is never stalled by the
        # batcher; the linger is the latency ceiling the batcher may add.
        self.batch_window = max(1, int(batch_window))
        # floor 1 ms: the flusher wakes at linger/2, so an unclamped 0
        # would busy-spin a core per connection (Event.wait(0) returns
        # immediately); 1 ms keeps "flush asap" semantics at a bounded
        # wakeup rate
        self.batch_linger_ms = max(1.0, float(batch_linger_ms))
        self.tracker = tracker
        # tracking is per STREAM, not per server: with concurrent TCP
        # clients (serve --max-clients > 1) each connection is its own
        # camera feed and must not see another feed's track state.  A
        # factory makes handle_stream build a fresh tracker per stream; a
        # plain ``tracker`` instance is shared (single-stream servers,
        # back-compat).
        self.tracker_factory = tracker_factory
        # drop poses whose quality column (mean reprojection residual, px)
        # exceeds this — ghost/mis-associated proposals score an order of
        # magnitude above the detector noise floor.  Applied BEFORE the
        # tracker so ghosts never spawn tracks.  Poses with quality -1
        # (no valid observation to judge by) are kept, conservatively.
        self.quality_gate = quality_gate
        self.frames_served = 0
        self.errors = 0
        self.dropped_low_quality = 0
        self._latency_sum_ms = 0.0
        # fallback native-miss counter for direct _parse/_submit callers;
        # handle_stream passes its own per-stream state so one client
        # whose encoding the C++ parser can't read never disables the
        # fast path for concurrent streams (PoseThreadingTCPServer)
        self._native_misses = {"n": 0}
        # counters are bumped from both the reader and collector threads;
        # += is a non-atomic read-modify-write, so stats go through a lock
        import threading
        self._stats_lock = threading.Lock()
        # serializes reload_from_dir across concurrent client streams
        self._reload_lock = threading.Lock()
        # a rig with a single matching camera cannot run the fused ≥2-view
        # decode; the staged path's single-camera bypass handles it
        self._bypass = len(pipe.match_idx) <= 1

    # ------------------------------------------------------------------
    def _parse_line(self, line: str, misses=None):
        """One wire line → FrameArrays.  Fast path: the C++ parser
        (mpe3d_tpu/native) on the raw bytes — it skips the ~ms-scale
        ``json.loads`` + python skeleton loop, which would otherwise
        dominate the ~0.1 ms on-device frame time on a direct-attached
        chip.  Transparent python fallback (native unavailable, or the
        line doesn't parse to exactly one frame).  ``misses`` is the
        PER-STREAM miss counter ({"n": int}); default = the shared one."""
        from mpe3d_tpu.data.frames import parse_frames_batch
        if misses is None:
            misses = self._native_misses
        if line.startswith("{") and misses["n"] < 3:
            try:
                fas = parse_frames_batch(("[" + line + "]").encode(),
                                         self.rig_config,
                                         self.max_skeletons)
                if len(fas) == 1:
                    misses["n"] = 0
                    return fas[0]
            except Exception:
                pass
            # back off after consecutive misses: a client whose encoding
            # the native parser can't handle (e.g. list-encoded
            # skeletons) must not pay a failed scan + stderr warning on
            # every frame of a long-lived session
            misses["n"] += 1
        # python path doubles as the validator: raises on malformed JSON
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError("frame must be a JSON object")
        return parse_frame(obj, self.rig_config, self.max_skeletons)

    def _parse(self, frame, misses=None):
        """``frame``: a raw wire line (str) or an already-parsed dict."""
        if isinstance(frame, str):
            return self._parse_line(frame, misses)
        return parse_frame(frame, self.rig_config, self.max_skeletons)

    def _submit(self, frame, misses=None):
        t0 = time.perf_counter()
        fa = self._parse(frame, misses)
        if self._bypass:
            return t0, self.pipe(fa)          # synchronous staged path
        return t0, self.pipe.submit_fused(fa)

    def _new_stream_tracker(self):
        """The tracker a new stream should update (see __init__)."""
        if self.tracker_factory is not None:
            return self.tracker_factory()
        return self.tracker

    def _collect(self, seq: int, t0: float, ticket, tracker=None):
        out = ticket if self._bypass else self.pipe.collect_fused(ticket)
        return self._finish(seq, t0, out, tracker)

    def _finish(self, seq: int, t0: float, out, tracker=None):
        """Returns the response as a preformatted line (str, C++ fast
        path — json.dumps of the poses measured ~140 µs/frame, on par
        with the whole on-device frame time) or as a dict (python
        fallback; ``emit`` serialises it)."""
        poses, quality, _, ids, dropped = gate_and_track(
            out.poses, out.quality, gate=self.quality_gate,
            tracker=tracker)
        if dropped:
            with self._stats_lock:
                self.dropped_low_quality += dropped
        lat = (time.perf_counter() - t0) * 1e3
        with self._stats_lock:
            self.frames_served += 1
            self._latency_sum_ms += lat

        from mpe3d_tpu.native import format_result_native
        line = format_result_native(seq, poses, quality=quality,
                                    track_ids=ids, dropped=dropped,
                                    latency_ms=lat)
        if line is not None:
            return line

        rec = {"seq": seq}
        if dropped:
            rec["dropped_low_quality"] = dropped
        rec["n_persons"] = int(len(poses))
        if ids is not None:
            rec["track_ids"] = ids.tolist()
        if quality is not None:
            rec["quality_px"] = quality.round(2).tolist()
        rec["poses_m"] = poses.round(4).tolist()
        rec["latency_ms"] = round(lat, 3)
        return rec

    def _bump_errors(self) -> None:
        with self._stats_lock:
            self.errors += 1

    def reload_from_dir(self, modelsdir) -> dict:
        """Hot-swap the pipeline's weights from a checkpoint directory
        (``{"cmd": "reload", "modelsdir": "..."}``): load whichever of
        ``skeleton_matching`` / ``pose_estimator`` the directory ships
        and hand the raw trees to
        :meth:`PoseEstimationPipeline.reload_weights` (same-architecture
        shape check, serve-dtype cast, device residency, multi-device
        re-replication — see its docstring).  The lifter checkpoint's
        prior variant must match the serving pipeline's (the checkpoint
        contract, lifting/pack.py).  Raises on any problem WITHOUT
        touching serving state; the caller turns that into an error
        response and the server keeps serving the old weights.

        Trust model: same as the CLI — the client names a path readable
        by the server process.  The server binds localhost by default;
        anyone who can reach the socket already speaks for the operator.
        """
        import os

        import jax

        from mpe3d_tpu.models.gat import init_matcher
        from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                load_checkpoint,
                                                load_lifter_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)

        if not modelsdir or not isinstance(modelsdir, str):
            raise ValueError("reload needs a 'modelsdir' string")
        if not os.path.isdir(modelsdir):
            raise ValueError(f"no such directory: {modelsdir}")
        mstem = os.path.join(modelsdir, "skeleton_matching")
        lstem = os.path.join(modelsdir, "pose_estimator")
        mp = lp = None
        if checkpoint_exists(mstem):
            mcfg = matcher_config_from_meta(read_meta(mstem),
                                            self.pipe.matcher_cfg)
            if mcfg != self.pipe.matcher_cfg:
                # architecture flags (residual, heads, …) change the
                # computed function without necessarily changing leaf
                # shapes — reload_weights' shape check cannot catch that
                raise ValueError(
                    f"matcher checkpoint architecture {mcfg} does not "
                    f"match the serving pipeline's "
                    f"{self.pipe.matcher_cfg} (restart the server on "
                    "the new modelsdir instead)")
            mp, _, _ = load_checkpoint(
                mstem, init_matcher(jax.random.PRNGKey(0), mcfg))
        if checkpoint_exists(lstem):
            lp, lcfg, prior = load_lifter_checkpoint(lstem,
                                                     self.pipe.lifter_cfg)
            if lcfg != self.pipe.lifter_cfg:
                # e.g. residual_prior=True vs an absolute head: identical
                # widths/shapes, different apply semantics — serving it
                # through the old config would add/skip the packed prior
                raise ValueError(
                    f"lifter checkpoint architecture {lcfg} does not "
                    f"match the serving pipeline's "
                    f"{self.pipe.lifter_cfg} (restart the server on "
                    "the new modelsdir instead)")
            if prior != self.pipe.lifter_prior:
                raise ValueError(
                    f"checkpoint prior={prior!r} does not match the "
                    f"serving pipeline's lifter_prior="
                    f"{self.pipe.lifter_prior!r} (restart with the "
                    "matching --prior; the prior variant is part of the "
                    "checkpoint contract)")
        if mp is None and lp is None:
            raise ValueError(f"no skeleton_matching/pose_estimator "
                             f"checkpoint under {modelsdir}")
        with self._reload_lock:   # serialize concurrent stream reloads
            self.pipe.reload_weights(matcher_params=mp, lifter_params=lp)
        return {"modelsdir": modelsdir, "matcher": mp is not None,
                "lifter": lp is not None}

    def _stats(self) -> dict:
        with self._stats_lock:
            n = max(self.frames_served, 1)
            rec = {"frames": self.frames_served, "errors": self.errors,
                   "mean_latency_ms": round(self._latency_sum_ms / n, 3),
                   "depth": self.depth,
                   "tracking": (self.tracker is not None
                                or self.tracker_factory is not None)}
            if self.batch_window > 1:
                rec["batch_window"] = self.batch_window
            if self.quality_gate is not None:
                rec["quality_gate_px"] = self.quality_gate
                rec["dropped_low_quality"] = self.dropped_low_quality
        return rec

    # ------------------------------------------------------------------
    def handle_stream(self, lines, write) -> None:
        """Serve newline-delimited JSON: ``lines`` is an iterable of input
        lines, ``write`` a callable taking one output line (with newline).
        Returns when the input ends or a ``close`` command arrives.

        Responses are written by a dedicated collector thread as soon as
        each frame's result is ready — a synchronous request-response
        client gets its answer without having to send more input (the
        reader thread may be blocked on the next line the whole time).
        ``depth`` only bounds how many frames are in flight (a full
        window blocks the reader, backpressure for firehose clients).
        Order is still strict: the collector drains a FIFO queue, and
        control/error responses are emitted only after a full drain."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        wlock = threading.Lock()
        dead = threading.Event()   # client write side gone
        seq = 0
        tracker = self._new_stream_tracker()   # per-stream track state
        misses = {"n": 0}   # per-stream native-parser backoff counter

        def emit(rec):
            if dead.is_set():
                return
            try:
                with wlock:
                    write(rec if isinstance(rec, str)
                          else json.dumps(rec) + "\n")
            except Exception:
                # client disconnected mid-stream (BrokenPipe on TCP,
                # closed stdout).  The collector must survive: a dead
                # collector would leave queued items un-task_done()d and
                # the final drain()/q.join() would deadlock the server.
                dead.set()

        def collector():
            while True:
                item = q.get()
                try:
                    if item is None:
                        return
                    if item[0] == "batch_error":
                        # submit_batch failed in the flusher/reader; the
                        # error lines ride the FIFO so responses for
                        # earlier in-flight batches still come out first
                        # (the strict-ordering contract)
                        _, items, msg = item
                        self._bump_errors()
                        for s, _, _ in items:
                            emit({"seq": s, "error": msg})
                        continue
                    if item[0] == "batch":
                        _, items, ticket = item
                        try:
                            outs = self.pipe.collect_batch(ticket)
                        except Exception as e:
                            self._bump_errors()
                            for s, _, _ in items:
                                emit({"seq": s,
                                      "error": f"{type(e).__name__}: {e}"})
                            continue
                        # per-item finish: a host-side failure on one
                        # frame (tracker/format) must not re-answer the
                        # seqs already emitted for this batch
                        for (s, t0, _), out in zip(items, outs):
                            try:
                                emit(self._finish(s, t0, out, tracker))
                            except Exception as e:
                                self._bump_errors()
                                emit({"seq": s,
                                      "error": f"{type(e).__name__}: {e}"})
                        continue
                    s, t0, ticket = item
                    try:
                        emit(self._collect(s, t0, ticket, tracker))
                    except Exception as e:   # device/readback failure:
                        self._bump_errors()  # report, keep serving
                        emit({"seq": s,
                              "error": f"{type(e).__name__}: {e}"})
                finally:
                    q.task_done()

        thread = threading.Thread(target=collector, daemon=True)
        thread.start()

        # ---- micro-batcher state (batch_window > 1; see __init__) -------
        batching = self.batch_window > 1 and not self._bypass
        pending: list = []            # [(seq, t0, FrameArrays)]
        plock = threading.Lock()
        stop_flush = threading.Event()

        def flush_pending(min_age_s: Optional[float] = None):
            """Submit pending frames as one padded batch.  The q.put stays
            inside the lock so batch order in the FIFO == seq order."""
            with plock:
                if not pending:
                    return
                if (min_age_s is not None
                        and time.perf_counter() - pending[0][1] < min_age_s):
                    return
                items = pending[:]
                pending.clear()
                try:
                    ticket = self.pipe.submit_batch(
                        [fa for _, _, fa in items],
                        pad_to=self.batch_window)
                except Exception as e:
                    # route the errors through the FIFO, not straight to
                    # emit: earlier batches may still be queued and the
                    # protocol is strictly ordered
                    q.put(("batch_error", items,
                           f"{type(e).__name__}: {e}"))
                    return
                q.put(("batch", items, ticket))

        def flusher():
            # partial windows must not wait for the next frame: flush any
            # batch older than the linger.  Wakes at linger/2 granularity.
            while not stop_flush.wait(self.batch_linger_ms / 2e3):
                flush_pending(min_age_s=self.batch_linger_ms / 1e3)

        if batching:
            flush_thread = threading.Thread(target=flusher, daemon=True)
            flush_thread.start()

        def drain():
            if batching:
                flush_pending()
            q.join()   # every submitted frame collected and written

        try:
            for line in lines:
                if dead.is_set():
                    break          # client gone: stop parsing/submitting
                line = line.strip()
                if not line:
                    continue
                # frame lines skip json.loads entirely (the C++ parser
                # reads the raw bytes); only lines that could be control
                # objects ('"cmd"' anywhere — JSON member order is not
                # significant) or non-objects pay the python parse for
                # classification.  A frame that merely *contains* the
                # substring takes the slow path and is still served
                # correctly.
                if line.startswith("{") and '"cmd"' not in line:
                    try:
                        if batching:
                            t0 = time.perf_counter()
                            fa = self._parse(line, misses)
                        else:
                            ticket = self._submit(line, misses)
                    except Exception as e:  # malformed frame payloads
                        drain()
                        self._bump_errors()
                        emit({"seq": seq,
                              "error": f"{type(e).__name__}: {e}"})
                        seq += 1
                        continue
                    if batching:
                        with plock:
                            pending.append((seq, t0, fa))
                            full = len(pending) >= self.batch_window
                        if full:
                            flush_pending()
                    else:
                        q.put((seq, *ticket))  # blocks when window is full
                    seq += 1
                    continue
                try:
                    obj = json.loads(line)
                except (ValueError, RecursionError) as e:
                    # RecursionError: hostile deeply-nested JSON — the
                    # long-lived server must answer and keep serving
                    drain()
                    self._bump_errors()
                    emit({"seq": seq, "error": f"bad json: {e}"})
                    seq += 1
                    continue
                if isinstance(obj, dict) and "cmd" in obj:
                    drain()  # strict ordering around control responses
                    cmd = obj["cmd"]
                    if cmd == "ping":
                        emit({"pong": True})
                    elif cmd == "stats":
                        emit(self._stats())
                    elif cmd == "close":
                        emit({"closed": True, **self._stats()})
                        return
                    elif cmd == "reload":
                        # weights hot-swap; drain() above already flushed
                        # this stream's in-flight frames, so every earlier
                        # response was produced by the old weights and
                        # every later one by the new — per stream, the
                        # reload is an ordering barrier
                        try:
                            info = self.reload_from_dir(obj.get("modelsdir"))
                            emit({"reloaded": True, **info})
                        except Exception as e:
                            self._bump_errors()
                            emit({"error": f"reload failed: "
                                  f"{type(e).__name__}: {e}"})
                    else:
                        self._bump_errors()
                        emit({"error": f"unknown cmd: {cmd}"})
                    continue
                if isinstance(obj, dict):
                    # a frame whose raw line contains the substring '"cmd"'
                    # without a top-level "cmd" key: classification sent it
                    # down the slow path — it is still a frame, serve it
                    try:
                        if batching:
                            t0 = time.perf_counter()
                            fa = self._parse(obj, misses)
                        else:
                            ticket = self._submit(obj, misses)
                    except Exception as e:
                        drain()
                        self._bump_errors()
                        emit({"seq": seq,
                              "error": f"{type(e).__name__}: {e}"})
                        seq += 1
                        continue
                    if batching:
                        with plock:
                            pending.append((seq, t0, fa))
                            full = len(pending) >= self.batch_window
                        if full:
                            flush_pending()
                    else:
                        q.put((seq, *ticket))
                    seq += 1
                    continue
                drain()
                self._bump_errors()
                emit({"seq": seq, "error": "frame must be a JSON object"})
                seq += 1
        finally:
            drain()
            stop_flush.set()
            q.put(None)
            thread.join(timeout=30)

    def serve_stdio(self) -> None:
        """Serve stdin→stdout (one process per client, e.g. behind
        ``socat`` or a container runtime)."""
        out = sys.stdout

        def write(s):
            out.write(s)
            out.flush()

        self.handle_stream(sys.stdin, write)


# ---------------------------------------------------------------------------
# TCP front-end
# ---------------------------------------------------------------------------


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        server: PoseServer = self.server.pose_server  # type: ignore
        slots = getattr(self.server, "client_slots", None)

        def write(s: str):
            self.wfile.write(s.encode())
            self.wfile.flush()

        # errors="replace": a binary/mis-encoded line must become a
        # malformed-JSON error response, not a UnicodeDecodeError that
        # tears the connection down with no answer
        lines = (raw.decode(errors="replace") for raw in self.rfile)
        if slots is None:
            server.handle_stream(lines, write)
            return
        with slots:
            server.handle_stream(lines, write)


class PoseTCPServer(socketserver.TCPServer):
    """One-connection-at-a-time TCP wrapper.  Each stream's track state is
    private either way (``handle_stream`` builds it per connection); use
    :class:`PoseThreadingTCPServer` / ``serve --max-clients N`` to serve
    several clients concurrently over the shared device(s)."""

    allow_reuse_address = True

    def __init__(self, pose_server: PoseServer, host: str = "127.0.0.1",
                 port: int = 0):
        super().__init__((host, port), _Handler)
        self.pose_server = pose_server

    @property
    def port(self) -> int:
        return self.server_address[1]


class PoseThreadingTCPServer(socketserver.ThreadingMixIn, PoseTCPServer):
    """Concurrent multi-client TCP wrapper: one handler thread per
    connection, each running its own ``handle_stream`` (own seq counter,
    own in-flight window of ``depth``, own tracker — pass
    ``tracker_factory`` to PoseServer so streams don't share track state).
    Device dispatches from all streams interleave safely: jax dispatch is
    thread-safe, results ride per-ticket buffers, and with multi-device
    serving enabled the round-robin counter bump is atomic
    (``pipeline._next_serve_device``), so N streams spread over N chips
    without collectives.  ``max_clients`` bounds concurrently *served*
    connections — excess clients block in accept order rather than being
    refused (a BoundedSemaphore gate in the handler)."""

    daemon_threads = True

    def __init__(self, pose_server: PoseServer, host: str = "127.0.0.1",
                 port: int = 0, max_clients: int = 4):
        import threading
        super().__init__(pose_server, host, port)
        self.client_slots = threading.BoundedSemaphore(max(1, max_clients))


def serve_tcp(pose_server: PoseServer, host: str = "127.0.0.1",
              port: int = 0, ready: Optional[list] = None,
              max_clients: int = 1) -> None:
    """Blocking TCP serve loop.  ``ready`` (if given) receives the bound
    server object before accepting, so tests can learn the ephemeral port
    and call ``shutdown()``.  ``max_clients > 1`` serves that many
    connections concurrently (PoseThreadingTCPServer)."""
    cls = (PoseTCPServer if max_clients <= 1
           else lambda ps, h, p: PoseThreadingTCPServer(
               ps, h, p, max_clients=max_clients))
    with cls(pose_server, host, port) as srv:
        if ready is not None:
            ready.append(srv)
        print(f"[mpe3d] serving on {host}:{srv.port}", file=sys.stderr)
        srv.serve_forever(poll_interval=0.1)
