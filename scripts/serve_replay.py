"""Replay a recorded wire-format file against a running pose server and
measure serving throughput/latency — the acceptance client for the
`mpe3d_tpu serve` front-end (and its honest benchmark: timings include
JSON transport, parse, tracking, and formatting, not just device time).

Usage:
  # against a TCP server started elsewhere:
  python scripts/serve_replay.py --connect HOST:PORT recording.json
  # self-contained: spawn a stdio server subprocess and replay through it
  python scripts/serve_replay.py --spawn "--cpu --modelsdir models_demo/widefield \
      --backend triangulation --tm /root/reference/tm_panoptic.pickle" recording.json

Prints one JSON line: frames, wall seconds, fps, latency percentiles (ms,
as reported per-response), errors.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _percentiles(xs, ps=(50, 90, 99)):
    if not xs:
        return {}
    xs = sorted(xs)
    return {f"p{p}": round(xs[min(len(xs) - 1, int(len(xs) * p / 100))], 3)
            for p in ps}


def replay(rfile, wfile, frames, limit):
    # write from a thread so a long recording can't deadlock on pipe/socket
    # buffers (the server blocks writing responses nobody is reading)
    import threading

    frames = frames[:limit]
    sent = len(frames)

    # readiness gate: the server answers a ping only once its serve loop is
    # live — i.e. after imports, model load, and --warmup compiles.  Without
    # this, spawn-mode wall time charges ~a minute of cold-start to the
    # first frames (a TCP client connecting to a warm server never sees it).
    wfile.write('{"cmd": "ping"}\n')
    wfile.flush()
    for line in rfile:
        if "pong" in json.loads(line):
            break

    def feed():
        for f in frames:
            wfile.write(json.dumps(f) + "\n")
        wfile.write('{"cmd": "stats"}\n{"cmd": "close"}\n')
        wfile.flush()

    t0 = time.perf_counter()
    writer = threading.Thread(target=feed, daemon=True)
    writer.start()
    lat, errors, got = [], 0, 0
    stats = None
    for line in rfile:
        rec = json.loads(line)
        if "closed" in rec:
            break
        if "frames" in rec:
            stats = rec
            continue
        got += 1
        if "error" in rec:
            errors += 1
        elif "latency_ms" in rec:
            lat.append(rec["latency_ms"])
    wall = time.perf_counter() - t0
    writer.join(timeout=10)
    return {"frames_sent": sent, "responses": got, "errors": errors,
            "wall_s": round(wall, 3),
            "fps": round(got / wall, 2) if wall > 0 else None,
            "latency_ms": _percentiles(lat),
            "server_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recording", help="wire-format frames JSON (list)")
    ap.add_argument("--connect", default=None, metavar="HOST:PORT")
    ap.add_argument("--spawn", default=None, metavar="SERVE_ARGS",
                    help="spawn `python -m mpe3d_tpu serve <args>` over "
                    "stdio and replay through it")
    ap.add_argument("--limit", type=int, default=10 ** 9)
    ap.add_argument("--repeat", type=int, default=1,
                    help="replay the file N times back-to-back (warm jit)")
    args = ap.parse_args()

    with open(args.recording) as f:
        frames = json.load(f)
    frames = frames * args.repeat

    if args.connect:
        host, port = args.connect.rsplit(":", 1)
        with socket.create_connection((host, int(port)), timeout=600) as s:
            # Separate reader/writer objects: the feed thread writes while
            # the main thread blocks in readline(), and a single shared
            # TextIOWrapper is not safe under that concurrency.
            rf, wf = s.makefile("r"), s.makefile("w")
            out = replay(rf, wf, frames, args.limit)
    elif args.spawn is not None:
        cmd = [sys.executable, "-m", "mpe3d_tpu", "serve"] + args.spawn.split()
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE, text=True,
                                bufsize=1)
        try:
            out = replay(proc.stdout, proc.stdin, frames, args.limit)
        finally:
            proc.stdin.close()
            proc.wait(timeout=60)
    else:
        ap.error("need --connect or --spawn")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
