"""Diagnose the bench.py streaming-latency collapse.

RESOLVED (kept as the on-chip regression validation): the cause was axis
(a) in a sharper form than hypothesised — the TRAINED checkpoint loads as
a host-numpy tree and numpy jit arguments re-transfer on every dispatch
(~70 MB/frame; measured 360 vs 39 ms/dispatch for one 12.5 MB numpy arg).
PoseEstimationPipeline now device_puts params at construction, so all
phases below should measure alike (~4 ms at depth 16 through the relay).


bench.py's primary stream figure has collapsed to ~single-dispatch time in
every full-bench run since round 1 (reports/chain4_logs/bench_full.log:
128.7 ms/frame; chain8_logs/bench_full2.log: 190 ms) while the standalone
depth sweep (scripts/bench_stream_depth.py) — same relay session, minutes
apart — measures 4.1 ms at the same depth 16.  The two measurements differ
on exactly two axes:

  (a) bench.py loads the TRAINED demo matcher (models_demo/widefield);
      the sweep uses random init;
  (b) bench.py runs work before its stream measurement: 5 fused warmups,
      3 trivial-program value readbacks (the RTT reference), and 60 timed
      single dispatches each synchronised with a value readback.

This script isolates both in ONE process, in an order that lets each
phase implicate only what changed since the previous one:

  phase1   random-init pipeline, stream x3           (depth-sweep replica)
  phase2   trained-matcher pipeline, stream x3       (axis a)
  phase2b  random pipeline again                     (drift control)
  phase3   rtt floats + 60 timed singles, stream x3  (axis b)
  phase4   random pipeline stream x3 again           (process-wide state?)

Every phase records all stream rep times (not just best), a 10-frame
single-dispatch median (so a relay-mode transition — "singles suddenly
cost ~9 RTT" — is visible directly), and the total decoded-person count
(the device decode's while_loop trip count is data-dependent, so trained
vs random weights can change on-device time).  One JSON line at the end.

No reference counterpart (the reference benches with CUDA events on a
local GPU; metrics_from_model.py:178-300).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(trained: bool, smoke: bool):
    import jax

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig

    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    if trained:
        from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                load_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)
        demo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "models_demo", "widefield", "skeleton_matching")
        if checkpoint_exists(demo):
            mcfg = matcher_config_from_meta(read_meta(demo), mcfg)
            mparams, _, _ = load_checkpoint(
                demo, init_matcher(jax.random.PRNGKey(0), mcfg))
        else:
            print("[diag] no trained matcher — phase2/3 use random",
                  file=sys.stderr)
    return PoseEstimationPipeline(
        rig_config, rig, mparams, mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,)), rig_config, rig


def stream_reps(pipe, frames, depth: int, reps: int):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = len(list(pipe.infer_stream(frames, depth=depth)))
        out.append(round((time.perf_counter() - t0) / max(n, 1) * 1e3, 3))
    return out


def person_total(pipe, frames, depth: int) -> int:
    return int(sum(len(o.poses) for o in pipe.infer_stream(frames,
                                                           depth=depth)))


def single_median_ms(pipe, frames, n: int):
    import numpy as np
    ts = []
    for f in frames[:n]:
        t0 = time.perf_counter()
        pipe.infer_fused(f)
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="CPU, tiny counts")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames

    n_frames = 10 if args.smoke else args.frames
    reps = 2 if args.smoke else 3

    res = {"backend": jax.default_backend(), "depth": args.depth,
           "frames": n_frames}

    # phase 1: depth-sweep replica — random init, stream only
    pipe_r, rig_config, rig = build(trained=False, smoke=args.smoke)
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = [parse_frame(f, rig_config, max_skeletons=4)
              for f in generate_frames(rig_config, rig, n_frames,
                                       n_people=(2, 3), seed=11, noise=noise,
                                       with_gt=False)]
    list(pipe_r.infer_stream(frames, depth=args.depth))          # warm
    res["p1_random_stream_ms"] = stream_reps(pipe_r, frames, args.depth, reps)
    res["p1_single_ms"] = single_median_ms(pipe_r, frames, 10)
    res["p1_persons"] = person_total(pipe_r, frames, args.depth)
    print(f"[diag] p1 {res['p1_random_stream_ms']} single "
          f"{res['p1_single_ms']} persons {res['p1_persons']}",
          file=sys.stderr)

    # phase 2: trained matcher (bench.py's pipeline), stream only
    pipe_t, _, _ = build(trained=True, smoke=args.smoke)
    for f in frames[:5]:
        pipe_t.infer_fused(f)                                    # bench warm
    res["p2_trained_stream_ms"] = stream_reps(pipe_t, frames, args.depth,
                                              reps)
    res["p2_single_ms"] = single_median_ms(pipe_t, frames, 10)
    res["p2_persons"] = person_total(pipe_t, frames, args.depth)
    print(f"[diag] p2 {res['p2_trained_stream_ms']} single "
          f"{res['p2_single_ms']} persons {res['p2_persons']}",
          file=sys.stderr)

    # phase 2b: drift control — the random pipe again, before the singles
    res["p2b_random_stream_ms"] = stream_reps(pipe_r, frames, args.depth,
                                              reps)
    print(f"[diag] p2b {res['p2b_random_stream_ms']}", file=sys.stderr)

    # phase 3: bench.py's pre-stream work, then stream again (trained pipe)
    import jax.numpy as jnp
    float(jnp.ones(()) + 0)
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.ones(()) + 0)
    res["p3_rtt_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
    res["p3_singles60_ms"] = single_median_ms(pipe_t, frames, len(frames))
    res["p3_trained_stream_ms"] = stream_reps(pipe_t, frames, args.depth,
                                              reps)
    print(f"[diag] p3 rtt {res['p3_rtt_ms']} singles "
          f"{res['p3_singles60_ms']} stream {res['p3_trained_stream_ms']}",
          file=sys.stderr)

    # phase 4: the phase-1 pipeline again — did the PROCESS degrade?
    res["p4_random_stream_ms"] = stream_reps(pipe_r, frames, args.depth, reps)
    res["p4_single_ms"] = single_median_ms(pipe_r, frames, 10)
    print(f"[diag] p4 {res['p4_random_stream_ms']} single "
          f"{res['p4_single_ms']}", file=sys.stderr)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
