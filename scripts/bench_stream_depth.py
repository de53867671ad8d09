"""Sweep infer_stream pipeline depth on the real TPU.

The streaming path keeps ``depth`` frames in flight so relay round trips
overlap; steady-state per-frame wall time ≈ RTT/depth + host work.  This
sweep measures the depth curve to pick bench.py's setting with data (the
knee, not a guess) — and to document where latency-to-first-result
(≈ depth × dispatch interval) starts to matter.

    python scripts/bench_stream_depth.py [--frames 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--depths", default="4,8,16,32")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    pipe = PoseEstimationPipeline(
        rig_config, rig, init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,))

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = [parse_frame(f, rig_config, max_skeletons=4)
              for f in generate_frames(rig_config, rig, args.frames,
                                       n_people=(2, 3), seed=7, noise=noise,
                                       with_gt=False)]

    results = {"backend": jax.default_backend(), "frames": len(frames),
               "per_depth_ms": {}}
    depths = [int(d) for d in args.depths.split(",")]
    list(pipe.infer_stream(frames, depth=depths[0]))       # warm compile
    for d in depths:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = list(pipe.infer_stream(frames, depth=d))
            dt = (time.perf_counter() - t0) / max(len(outs), 1) * 1e3
            best = dt if best is None else min(best, dt)
        results["per_depth_ms"][str(d)] = round(best, 3)
        print(f"depth {d}: {best:.3f} ms/frame", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
