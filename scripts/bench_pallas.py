"""Measure the Pallas fused projection kernel vs plain XLA on the real chip.

VERDICT round-1 asked to prove or drop `ops/fused_proj.py`.  Two levels:

  * raw op: fused_linear_leaky_linear at matcher-layer shapes
    (D=902 fc1 + fc2, varying node counts), amortized over many in-flight
    dispatches (single trailing block_until_ready — the relay-safe pattern);
  * whole pipeline: the fused per-frame program with
    MatcherConfig.use_pallas_proj on/off.

Run each variant in its OWN process (the axon relay degrades a session after
its first readback):
    python scripts/bench_pallas.py --mode op --pallas 0|1
    python scripts/bench_pallas.py --mode pipeline --pallas 0|1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["op", "pipeline"], default="op")
    ap.add_argument("--pallas", type=int, default=0)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")

    use_pallas = bool(args.pallas)
    out = {"mode": args.mode, "pallas": use_pallas,
           "backend": jax.default_backend()}

    if args.mode == "op":
        from mpe3d_tpu.ops.fused_proj import fused_linear_leaky_linear

        D, F = 902, 400            # matcher layer-0 widths (hidden 40 x 10)
        rng = np.random.default_rng(0)
        w1 = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(D, F)), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
        for N in (128, 256, 1024, 4096):
            x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
            f = jax.jit(lambda x: fused_linear_leaky_linear(
                x, w1, b1, w2, b2, 0.15, use_pallas=use_pallas))
            y = f(x)
            jax.block_until_ready(y)           # compile + first readback
            t0 = time.perf_counter()
            for _ in range(args.reps):
                y = f(x)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / args.reps
            out[f"op_N{N}_us"] = round(dt * 1e6, 2)
            print(f"# N={N}: {dt * 1e6:.1f} us", file=sys.stderr, flush=True)
    else:
        from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
        from mpe3d_tpu.data.frames import parse_frame
        from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                              synthetic_ring_rig)
        from mpe3d_tpu.models.gat import init_matcher
        from mpe3d_tpu.models.mlp import init_lifter
        from mpe3d_tpu.pipeline import PoseEstimationPipeline

        rig_config = PANOPTIC
        rig = synthetic_ring_rig(rig_config)
        mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim,
                             use_pallas_proj=use_pallas)
        lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                            out_dim=rig_config.n_joints * 3)
        pipe = PoseEstimationPipeline(
            rig_config, rig, init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
            init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
            slot_buckets=(4,), person_buckets=(8,))
        noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                           spurious_rate=0.1, camera_dropout=0.05)
        frame = parse_frame(generate_frames(
            rig_config, rig, 1, n_people=(3, 3), seed=7, noise=noise,
            with_gt=False)[0], rig_config, max_skeletons=4)
        fn = pipe._fused_fn(4, 8)
        a = [jnp.asarray(frame.kp[:, :4]), jnp.asarray(frame.valid[:, :4]),
             jnp.asarray(frame.prob[:, :4]),
             jnp.asarray(frame.in_view[:, :4]),
             jnp.asarray(frame.present[:, :4])]
        o = fn(pipe.matcher_params, pipe.lifter_params, *a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(pipe.matcher_params, pipe.lifter_params, *a)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.reps
        out["pipeline_frame_us"] = round(dt * 1e6, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
