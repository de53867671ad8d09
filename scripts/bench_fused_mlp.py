"""On-chip A/B: whole-network pallas MLP kernel vs the existing serving
paths, inside the real fused frame program.

Four configurations, chained-differential timing (mpe3d_tpu/benchutil.py,
same methodology as bench_serve_dtype / bench_stage_breakdown):

  bf16 / XLA        : stored-bf16 weights, XLA layer matmuls   (default)
  bf16 / fused-mlp  : ops/fused_mlp.py single-launch kernel
  int8 / per-layer  : ops/quant_matmul.py (9 pallas launches — measured
                      SLOWER than bf16: launch overhead > bytes saved)
  int8 / fused-mlp  : single launch, int8 tiles dequantised in VMEM

Decision input for flipping the pipeline's ``use_fused_mlp`` default on
TPU (pipeline.py) and for the int8 serving policy (RESULTS.md ladder).

    python scripts/bench_fused_mlp.py [--k 120] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=120)
    ap.add_argument("--modelsdir", default="models_demo/widefield")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--decode-top-k", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.benchutil import chained_frame_us
    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig = synthetic_ring_rig(PANOPTIC)
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim)
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    stem = os.path.join(args.modelsdir, "skeleton_matching")
    if checkpoint_exists(stem):
        mcfg = matcher_config_from_meta(read_meta(stem), mcfg)
        mp, _, _ = load_checkpoint(stem,
                                   init_matcher(jax.random.PRNGKey(0), mcfg))
    lcfg = LifterConfig(in_dim=PANOPTIC.lifter_input_dim,
                        out_dim=PANOPTIC.n_joints * 3)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    # a size-variant lifter checkpoint (--widths) changes the kernel's
    # tile schedule and bytes — load it when the dir ships one (same fix
    # as bench_serve_dtype.py).  Variant-aware: an int8 servable export
    # is dequantised into the fp master the A/B's bf16 arms need (the
    # int8 arms re-quantise it; latency depends on bytes, not values)
    lstem = os.path.join(args.modelsdir, "pose_estimator")
    lifter_prior = "mean"
    if checkpoint_exists(lstem):
        from mpe3d_tpu.models.mlp import (dequantize_lifter_weights,
                                          lifter_is_quantized)
        from mpe3d_tpu.train.checkpoint import load_lifter_checkpoint
        # keep the checkpoint's prior variant: pack_lifter_input runs
        # INSIDE the timed fused program, and an irls prior costs real
        # per-frame work the A/B must include
        lp, lcfg, lifter_prior = load_lifter_checkpoint(lstem, lcfg)
        if lifter_is_quantized(lp):
            lp = dequantize_lifter_weights(lp)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    fa = parse_frame(next(iter(generate_frames(
        PANOPTIC, rig, 1, n_people=(3, 3), seed=11, noise=noise,
        with_gt=False))), PANOPTIC, max_skeletons=4)
    S, P = 4, 8
    frame_args = [jnp.asarray(fa.kp[:, :S]), jnp.asarray(fa.valid[:, :S]),
                  jnp.asarray(fa.prob[:, :S]),
                  jnp.asarray(fa.in_view[:, :S]),
                  jnp.asarray(fa.present[:, :S])]
    K1, K2 = (2, 6) if args.cpu else (20, args.k)

    def measure(serve_dtype, fused):
        pipe = PoseEstimationPipeline(
            PANOPTIC, rig, mp, mcfg, lp, lcfg, slot_buckets=(4,),
            person_buckets=(8,), threshold=args.threshold,
            decode_top_k=args.decode_top_k, serve_dtype=serve_dtype,
            lifter_prior=lifter_prior, use_fused_mlp=fused)
        # a silently-demoted kernel would make the A/B compare the base
        # path against itself — fail loudly instead
        assert pipe.use_fused_mlp == fused, (serve_dtype, fused)
        lparams = pipe.lifter_params_serve
        wbytes = sum(np.size(x) * np.dtype(jnp.asarray(x).dtype).itemsize
                     for x in jax.tree_util.tree_leaves(
                         (pipe.matcher_params, lparams)))
        us = chained_frame_us(pipe._fused_fn(S, P),
                              (pipe.matcher_params, lparams),
                              frame_args, K1, K2)
        # parity probe: the two paths must produce the same poses
        out = pipe.infer_fused(fa)
        return us, wbytes, out

    res = {"backend": jax.default_backend(), "threshold": args.threshold,
           "decode_top_k": args.decode_top_k, "configs": {}}
    ref_poses = {}
    for dtype_name, serve_dtype in (("bf16", jnp.bfloat16), ("int8", "int8")):
        for fused in (False, True):
            name = f"{dtype_name}_{'fusedmlp' if fused else 'base'}"
            us, wbytes, out = measure(serve_dtype, fused)
            floor_us = wbytes / 819e9 * 1e6
            res["configs"][name] = {
                "ondevice_frame_us": round(us, 1),
                "served_weight_mb": round(wbytes / 2**20, 2),
                "hbm_floor_us_v5e": round(floor_us, 1),
                "hbm_roofline_pct": round(100.0 * floor_us / us, 1)
                if us > 0 else None,
            }
            if dtype_name in ref_poses and len(out.poses):
                diff = float(np.max(np.abs(
                    np.asarray(out.poses) - ref_poses[dtype_name])))
                res["configs"][name]["max_pose_diff_m_vs_base"] = diff
            elif len(out.poses):
                ref_poses[dtype_name] = np.asarray(out.poses)
            print(f"[fusedmlp] {name}: {us:.1f} us/frame", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
