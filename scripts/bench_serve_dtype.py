"""Measure bf16 weight serving (pipeline serve_dtype) vs fp32 on the chip.

The fused per-frame program reads the 29.1 M-param lifter's weights from
HBM every frame; storing them in bfloat16 halves that traffic and is
numerically identical under the TPU's DEFAULT matmul precision
(models/mlp.py::cast_lifter_weights).  This script measures the fused
program's on-device per-frame time for both stored dtypes with the
relay-safe chained-differential pattern (bench.py): the program is chained
K times inside one jit and timed as (t_K2 − t_K1)/(K2 − K1) with float()
value syncs, cancelling the relay round trip.

Run each variant in its OWN process (the relay degrades a session after
its first readback):
    python scripts/bench_serve_dtype.py --dtype fp32
    python scripts/bench_serve_dtype.py --dtype bf16
    python scripts/bench_serve_dtype.py --dtype int8
For fp32/bf16 it also reports the max |Δpose| between the two dtypes'
outputs on the same frame (expected ~0 on TPU: default precision already
rounds to bf16).  int8 accuracy is measured separately on real
checkpoints (scripts/eval_serve_int8.py; reports/serve_int8_*.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None,
                    choices=["fp32", "bf16", "int8"])
    ap.add_argument("--bf16", type=int, default=None,
                    help="legacy alias: --bf16 1 == --dtype bf16")
    ap.add_argument("--k", type=int, default=120,
                    help="long-chain length (short chain is 20)")
    ap.add_argument("--decode-top-k", type=int, default=0,
                    help="device decode candidate cap (0 = exact/uncapped "
                    "— the decode-stress configuration; 64 = the "
                    "pipeline's serving default)")
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="decode eligibility threshold (0.05 makes the "
                    "untrained matcher merge nearly every pair — decode "
                    "worst case; 0.5 = serving default)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (methodology smoke "
                    "test; roofline pct is only meaningful on the chip)")
    ap.add_argument("--modelsdir", default=None,
                    help="load a trained matcher checkpoint (dir with "
                    "skeleton_matching.npz) — with the dynamic-trip-count "
                    "decode, trained scores at threshold 0.5 give the "
                    "serving-regime trip count instead of the K cap")
    args = ap.parse_args()
    dtype = args.dtype or ("bf16" if args.bf16 in (None, 1) else "fp32")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

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
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lifter_prior = "mean"
    stored = "fp32"
    if args.modelsdir:
        from mpe3d_tpu.train.checkpoint import (load_checkpoint,
                                                load_lifter_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)
        stem = os.path.join(args.modelsdir, "skeleton_matching")
        mcfg = matcher_config_from_meta(read_meta(stem), mcfg)
        mp, _, _ = load_checkpoint(stem,
                                   init_matcher(jax.random.PRNGKey(0), mcfg))
        # load the LIFTER checkpoint too when the dir has one — a size
        # variant (--widths) changes the served weight bytes, which is
        # exactly what the compact-model latency A/B measures; loading
        # only the matcher would silently time the default 29.1 M init.
        # Variant-aware: the dir may hold an int8/bf16 servable export
        # (after the Aug-19 reset those are the only surviving lifters)
        lstem = os.path.join(args.modelsdir, "pose_estimator")
        from mpe3d_tpu.train.checkpoint import checkpoint_exists
        if checkpoint_exists(lstem):
            lp, lcfg, lifter_prior = load_lifter_checkpoint(lstem, lcfg)
            stored = read_meta(lstem).get("stored", "fp32")
            if stored == "int8" and dtype != "int8":
                # no fp32 master survives in an int8 export — serve the
                # tree the int8 path effectively computes with, in the
                # requested dtype (latency depends on bytes, not values)
                from mpe3d_tpu.models.mlp import dequantize_lifter_weights
                lp = dequantize_lifter_weights(lp)
            elif stored == "bf16" and dtype == "fp32":
                # lossless upcast — otherwise the 'fp32' arm would time
                # the bf16 tree (half the bytes) under an fp32 label
                from mpe3d_tpu.models.mlp import cast_lifter_weights
                lp = cast_lifter_weights(lp, jnp.float32)
    pipe = PoseEstimationPipeline(
        rig_config, rig,
        mp, mcfg, lp, lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        lifter_prior=lifter_prior,
        # default low threshold: the untrained matcher must decode real
        # persons so the |Δpose| check compares actual lifter outputs, not
        # zero masks
        threshold=args.threshold, decode_top_k=args.decode_top_k,
        serve_dtype={"fp32": False, "bf16": jnp.bfloat16,
                     "int8": "int8"}[dtype])

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    fa = parse_frame(next(iter(generate_frames(
        rig_config, rig, 1, n_people=(3, 3), seed=11, noise=noise,
        with_gt=False))), rig_config, max_skeletons=4)

    core = pipe._fused_fn(4, 8)
    chain_args = [jnp.asarray(fa.kp[:, :4]), jnp.asarray(fa.valid[:, :4]),
                  jnp.asarray(fa.prob[:, :4]),
                  jnp.asarray(fa.in_view[:, :4]),
                  jnp.asarray(fa.present[:, :4])]

    from mpe3d_tpu.benchutil import chained_frame_us

    K1, K2 = 20, args.k
    margs = (pipe.matcher_params, pipe.lifter_params)
    ondevice_us = chained_frame_us(core, margs, chain_args, K1, K2)

    # ---- HBM roofline -----------------------------------------------------
    # The fused frame is weight-streaming-bound: arithmetic intensity of the
    # lifter matmuls is ~P_max=8 FLOP/byte, far under the v5e ridge
    # (197 TF/s bf16 ÷ 819 GB/s ≈ 240), so light speed is the served
    # parameter bytes over HBM bandwidth.  pipe.{matcher,lifter}_params are
    # the post-cast/quantized trees — their bytes ARE the per-frame traffic.
    def tree_bytes(t):
        return sum(np.size(x) * np.dtype(jnp.asarray(x).dtype).itemsize
                   for x in jax.tree_util.tree_leaves(t))
    wbytes = tree_bytes(margs)
    hbm_gbps = 819.0  # TPU v5e HBM bandwidth
    floor_us = wbytes / (hbm_gbps * 1e9) * 1e6

    out = {"dtype": dtype, "stored": stored,
           "backend": jax.default_backend(),
           "decode_top_k": args.decode_top_k, "threshold": args.threshold,
           "ondevice_frame_us": round(ondevice_us, 1),
           "served_weight_mb": round(wbytes / 2**20, 2),
           "hbm_floor_us_v5e": round(floor_us, 1),
           "hbm_roofline_pct": round(100.0 * floor_us / ondevice_us, 1)}
    if dtype != "int8":
        # numerical check vs the OTHER fp dtype on the same frame (same
        # pytree structure, so the traced program is reusable); int8's
        # accuracy is measured on real checkpoints in eval_serve_int8.py
        poses, *_ = core(*margs, *chain_args)
        from mpe3d_tpu.models.mlp import cast_lifter_weights
        alt_lp = (jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x, np.float32)), lp)
            if dtype == "bf16" else cast_lifter_weights(lp, jnp.bfloat16))
        poses_alt, *_ = core(pipe.matcher_params, alt_lp, *chain_args)
        out["max_pose_diff_m_vs_other_dtype"] = float(
            jnp.max(jnp.abs(poses - poses_alt)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
