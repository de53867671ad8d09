"""On-device per-stage breakdown of the fused frame program.

Measures three chained-differential times on the same frame and params:
  A. matcher only      (features + GAT scores)          — _match_fn
  B. matcher + decode  (+ on-device greedy decode)      — _match_decode_fn
  C. full fused        (+ per-person pack + lift + quality) — _fused_fn
B−A isolates the serial decode, C−B the lifting stage.  This is the map
of where the ~160 µs/frame of non-weight-stream compute lives (the
batched bench shows weights amortize but compute does not), guiding any
future kernel work.  Methodology identical to bench_serve_dtype
(mpe3d_tpu/benchutil.py).
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
    stem = os.path.join(args.modelsdir, "skeleton_matching")
    mcfg = matcher_config_from_meta(read_meta(stem), mcfg)
    mp, _, _ = load_checkpoint(stem, init_matcher(jax.random.PRNGKey(0), mcfg))
    lcfg = LifterConfig(in_dim=PANOPTIC.lifter_input_dim,
                        out_dim=PANOPTIC.n_joints * 3)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    # a size-variant lifter checkpoint (--widths) changes stage timings —
    # load it when the dir ships one (same fix as bench_serve_dtype.py).
    # Variant-aware: int8/bf16 servable exports load too, dequantised so
    # the breakdown times the default fp serving path
    lstem = os.path.join(args.modelsdir, "pose_estimator")
    lifter_prior = "mean"
    if checkpoint_exists(lstem):
        from mpe3d_tpu.models.mlp import (dequantize_lifter_weights,
                                          lifter_is_quantized)
        from mpe3d_tpu.train.checkpoint import load_lifter_checkpoint
        # keep the checkpoint's prior variant — the pack stage it
        # changes runs inside the timed fused program
        lp, lcfg, lifter_prior = load_lifter_checkpoint(lstem, lcfg)
        if lifter_is_quantized(lp):
            lp = dequantize_lifter_weights(lp)
    pipe = PoseEstimationPipeline(
        PANOPTIC, rig, mp, mcfg, lp, lcfg, slot_buckets=(4,),
        person_buckets=(8,), threshold=args.threshold,
        decode_top_k=args.decode_top_k, lifter_prior=lifter_prior)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    fa = parse_frame(next(iter(generate_frames(
        PANOPTIC, rig, 1, n_people=(3, 3), seed=11, noise=noise,
        with_gt=False))), PANOPTIC, max_skeletons=4)
    S, P = 4, 8
    mi = list(range(len(pipe.match_idx)))
    frame_args = [jnp.asarray(fa.kp[:, :S]), jnp.asarray(fa.valid[:, :S]),
                  jnp.asarray(fa.prob[:, :S]),
                  jnp.asarray(fa.in_view[:, :S]),
                  jnp.asarray(fa.present[:, :S])]
    match_args = [jnp.asarray(fa.kp[mi, :S]), jnp.asarray(fa.valid[mi, :S]),
                  jnp.asarray(fa.prob[mi, :S]),
                  jnp.asarray(fa.in_view[mi, :S]),
                  jnp.asarray(fa.present[mi, :S])]

    K1, K2 = 20, args.k
    a = chained_frame_us(pipe._match_fn(S), (pipe.matcher_params,),
                         match_args, K1, K2)
    b = chained_frame_us(pipe._match_decode_fn(S, P), (pipe.matcher_params,),
                         match_args, K1, K2)
    c = chained_frame_us(pipe._fused_fn(S, P),
                         (pipe.matcher_params, pipe.lifter_params),
                         frame_args, K1, K2)
    print(json.dumps({
        "backend": jax.default_backend(),
        "threshold": args.threshold, "decode_top_k": args.decode_top_k,
        "match_us": round(a, 1),
        "match_decode_us": round(b, 1),
        "fused_us": round(c, 1),
        "decode_us": round(b - a, 1),
        "lift_us": round(c - b, 1),
    }))


if __name__ == "__main__":
    main()
