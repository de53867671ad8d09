"""On-chip A/B: XLA matcher stack vs the pallas GAT megakernel.

The matcher stage is critical-path-bound (5 dependent GAT layers of tiny
tensors, each XLA fusion an HBM round trip); ``ops/gat_kernel.py`` runs
all five layers inside one VMEM-resident ``pallas_call``.  This bench
builds two pipeline instances (``use_pallas_matcher`` off/on), guards
score agreement, then times the match-only program and optionally the
full fused frame program interleaved in the SAME relay session
(chained differential, value-synced — methodology mpe3d_tpu/benchutil.py)
so the comparison is session-drift-free.

Usage: python scripts/bench_gat_pallas_ab.py [--fused] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=160)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modelsdir", default="models_demo/widefield")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="also A/B the full fused frame program")
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
    from mpe3d_tpu.models.mlp import (dequantize_lifter_weights, init_lifter,
                                      lifter_is_quantized)
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            load_checkpoint,
                                            load_lifter_checkpoint,
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
    lifter_prior = "mean"
    lstem = os.path.join(args.modelsdir, "pose_estimator")
    if checkpoint_exists(lstem):
        lp, lcfg, lifter_prior = load_lifter_checkpoint(lstem, lcfg)
        if lifter_is_quantized(lp):
            lp = dequantize_lifter_weights(lp)

    def build_pipe(use_pallas):
        return PoseEstimationPipeline(
            PANOPTIC, rig, mp, mcfg, lp, lcfg, slot_buckets=(4,),
            person_buckets=(8,), threshold=0.5, decode_top_k=64,
            lifter_prior=lifter_prior, use_pallas_matcher=use_pallas)

    pipe_xla = build_pipe(False)
    pipe_pal = build_pipe(True)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    fa = parse_frame(next(iter(generate_frames(
        PANOPTIC, rig, 1, n_people=(3, 3), seed=11, noise=noise,
        with_gt=False))), PANOPTIC, max_skeletons=4)
    S, P = 4, 8
    # the actual matching-camera indices, NOT range(len(...)): identical on
    # PANOPTIC (identity map) but a subset/reordered rig would silently
    # feed wrong rows (round-2 ADVICE)
    mi = list(pipe_xla.match_idx)
    match_args = [jnp.asarray(fa.kp[mi, :S]), jnp.asarray(fa.valid[mi, :S]),
                  jnp.asarray(fa.prob[mi, :S]),
                  jnp.asarray(fa.in_view[mi, :S]),
                  jnp.asarray(fa.present[mi, :S])]
    frame_args = [jnp.asarray(fa.kp[:, :S]), jnp.asarray(fa.valid[:, :S]),
                  jnp.asarray(fa.prob[:, :S]),
                  jnp.asarray(fa.in_view[:, :S]),
                  jnp.asarray(fa.present[:, :S])]

    # score agreement guard: the megakernel must not move the scores
    s_x = np.asarray(pipe_xla._match_fn(S)(pipe_xla.matcher_params,
                                           *match_args))
    s_p = np.asarray(pipe_pal._match_fn(S)(pipe_pal.matcher_params,
                                           *match_args))
    score_max_diff = float(np.abs(s_x - s_p).max())

    K1, K2 = 20, args.k
    rows = []
    for rep in range(args.reps):
        t_x = chained_frame_us(pipe_xla._match_fn(S),
                               (pipe_xla.matcher_params,), match_args,
                               K1, K2)
        t_p = chained_frame_us(pipe_pal._match_fn(S),
                               (pipe_pal.matcher_params,), match_args,
                               K1, K2)
        row = {"rep": rep, "xla_match_us": round(t_x, 1),
               "pallas_match_us": round(t_p, 1)}
        if args.fused:
            f_x = chained_frame_us(
                pipe_xla._fused_fn(S, P),
                (pipe_xla.matcher_params, pipe_xla.lifter_params),
                frame_args, K1, K2)
            f_p = chained_frame_us(
                pipe_pal._fused_fn(S, P),
                (pipe_pal.matcher_params, pipe_pal.lifter_params),
                frame_args, K1, K2)
            row.update(xla_fused_us=round(f_x, 1),
                       pallas_fused_us=round(f_p, 1))
        rows.append(row)

    best_x = min(r["xla_match_us"] for r in rows)
    best_p = min(r["pallas_match_us"] for r in rows)
    out = {"backend": jax.default_backend(), "score_max_diff": score_max_diff,
           "rows": rows, "best_xla_match_us": best_x,
           "best_pallas_match_us": best_p,
           "speedup": round(best_x / best_p, 3)}
    if args.fused:
        out["best_xla_fused_us"] = min(r["xla_fused_us"] for r in rows)
        out["best_pallas_fused_us"] = min(r["pallas_fused_us"] for r in rows)
        out["fused_speedup"] = round(out["best_xla_fused_us"]
                                     / out["best_pallas_fused_us"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
