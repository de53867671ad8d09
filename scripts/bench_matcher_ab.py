"""On-chip A/B of the launch-consolidated GAT layer vs the pre-change one.

The stage breakdown showed the matcher stage is fixed-overhead-bound
(~145 us/frame in the chain19 session, "many small ops") — the rework in
models/gat.py batches heads+edges through one projection, one stacked
incidence gather, and K-concatenated softmax scatters (~18-22 dots/layer
→ ~7).  This bench reconstructs the OLD ``apply_matcher`` from git
(``--old-rev``), monkeypatches it into a second pipeline instance, and
times both match-only programs interleaved in the SAME relay session
(chained differential, value-synced) so the comparison is
session-drift-free.  Methodology: mpe3d_tpu/benchutil.py.
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_module_from_rev(rev: str, path: str, name: str):
    src = subprocess.check_output(["git", "show", f"{rev}:{path}"],
                                  cwd=os.path.join(os.path.dirname(__file__),
                                                   "..")).decode()
    spec = importlib.util.spec_from_loader(name, loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = name
    exec(compile(src, f"{rev}:{path}", "exec"), mod.__dict__)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=160)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved A/B repetitions")
    ap.add_argument("--modelsdir", default="models_demo/widefield")
    ap.add_argument("--old-rev", default="3159b65",
                    help="git rev holding the pre-consolidation gat.py")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="also A/B the full fused frame program")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import mpe3d_tpu.pipeline as pl
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

    def build_pipe():
        return PoseEstimationPipeline(
            PANOPTIC, rig, mp, mcfg, lp, lcfg, slot_buckets=(4,),
            person_buckets=(8,), threshold=0.5, decode_top_k=64,
            lifter_prior=lifter_prior)

    pipe_new = build_pipe()
    old_gat = load_module_from_rev(args.old_rev, "mpe3d_tpu/models/gat.py",
                                   "mpe3d_tpu._old_gat")
    saved = pl.apply_matcher
    pl.apply_matcher = old_gat.apply_matcher
    try:
        pipe_old = build_pipe()
    finally:
        pl.apply_matcher = saved
    # NOTE: pipe_old's jitted programs were traced while the patch was live,
    # so they keep the old matcher; per-instance jit caches make this safe.

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    fa = parse_frame(next(iter(generate_frames(
        PANOPTIC, rig, 1, n_people=(3, 3), seed=11, noise=noise,
        with_gt=False))), PANOPTIC, max_skeletons=4)
    S, P = 4, 8
    mi = list(range(len(pipe_new.match_idx)))
    match_args = [jnp.asarray(fa.kp[mi, :S]), jnp.asarray(fa.valid[mi, :S]),
                  jnp.asarray(fa.prob[mi, :S]),
                  jnp.asarray(fa.in_view[mi, :S]),
                  jnp.asarray(fa.present[mi, :S])]
    frame_args = [jnp.asarray(fa.kp[:, :S]), jnp.asarray(fa.valid[:, :S]),
                  jnp.asarray(fa.prob[:, :S]),
                  jnp.asarray(fa.in_view[:, :S]),
                  jnp.asarray(fa.present[:, :S])]

    # score agreement guard: the rework must not move the scores
    import numpy as np
    s_new = np.asarray(pipe_new._match_fn(S)(pipe_new.matcher_params,
                                             *match_args))
    s_old = np.asarray(pipe_old._match_fn(S)(pipe_old.matcher_params,
                                             *match_args))
    score_max_diff = float(np.abs(s_new - s_old).max())

    K1, K2 = 20, args.k
    rows = []
    for rep in range(args.reps):
        t_old = chained_frame_us(pipe_old._match_fn(S),
                                 (pipe_old.matcher_params,), match_args,
                                 K1, K2)
        t_new = chained_frame_us(pipe_new._match_fn(S),
                                 (pipe_new.matcher_params,), match_args,
                                 K1, K2)
        row = {"rep": rep, "old_match_us": round(t_old, 1),
               "new_match_us": round(t_new, 1)}
        if args.fused:
            f_old = chained_frame_us(
                pipe_old._fused_fn(S, P),
                (pipe_old.matcher_params, pipe_old.lifter_params),
                frame_args, K1, K2)
            f_new = chained_frame_us(
                pipe_new._fused_fn(S, P),
                (pipe_new.matcher_params, pipe_new.lifter_params),
                frame_args, K1, K2)
            row.update(old_fused_us=round(f_old, 1),
                       new_fused_us=round(f_new, 1))
        rows.append(row)

    best_old = min(r["old_match_us"] for r in rows)
    best_new = min(r["new_match_us"] for r in rows)
    out = {"backend": jax.default_backend(), "score_max_diff": score_max_diff,
           "rows": rows, "best_old_match_us": best_old,
           "best_new_match_us": best_new,
           "speedup": round(best_old / best_new, 3)}
    if args.fused:
        out["best_old_fused_us"] = min(r["old_fused_us"] for r in rows)
        out["best_new_fused_us"] = min(r["new_fused_us"] for r in rows)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
