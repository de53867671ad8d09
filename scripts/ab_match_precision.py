"""A/B: matcher matmul precision ladder at the crowded bucket (S=16).

The round-4 stage ledger puts the S=16 frame's wall almost entirely in
the match compute (~920 of ~960 µs), which runs fp32 matmuls at
precision="highest" (multi-pass bf16 emulation on the MXU).  Relaxing to
"high" (3-pass) or "default" (single-pass bf16 operands) divides the MXU
work — IF the decode survives the rounding.  The bf16-WEIGHT experiment
(scripts/ab_gat_weight_dtype.py) measured storage rounding UNSAFE
(7 threshold flips / 90 frames); operand-precision rounding is a
different (per-op) perturbation, so it gets its own on-chip measurement
(CPU cannot emulate the MXU pass structure):

  for precision in (highest, high, default):
    * tiled-stack scores on N crowded frames vs the "highest" oracle:
      max/p99 drift, 0.5-threshold flips;
    * full-frame decode: person-set mismatches vs "highest";
    * chained per-frame time of the split frame program.

    python scripts/ab_match_precision.py [--frames 8] [--slots 16]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--k", type=int, nargs=2, default=(6, 24))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.benchutil import chained_frame_us
    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.ops.frame_kernel import (build_frame_program,
                                            pack_frame_serving)
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    S = args.slots
    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models_demo", "widefield",
        "skeleton_matching")
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    if checkpoint_exists(demo):
        mcfg = matcher_config_from_meta(read_meta(demo), mcfg)
        mparams, _, _ = load_checkpoint(
            demo, init_matcher(jax.random.PRNGKey(0), mcfg))
        print("[prec] trained demo matcher loaded")

    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    lparams = init_lifter(jax.random.PRNGKey(1), lcfg)
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    wire = generate_frames(rig_config, rig, args.frames,
                           n_people=(S - 2, S - 1), seed=11, noise=noise,
                           with_gt=False)
    frames = [parse_frame(f, rig_config, max_skeletons=S) for f in wire]
    print(f"[prec] backend={jax.default_backend()} S={S} "
          f"frames={len(frames)}")

    def person_sets(persons, mask):
        return {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
                for p in persons[mask]}

    results = {}
    # Mosaic lowers only DEFAULT and HIGHEST dot precision in-kernel
    # (measured: NotImplementedError "Unsupported dot precision: HIGH"),
    # so the ladder is two rungs
    for prec in ("highest", "default"):
        mcfg_p = dataclasses.replace(mcfg, matmul_precision=prec)
        pipe = PoseEstimationPipeline(
            rig_config, rig, mparams, mcfg_p, lparams, lcfg,
            slot_buckets=(S,), person_buckets=(16,),
            serve_dtype=jnp.bfloat16)
        P = pipe._p_max(S)
        lflat = jax.device_put(pack_frame_serving(
            pipe.lifter_params, len(pipe.used_idx), rig_config.n_joints))
        prog = build_frame_program(pipe, S, P, interpret=False,
                                   matcher="tiled")
        outs = []
        t0 = time.time()
        for fa in frames:
            a = tuple(jnp.asarray(x) for x in
                      (fa.kp[:, :S], fa.valid[:, :S], fa.prob[:, :S],
                       fa.in_view[:, :S], fa.present[:, :S]))
            poses, persons, pmask, scores, q = jax.device_get(
                prog(pipe.matcher_params, lflat, *a))
            outs.append((np.asarray(scores), np.asarray(persons),
                         np.asarray(pmask) > 0.5))
        ca = [jnp.asarray(x) for x in
              (frames[0].kp[:, :S], frames[0].valid[:, :S],
               frames[0].prob[:, :S], frames[0].in_view[:, :S],
               frames[0].present[:, :S])]
        us = chained_frame_us(prog, (pipe.matcher_params, lflat), ca,
                              *args.k)
        results[prec] = (outs, us)
        print(f"[prec] {prec:8s}: compiled+scored in {time.time()-t0:.0f}s,"
              f" frame {us:8.1f} us", flush=True)

    ref_outs, ref_us = results["highest"]
    for prec in ("default",):
        outs, us = results[prec]
        drift, flips, mism = [], 0, 0
        for (rs, rp, rm), (s, p, m) in zip(ref_outs, outs):
            live = rs > 0
            drift.append(np.abs(rs - s)[live])
            flips += int(((rs > 0.5) != (s > 0.5)).sum())
            mism += int(person_sets(rp, rm) != person_sets(p, m))
        d = np.concatenate(drift)
        print(f"[prec] {prec:8s} vs highest: score drift max {d.max():.3e}"
              f" p99 {np.percentile(d, 99):.3e}; threshold flips {flips};"
              f" person-set mismatches {mism}/{len(outs)};"
              f" speedup {ref_us / us:.2f}x")


if __name__ == "__main__":
    main()
