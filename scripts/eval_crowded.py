"""Crowded-frame (P=16) dense-scene protocol — the RESULTS.md scale row.

Round-2 VERDICT item 5: the reference's eval dies combinatorially past ~7
people (metrics_from_model.py:322-337 exhaustive permutations) and no
measurement existed above P=8 here either.  This script measures the
10-16-person regime end-to-end on synthetic dense scenes with the trained
demo matcher at the (slots=16, persons=16) bucket:

  * matcher clustering quality (ARI/H/C/V, run_sm_metrics),
  * full-pipeline pose metrics raw AND GT-deduped (Hungarian assignment),
  * fused-frame latency at the P=16 bucket (value-synced; meaningful on
    TPU — pass --cpu for a correctness-only run).

Usage:
  python scripts/eval_crowded.py [--cpu] [--n-frames 60]
      [--modelsdir models_demo] [--lifter models_demo/pan_irls_bf16]
      [--out reports/crowded_p16.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF_TM = "/root/reference/tm_panoptic.pickle"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-frames", type=int, default=60)
    ap.add_argument("--modelsdir", default="models_demo")
    ap.add_argument("--lifter", default=None,
                    help="lifter checkpoint dir for the MLP backend rows "
                    "(e.g. models_demo/pan_irls_bf16); triangulation rows "
                    "always run")
    ap.add_argument("--people", default="10,16")
    ap.add_argument("--out", default="reports/crowded_p16.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.cli import load_models
    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
    from mpe3d_tpu.eval.runners import run_pose_metrics, run_sm_metrics
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import load_lifter_checkpoint

    rig = rig_from_files(PANOPTIC, REF_TM)
    p_lo, p_hi = (int(x) for x in args.people.split(","))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.05, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, rig, args.n_frames,
                             n_people=(p_lo, p_hi), seed=616, noise=noise)

    mparams, mcfg, _lp, lcfg_default, _pr = load_models(args.modelsdir,
                                                        PANOPTIC)
    backends = [("triangulation", None, None, "median")]
    if args.lifter:
        lp, lcfg, prior = load_lifter_checkpoint(
            os.path.join(args.lifter, "pose_estimator"), lcfg_default)
        backends.append(("mlp", lp, lcfg, prior))

    report = {"protocol": {"n_frames": args.n_frames,
                           "people": [p_lo, p_hi], "slots": 16,
                           "backend": jax.default_backend(),
                           "noise": "sigma1.5 drop0.05 spur0.05 camdrop0.05"},
              "rows": []}
    for name, lp, lcfg, prior in backends:
        pipe = PoseEstimationPipeline(
            PANOPTIC, rig, mparams, mcfg, lp, lcfg, backend=name,
            slot_buckets=(16,), person_buckets=(16,), decode_top_k=0,
            lifter_prior=prior if lp is not None else "mean")
        sm = run_sm_metrics(frames, PANOPTIC, pipe, datastep=1,
                            max_skeletons=16)
        raw = run_pose_metrics(frames, PANOPTIC, pipe, datastep=1,
                               max_skeletons=16, fused=True)
        dedup = run_pose_metrics(frames, PANOPTIC, pipe, datastep=1,
                                 max_skeletons=16, fused=True,
                                 dedup_gt=True)
        # on-device fused-frame time at the (16,16) bucket: chained
        # differential (benchutil methodology — infer_fused in a wall-
        # clock loop would measure one ~25 ms relay round trip per
        # iteration, not the frame; review finding r3)
        import jax.numpy as jnp

        from mpe3d_tpu.benchutil import chained_frame_us

        fa = parse_frame(frames[0], PANOPTIC, max_skeletons=16)
        p_max = pipe._p_max(16)
        core = pipe._fused_fn(16, p_max)
        # the S=16 bucket can now resolve to the whole-frame kernel
        # (round 4: the split variant), whose program takes the
        # frame-packed serving list instead of the layer tree
        lp_lat = (pipe.lifter_params_frame
                  if pipe._frame_kernel_on(16, p_max)
                  else pipe.lifter_params_serve)
        chain_args = [jnp.asarray(fa.kp), jnp.asarray(fa.valid),
                      jnp.asarray(fa.prob), jnp.asarray(fa.in_view),
                      jnp.asarray(fa.present)]
        k1, k2 = (2, 6) if jax.default_backend() != "tpu" else (20, 80)
        lat_us = chained_frame_us(
            core, (pipe.matcher_params, lp_lat),
            chain_args, k1, k2)
        row = {"backend": name,
               "ari": round(sm["ari"], 4),
               "v_measure": round(sm["v_measure"], 4),
               "raw": {k: (round(raw[k], 3) if isinstance(raw[k], float)
                           else raw[k])
                       for k in ("mpjpe_mm", "mAP", "mR", "n_gt", "n_poses")},
               "dedup": {k: (round(dedup[k], 3)
                             if isinstance(dedup[k], float) else dedup[k])
                         for k in ("mpjpe_mm", "mAP", "mR", "n_gt",
                                   "n_poses")},
               "ondevice_frame_us_p16": round(lat_us, 1)}
        report["rows"].append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
