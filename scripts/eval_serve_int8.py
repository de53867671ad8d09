"""Measure the accuracy cost of int8 weight-only lifter serving.

Runs the full pipeline (fused path) twice on the same seeded synthetic
frames — serve_dtype off (fp32 weights) vs serve_dtype="int8" — and
reports the MPJPE / mAP / mR deltas.  The int8 math is backend-exact
(bf16 operands, fp32 accumulation, post-scale; ops/quant_matmul.py), so
a CPU run measures the same numbers the chip will serve.

Usage:
    python scripts/eval_serve_int8.py --models runs/eval_res --frames 60
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--spread", type=float, default=1.2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mpe3d_jax_cache")
    import jax

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.runners import run_pose_metrics
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(rig_config, rig, args.frames, n_people=(2, 4),
                             seed=args.seed, noise=noise, spread=args.spread)

    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.models, "skeleton_matching")),
        MatcherConfig(in_dim=rig_config.matcher_feature_dim))
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.models, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    lmeta = read_meta(os.path.join(args.models, "pose_estimator"))
    lcfg = lifter_config_from_meta(
        lmeta, LifterConfig(in_dim=rig_config.lifter_input_dim,
                            out_dim=rig_config.n_joints * 3))
    lparams, _, _ = load_checkpoint(
        os.path.join(args.models, "pose_estimator"),
        init_lifter(jax.random.PRNGKey(1), lcfg))

    S = int(mmeta.get("n_slots", 6))
    report = {"models": args.models, "frames": args.frames,
              "seed": args.seed, "spread": args.spread,
              "prior": lmeta.get("prior", "mean"),
              "residual_prior": bool(lcfg.residual_prior)}
    kw = dict(slot_buckets=(S,), person_buckets=(8,),
              lifter_prior=lmeta.get("prior", "mean"))
    for tag, sd in (("fp32", False), ("int8", "int8")):
        pipe = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                      lparams, lcfg, serve_dtype=sd, **kw)
        r = run_pose_metrics(frames, rig_config, pipe, datastep=2,
                             fused=True)
        r.pop("ap_per_threshold", None)
        report[tag] = r
        print(tag, {k: round(v, 3) for k, v in r.items()
                    if isinstance(v, float)})

    d = {k: report["int8"][k] - report["fp32"][k]
         for k in ("mpjpe_mm", "mAP", "mR") if k in report["fp32"]}
    report["delta_int8_minus_fp32"] = d
    print("delta (int8 - fp32):", {k: round(v, 3) for k, v in d.items()})

    out = args.out or os.path.join(args.models, "serve_int8_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
