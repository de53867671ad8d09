"""Measure the geometric decode rerank's effect on dense-scene matching.

Runs run_sm_metrics over dense synthetic frames (spread 1.2 — constant
person overlap, the regime where GAT scores saturate) for a lambda sweep,
at 2/3/5 views.  Usage:

    python scripts/georank_experiment.py --models models_demo \
        [--lams 0,0.2,0.4] [--scale 0.3] [--frames 120] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="models_demo")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--datastep", type=int, default=2)
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--spread", type=float, default=1.2)
    ap.add_argument("--lams", default="0,0.2,0.4")
    ap.add_argument("--scale", type=float, default=0.3)
    ap.add_argument("--rescues", default="0",
                    help="comma list of geo_rescue low-thresholds (0 = off)")
    ap.add_argument("--rescue-dist", type=float, default=0.05)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames, synthetic_ring_rig
    from mpe3d_tpu.eval.runners import run_sm_metrics
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import load_checkpoint

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(rig_config, rig, args.frames, n_people=(2, 4),
                             seed=args.seed, noise=noise, spread=args.spread)

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    from mpe3d_tpu.train.checkpoint import (matcher_config_from_meta,
                                            read_meta)
    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.models, "skeleton_matching")), mcfg)
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.models, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    S = int(mmeta.get("n_slots", 6))

    subsets = {"2v": ("trackera", "trackerb"),
               "3v": ("trackera", "trackerb", "trackerc"),
               "5v": rig_config.camera_names}
    report = {"spread": args.spread, "scale": args.scale,
              "rescue_dist": args.rescue_dist}
    for lam in [float(x) for x in args.lams.split(",")]:
        for rescue in [float(x) for x in args.rescues.split(",")]:
            pipe = PoseEstimationPipeline(
                rig_config, rig, mparams, mcfg, slot_buckets=(S,),
                person_buckets=(8,), backend="triangulation",
                decode_on_device=True, decode_top_k=0,   # exact: no top-K cap
                geo_rerank=lam, geo_scale=args.scale,
                geo_rescue=rescue, geo_rescue_dist=args.rescue_dist)
            row = {}
            for tag, cams in subsets.items():
                restricted = [{c: f[c] for c in cams if c in f}
                              for f in frames]
                r = run_sm_metrics(restricted, rig_config, pipe,
                                   datastep=args.datastep)
                row[tag] = {k: round(float(v), 4) for k, v in r.items()
                            if isinstance(v, float)}
            report[f"lam_{lam}_rescue_{rescue}"] = row
            print(f"lam={lam} rescue={rescue}",
                  {t: row[t]["ari"] for t in row})

    out = args.out or "runs/georank_experiment.json"
    d = os.path.dirname(out)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
