"""Wide-regime error decomposition: where does the 65-90 mm live?

Round-3 VERDICT #8 asks for either a wide-spread quality win or a
documented floor analysis.  Measured facts so far: the prior gate is a
no-op at spread 1.8 (86.98 → 86.68 mm, reports round-4), clean-2D wide
input scores 9.44 mm (RESULTS projected-2D protocol), and mixed-spread
training saturated (64.5 → 64.2 mm over two legs).  This script
decomposes the remaining wide error per PERSON:

  * by the number of cameras whose 2D evidence the decode actually
    assembled for the person (the triangulation-conditioning variable),
  * by the person's distance from the rig centre (the
    training-distribution variable — Panoptic cameras sit ~2.8 m out, so
    spread-1.8 people stand nearly AT the cameras),

for both the learned lifter and the DLT backend.  If the tail
concentrates in ≤2-view / near-camera people, the wide number is a
geometric-visibility floor, not a model gap.

    python scripts/diag_wide_floor.py [--models models_demo/pan_res]
        [--spread 1.8] [--frames 100]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="models_demo/pan_res")
    ap.add_argument("--spread", type=float, default=1.8)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.pose_metrics import (best_permutation,
                                             pose_error_table)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (load_checkpoint,
                                            load_lifter_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.models, "skeleton_matching")), mcfg)
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.models, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    lmeta = read_meta(os.path.join(args.models, "pose_estimator"))
    lparams, lcfg, _ = load_lifter_checkpoint(
        os.path.join(args.models, "pose_estimator"), lcfg)
    prior = lmeta.get("prior", "mean")

    S = int(mmeta.get("n_slots", 6))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    wire = generate_frames(rig_config, rig, args.frames, n_people=(2, 4),
                           seed=args.seed, noise=noise, spread=args.spread)
    used_joints = rig_config.used_joints

    def person_rows(backend):
        pipe = PoseEstimationPipeline(
            rig_config, rig, mparams, mcfg, lparams, lcfg,
            backend=backend, lifter_prior=prior,
            slot_buckets=(S,), person_buckets=(8,))
        rows = []
        for w in wire:
            fa = parse_frame(w, rig_config, max_skeletons=S)
            gt = parse_frame_gt(w, rig_config)
            if gt is None or len(gt.gt3d) == 0:
                continue
            r = pipe.infer_fused(fa)
            if len(r.poses) == 0:
                continue
            tab = pose_error_table(gt.gt3d, gt.gt_valid, r.poses,
                                   used_joints)
            match = best_permutation(tab)
            for g, ri in enumerate(match):
                if ri >= len(r.poses):
                    continue
                n_views = int(sum(1 for s in r.persons[ri] if s >= 0))
                dist = float(np.linalg.norm(gt.gt3d[g].mean(axis=0)[:2]))
                rows.append((tab[g, ri] * 1000.0, n_views, dist))
        return rows

    def buckets(rows):
        out = {}
        by_v = {}
        for err, nv, dist in rows:
            by_v.setdefault(min(nv, 5), []).append(err)
        out["by_views"] = {
            f"{v}v": {"mpjpe_mm": round(float(np.mean(e)), 2),
                      "p90_mm": round(float(np.percentile(e, 90)), 2),
                      "n": len(e)}
            for v, e in sorted(by_v.items())}
        by_d = {}
        for err, nv, dist in rows:
            key = "<1.0m" if dist < 1.0 else ("1-2m" if dist < 2.0
                                              else ">2m")
            by_d.setdefault(key, []).append(err)
        out["by_center_dist"] = {
            k: {"mpjpe_mm": round(float(np.mean(e)), 2), "n": len(e)}
            for k, e in sorted(by_d.items())}
        errs = [r[0] for r in rows]
        out["overall_mm"] = round(float(np.mean(errs)), 2)
        out["n_persons"] = len(errs)
        return out

    report = {"spread": args.spread, "frames": args.frames,
              "models": args.models}
    for backend in ("mlp", "triangulation"):
        rows = person_rows(backend)
        report[backend] = buckets(rows)
        print(f"[floor] {backend}: {json.dumps(report[backend])}",
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
