"""Is the prior-quality bound movable?  Triangulator shoot-out.

RESULTS.md locates the extreme-spread (2.1) and wide (1.8) MPJPE
ceilings in the triangulated PRIOR itself: the residual lifter degrades
with its input prior, and training-coverage knobs don't help (the wide24
A/B).  The reference's aggregations are camera-PAIR DLT means/medians
(utils/pose_estimator_utils.py:52-75) — weak exactly where few views
survive (2-3 cameras give 1-3 pairs) and under heavy-tailed detector
error (one outlier camera poisons every pair it joins).

This script measures, on oracle-packed single-person frames, the prior
3D MPJPE of each triangulator across spreads × noise regimes:

  * mean      — all-pair mean (the reference's lifter prior)
  * median    — coordinate-median filtered pair mean (the classical
                backend / the shipping residual prior)
  * irls      — joint all-view Huber-IRLS DLT (geometry/triangulate.py
                triangulate_irls, no reference counterpart)

If irls ≪ median at spread 1.8-2.1 / under outliers, it is worth a
`--prior irls` lifter variant (training leg) and/or a backend option.

Usage:
  python scripts/diag_triangulators.py --cpu --n 200
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--spreads", type=float, nargs="+",
                    default=[1.2, 1.8, 2.1])
    ap.add_argument("--min-cam-dist", type=float, default=1.2)
    ap.add_argument("--irls-iters", type=int, default=5)
    ap.add_argument("--irls-delta-px", type=float, default=4.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="reports/triangulator_diag.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    import jax.numpy as jnp

    from mpe3d_tpu.config import get_rig
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.geometry.triangulate import (triangulate_irls,
                                                triangulate_mean,
                                                triangulate_median_filtered)
    from mpe3d_tpu.train.lifter_data import biggest_skeleton_obs

    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    used_idx = rig_config.used_camera_indices()
    used_rig = rig.select(np.asarray(used_idx))
    uj = np.asarray(rig_config.used_joints)

    tri_fns = {
        "mean": jax.jit(lambda p, v: triangulate_mean(p, v, used_rig)),
        "median": jax.jit(
            lambda p, v: triangulate_median_filtered(p, v, used_rig)),
        "irls": jax.jit(lambda p, v: triangulate_irls(
            p, v, used_rig, n_iters=args.irls_iters,
            delta_px=args.irls_delta_px)),
    }

    # noise regimes: the quality-table regime, the heavy-tailed regime,
    # and the few-view regime (only 2 random cameras keep the joint)
    regimes = {
        "clean_s1.5": SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                                 spurious_rate=0.0, camera_dropout=0.0),
        "outlier7": SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                               spurious_rate=0.0, camera_dropout=0.0,
                               outlier_rate=0.07),
        "camdrop40": SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                                spurious_rate=0.0, camera_dropout=0.4),
    }

    report = {"env": args.env, "n": args.n, "irls_iters": args.irls_iters,
              "irls_delta_px": args.irls_delta_px, "regimes": {}}
    for rname, noise in regimes.items():
        report["regimes"][rname] = {}
        for spread in args.spreads:
            frames = generate_frames(rig_config, rig, args.n,
                                     n_people=(1, 1), seed=args.seed,
                                     noise=noise, spread=spread,
                                     min_cam_dist=args.min_cam_dist)
            gts, kps, incs = [], [], []
            for fr in frames:
                gtf = parse_frame_gt(fr, rig_config)
                if gtf is None or len(gtf.gt3d) == 0:
                    continue            # person dropped from every camera
                fa = parse_frame(fr, rig_config)
                kp, v, _p, o = biggest_skeleton_obs(fa, used_idx)
                kps.append(kp)
                incs.append(o & (v >= 1.0))
                gts.append(gtf.gt3d[0])
            kp = jnp.asarray(np.stack(kps))                  # [N, Cu, J, 2]
            inc = jnp.asarray(np.stack(incs).astype(np.float32))
            gt = np.stack(gts)                               # [N, J, 3]

            row = {}
            for tname, fn in tri_fns.items():
                xyz, ok = jax.vmap(fn)(kp, inc)
                xyz, ok = np.asarray(xyz), np.asarray(ok)
                sel = ok[:, uj]
                err = np.linalg.norm(xyz[:, uj] - gt[:, uj], axis=-1)
                row[tname] = {
                    "mpjpe_mm": float(err[sel].mean() * 1000.0),
                    "median_mm": float(np.median(err[sel]) * 1000.0),
                    "p95_mm": float(np.percentile(err[sel], 95) * 1000.0),
                    "ok_frac": float(sel.mean()),
                }
            report["regimes"][rname][str(spread)] = row
            print(f"{rname:12s} spread {spread}: " + "  ".join(
                f"{t} {row[t]['mpjpe_mm']:7.1f} mm (p95 "
                f"{row[t]['p95_mm']:7.1f})" for t in tri_fns))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
