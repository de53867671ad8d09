"""Can a runtime prior-quality gate recover the OOD prior collapse?

Motivation (RESULTS.md, chain9/chain10 rows): the residual-prior lifter
follows its triangulated prior; at extreme spread (people near the
cameras, spread 2.1) the DLT prior itself collapses (329 mm) and the
net degrades with it (116-119 mm) — training-coverage knobs do NOT fix
it (the wide24 A/B).  But the prior-dropout-trained no-prior fallback
is in-distribution: if we can *detect* a bad prior at inference and
zero it (exactly the `apply_prior_dropout` input pattern,
mpe3d_tpu/lifting/pack.py:143), the net should fall back gracefully.

This script measures, on oracle-packed single-person frames across
spreads:
  * per-joint prior 3D error vs per-joint prior reprojection residual
    (the detectable signal — the same quantity as the serving quality
    column, pipeline.pose_quality_px, applied to the PRIOR);
  * MPJPE of the unmodified input vs residual-gated priors (several
    thresholds) vs the 3D-error ORACLE gate (the ceiling of any gating
    scheme) vs all-priors-zeroed (the floor/fallback).

If oracle-gate ≪ plain at spread 2.1 and a residual gate tracks it,
the gate is worth wiring into the pipeline (opt-in knob).

Usage:
  python scripts/diag_prior_gate.py --lifter runs/pan_res --cpu \
      --spreads 1.2 1.8 2.1 --n 200
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lifter", required=True)
    ap.add_argument("--env", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--spreads", type=float, nargs="+",
                    default=[1.2, 1.8, 2.1])
    ap.add_argument("--min-cam-dist", type=float, default=1.2)
    ap.add_argument("--gates-px", type=float, nargs="+",
                    default=[3.0, 5.0, 8.0, 12.0, 20.0, 40.0])
    ap.add_argument("--oracle-mm", type=float, nargs="+",
                    default=[30.0, 60.0, 100.0])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU to training)")
    ap.add_argument("--out", default="reports/prior_gate_diag.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mpe3d_tpu.config import LifterConfig, get_rig
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.geometry.camera import project_points
    from mpe3d_tpu.lifting.pack import apply_prior_dropout
    from mpe3d_tpu.models.mlp import apply_lifter, init_lifter
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            load_checkpoint, read_meta)
    from mpe3d_tpu.train.lifter_data import (biggest_skeleton_obs,
                                             build_lifter_dataset)

    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    used_idx = rig_config.used_camera_indices()
    used_rig = rig.select(np.asarray(used_idx))
    Cu, J = len(used_idx), rig_config.n_joints
    uj = np.asarray(rig_config.used_joints)

    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    lmeta = read_meta(os.path.join(args.lifter, "pose_estimator"))
    lcfg = lifter_config_from_meta(lmeta, lcfg)
    lparams, _, _ = load_checkpoint(
        os.path.join(args.lifter, "pose_estimator"),
        init_lifter(jax.random.PRNGKey(1), lcfg))
    prior_kind = lmeta.get("prior", "mean")
    fwd = jax.jit(lambda x: apply_lifter(lparams, x, lcfg))

    def mpjpe(pred, gt):
        err = np.linalg.norm(pred[:, uj] - gt[:, uj], axis=-1)
        return float(err.mean() * 1000.0)

    report = {"lifter": args.lifter, "prior": prior_kind, "n": args.n,
              "spreads": {}}
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.0, camera_dropout=0.0)

    for spread in args.spreads:
        frames = generate_frames(rig_config, rig, args.n, n_people=(1, 1),
                                 seed=args.seed, noise=noise, spread=spread,
                                 min_cam_dist=args.min_cam_dist)
        net, _err = build_lifter_dataset(frames, rig_config, rig,
                                         augment=False, prior=prior_kind)
        gts = np.stack([parse_frame_gt(fr, rig_config).gt3d[0]
                        for fr in frames])
        blocks = net.reshape(-1, Cu, J, 14)
        N = len(blocks)
        prior3d = blocks[:, 0, :, 11:14] * 10.0            # [N, J, 3] m
        pok = blocks[:, 0, :, 10] > 0                      # [N, J]

        # observations for the residual: same selection as the packer
        # (biggest skeleton on used cameras, require_valid semantics)
        kps, vals, obss = [], [], []
        for fr in frames:
            fa = parse_frame(fr, rig_config)
            kp, v, _p, o = biggest_skeleton_obs(fa, used_idx)
            kps.append(kp); vals.append(v); obss.append(o)
        kp = np.stack(kps)                                  # [N, Cu, J, 2]
        inc = np.stack(obss) & (np.stack(vals) >= 1.0)      # [N, Cu, J]

        # per-joint prior reprojection residual (px) + view count
        pix = np.asarray(project_points(
            jnp.asarray(prior3d)[:, None], used_rig.T_wc[None, :, None],
            used_rig.K[None, :, None], used_rig.dist[None, :, None],
            min_depth=1e-4))                                # [N, Cu, J, 2]
        d = np.linalg.norm(np.clip(kp - pix, -1e5, 1e5), axis=-1)
        mf = inc.astype(np.float32)
        nv = mf.sum(axis=1)                                 # [N, J] views
        # masked MEDIAN over cameras (matches pack_lifter_input's gate:
        # one confident outlier detection must not fire the gate on a
        # good prior — measured 16.55 vs 13.55 mm at outlier_rate 0.07
        # with the old mean statistic)
        ds = np.sort(np.where(inc, d, np.inf), axis=1)      # [N, Cu, J]
        idx = np.maximum(np.ceil(nv / 2.0) - 1, 0).astype(np.int64)
        resid = np.take_along_axis(ds, idx[:, None, :], axis=1)[:, 0]
        err3d = np.linalg.norm(prior3d - gts, axis=-1)      # [N, J] m

        # detectability: how well does the residual rank true prior error?
        sel = pok & (nv > 0)
        corr = float(np.corrcoef(resid[sel], err3d[sel])[0, 1]) \
            if sel.sum() > 3 else float("nan")

        def run(tag, joint_keep):
            """joint_keep [N, J] True = keep the prior fields."""
            x = np.asarray(apply_prior_dropout(
                jnp.asarray(net), jnp.asarray(joint_keep, np.float32), J))
            pred = np.asarray(fwd(jnp.asarray(x))).reshape(N, J, 3) * 10.0
            row = {"mpjpe_mm": mpjpe(pred, gts),
                   "gated_frac": float((~joint_keep & pok)[:, uj].mean())}
            rows[tag] = row
            print(f"  {tag:22s} MPJPE {row['mpjpe_mm']:7.1f} mm "
                  f"(gated {row['gated_frac']:.2f})")
            return row

        rows = {}
        print(f"spread {spread} (prior-ok {float(pok[:, uj].mean()):.2f}, "
              f"resid/err3d corr {corr:.2f}):")
        run("plain", np.ones((N, J), bool))
        run("no_prior", np.zeros((N, J), bool))
        for t in args.gates_px:
            run(f"resid_gate_{t:g}px", ~(pok & (resid > t)))
        for e in args.oracle_mm:
            run(f"oracle_{e:g}mm", ~(pok & (err3d > e / 1000.0)))
        report["spreads"][str(spread)] = {
            "prior_ok_frac": float(pok[:, uj].mean()),
            "resid_err3d_corr": corr, "rows": rows}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
