"""One-command weight-level parity harness for the reference's released
artifacts (round-3 VERDICT #6).

The reference publishes its trained checkpoints and test recordings via
Dropbox (reference README.md:68,122: ``skeleton_matching.tch`` +
``.prms``, ``pose_estimator.pytorch``, test JSONs) — unreachable from
this environment (no egress).  This script is the standing harness so
that THE DAY those files appear on disk, full weight-level parity is one
command:

  1. **strict import** — ``convert.torch_import`` reads both checkpoints
     (every tensor consumed, shapes validated);
  2. **golden forward parity vs the torch originals, in-process** — the
     lifter forward runs through the reference's own
     ``utils/mlp.py::PoseEstimatorMLP`` (imported from /root/reference)
     with ``load_state_dict(strict=True)``; the matcher through the
     no-DGL GAT2 replica (convert/gat2_replica.py, golden-tested against
     our jax model in tests/test_golden_reference.py) — max |Δ| of both
     forwards vs our jax models is reported and gated;
  3. **full metrics** — when test JSONs + a calibration pickle are
     given, runs metrics-from-model / sm-metrics through eval/runners.py
     with the imported weights, printing the tables to set against the
     reference's published numbers (README.md:131-150).

``--selfcheck`` exercises the whole harness today: it writes synthetic
stand-in checkpoints in the reference's exact wire formats via
``convert.torch_export``, then runs stages 1-2 on them and asserts the
gates (tests/test_weight_parity_harness.py runs this in CI).

  python scripts/reference_weight_parity.py \
      --matcher-tch skeleton_matching.tch \
      --matcher-prms skeleton_matching.prms \
      --lifter pose_estimator.pytorch \
      [--test-json test.json ...] [--calib tm_panoptic.pickle] \
      [--env PANOPTIC]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REF = "/root/reference"
FWD_TOL = 2e-4      # fp32 jax-vs-torch forward drift gate (matmul order)


def _ref_mlp_module():
    """Import the reference's own PoseEstimatorMLP (utils/mlp.py)."""
    p = os.path.join(REF, "utils")
    if p not in sys.path:
        sys.path.insert(0, p)
    try:
        from mlp import PoseEstimatorMLP
        return PoseEstimatorMLP
    finally:
        sys.path.remove(p)


def lifter_parity(lifter_path: str, n_probe: int = 64):
    """Stages 1-2 for the lifter.  Returns (params, cfg, max_abs_diff)."""
    import jax.numpy as jnp
    import torch

    from mpe3d_tpu.convert.torch_import import load_reference_lifter
    from mpe3d_tpu.models.mlp import apply_lifter

    params, cfg = load_reference_lifter(lifter_path)
    n_params = sum(int(np.prod(l["w"].shape)) + len(l["b"])
                   for l in params["layers"])
    print(f"[lifter] strict import OK: in={cfg.in_dim} out={cfg.out_dim} "
          f"widths={cfg.widths} ({n_params / 1e6:.1f} M params)")

    # torch original: the reference's own class when the architecture is
    # its hard-coded ladder; otherwise a Sequential with the imported
    # widths (stand-in checkpoints may be smaller)
    saved = torch.load(lifter_path, map_location="cpu", weights_only=False)
    state = saved.get("model_state_dict", saved)
    ref_cls = None
    if tuple(cfg.widths) == (3072, 3072, 2048, 2048, 1024, 1024, 1024,
                             1024):
        try:
            ref_cls = _ref_mlp_module()
        except Exception as e:  # noqa: BLE001 — reference tree absent
            print(f"[lifter] reference utils/mlp.py unavailable ({e}); "
                  f"using a width-matched Sequential")
    if ref_cls is not None:
        model = ref_cls(cfg.in_dim, cfg.out_dim)
        # the reference saves bare Sequential keys ('layers.1.weight');
        # tolerate both prefixed and bare
        try:
            model.load_state_dict(state, strict=True)
        except RuntimeError:
            model.load_state_dict(
                {f"layers.{k}" if not k.startswith("layers.") else k: v
                 for k, v in state.items()}, strict=True)
        print("[lifter] reference PoseEstimatorMLP load_state_dict"
              "(strict=True) OK")
    else:
        from torch import nn
        mods, d = [nn.Flatten()], cfg.in_dim
        for w in cfg.widths:
            mods += [nn.Linear(d, w), nn.LeakyReLU(0.1)]
            d = w
        mods.append(nn.Linear(d, cfg.out_dim))
        model = nn.Sequential(*mods)
        bare = {k.split("layers.")[-1]: v for k, v in state.items()}
        model.load_state_dict(bare, strict=True)

    rng = np.random.default_rng(0)
    x = rng.normal(scale=0.3, size=(n_probe, cfg.in_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref_y = model(torch.from_numpy(x)).numpy()
    got_y = np.asarray(apply_lifter(params, jnp.asarray(x), cfg))
    d = float(np.abs(got_y - ref_y).max())
    rel = d / max(float(np.abs(ref_y).max()), 1e-9)
    print(f"[lifter] forward parity vs torch original: max|Δ| {d:.3e} "
          f"(rel {rel:.3e}) over {n_probe} probes")
    return params, cfg, d


def matcher_parity(tch_path: str, prms_path: str, slots: int = 2):
    """Stages 1-2 for the matcher.  Returns (params, cfg, max_abs_diff)."""
    import jax.numpy as jnp
    import torch

    from mpe3d_tpu.convert.gat2_replica import (build_gat2_replica,
                                                build_real_graph)
    from mpe3d_tpu.convert.torch_import import load_reference_matcher
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.models.gat import TopologyArrays, apply_matcher

    params, cfg = load_reference_matcher(tch_path, prms_path)
    print(f"[matcher] strict import OK: in={cfg.in_dim} "
          f"hidden={cfg.hidden} heads={cfg.heads} "
          f"residual={cfg.residual}")

    model = build_gat2_replica(cfg.in_dim, cfg.hidden, cfg.heads,
                               alpha=cfg.alpha, residual=cfg.residual,
                               hidden_slope=cfg.hidden_slope)
    state = torch.load(tch_path, map_location="cpu", weights_only=False)
    model.load_state_dict(state, strict=True)
    print("[matcher] GAT2 replica load_state_dict(strict=True) OK")

    # a masked alt-3 scene (3 cameras x slots, one absent head)
    topo = build_topology(3, slots)
    head_mask = np.ones(topo.n_heads, bool)
    head_mask[slots] = False
    rng = np.random.default_rng(1)
    feats_h = rng.normal(size=(topo.n_heads, cfg.in_dim)) \
        .astype(np.float32)
    feats_h[~head_mask] = 0.0
    feats_h[:, 0], feats_h[:, 1] = head_mask, 0.0
    feats_e = np.zeros((topo.n_pairs, cfg.in_dim), np.float32)
    feats_e[:, 1] = 1.0
    pair_mask = (head_mask[topo.e1] & head_mask[topo.e2]) \
        .astype(np.float32)
    real_heads, src, dst, real_pairs, H = build_real_graph(
        topo, head_mask, pair_mask)
    x = np.concatenate([feats_h[real_heads], feats_e[:len(real_pairs)]])
    with torch.no_grad():
        ref_scores = model(torch.from_numpy(x), src, dst).numpy()
    got = np.asarray(apply_matcher(
        params, jnp.asarray(feats_h), jnp.asarray(feats_e),
        TopologyArrays.from_topology(topo), jnp.asarray(pair_mask), cfg))
    d = float(np.abs(got[real_pairs] - ref_scores[H:]).max())
    print(f"[matcher] forward parity vs torch replica: max|Δ| {d:.3e} "
          f"over {len(real_pairs)} scored pairs")
    return params, cfg, d


def run_metrics(args, mparams, mcfg, lparams, lcfg):
    """Stage 3: full eval through the repo's runners on the given test
    JSONs (prints the tables to compare with the reference's published
    rows)."""
    from mpe3d_tpu.config import get_rig
    from mpe3d_tpu.data.frames import load_frames
    from mpe3d_tpu.eval.runners import run_pose_metrics, run_sm_metrics
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config = get_rig(args.env)
    rig = rig_from_files(rig_config, args.calib)
    pipe = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                  lparams, lcfg)
    for path in args.test_json:
        frames = load_frames(path)
        print(f"\n[metrics] {path} ({len(frames)} frames)")
        pm = run_pose_metrics(frames, rig_config, pipe, fused=True)
        print(f"  metrics_from_model: {pm}")
        sm = run_sm_metrics(frames, rig_config, pipe)
        print(f"  sm_metrics:         {sm}")


def selfcheck() -> int:
    """Write stand-in checkpoints via torch_export, run stages 1-2."""
    import jax

    from mpe3d_tpu.config import LifterConfig, MatcherConfig
    from mpe3d_tpu.convert.torch_export import (export_reference_lifter,
                                                export_reference_matcher)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter

    mcfg = MatcherConfig(in_dim=24, hidden=(8, 6), heads=(2, 2))
    lcfg = LifterConfig(in_dim=120, out_dim=18, widths=(64, 48))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    with tempfile.TemporaryDirectory() as td:
        export_reference_matcher(mp, mcfg, os.path.join(td, "m.tch"),
                                 os.path.join(td, "m.prms"))
        export_reference_lifter(lp, os.path.join(td, "l.pytorch"),
                                lcfg)
        _, _, dl = lifter_parity(os.path.join(td, "l.pytorch"))
        _, _, dm = matcher_parity(os.path.join(td, "m.tch"),
                                  os.path.join(td, "m.prms"))
    ok = dl < FWD_TOL and dm < FWD_TOL
    print(f"[selfcheck] {'OK' if ok else 'FAIL'} "
          f"(lifter {dl:.2e}, matcher {dm:.2e}, gate {FWD_TOL:g})")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matcher-tch")
    ap.add_argument("--matcher-prms")
    ap.add_argument("--lifter")
    ap.add_argument("--test-json", nargs="*", default=[])
    ap.add_argument("--calib")
    ap.add_argument("--env", default="PANOPTIC")
    ap.add_argument("--selfcheck", action="store_true",
                    help="run on synthetic stand-in checkpoints written "
                    "by convert.torch_export (no artifacts needed)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: force CPU — "
                    "the fp32 forward-parity oracle must not see the "
                    "MXU's bf16 operand rounding; measured 5e-4 drift "
                    "on-chip vs 4e-7 on CPU)")
    args = ap.parse_args()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.selfcheck:
        sys.exit(selfcheck())

    if not (args.matcher_tch and args.matcher_prms and args.lifter):
        ap.error("--matcher-tch/--matcher-prms/--lifter required "
                 "(or --selfcheck)")
    lp, lc, dl = lifter_parity(args.lifter)
    mp, mc, dm = matcher_parity(args.matcher_tch, args.matcher_prms)
    ok = dl < FWD_TOL and dm < FWD_TOL
    print(f"\n[parity] forward gates {'OK' if ok else 'FAIL'} "
          f"(lifter {dl:.2e}, matcher {dm:.2e}, gate {FWD_TOL:g})")
    if args.test_json and args.calib:
        run_metrics(args, mp, mc, lp, lc)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
