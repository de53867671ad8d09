"""On-chip A/B: whole-frame pallas kernel vs the fused XLA program.

Builds the bench.py serving configuration (PANOPTIC, trained demo matcher
when present, 29 M-param lifter, S=4/P=8 buckets, bf16 serving), verifies
the kernel's outputs against the XLA fused path on real frames, then
measures both with the chained-differential methodology (benchutil).

    python scripts/bench_frame_kernel.py [--dtype bf16|int8] [--verify-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="in-kernel ledger: chain-time the gat/decode/"
                         "pack/full truncation variants; deltas isolate "
                         "each phase (every variant still issues+awaits "
                         "the weight DMAs)")
    ap.add_argument("--k", type=int, nargs=2, default=(20, 120))
    ap.add_argument("--rig", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--demo", default=None,
                    help="serve a trained demo directory (matcher + "
                         "lifter + prior meta), e.g. "
                         "models_demo/pan_irls_bf16")
    ap.add_argument("--gate", type=float, default=None,
                    help="prior_gate_px for the pipeline (recommended 8 "
                         "with prior-dropout-trained demo checkpoints)")
    ap.add_argument("--slots", type=int, default=4,
                    help="slot bucket to A/B (4 = the small-bucket "
                         "default; 10/16 = the crowded buckets)")
    ap.add_argument("--people", type=int, nargs=2, default=None,
                    help="people per generated frame (default scales "
                         "with --slots)")
    ap.add_argument("--variant", default="auto",
                    choices=["auto", "full", "split"],
                    help="kernel form: 'full' = GAT in-kernel, 'split' = "
                         "tiled-GAT + decode/pack/lift kernel; 'auto' = "
                         "what the pipeline probe resolves for the bucket")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.ops.frame_kernel import (build_frame_program,
                                            frame_kernel_supported,
                                            pack_frame_serving)
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    from mpe3d_tpu.config import get_rig
    rig_config = get_rig(args.rig)
    rig = synthetic_ring_rig(rig_config)
    if args.demo:
        # trained demo checkpoints pair with the reference calibration
        tm = ("/root/reference/tm_arp.pickle" if args.rig == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
        if os.path.exists(tm):
            from mpe3d_tpu.geometry import rig_from_files
            rig = rig_from_files(rig_config, tm)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models_demo", "widefield",
        "skeleton_matching")
    try:
        from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                load_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)
        if checkpoint_exists(demo):
            mcfg = matcher_config_from_meta(read_meta(demo), mcfg)
            mparams, _, _ = load_checkpoint(
                demo, init_matcher(jax.random.PRNGKey(0), mcfg))
            print("[ab] trained demo matcher loaded")
    except Exception as e:  # noqa: BLE001
        print(f"[ab] matcher load skipped: {e}")

    serve_dtype = jnp.bfloat16 if args.dtype == "bf16" else "int8"
    lparams_init = init_lifter(jax.random.PRNGKey(1), lcfg)
    lifter_prior = "mean"
    if args.demo:
        import json

        from mpe3d_tpu.train.checkpoint import load_checkpoint, read_meta
        lroot = os.path.join(args.demo, "pose_estimator")
        with open(lroot + ".json") as f:
            meta = json.load(f)
        from mpe3d_tpu.config import LifterConfig as _LC
        lc = dict(meta.get("lifter_config", {}))
        lc["widths"] = tuple(lc.get("widths", lcfg.widths))
        lcfg = _LC(**lc)
        lparams_init, _, _ = load_checkpoint(
            lroot, init_lifter(jax.random.PRNGKey(1), lcfg))
        lifter_prior = meta.get("prior", "mean")
        mroot = os.path.join(args.demo, "skeleton_matching")
        try:
            from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                    matcher_config_from_meta)
            if checkpoint_exists(mroot):
                mcfg = matcher_config_from_meta(read_meta(mroot), mcfg)
                mparams, _, _ = load_checkpoint(
                    mroot, init_matcher(jax.random.PRNGKey(0), mcfg))
        except Exception as e:  # noqa: BLE001
            print(f"[ab] demo matcher load skipped: {e}")
        print(f"[ab] demo={args.demo} prior={lifter_prior} "
              f"residual={lcfg.residual_prior}")
    S = args.slots
    pmax_by_s = {4: 8, 10: 16, 16: 16}
    P = pmax_by_s.get(S, min(16, S))
    pipe = PoseEstimationPipeline(
        rig_config, rig, mparams, mcfg, lparams_init, lcfg,
        slot_buckets=(S,), person_buckets=(P,), serve_dtype=serve_dtype,
        lifter_prior=lifter_prior, prior_gate_px=args.gate)
    assert frame_kernel_supported(pipe), "config not kernel-supported"

    variant = args.variant
    if variant == "auto":
        v = pipe._frame_kernel_on(S, pipe._p_max(S)) \
            if jax.default_backend() == "tpu" else "full"
        variant = v or "full"
    matcher = "tiled" if variant == "split" else "inkernel"
    print(f"[ab] backend={jax.default_backend()} dtype={args.dtype} "
          f"S={S}/P={pipe._p_max(S)} variant={variant}")
    P = pipe._p_max(S)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               rig_config.n_joints)
    lflat = jax.device_put(lflat)

    t0 = time.time()
    prog = build_frame_program(pipe, S, P, interpret=False,
                               matcher=matcher)
    # the explicit XLA variant: _fused_fn would auto-resolve to the kernel
    # on TPU now that the pipeline wiring is in
    xla = pipe._fused_impl(S, P, pipe._geo_key, False)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    ppl = tuple(args.people) if args.people else (
        (2, 3) if S <= 4 else (S - 2, S - 1))
    wire = generate_frames(rig_config, rig, 8, n_people=ppl, seed=11,
                           noise=noise, with_gt=False)
    frames = [parse_frame(f, rig_config, max_skeletons=S) for f in wire]

    def fargs(fa):
        return tuple(jnp.asarray(a) for a in
                     (fa.kp[:, :S], fa.valid[:, :S], fa.prob[:, :S],
                      fa.in_view[:, :S], fa.present[:, :S]))

    # ---- verify ---------------------------------------------------------
    def person_sets(persons, mask=None):
        it = persons if mask is None else persons[mask]
        return {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
                for p in it}

    nchecked = 0
    max_pose = max_score = 0.0
    for fa in frames:
        a = fargs(fa)
        kposes, kpersons, kmask, kscores, kq = jax.device_get(
            prog(pipe.matcher_params, lflat, *a))
        xposes, xpersons, xmask, xscores, xq = jax.device_get(
            xla(pipe.matcher_params, pipe.lifter_params, *a))
        ks = person_sets(kpersons, kmask)
        xs = person_sets(np.asarray(xpersons)[np.asarray(xmask)])
        assert ks == xs, (ks, xs)
        max_score = max(max_score, float(np.abs(kscores - xscores).max()))
        xmap = {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0): i
                for i, p in enumerate(np.asarray(xpersons))}
        for i in range(int(kmask.sum())):
            j = xmap[frozenset((c, int(s))
                               for c, s in enumerate(kpersons[i]) if s >= 0)]
            max_pose = max(max_pose,
                           float(np.abs(kposes[i] - xposes[j]).max()))
            nchecked += 1
    print(f"[ab] verified {nchecked} persons over {len(frames)} frames: "
          f"max pose diff {max_pose:.3e} m, max score diff {max_score:.3e} "
          f"(compile+verify {time.time()-t0:.1f}s)")
    if args.verify_only:
        return

    # ---- measure --------------------------------------------------------
    from mpe3d_tpu.benchutil import chained_frame_us

    fa0 = frames[0]
    chain_args = list(fargs(fa0))
    k1, k2 = args.k

    if args.stages:
        prev = 0.0
        for st in ("gat", "decode", "pack", "full"):
            p = build_frame_program(pipe, S, P, interpret=False, stage=st,
                                    matcher=matcher)
            us = chained_frame_us(p, (pipe.matcher_params, lflat),
                                  chain_args, k1, k2)
            print(f"[ab] stage {st:7s}: {us:8.1f} us   "
                  f"(delta {us - prev:+7.1f})")
            prev = us
        return
    xla_us = chained_frame_us(xla, (pipe.matcher_params, pipe.lifter_params),
                              chain_args, k1, k2)
    print(f"[ab] XLA fused frame:   {xla_us:8.1f} us")
    kern_us = chained_frame_us(prog, (pipe.matcher_params, lflat),
                               chain_args, k1, k2)
    print(f"[ab] whole-frame kernel:{kern_us:8.1f} us   "
          f"({xla_us / kern_us:.2f}x)")

    wbytes = sum(np.size(x) * np.dtype(jnp.asarray(x).dtype).itemsize
                 for x in jax.tree_util.tree_leaves(
                     (pipe.matcher_params, lflat)))
    floor_us = wbytes / 819e9 * 1e6
    print(f"[ab] served bytes {wbytes/2**20:.1f} MB, analytic stream floor "
          f"{floor_us:.1f} us -> roofline {100*floor_us/kern_us:.1f}%")


if __name__ == "__main__":
    main()
