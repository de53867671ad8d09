"""On-chip compile probe for the S=10/16 big-bucket kernels.

Round-3 measured (check_frame_kernel_buckets.py): the whole-frame kernel
demanded ~142 MB scoped VMEM at S=10 and the GAT megakernel ~195 MB —
over the v5e's 128 MB; the on-chip compile diagnostics attribute the
whole overflow to Mosaic register-allocator SPILL SLOTS (one per large
straight-line value).  This script probes the round-4 serving forms per
bucket — the grid-tiled stack (ops/gat_tiled.py), the megakernel, and
the whole-frame kernel's variant chain — and prints the Mosaic
scoped-VMEM numbers from the rejection messages when a form does not
compile.

    python scripts/probe_big_buckets.py [--buckets 10,16] [--time]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true",
                    help="also run + time one frame through each compiled "
                         "bucket (forces a readback — run probes first)")
    ap.add_argument("--buckets", default="10,16")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu import pipeline as plmod
    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    lparams = init_lifter(jax.random.PRNGKey(1), lcfg)

    pipe = PoseEstimationPipeline(
        rig_config, rig, mparams, mcfg, lparams, lcfg,
        slot_buckets=(4, 10, 16), person_buckets=(8, 16, 16),
        threshold=0.5)
    print(f"[probe] backend={jax.default_backend()}")

    import jax.numpy as jnp

    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.ops.gat_tiled import apply_matcher_tiled

    def probe_tiled(S):
        topo = build_topology(rig_config.n_cameras, S)
        d = rig_config.matcher_feature_dim
        hf = jax.ShapeDtypeStruct((topo.n_heads, d), jnp.float32)
        ef = jax.ShapeDtypeStruct((topo.n_pairs, d), jnp.float32)
        pw = jax.ShapeDtypeStruct((topo.n_pairs,), jnp.float32)
        try:
            jax.jit(lambda p, a, b, w: apply_matcher_tiled(
                p, a, b, topo, w, mcfg, interpret=False)
            ).lower(mparams, hf, ef, pw).compile()
            return True
        except Exception as e:  # noqa: BLE001
            print(f"[probe] tiled matcher S={S} compile failed: "
                  f"{type(e).__name__}: {str(e)[:4000]}", flush=True)
            return False

    buckets = [int(s) for s in args.buckets.split(",")]
    for S in buckets:
        P = pipe._p_max(S)
        t0 = time.time()
        ok_t = probe_tiled(S)
        t_t = time.time() - t0
        # megakernel probe
        plmod._PALLAS_MATCHER_PROBE.clear()
        t0 = time.time()
        ok_m = plmod._pallas_matcher_probe_ok(
            mparams, mcfg, rig_config, rig_config.n_cameras, S)
        t_m = time.time() - t0
        # frame kernel probe (variant: full -> split -> None)
        plmod._FRAME_KERNEL_PROBE.clear()
        t0 = time.time()
        var = plmod._frame_kernel_variant(pipe, S, P)
        t_f = time.time() - t0
        print(f"[probe] S={S:2d}/P={P:2d}: tiled "
              f"{'OK' if ok_t else 'REJECT'} ({t_t:.1f}s)  megakernel "
              f"{'OK' if ok_m else 'REJECT'} ({t_m:.1f}s)  frame-kernel "
              f"{var or 'REJECT'} ({t_f:.1f}s)", flush=True)

    if args.time:
        from mpe3d_tpu.data.frames import parse_frame
        from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames

        noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                           spurious_rate=0.05, camera_dropout=0.03)
        for n_people in (9, 14):
            wire = generate_frames(rig_config, rig, 2,
                                   n_people=(n_people, n_people),
                                   seed=40 + n_people, noise=noise,
                                   with_gt=False)
            frames = [parse_frame(f, rig_config, max_skeletons=16)
                      for f in wire]
            r = pipe.infer_fused(frames[0])      # compile + warm
            np.asarray(r.poses)
            iters = 50
            t0 = time.time()
            for _ in range(iters):
                r = pipe.infer_fused(frames[1])
            np.asarray(r.poses)
            dt = (time.time() - t0) / iters
            print(f"[probe] P={n_people} frame wall {dt * 1e6:.1f} us "
                  f"(relay-session-relative)", flush=True)


if __name__ == "__main__":
    main()
