"""On-chip bucket-ladder check for the whole-frame kernel.

Builds the DEFAULT serving pipeline (slot buckets 2/4/10, person buckets
4/8/16) and drives sparse → crowded frames through `infer_fused`, so each
bucket's per-bucket probe runs for real: buckets whose kernel compiles
serve through it, the rest must fall back to the XLA program — either
way the outputs must match a use_frame_kernel=False pipeline exactly.

    python scripts/check_frame_kernel_buckets.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
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
    except Exception as e:  # noqa: BLE001
        print(f"[buckets] matcher load skipped: {e}")
    lparams = init_lifter(jax.random.PRNGKey(1), lcfg)

    kw = dict(slot_buckets=(2, 4, 10), person_buckets=(4, 8, 16),
              threshold=0.5)
    kern = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                  lparams, lcfg, **kw)
    xla = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                 lparams, lcfg, use_frame_kernel=False,
                                 **kw)
    print(f"[buckets] backend={jax.default_backend()}")

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.05, camera_dropout=0.03)

    def person_sets(persons):
        return {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
                for p in persons}

    for n_people, n_frames in ((1, 3), (3, 3), (6, 3), (9, 3)):
        wire = generate_frames(rig_config, rig, n_frames,
                               n_people=(n_people, n_people),
                               seed=100 + n_people, noise=noise,
                               with_gt=False)
        frames = [parse_frame(f, rig_config, max_skeletons=10)
                  for f in wire]
        S = kern._bucket(max(1, max(int(f.present.sum(axis=1).max())
                                    for f in frames)))
        p_max = kern._p_max(S)
        t0 = time.time()
        on = kern._frame_kernel_on(S, p_max)
        probe_s = time.time() - t0
        mism = 0
        pd_max = 0.0
        t0 = time.time()
        for fa in frames:
            a = kern.infer_fused(fa)
            b = xla.infer_fused(fa)
            if person_sets(a.persons) != person_sets(b.persons):
                mism += 1
                continue
            amap = {frozenset((c, int(s)) for c, s in enumerate(p)
                              if s >= 0): i for i, p in enumerate(b.persons)}
            for i, p in enumerate(a.persons):
                j = amap[frozenset((c, int(s)) for c, s in enumerate(p)
                                   if s >= 0)]
                pd_max = max(pd_max,
                             float(np.abs(a.poses[i] - b.poses[j]).max()))
        dt = time.time() - t0
        print(f"[buckets] P={n_people:2d} -> bucket S={S:2d}/p{p_max:2d}: "
              f"kernel={'ON ' if on else 'off'} (probe {probe_s:5.1f}s)  "
              f"person-set mismatches {mism}/{n_frames}, max pose diff "
              f"{pd_max:.2e} m  ({dt:.1f}s incl. compiles)")
        assert mism == 0

    print("[buckets] OK")


if __name__ == "__main__":
    main()
