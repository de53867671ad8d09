"""A/B: bf16-stored GAT matcher weights vs fp32 — score drift and decode
decision flips (round-3 VERDICT #4).

The whole-frame kernel's ~112 µs stream wall includes a ~4.7 MB fp32
layer-0 GAT-weight prologue copy (layers >= 1 now stream via DMA under
layer-0 compute).  Storing the matcher weights bf16 would halve that
copy, but round 3 labelled it "parity-hostile" WITHOUT measuring the
actual effect.  This script measures it: the decode thresholds sigmoid
scores at 0.5 and proceeds greedily in score order, so weight rounding
matters only if it flips a threshold crossing or reorders two
candidates across a decode decision.

Protocol (CPU, deterministic): the trained demo matcher on dense /
crowded synthetic scenes at several noise levels; for each frame score
the pairs with fp32 params and with bf16-roundtripped params
(float32(bfloat16(w)) — exactly the storage rounding the kernel would
apply; the MXU already rounds MATMUL OPERANDS to bf16 on TPU, so this
isolates the storage effect), then decode both and compare:

  * max / p99 absolute sigmoid-score drift,
  * threshold flips: pairs where (s > 0.5) differs,
  * greedy-order flips: adjacent-score inversions among eligible pairs,
  * person-set mismatches after the full decode.

    python scripts/ab_gat_weight_dtype.py [--frames 200]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--people", default="2,5,9")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models_demo", "widefield",
        "skeleton_matching")
    assert checkpoint_exists(demo), demo
    mcfg = matcher_config_from_meta(read_meta(demo), mcfg)
    mparams, _, _ = load_checkpoint(
        demo, init_matcher(jax.random.PRNGKey(0), mcfg))

    def bf16_roundtrip(tree):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                                 .astype(jnp.float32)), tree)

    mparams_b = bf16_roundtrip(mparams)

    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    def pipe_for(params):
        return PoseEstimationPipeline(
            rig_config, rig, params, mcfg, None, None,
            backend="triangulation", threshold=0.5,
            use_pallas_matcher=False)

    pa, pb = pipe_for(mparams), pipe_for(mparams_b)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.05, camera_dropout=0.03)
    drifts, flips, order_flips, mismatches, n_pairs_live = [], 0, 0, 0, 0
    n_frames_total = 0
    for n_people in (int(s) for s in args.people.split(",")):
        wire = generate_frames(rig_config, rig, args.frames // 3,
                               n_people=(n_people, n_people),
                               seed=300 + n_people, noise=noise,
                               with_gt=False)
        for w in wire:
            fa = parse_frame(w, rig_config, max_skeletons=10)
            ra = pa.infer_fused(fa)
            rb = pb.infer_fused(fa)
            sa, sb = np.asarray(ra.scores), np.asarray(rb.scores)
            live = sa > 0  # masked pairs score exactly 0 in both
            drifts.append(np.abs(sa - sb)[live])
            flips += int(((sa > 0.5) != (sb > 0.5)).sum())
            n_pairs_live += int(live.sum())
            # greedy decode order: eligible pairs sorted by score desc —
            # count adjacent inversions between the two orderings
            ea = np.argsort(-sa[sa > 0.5], kind="stable")
            eb = np.argsort(-sb[sa > 0.5], kind="stable")
            order_flips += int((ea != eb).any())
            sets_a = {frozenset((c, int(s)) for c, s in enumerate(p)
                                if s >= 0) for p in ra.persons}
            sets_b = {frozenset((c, int(s)) for c, s in enumerate(p)
                                if s >= 0) for p in rb.persons}
            mismatches += int(sets_a != sets_b)
            n_frames_total += 1

    d = np.concatenate(drifts)
    print(f"[ab] frames={n_frames_total} live_pairs={n_pairs_live}")
    print(f"[ab] score drift: max {d.max():.3e}  p99 "
          f"{np.percentile(d, 99):.3e}  mean {d.mean():.3e}")
    print(f"[ab] threshold flips (s>0.5 differs): {flips}")
    print(f"[ab] frames with any greedy-order change: {order_flips}")
    print(f"[ab] person-set mismatches after decode: {mismatches}")
    verdict = ("SAFE: bf16 storage never flipped a decode decision"
               if flips == 0 and mismatches == 0 else
               "UNSAFE: bf16 storage flips decode decisions")
    print(f"[ab] {verdict}")


if __name__ == "__main__":
    main()
