"""Whole-network pallas MLP serving kernel (ops/fused_mlp.py).

Equivalence oracles are the existing apply_lifter paths (XLA bf16 matmul;
XLA int8 emulation) — the same algebra the kernel implements, so
differences are fp32 reassociation only (the kernel accumulates per
K-tile).  Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import LifterConfig
from mpe3d_tpu.models.mlp import (apply_lifter, init_lifter,
                                  pack_lifter_serving,
                                  quantize_lifter_weights)
from mpe3d_tpu.ops.fused_mlp import (M_TILE, fused_mlp_forward,
                                     pack_fused_layers)

CFG = LifterConfig(in_dim=70, out_dim=12, widths=(96, 128, 64))


def _params(cfg=CFG, seed=0):
    return init_lifter(jax.random.PRNGKey(seed), cfg)


def _x(cfg=CFG, m=5, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (m, cfg.in_dim), jnp.float32) * 0.3


@pytest.mark.parametrize("m", [1, 5, 16])
def test_bf16_matches_xla(m):
    params = _params()
    x = _x(m=m)
    ref = apply_lifter(params, x, CFG, compute_dtype=jnp.bfloat16)
    flat, kinds, dims = pack_fused_layers(params["layers"])
    out = fused_mlp_forward(x, flat, kinds, dims, CFG.negative_slope,
                            CFG.out_dim, interpret=True)
    assert out.shape == (m, CFG.out_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_matches_xla_emulation():
    params = quantize_lifter_weights(_params())
    x = _x(m=7)
    # oracle: per-layer int8 path with the XLA emulation kernel; bf16
    # compute dtype for the kept-fp last layer, as the pipeline's int8
    # serving mode sets (pipeline.py serve_dtype handling)
    ref = apply_lifter(params, x, CFG, compute_dtype=jnp.bfloat16,
                       use_pallas_quant=False)
    flat, kinds, dims = pack_fused_layers(params["layers"])
    assert kinds[:-1] == ("q",) * (len(kinds) - 1)   # last layer kept fp
    assert kinds[-1] == "w"
    out = fused_mlp_forward(x, flat, kinds, dims, CFG.negative_slope,
                            CFG.out_dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_apply_lifter_packed_tree_and_residual_prior():
    cfg = LifterConfig(in_dim=2 * 18 * 14, out_dim=54, widths=(64,),
                       residual_prior=True)
    params = _params(cfg, seed=3)
    x = _x(cfg, m=4, seed=4)
    ref = apply_lifter(params, x, cfg, compute_dtype=jnp.bfloat16)
    packed = pack_lifter_serving(params)
    out = apply_lifter(packed, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_row_cap_raises():
    params = _params()
    flat, kinds, dims = pack_fused_layers(params["layers"])
    with pytest.raises(ValueError):
        fused_mlp_forward(_x(m=M_TILE + 1), flat, kinds, dims,
                          CFG.negative_slope, CFG.out_dim, interpret=True)


def test_full_size_lifter_shapes():
    """The real serving geometry (29.1 M params) packs and runs."""
    cfg = LifterConfig()
    params = _params(cfg, seed=5)
    x = _x(cfg, m=8, seed=6)
    ref = apply_lifter(params, x, cfg, compute_dtype=jnp.bfloat16)
    packed = pack_lifter_serving(params)
    out = apply_lifter(packed, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_fused_mlp_matches_default(panoptic_rig):
    """A use_fused_mlp pipeline serves the same poses as the default one
    (both on stored-bf16 weights so the weight numerics are identical;
    kernel runs in interpret mode on CPU)."""
    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    lparams = init_lifter(jax.random.PRNGKey(1), lcfg)

    def mk(fused):
        return PoseEstimationPipeline(
            PANOPTIC, panoptic_rig, mparams, mcfg, lparams, lcfg,
            slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
            decode_top_k=0, serve_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            use_fused_mlp=fused)

    base, fused = mk(False), mk(True)
    assert not base.use_fused_mlp and fused.use_fused_mlp
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03)
    frames = generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(1, 3),
                             seed=9, noise=noise, with_gt=False)
    checked = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        a = base.infer_fused(fa)
        b = fused.infer_fused(fa)
        assert len(a.poses) == len(b.poses)
        if len(a.poses):
            checked += 1
            np.testing.assert_allclose(b.poses, a.poses, atol=1e-4)
    assert checked > 0


@pytest.mark.parametrize("widths", [(384, 1024), (384, 384), (640, 896)])
def test_odd_128_multiple_widths(widths):
    """Review regression: padded layer-boundary dims must agree for widths
    that are odd multiples of 128 (the old 256-rounding of K broke them —
    NaN poses or trace errors)."""
    cfg = LifterConfig(in_dim=70, out_dim=12, widths=widths)
    params = _params(cfg, seed=8)
    x = _x(cfg, m=4, seed=9)
    ref = apply_lifter(params, x, cfg, compute_dtype=jnp.bfloat16)
    packed = pack_lifter_serving(params)
    out = apply_lifter(packed, x, cfg)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_one_sided_int8_tree():
    """Review regression: row_scale=False quantised trees (no rscale key)
    must pack — both int8 paths accept the same input domain."""
    params = quantize_lifter_weights(_params(), row_scale=False)
    assert "rscale" not in params["layers"][0]
    x = _x(m=3)
    ref = apply_lifter(params, x, CFG, compute_dtype=jnp.bfloat16,
                       use_pallas_quant=False)
    packed = pack_lifter_serving(params)
    out = apply_lifter(packed, x, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fp32_request_demotes_fused(panoptic_rig, capsys):
    """Review regression: an fp32 serving tree must NOT be silently cast
    to bf16 by the kernel packer — the pipeline demotes to XLA."""
    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64,))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        serve_dtype=False, use_fused_mlp=True)
    assert not pipe.use_fused_mlp
    assert "not engaged" in capsys.readouterr().err


def test_lift_truncates_past_largest_bucket(panoptic_rig):
    """Review regression: host-decoded proposals beyond the largest person
    bucket must truncate (with aligned PipelineOutput rows), not crash on
    a negative pad."""
    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import generate_frames
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64,))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(2,))
    fa = parse_frame(next(iter(generate_frames(
        PANOPTIC, panoptic_rig, 1, n_people=(3, 3), seed=3,
        with_gt=False))), PANOPTIC, max_skeletons=4)
    persons = np.array([[0, 0, 0, 0, 0], [1, 1, 1, 1, 1], [2, 2, 2, 2, 2],
                        [0, 1, -1, -1, -1]])  # 4 proposals > bucket 2
    poses = pipe.lift(fa, persons)
    assert poses.shape[0] == 2


def test_pack_rejects_unpadded_boundary_mismatch():
    """Layer boundaries must be validated on UNPADDED dims: N=256 feeding
    K=250 rounds to the same 128-bucket and the old padded-only check let
    it through, silently dropping 6 activation columns (review finding)."""
    import numpy as np
    import pytest

    layers = [{"w": np.zeros((128, 256), np.float32),
               "b": np.zeros(256, np.float32)},
              {"w": np.zeros((250, 64), np.float32),
               "b": np.zeros(64, np.float32)}]
    with pytest.raises(ValueError, match="boundary"):
        pack_fused_layers(layers)
