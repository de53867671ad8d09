"""int8 weight-only lifter serving (ops/quant_matmul.py, models/mlp.py).

No reference counterpart (the reference serves fp32 torch weights,
utils/mlp.py:3-31); these tests pin the serving extension's numerics:
quantisation error bounds, pallas-kernel ≡ XLA-path equivalence (interpret
mode), and end-to-end pipeline accuracy vs fp32 serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import LifterConfig
from mpe3d_tpu.models.mlp import (apply_lifter, init_lifter,
                                  quantize_lifter_weights)
from mpe3d_tpu.ops.quant_matmul import int8_weight_matmul, xla_int8_matmul


def small_cfg():
    return LifterConfig(in_dim=5 * 18 * 14, widths=(256, 128),
                        out_dim=54)


def test_quantize_roundtrip_error_bound():
    key = jax.random.PRNGKey(0)
    # mixed row scales (like the packer's mixed-unit input fields) AND
    # mixed column scales
    w = (jax.random.normal(key, (96, 64))
         * jnp.linspace(0.1, 3.0, 64)[None, :]
         * jnp.logspace(-2, 1, 96)[:, None])
    params = {"layers": [{"w": w, "b": jnp.zeros((64,))},
                         {"w": w[:64, :32], "b": jnp.zeros((32,))}]}
    q = quantize_lifter_weights(params)
    lay = q["layers"][0]
    assert lay["wq"].dtype == jnp.int8
    deq = (lay["rscale"][:, None]
           * lay["wq"].astype(jnp.float32) * lay["scale"])
    # two-sided symmetric rounding: |err| <= rscale*scale/2 elementwise
    err = np.abs(np.asarray(deq - w))
    bound = (np.asarray(lay["rscale"])[:, None]
             * np.asarray(lay["scale"])[None, :] / 2 + 1e-9)
    assert (err <= bound).all()
    # head kept fp32 by default
    assert "w" in q["layers"][1] and "wq" not in q["layers"][1]
    # single-sided fallback
    q1 = quantize_lifter_weights(params, row_scale=False)
    assert "rscale" not in q1["layers"][0]
    deq1 = q1["layers"][0]["wq"].astype(jnp.float32) * q1["layers"][0]["scale"]
    b1 = np.asarray(q1["layers"][0]["scale"])[None, :] / 2 + 1e-9
    assert (np.abs(np.asarray(deq1 - w)) <= b1).all()


def test_pallas_kernel_matches_xla_path():
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    for M, K, N in [(4, 1260, 3072), (16, 300, 130), (1, 64, 54)]:
        x = jax.random.normal(k1, (M, K))
        wq = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
        scale = jax.random.uniform(k3, (N,), minval=1e-3, maxval=0.1)
        b = jax.random.normal(k4, (N,))
        rscale = jax.random.uniform(k1, (K,), minval=0.5, maxval=2.0)
        for alpha in (None, 0.1):
            for rs in (None, rscale):
                ref = xla_int8_matmul(x, wq, scale, b, alpha, rs)
                got = int8_weight_matmul(x, wq, scale, b, alpha=alpha,
                                         rscale=rs, interpret=True)
                # padded vs unpadded dots differ by fp32 accumulation order
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           rtol=3e-3, atol=1e-4)


def test_pallas_kernel_batched_vmap():
    """infer_batch vmaps the fused program over frames — the kernel must
    survive batching (pallas lifts the batch into the grid)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 8, 256))
    wq = jax.random.randint(key, (256, 128), -127, 128, jnp.int8)
    scale = jnp.full((128,), 0.01)
    run = jax.vmap(lambda xi: int8_weight_matmul(xi, wq, scale,
                                                 interpret=True))
    ref = jax.vmap(lambda xi: xla_int8_matmul(xi, wq, scale, None, None))
    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(ref(x)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("residual", [False, True])
def test_apply_lifter_int8_close_to_fp32(residual):
    cfg = LifterConfig(in_dim=5 * 18 * 14, widths=(256, 128), out_dim=54,
                       residual_prior=residual)
    params = init_lifter(jax.random.PRNGKey(3), cfg)
    if residual:
        # give the zero-init head a realistic small correction
        params["layers"][-1]["w"] = 0.02 * jax.random.normal(
            jax.random.PRNGKey(4), params["layers"][-1]["w"].shape)
    q = quantize_lifter_weights(params)
    x = jax.random.normal(jax.random.PRNGKey(5), (6, cfg.in_dim)) * 0.3
    ref = apply_lifter(params, x, cfg)
    got = apply_lifter(q, x, cfg, use_pallas_quant=False)
    # int8 per-channel + bf16 activations: a few-percent envelope on
    # random weights (real-checkpoint MPJPE deltas are measured separately)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(got - ref))) / scale
    assert rel < 0.08, rel


def test_cli_serve_dtype_mapping(panoptic_rig, tmp_path):
    """cli.build_pipeline maps --serve-dtype {auto,fp32,bf16,int8} onto the
    pipeline knob (auto leaves the pipeline's backend-dependent default)."""
    import argparse

    from mpe3d_tpu import cli

    ns = dict(cpu=True, rig="PANOPTIC", tm=None, modelsdir=str(tmp_path))
    for sd, expect in [("auto", None), ("fp32", None),
                       ("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
        args = argparse.Namespace(serve_dtype=sd, **ns)
        _, _, pipe = cli.build_pipeline(args, "mlp")   # random-init models
        assert pipe.serve_dtype == (None if expect is None else expect), sd
        if sd == "int8":
            assert "wq" in pipe.lifter_params["layers"][0]


def test_pipeline_serve_int8(panoptic_rig):
    """serve_dtype='int8' quantises at init and stays close to fp32
    serving on real synthetic frames end-to-end (same proposals — the
    matcher is untouched — poses within centimetres on an untrained
    random lifter whose outputs are O(1 m))."""
    from mpe3d_tpu.config import PANOPTIC, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(128, 64))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    kw = dict(slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
              decode_top_k=0)
    fp32 = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  serve_dtype=False, **kw)
    q8 = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                serve_dtype="int8", **kw)
    assert q8.serve_dtype == jnp.int8
    assert q8.lifter_params["layers"][0]["wq"].dtype == jnp.int8
    assert "w" in q8.lifter_params["layers"][-1]        # head kept fp32

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(1, 3),
                             seed=13, noise=noise, with_gt=False)
    checked = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        a, b = fp32.infer_fused(fa), q8.infer_fused(fa)
        assert a.poses.shape == b.poses.shape
        if len(a.poses):
            assert np.allclose(a.poses, b.poses, atol=0.05), \
                np.max(np.abs(a.poses - b.poses))
            checked += 1
    assert checked > 0


def test_prepad_quantized_lifter_identical_outputs():
    """prepad_quantized_lifter K-aligns int8 matrices with zero rows — a
    serving-setup transform that must be output-identical on BOTH int8
    paths (XLA oracle and the pallas kernel in interpret mode), and a
    no-op on the already-aligned hidden layers."""
    from mpe3d_tpu.config import LifterConfig
    from mpe3d_tpu.models.mlp import prepad_quantized_lifter

    cfg = LifterConfig(in_dim=1260, out_dim=54, widths=(256, 128))
    params = init_lifter(jax.random.PRNGKey(3), cfg)
    q = quantize_lifter_weights(params)
    qp = prepad_quantized_lifter(q)
    assert qp["layers"][0]["wq"].shape[0] == 1280       # 1260 -> padded
    assert qp["layers"][0]["rscale"].shape[0] == 1260   # true K kept
    assert qp["layers"][1]["wq"].shape == q["layers"][1]["wq"].shape
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 1260), jnp.float32)
    ref = apply_lifter(q, x, cfg, use_pallas_quant=False)
    got = apply_lifter(qp, x, cfg, use_pallas_quant=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    l0, l0p = q["layers"][0], qp["layers"][0]
    ref_k = int8_weight_matmul(x, l0["wq"], l0["scale"], l0["b"],
                               alpha=0.1, rscale=l0["rscale"],
                               interpret=True)
    got_k = int8_weight_matmul(x, l0p["wq"], l0p["scale"], l0p["b"],
                               alpha=0.1, rscale=l0p["rscale"],
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_k), np.asarray(got_k))


def test_dequantize_matches_served_function():
    """dequantize_lifter_weights must reconstruct exactly the fp32 tree
    the int8 serving path computes with (w = rscale[:,None]*wq*scale) —
    so a dequantised master run through the plain fp path equals the
    quantised tree run through the int8 path, and re-quantising it is
    idempotent (bench_serve_dtype/bench_fused_mlp rely on this to drive
    dtype A/Bs from an int8 servable export)."""
    from mpe3d_tpu.models.mlp import (dequantize_lifter_weights,
                                      lifter_is_quantized)

    cfg = LifterConfig(in_dim=1260, out_dim=54, widths=(256, 128))
    params = init_lifter(jax.random.PRNGKey(7), cfg)
    q = quantize_lifter_weights(params)
    dq = dequantize_lifter_weights(q)
    assert not lifter_is_quantized(dq)
    x = jax.random.normal(jax.random.PRNGKey(8), (5, 1260), jnp.float32)
    served = apply_lifter(q, x, cfg, use_pallas_quant=False)
    replay = apply_lifter(dq, x, cfg)
    # the int8 path feeds bf16 operands into the dot (quant_matmul.py:62,
    # matching MXU serving); the fp replay runs fp32 on CPU — tolerance
    # is bf16 operand rounding, not dequant error
    np.testing.assert_allclose(np.asarray(served), np.asarray(replay),
                               atol=5e-3, rtol=0)
    q2 = quantize_lifter_weights(dq)
    for l1, l2 in zip(q["layers"], q2["layers"]):
        if "wq" in l1:
            np.testing.assert_array_equal(np.asarray(l1["wq"]),
                                          np.asarray(l2["wq"]))
            np.testing.assert_allclose(np.asarray(l1["scale"]),
                                       np.asarray(l2["scale"]), rtol=1e-6)
