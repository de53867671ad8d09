"""Whole-frame pallas kernel (ops/frame_kernel.py) == fused XLA pipeline.

Interpret mode on CPU; the on-chip compile/perf A/B lives in
scripts/bench_frame_kernel.py (same program builder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import FrameArrays, parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.ops.frame_kernel import (build_frame_program,
                                        frame_kernel_supported,
                                        pack_frame_layers,
                                        pack_frame_serving)
from mpe3d_tpu.pipeline import PoseEstimationPipeline


def _person_sets(persons):
    return {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
            for p in persons}


def _mk_pipe(panoptic_rig, residual_prior=False, serve_dtype=jnp.bfloat16):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64), residual_prior=residual_prior)
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        threshold=0.05, decode_top_k=0, serve_dtype=serve_dtype)


def _frames(panoptic_rig, n=5, seed=7):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    return [parse_frame(f, PANOPTIC, max_skeletons=4)
            for f in generate_frames(PANOPTIC, panoptic_rig, n,
                                     n_people=(1, 3), seed=seed,
                                     noise=noise, with_gt=False)]


def _args(fa):
    return tuple(jnp.asarray(a) for a in
                 (fa.kp[:, :4], fa.valid[:, :4], fa.prob[:, :4],
                  fa.in_view[:, :4], fa.present[:, :4]))


def _check_frames(pipe, prog, lflat, frames, pose_atol=1e-3):
    checked = 0
    for fa in frames:
        ref = pipe.infer_fused(fa)
        poses, persons, pmask, scores, quality = jax.device_get(
            prog(pipe.matcher_params, lflat, *_args(fa)))
        n = int(pmask.sum())
        assert _person_sets(persons[:n]) == _person_sets(ref.persons)
        np.testing.assert_allclose(scores, ref.scores, atol=2e-6)
        s_map = {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0): i
                 for i, p in enumerate(ref.persons)}
        for i, p in enumerate(persons[:n]):
            j = s_map[frozenset((c, int(s))
                                for c, s in enumerate(p) if s >= 0)]
            assert np.abs(poses[i] - ref.poses[j]).max() < pose_atol
            assert abs(quality[i] - ref.quality[j]) < 0.1
            checked += 1
    return checked


def test_frame_kernel_matches_fused(panoptic_rig):
    pipe = _mk_pipe(panoptic_rig)
    assert frame_kernel_supported(pipe)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    assert _check_frames(pipe, prog, lflat, _frames(panoptic_rig)) > 0


def test_frame_kernel_residual_prior(panoptic_rig):
    """The residual-prior head's exact fp32 prior add survives the
    kernel's block-padded net layout (the epilogue extract)."""
    pipe = _mk_pipe(panoptic_rig, residual_prior=True)
    assert frame_kernel_supported(pipe)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    assert _check_frames(pipe, prog, lflat, _frames(panoptic_rig,
                                                    seed=13)) > 0


def test_frame_kernel_int8(panoptic_rig):
    """int8 serving trees (wq/scale/rscale layers, K-prepadded layer 0)
    run the kernel's dequant path and match the pipeline's int8 output."""
    pipe = _mk_pipe(panoptic_rig, serve_dtype="int8")
    assert frame_kernel_supported(pipe)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    assert _check_frames(pipe, prog, lflat, _frames(panoptic_rig),
                         pose_atol=2e-2) > 0


@pytest.mark.parametrize("variant", [
    {"lifter_prior": "median"},
    {"lifter_prior": "irls"},
    {"prior_gate_px": 8.0},
    {"lifter_prior": "median", "prior_gate_px": 8.0},
])
def test_frame_kernel_prior_variants(panoptic_rig, variant):
    """The trained-serving configs — median/IRLS priors and the
    prior-quality gate — match the XLA fused path through the kernel's
    component-form geometry (counting selection replaces sorts)."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        threshold=0.05, decode_top_k=0, serve_dtype=jnp.bfloat16,
        **variant)
    assert frame_kernel_supported(pipe)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    # poison one camera's detections so the gate path actually fires
    frames = _frames(panoptic_rig, n=3, seed=31)
    if "prior_gate_px" in variant:
        for fa in frames:
            fa.kp[1, :, 5] += 200.0
    assert _check_frames(pipe, prog, lflat, frames) > 0


def test_frame_kernel_empty_frame(panoptic_rig):
    pipe = _mk_pipe(panoptic_rig)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    C, S, J = 5, 4, 18
    fa = FrameArrays(np.zeros((C, S, J, 2), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), bool),
                     np.zeros((C, S), bool), np.zeros(C))
    poses, persons, pmask, scores, quality = jax.device_get(
        prog(pipe.matcher_params, lflat, *_args(fa)))
    assert int(pmask.sum()) == 0
    assert np.all(persons == -1)
    assert np.allclose(poses * pmask.reshape(-1, 1, 1), 0.0)


def test_pack_frame_layers_layout():
    """Layer-0 rows land at c*BW + j*14 + k; the padded rows are zero;
    later layers match pack_fused_layers semantics."""
    rng = np.random.default_rng(0)
    Cu, J = 5, 18
    in_dim = Cu * J * 14
    layers = [
        {"w": rng.normal(size=(in_dim, 64)).astype(np.float32),
         "b": rng.normal(size=(64,)).astype(np.float32)},
        {"w": rng.normal(size=(64, 54)).astype(np.float32),
         "b": rng.normal(size=(54,)).astype(np.float32)},
    ]
    flat, kinds, dims = pack_frame_layers(layers, Cu, J)
    assert kinds == ("w", "w")
    bw = 256
    assert dims[0] == (Cu * bw, 128)
    w0 = np.asarray(flat[0], np.float32)
    orig = layers[0]["w"]
    for c in range(Cu):
        blk = w0[c * bw:(c + 1) * bw]
        np.testing.assert_allclose(
            blk[:J * 14, :64], orig[c * J * 14:(c + 1) * J * 14],
            atol=2e-2)          # bf16 storage rounding
        assert np.all(blk[J * 14:] == 0)
        assert np.all(blk[:, 64:] == 0)

    # int8 tree with prepadded layer-0 K re-lays out the true rows
    from mpe3d_tpu.models.mlp import (prepad_quantized_lifter,
                                      quantize_lifter_weights)
    q = prepad_quantized_lifter(quantize_lifter_weights(
        {"layers": layers}, keep_last_fp=True))
    qflat, qkinds, qdims = pack_frame_layers(q["layers"], Cu, J)
    assert qkinds == ("q", "w")
    assert qdims[0] == (Cu * bw, 128)
    rscale = np.asarray(qflat[2]).reshape(Cu, bw)
    assert np.all(rscale[:, J * 14:] == 0)
    assert np.all(rscale[:, :J * 14] > 0)


def test_pipeline_forced_frame_kernel(panoptic_rig):
    """use_frame_kernel=True routes submit_fused/infer_fused through the
    kernel (interpret mode on CPU) and reproduces the XLA pipeline."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    kw = dict(slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
              decode_top_k=0, serve_dtype=jnp.bfloat16)
    base = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp,
                                  lcfg, **kw)
    kern = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp,
                                  lcfg, use_frame_kernel=True, **kw)
    assert kern.lifter_params_frame is not None
    assert kern._frame_kernel_on(4, 8)
    assert not base._frame_kernel_on(4, 8)     # auto: CPU keeps XLA
    checked = 0
    for fa in _frames(panoptic_rig, n=3, seed=29):
        a = base.infer_fused(fa)
        b = kern.infer_fused(fa)
        assert _person_sets(a.persons) == _person_sets(b.persons)
        s_map = {frozenset((c, int(s)) for c, s in enumerate(p)
                           if s >= 0): i for i, p in enumerate(a.persons)}
        for i, p in enumerate(b.persons):
            j = s_map[frozenset((c, int(s))
                                for c, s in enumerate(p) if s >= 0)]
            assert np.allclose(b.poses[i], a.poses[j], atol=1e-3)
            checked += 1
        # the batch path stays on the XLA variant and agrees
        (ob,) = kern.infer_batch([fa], slots=4)
        assert _person_sets(ob.persons) == _person_sets(a.persons)
    assert checked > 0


def test_frame_kernel_arplab_topology():
    """The 6-camera ARP Lab rig (15 camera pairs, 1512-dim lifter input,
    K0p = 6*256) through the kernel matches the XLA fused path — covers
    the non-PANOPTIC static topology paths (pair loops, block layout)."""
    from mpe3d_tpu.config import ARPLAB
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig

    rig = synthetic_ring_rig(ARPLAB)
    mcfg = MatcherConfig(in_dim=ARPLAB.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(in_dim=ARPLAB.lifter_input_dim,
                        out_dim=ARPLAB.n_joints * 3, widths=(64, 64))
    pipe = PoseEstimationPipeline(
        ARPLAB, rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        threshold=0.05, decode_top_k=0, serve_dtype=jnp.bfloat16,
        lifter_prior="median")
    assert frame_kernel_supported(pipe)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               ARPLAB.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = [parse_frame(f, ARPLAB, max_skeletons=4)
              for f in generate_frames(ARPLAB, rig, 3, n_people=(1, 3),
                                       seed=17, noise=noise,
                                       with_gt=False)]
    assert _check_frames(pipe, prog, lflat, frames) > 0


def test_cli_no_frame_kernel_flag_threads_through():
    """--no-frame-kernel forces use_frame_kernel=False into the pipeline
    kwargs (the serving escape hatch, mirroring --no-pallas-matcher)."""
    import argparse

    from mpe3d_tpu import cli

    ns = argparse.Namespace(no_frame_kernel=True)
    geo_kw = {}
    if getattr(ns, "no_frame_kernel", False):
        geo_kw["use_frame_kernel"] = False
    assert geo_kw == {"use_frame_kernel": False}
    p = argparse.ArgumentParser()
    cli._add_common(p)
    assert p.parse_args(["--no-frame-kernel"]).no_frame_kernel is True
    assert p.parse_args([]).no_frame_kernel is False


def test_frame_kernel_stage_variants(panoptic_rig):
    """The measurement-only stage truncations (bench_frame_kernel
    --stages) stay consistent with the full program where they overlap:
    scores at every stage, persons/mask from 'decode' on."""
    pipe = _mk_pipe(panoptic_rig)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    fa = _frames(panoptic_rig, n=1, seed=41)[0]
    full = jax.device_get(build_frame_program(
        pipe, 4, 8, interpret=True)(pipe.matcher_params, lflat, *_args(fa)))
    for st in ("gat", "decode", "pack"):
        part = jax.device_get(build_frame_program(
            pipe, 4, 8, interpret=True, stage=st)(
                pipe.matcher_params, lflat, *_args(fa)))
        np.testing.assert_allclose(part[3], full[3], atol=1e-7)  # scores
        if st != "gat":
            assert np.array_equal(part[1], full[1])              # persons
            assert np.array_equal(part[2], full[2])              # mask


def test_frame_kernel_supported_gates(panoptic_rig):
    """Unsupported configs are declined (they keep the XLA path)."""
    pipe = _mk_pipe(panoptic_rig)
    assert frame_kernel_supported(pipe)
    pipe.geo_rescue = 0.5
    assert not frame_kernel_supported(pipe)
    pipe.geo_rescue = 0.0
    pipe.backend = "triangulation"
    assert not frame_kernel_supported(pipe)
    pipe.backend = "mlp"
    assert frame_kernel_supported(pipe)
    # fp32 serving (CPU auto-resolution) keeps the XLA path
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    lcfg = LifterConfig(widths=(32,))
    fp32 = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), serve_dtype=False)
    assert not frame_kernel_supported(fp32)


def test_frame_kernel_split_variant_matches_fused(panoptic_rig):
    """The SPLIT crowded-bucket variant (grid-tiled GAT outside the
    kernel, decode+pack+lift inside — matcher="tiled") matches the fused
    XLA pipeline: identical person sets, scores within the tiled
    accumulation tolerance, poses within pose_atol."""
    pipe = _mk_pipe(panoptic_rig)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               PANOPTIC.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True,
                               matcher="tiled")
    frames = _frames(panoptic_rig, n=3, seed=21)
    checked = 0
    for fa in frames:
        ref = pipe.infer_fused(fa)
        poses, persons, pmask, scores, quality = jax.device_get(
            prog(pipe.matcher_params, lflat, *_args(fa)))
        n = int(pmask.sum())
        assert _person_sets(persons[:n]) == _person_sets(ref.persons)
        np.testing.assert_allclose(scores, ref.scores, atol=2e-5)
        s_map = {frozenset((c, int(s)) for c, s in enumerate(p)
                           if s >= 0): i for i, p in enumerate(ref.persons)}
        for i, p in enumerate(persons[:n]):
            j = s_map[frozenset((c, int(s))
                                for c, s in enumerate(p) if s >= 0)]
            assert np.abs(poses[i] - ref.poses[j]).max() < 1e-3
            checked += 1
    assert checked > 0


def test_frame_kernel_split_arplab_topology():
    """The SPLIT variant on the 6-camera ARP Lab rig — covers the
    grid-tiled GAT's non-PANOPTIC topology (15 camera pairs) feeding the
    decode+pack+lift kernel."""
    from mpe3d_tpu.config import ARPLAB
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig

    rig = synthetic_ring_rig(ARPLAB)
    mcfg = MatcherConfig(in_dim=ARPLAB.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(in_dim=ARPLAB.lifter_input_dim,
                        out_dim=ARPLAB.n_joints * 3, widths=(64, 64))
    pipe = PoseEstimationPipeline(
        ARPLAB, rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,),
        threshold=0.05, decode_top_k=0, serve_dtype=jnp.bfloat16)
    lflat = pack_frame_serving(pipe.lifter_params, len(pipe.used_idx),
                               ARPLAB.n_joints)
    prog = build_frame_program(pipe, 4, 8, interpret=True,
                               matcher="tiled")
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = [parse_frame(f, ARPLAB, max_skeletons=4)
              for f in generate_frames(ARPLAB, rig, 2, n_people=(2, 3),
                                       seed=19, noise=noise,
                                       with_gt=False)]
    checked = 0
    for fa in frames:
        ref = pipe.infer_fused(fa)
        poses, persons, pmask, scores, quality = jax.device_get(
            prog(pipe.matcher_params, lflat, *_args(fa)))
        n = int(pmask.sum())
        assert _person_sets(persons[:n]) == _person_sets(ref.persons)
        np.testing.assert_allclose(scores, ref.scores, atol=2e-5)
        checked += n
    assert checked > 0
