"""Fused single-program pipeline == staged pipeline."""

import jax
import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.pipeline import PoseEstimationPipeline


@pytest.fixture(scope="module", params=["mlp", "triangulation"])
def pipe(request, panoptic_rig):
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    # threshold below the untrained matcher's score range so decode runs
    return PoseEstimationPipeline(
        PANOPTIC, panoptic_rig,
        init_matcher(jax.random.PRNGKey(0), mcfg), mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,), backend=request.param,
        threshold=0.05, decode_top_k=0)   # exact decode: the low threshold
    # makes nearly every pair eligible, so top-K truncation would diverge


def _person_sets(persons):
    return {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
            for p in persons}


def test_fused_matches_staged(pipe, panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 8, n_people=(1, 3),
                             seed=7, noise=noise, with_gt=False)
    # an untrained matcher still produces *some* scores > 0.5 to decode
    checked = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        staged = pipe(fa)
        fused = pipe.infer_fused(fa)
        assert _person_sets(staged.persons) == _person_sets(fused.persons)
        if len(staged.persons):
            checked += 1
            # poses agree per person (order may differ) — match by person row
            s_map = {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0): i
                     for i, p in enumerate(staged.persons)}
            for i, p in enumerate(fused.persons):
                j = s_map[frozenset((c, int(s))
                                    for c, s in enumerate(p) if s >= 0)]
                assert np.allclose(fused.poses[i], staged.poses[j],
                                   atol=1e-3), (i, j)
    assert checked > 0


def test_staged_device_decode_matches_host(pipe, panoptic_rig):
    """decode_on_device=True (decode fused into stage 1) reproduces the
    host-decode staged path exactly."""
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 6, n_people=(1, 3),
                             seed=11, noise=noise, with_gt=False)
    checked = 0
    try:
        pipe.decode_on_device = True
        for f in frames:
            fa = parse_frame(f, PANOPTIC, max_skeletons=4)
            pipe.decode_on_device = False
            host = pipe(fa)
            pipe.decode_on_device = True
            dev = pipe(fa)
            assert _person_sets(host.persons) == _person_sets(dev.persons)
            checked += len(host.persons)
    finally:
        pipe.decode_on_device = False
    assert checked > 0


def test_pose_metrics_stream_matches_sequential(pipe, panoptic_rig):
    """run_pose_metrics(stream=N) returns the same accuracy numbers as the
    frame-by-frame fused path."""
    from mpe3d_tpu.eval.runners import run_pose_metrics

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.02,
                       spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(PANOPTIC, panoptic_rig, 6, n_people=(1, 2),
                             seed=13, noise=noise)
    seq = run_pose_metrics(frames, PANOPTIC, pipe, datastep=1, fused=True)
    st = run_pose_metrics(frames, PANOPTIC, pipe, datastep=1, stream=3)
    assert st["n_frames"] == seq["n_frames"] > 0
    assert st["stream_depth"] == 3
    for k in ("mpjpe_mm", "mAP", "mR"):
        a, b = seq.get(k), st.get(k)
        if a is None or (isinstance(a, float) and np.isnan(a)):
            assert b is None or np.isnan(b)
        else:
            assert np.isclose(a, b, atol=1e-6), (k, a, b)


def test_fused_empty_frame(pipe):
    from mpe3d_tpu.data.frames import FrameArrays

    C, S, J = 5, 4, 18
    fa = FrameArrays(np.zeros((C, S, J, 2), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), np.float32),
                     np.zeros((C, S, J), bool),
                     np.zeros((C, S), bool), np.zeros(C))
    out = pipe.infer_fused(fa)
    assert len(out.persons) == 0
    assert len(out.poses) == 0


def test_geo_paths_agree(panoptic_rig):
    """With geo_rerank+geo_rescue on, all four decode paths (staged host,
    staged device, fused, batched-fused) produce identical person sets."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    kw = dict(slot_buckets=(4,), person_buckets=(8,),
              backend="triangulation", threshold=0.05, decode_top_k=0,
              geo_rerank=0.3, geo_rescue=0.001, geo_rescue_dist=0.05)
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    host = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, **kw)
    dev = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg,
                                 decode_on_device=True, **kw)

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 6, n_people=(1, 3),
                             seed=11, noise=noise, with_gt=False)
    fas = [parse_frame(f, PANOPTIC, max_skeletons=4) for f in frames]
    batched = dev.infer_batch(fas, slots=4)
    saw_rescued = 0
    for fa, out_b in zip(fas, batched):
        ph = _person_sets(host(fa).persons)
        pd = _person_sets(dev(fa).persons)
        pf = _person_sets(dev.infer_fused(fa).persons)
        pb = _person_sets(out_b.persons)
        assert ph == pd == pf == pb
        # rescue really fires: some decoded pair scores sit below threshold
        scores = host(fa).scores
        if len(ph) and scores.size and (scores <= 0.05).any():
            saw_rescued += 1
    assert saw_rescued > 0


def test_use_pallas_proj_auto_resolution(panoptic_rig):
    """use_pallas_proj=None resolves by backend: False on CPU (pallas needs
    a TPU unless interpreted); True is measured-faster at inference shapes
    on the real chip (RESULTS.md)."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    lcfg = LifterConfig(widths=(32,))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    pipe = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  slot_buckets=(4,), person_buckets=(8,))
    assert pipe.use_pallas_proj == (jax.default_backend() == "tpu")
    pipe2 = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                   slot_buckets=(4,), person_buckets=(8,),
                                   use_pallas_proj=False)
    assert pipe2.use_pallas_proj is False


def test_pallas_matcher_probe_rejection_falls_back(panoptic_rig, capsys):
    """The auto-on megakernel path must survive a backend that rejects the
    kernel (round-2 ADVICE: vmem_limit_bytes is sized for v5e-class VMEM;
    a smaller part would fail the default inference path at compile with
    no fallback).  The probe compiles the kernel AOT; rejection → XLA
    path + a stderr note, cached per process."""
    from mpe3d_tpu import pipeline as plmod

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8,), heads=(2,))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    # CPU rejects interpret=False pallas_call outright — the same failure
    # shape as a VMEM-overflow rejection on a small TPU
    plmod._PALLAS_MATCHER_PROBE.clear()
    assert plmod._pallas_matcher_probe_ok(mp, mcfg, PANOPTIC, 5, 4) is False
    assert "XLA matcher path" in capsys.readouterr().err
    # cached: second call must not re-lower
    assert plmod._PALLAS_MATCHER_PROBE  # populated
    assert plmod._pallas_matcher_probe_ok(mp, mcfg, PANOPTIC, 5, 4) is False
    # explicit False always wins, no probe involved
    pipe = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg,
                                  slot_buckets=(4,), person_buckets=(8,),
                                  use_pallas_matcher=False)
    assert pipe.use_pallas_matcher is False


def test_cli_no_pallas_matcher_flag_threads_through():
    """--no-pallas-matcher forces use_pallas_matcher=False into the
    pipeline kwargs (the serving escape hatch when the probe itself
    misbehaves)."""
    import argparse

    from mpe3d_tpu import cli

    ns = argparse.Namespace(no_pallas_matcher=True)
    # build_pipeline assembles geo_kw via getattr; replicate its gate
    geo_kw = {}
    if getattr(ns, "no_pallas_matcher", False):
        geo_kw["use_pallas_matcher"] = False
    assert geo_kw == {"use_pallas_matcher": False}
    # and the flag is actually registered on a models subcommand parser
    p = argparse.ArgumentParser()
    cli._add_common(p)
    args = p.parse_args(["--no-pallas-matcher"])
    assert args.no_pallas_matcher is True
    assert p.parse_args([]).no_pallas_matcher is False


def test_serve_dtype_bf16_pipeline(panoptic_rig):
    """serve_dtype: auto-resolves off on CPU; explicit bf16 stores the
    lifter weights in bfloat16 and produces poses close to fp32 (identical
    on TPU, where default matmul precision rounds to bf16 anyway)."""
    import jax.numpy as jnp

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    kw = dict(slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
              decode_top_k=0)
    auto = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  **kw)
    assert (auto.serve_dtype is not None) == (jax.default_backend() == "tpu")

    fp32 = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  serve_dtype=False, **kw)
    bf16 = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  serve_dtype=jnp.bfloat16, **kw)
    assert fp32.serve_dtype is None
    assert all(l["w"].dtype == jnp.bfloat16 for l in
               bf16.lifter_params["layers"])
    assert all(l["b"].dtype == jnp.float32 for l in
               bf16.lifter_params["layers"])

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(1, 3),
                             seed=13, noise=noise, with_gt=False)
    checked = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        a, b = fp32.infer_fused(fa), bf16.infer_fused(fa)
        assert _person_sets(a.persons) == _person_sets(b.persons)
        if len(a.poses):
            # untrained-lifter outputs are O(1 m); bf16 operand rounding
            # perturbs them by well under a centimetre per coordinate
            assert np.allclose(a.poses, b.poses, atol=0.02)
            checked += 1
    assert checked > 0


def test_geo_paths_agree_undersized_slot_parse(panoptic_rig):
    """Same four-path agreement when frames were PARSED with fewer
    skeleton slots than the bucket (max_skeletons=3 vs S=4): the host
    geo path must zero-pad up to the bucket (pipeline.host_decode_scores
    uses _slot_view) — a bare [:S] slice would alias the last slot in
    pair_ray_distances' gathers and silently diverge."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    kw = dict(slot_buckets=(4,), person_buckets=(8,),
              backend="triangulation", threshold=0.05, decode_top_k=0,
              geo_rerank=0.3, geo_rescue=0.001, geo_rescue_dist=0.05)
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    host = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, **kw)
    dev = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg,
                                 decode_on_device=True, **kw)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 4, n_people=(2, 3),
                             seed=13, noise=noise, with_gt=False)
    fas = [parse_frame(f, PANOPTIC, max_skeletons=3) for f in frames]
    for fa in fas:
        assert fa.kp.shape[1] == 3          # parsed under the bucket
        ph = _person_sets(host(fa).persons)
        pf = _person_sets(dev.infer_fused(fa).persons)
        assert ph == pf


def test_prior_gate_pipeline_paths_agree(panoptic_rig):
    """With prior_gate_px set, the staged and fused MLP paths agree, the
    gate changes at least one pose on a frame with a poisoned detection,
    and mutating the knob on a live pipeline retraces (the _geo_key /
    _lift_fn cache-keying contract) instead of reusing stale constants."""
    from mpe3d_tpu.data.frames import FrameArrays

    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    kw = dict(slot_buckets=(4,), person_buckets=(8,), backend="mlp",
              threshold=0.05, decode_top_k=0)
    plain = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg,
                                   lp, lcfg, **kw)
    gated = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg,
                                   lp, lcfg, prior_gate_px=8.0, **kw)

    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 6, n_people=(1, 3),
                             seed=13, noise=noise, with_gt=False)
    saw_gate_effect = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        # poison one detection so at least some priors trip the gate
        kp = fa.kp.copy()
        kp[1, :, 5] += 200.0
        fa = FrameArrays(kp, fa.valid, fa.prob, fa.in_view,
                         fa.present, fa.timestamp)
        staged = gated(fa)
        fused = gated.infer_fused(fa)
        assert _person_sets(staged.persons) == _person_sets(fused.persons)
        s_map = {frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0): i
                 for i, p in enumerate(staged.persons)}
        for i, p in enumerate(fused.persons):
            j = s_map[frozenset((c, int(s))
                                for c, s in enumerate(p) if s >= 0)]
            assert np.allclose(fused.poses[i], staged.poses[j], atol=1e-3)
        base = plain.infer_fused(fa)
        if (_person_sets(base.persons) == _person_sets(fused.persons)
                and len(base.poses)
                and not np.allclose(base.poses, fused.poses, atol=1e-6)):
            saw_gate_effect += 1
    assert saw_gate_effect > 0

    # live-mutation retrace: flipping the knob on the plain pipeline must
    # reproduce the gated pipeline's output (stale caches would not)
    fa = parse_frame(frames[0], PANOPTIC, max_skeletons=4)
    kp = fa.kp.copy()
    kp[1, :, 5] += 200.0
    fa = FrameArrays(kp, fa.valid, fa.prob, fa.in_view,
                     fa.present, fa.timestamp)
    before = plain.infer_fused(fa)
    plain.prior_gate_px = 8.0
    after = plain.infer_fused(fa)
    want = gated.infer_fused(fa)
    assert np.allclose(after.poses, want.poses, atol=1e-6)
    plain.prior_gate_px = None
    again = plain.infer_fused(fa)
    assert np.allclose(again.poses, before.poses, atol=1e-6)


def test_use_pallas_matcher_pipeline_matches(panoptic_rig):
    """Pipeline with the whole-stack GAT megakernel (interpret mode on CPU)
    scores frames identically to the default XLA matcher path."""
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                         hidden=(8, 8), heads=(2, 2))
    lcfg = LifterConfig(widths=(64, 64))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    kw = dict(slot_buckets=(4,), person_buckets=(8,), threshold=0.05,
              decode_top_k=0)
    base = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  **kw)
    mega = PoseEstimationPipeline(PANOPTIC, panoptic_rig, mp, mcfg, lp, lcfg,
                                  use_pallas_matcher=True, **kw)
    assert mega.use_pallas_matcher and not base.use_pallas_matcher
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(PANOPTIC, panoptic_rig, 3, n_people=(1, 3),
                             seed=23, noise=noise, with_gt=False)
    checked = 0
    for f in frames:
        fa = parse_frame(f, PANOPTIC, max_skeletons=4)
        a = base(fa)
        b = mega(fa)
        assert _person_sets(a.persons) == _person_sets(b.persons)
        checked += len(a.persons)
    assert checked > 0
