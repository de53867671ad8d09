"""End-to-end per-frame latency benchmark vs the reference baseline.

Measures the full inference pipeline (alt-3 features + GAT matching on
device, greedy decode on host, per-person packing + batched MLP lift on
device) on synthetic CMU-Panoptic-like multi-person frames and compares
against the reference's published per-frame wall clock
t_pp + t_3Dg = 31.67 + 19.65 = 51.32 ms (BASELINE.json; reference README.md:40-41).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

BASELINE_MS = 51.32          # t_pp + t_3Dg, reference README.md:40-41


def _probe_device(timeout_s: float = 180.0) -> bool:
    """True if the default jax backend completes a VALUE readback.

    Runs in a SUBPROCESS: a dead axon relay blocks readbacks inside
    extension code where no signal/exception can interrupt them, so an
    in-process probe would wedge the bench itself.  Two attempts because
    tunnel sessions occasionally hang at startup (CLAUDE.md).
    """
    import subprocess
    code = "import jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))"
    for _ in range(2):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _start_watchdog(seconds: float):
    """Emit the driver's JSON line and hard-exit if the bench wedges.

    A relay that dies MID-run leaves the main thread blocked in a
    readback; a daemon timer still fires and keeps the bench's contract
    (exactly one JSON line) with the driver.
    """
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "e2e_frame_latency_stream", "value": -1.0,
            "unit": "ms", "vs_baseline": 0.0,
            "error": f"watchdog: no result after {seconds:.0f}s "
                     "(device backend stalled mid-run)"}), flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def build_bench_pipe():
    """The bench's pipeline + synthetic frame set, shared with
    scripts/ondevice_frame_probe.py so the per-session latency probes
    measure EXACTLY the configuration the main bench measures."""
    import os as _os

    import jax

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config = PANOPTIC
    # the reference calibration when present: the demo matcher below is
    # TRAINED on it — paired with the synthetic ring rig its scores
    # collapse to ~0 and the decode loop runs ZERO trips (best-case, not
    # serving; round-4 finding).  Ring rig only as the no-fixture fallback.
    rig = synthetic_ring_rig(rig_config)
    _tm = "/root/reference/tm_panoptic.pickle"
    if _os.path.exists(_tm):
        from mpe3d_tpu.geometry import rig_from_files
        rig = rig_from_files(rig_config, _tm)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    # the TRAINED demo matcher when available: a random-init matcher's
    # ~0.5 sigmoid scores mark half of all candidate pairs eligible, so
    # the decode's dynamic trip count always hits the K cap — worst-case,
    # not the serving regime the reference's 51.32 ms was measured in.
    # Compute cost is otherwise weight-value-independent.
    mparams = init_matcher(jax.random.PRNGKey(0), mcfg)
    _demo = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "models_demo", "widefield", "skeleton_matching")
    try:
        from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                load_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)
        if checkpoint_exists(_demo):
            mcfg = matcher_config_from_meta(read_meta(_demo), mcfg)
            mparams, _, _ = load_checkpoint(
                _demo, init_matcher(jax.random.PRNGKey(0), mcfg))
    except Exception:
        pass                      # random init keeps the bench contract
    pipe = PoseEstimationPipeline(
        rig_config, rig,
        mparams, mcfg,
        init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
        slot_buckets=(4,), person_buckets=(8,))
    return pipe, rig_config, rig, mcfg, lcfg


def measure_ondevice_frame_us(pipe, frames, smoke: bool) -> float:
    """The honest on-device per-frame chained differential (see below)."""
    import jax.numpy as jnp

    from mpe3d_tpu.benchutil import chained_frame_us

    core = pipe._fused_fn(4, 8)
    lparams_bench = (pipe.lifter_params_frame if pipe._frame_kernel_on(4, 8)
                     else pipe.lifter_params_serve)
    fa0 = frames[0]
    chain_args = [jnp.asarray(fa0.kp[:, :4]), jnp.asarray(fa0.valid[:, :4]),
                  jnp.asarray(fa0.prob[:, :4]),
                  jnp.asarray(fa0.in_view[:, :4]),
                  jnp.asarray(fa0.present[:, :4])]
    K1, K2 = (2, 6) if smoke else (20, 120)
    model_args = (pipe.matcher_params, lparams_bench)
    return chained_frame_us(core, model_args, chain_args, K1, K2), model_args


def _session_probes(k: int, timeout_s: float = 600.0):
    """Run up to ``k`` SEQUENTIAL fresh-process probes of the on-device
    frame time (scripts/ondevice_frame_probe.py), one relay session each.

    Round-3 finding (RESULTS "session spread"): the relay's effective
    stream rate varies ±25 % across sessions, so any single-session
    number over- or under-states the kernel.  Sequential because two
    concurrent TPU processes through the relay queue-stall each other
    (CLAUDE.md).  Returns the list of measured µs (may be short: a probe
    that hangs or dies is dropped)."""
    import os
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "ondevice_frame_probe.py")
    out = []
    for _ in range(k):
        try:
            r = subprocess.run([sys.executable, script], timeout=timeout_s,
                               capture_output=True, text=True)
            if r.returncode == 0:
                for line in reversed(r.stdout.strip().splitlines()):
                    try:
                        d = json.loads(line)
                        if d.get("backend", "tpu") != "tpu":
                            # the child fell back to CPU (relay drop):
                            # a CPU number must never enter the
                            # "on-device" median (round-4 review)
                            break
                        out.append(float(d["ondevice_frame_us"]))
                        break
                    except (json.JSONDecodeError, KeyError):
                        continue
        except subprocess.TimeoutExpired:
            # the SIGKILLed child can leave a queued relay backlog that
            # stalls any FURTHER device work (CLAUDE.md) — stop probing;
            # the probes run LAST so only they are at risk
            break
    return out


def main() -> int:
    smoke = "--smoke" in sys.argv
    backend = "cpu_smoke" if smoke else "device"
    if not smoke and not _probe_device():
        # Device backend unreachable (e.g. relay outage): keep the driver
        # contract with a CPU-sized fallback run rather than hanging.
        smoke = True
        backend = "cpu_fallback"
    if smoke:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    # generous on-device budget: cold remote compiles of the 5+ large
    # programs can take minutes each (CLAUDE.md) — the watchdog is a
    # last-resort contract keeper, not a performance assertion
    # round 4 added the crowded S=16 row (the doomed full-variant probe
    # compile alone is minutes on a cold cache) and the synth row — the
    # cold-cache worst case grew past the old 3300 s budget
    watchdog = _start_watchdog(900.0 if smoke else 4800.0)
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames, synthetic_ring_rig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    pipe, rig_config, rig, mcfg, lcfg = build_bench_pipe()

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    n_frames = 10 if smoke else 60
    wire = generate_frames(rig_config, rig, n_frames, n_people=(2, 3),
                           seed=11, noise=noise, with_gt=False)
    frames = [parse_frame(f, rig_config, max_skeletons=4) for f in wire]

    for f in frames[:5]:                       # warm the fused e2e path
        pipe.infer_fused(f)

    # pipelined streaming latency — the PRIMARY metric — measured first,
    # best-of-3 like the depth sweep.  History: chain4/chain8 runs of this
    # bench collapsed to 128.7/190 ms/frame while the sweep measured
    # 4.1 ms in the same sessions.  Root cause (measured, fixed): the
    # trained checkpoint loads as a HOST-NUMPY tree, and numpy jit args
    # re-transfer on EVERY dispatch (~70 MB of weights per frame; a single
    # 12.5 MB numpy arg measured 360 vs 39 ms/dispatch through the relay).
    # The sweep used random DEVICE-array init, hence the difference.
    # PoseEstimationPipeline now device_puts params at construction.
    list(pipe.infer_stream(frames, depth=16))   # warm
    stream_ms = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = list(pipe.infer_stream(frames, depth=16))
        dt = (time.perf_counter() - t0) / max(len(outs), 1) * 1e3
        stream_ms = dt if stream_ms is None else min(stream_ms, dt)

    # relay round-trip reference: the dispatch→readback time of a trivial
    # program.  Relay sessions vary ~5× (measured 32-160 ms single
    # dispatch across sessions); this anchors every latency field in the
    # line to the session it was measured in.
    import jax.numpy as _jnp
    float(_jnp.ones(()) + 0)                   # warm
    _t0 = time.perf_counter()
    for _ in range(3):
        float(_jnp.ones(()) + 0)
    rtt_ms = (time.perf_counter() - _t0) / 3 * 1e3

    times = []
    for f in frames:
        t0 = time.perf_counter()
        out = pipe.infer_fused(f)              # ONE dispatch + ONE readback
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1000.0)

    # serving front-end loopback: the full `serve` path per frame — wire
    # line → native parse → fused dispatch (depth-8 window) → JSON line —
    # with no socket, so it measures protocol + host work + device RTT
    from mpe3d_tpu.serve import PoseServer

    lines = [json.dumps(w) for w in wire]
    sink = []
    PoseServer(pipe, rig_config, max_skeletons=4,
               depth=16).handle_stream(lines, sink.append)      # warm
    sink = []
    t0 = time.perf_counter()
    PoseServer(pipe, rig_config, max_skeletons=4,
               depth=16).handle_stream(lines, sink.append)
    serve_ms = (time.perf_counter() - t0) / max(len(sink), 1) * 1e3

    # batched offline-eval throughput (one dispatch per batch)
    B = min(32, len(frames))
    pipe.infer_batch(frames[:B], slots=4)      # warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        pipe.infer_batch(frames[:B], slots=4)
    fps = B * reps / (time.perf_counter() - t0)

    # ---- honest on-device per-frame time (chained differential) ---------
    # Through the axon relay only VALUE readbacks synchronise (CLAUDE.md),
    # so the fused program is chained K times inside one jit (frame i+1's
    # pixels nudged by 1e-9·Σposes_i — numerically invisible, defeats
    # elision) and timed as (t_K2 − t_K1)/(K2 − K1) with float() syncs.
    import jax.numpy as jnp

    # the fused program's lifter argument depends on which body serves the
    # bucket: the whole-frame pallas kernel takes the frame-packed list,
    # the XLA program the layer tree (pipeline.submit_fused logic)
    ondevice_us_own, model_args = measure_ondevice_frame_us(pipe, frames,
                                                            smoke)
    from mpe3d_tpu.benchutil import chained_frame_us
    fa0 = frames[0]
    chain_args = [jnp.asarray(fa0.kp[:, :4]), jnp.asarray(fa0.valid[:, :4]),
                  jnp.asarray(fa0.prob[:, :4]),
                  jnp.asarray(fa0.in_view[:, :4]),
                  jnp.asarray(fa0.present[:, :4])]
    K1, K2 = (2, 6) if smoke else (20, 120)

    # HBM roofline: the fused frame is weight-streaming-bound (arithmetic
    # intensity ≈ P_max=8 FLOP/byte ≪ the v5e ridge ~240), so light speed
    # is served-parameter bytes over the chip's 819 GB/s HBM bandwidth.
    # Unique buffers only: the frame-packed list shares its hidden-layer
    # weights with the layer tree by object identity.
    import numpy as _np
    _seen, wbytes = set(), 0
    for x in jax.tree_util.tree_leaves(model_args):
        if id(x) not in _seen:
            _seen.add(id(x))
            wbytes += _np.size(x) * _np.dtype(jnp.asarray(x).dtype).itemsize
    hbm_floor_us = wbytes / 819e9 * 1e6

    # batched on-device per-frame time: infer_batch's core amortizes the
    # weight stream over B frames (the offline-eval throughput mode), so
    # its per-frame time should land far below the single-frame figure.
    BB = 4 if smoke else 32
    # the batch program is always the XLA variant (weights amortize across
    # the window) — it takes the LAYER tree regardless of the kernel mode
    batch_model_args = (pipe.matcher_params, pipe.lifter_params)
    batch_core = pipe._fused_batch_fn(4, 8)
    batch_args = [jnp.asarray(_np.repeat(_np.asarray(a)[None], BB, 0))
                  for a in chain_args]
    ondevice_batched_us = chained_frame_us(
        batch_core, batch_model_args, batch_args, K1, K2) / BB

    # ---- training throughput / MFU (scan-epoch lifter trainer) ----------
    # Reference batch 2096 (train_pose_estimator.py:6).  The dataset is
    # GENERATED ON DEVICE (no host upload); one lax.scan dispatch per epoch.
    # Matmul FLOPs: fwd 2·Σ(d_in·d_out) per sample, bwd ≈ 2× fwd → 6·Σ.
    # The MLP matmuls run with default precision → bf16 operands on the MXU
    # (fp32 accumulate), so peak is the chip's bf16 rate.
    import jax.numpy as jnp
    import optax

    from mpe3d_tpu.config import LifterTrainConfig
    from mpe3d_tpu.train.lifter import make_train_step

    bs = 256 if smoke else 2096
    k_batches = 2 if smoke else 16
    n_samples = bs * k_batches
    tcfg = LifterTrainConfig(batch_size=bs)
    tx = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip_norm),
                     optax.adam(tcfg.lr))
    _, _, epoch_step, _ = make_train_step(pipe.used_rig,
                                          rig_config.n_joints,
                                          lcfg, tcfg, tx)
    # fresh fp32 params: the pipeline may have bf16-cast its own copy for
    # serving (serve_dtype), but training throughput/MFU must measure the
    # fp32 configuration train_lifter actually runs
    lparams = {"model": init_lifter(jax.random.PRNGKey(9), lcfg)}
    opt_state = tx.init(lparams)
    gen = jax.jit(lambda k: (
        jax.random.normal(k, (n_samples, lcfg.in_dim)) * 0.3,
        jnp.abs(jax.random.normal(k, (n_samples, rig_config.loss_input_dim)))))
    net_all, err_all = gen(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    # warm/compile one epoch.  Timing uses VALUE readbacks (float(...)):
    # through the axon relay, block_until_ready returns at protocol ACK
    # time, long before the device has executed — only a value readback
    # truly synchronises (measured: a "blocked" queue later took 110 s to
    # drain at the first float()).
    lparams, opt_state, losses, _ = epoch_step(lparams, opt_state, net_all,
                                               err_all, key,
                                               k_batches=k_batches,
                                               batch_size=bs)
    float(losses.sum())
    reps_t = 1 if smoke else 3
    t0 = time.perf_counter()
    for r in range(reps_t):
        key, k = jax.random.split(key)
        lparams, opt_state, losses, _ = epoch_step(lparams, opt_state,
                                                   net_all, err_all, k,
                                                   k_batches=k_batches,
                                                   batch_size=bs)
    float(losses.sum())
    train_wall = time.perf_counter() - t0
    sps = reps_t * k_batches * bs / train_wall
    dims = (lcfg.in_dim, *lcfg.widths, lcfg.out_dim)
    mm_flops_fwd = 2.0 * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    train_tflops = 3.0 * mm_flops_fwd * sps / 1e12
    PEAK_BF16_TFLOPS = 197.0               # TPU v5e MXU peak (bf16)
    mfu = train_tflops / PEAK_BF16_TFLOPS * 100.0

    # ---- max-throughput training config (round-3 MFU ladder) ------------
    # The reference-parity row above pins batch 2096 / fp32 operands.  The
    # measured ladder (RESULTS "training MFU ladder") shows the optimizer/
    # activation HBM traffic amortizes with batch, and bf16 matmul
    # OPERANDS (fp32 master + accum — bit-identical on the MXU, which
    # rounds operands to bf16 under default precision anyway) halve the
    # activation bytes the backward re-reads: 44 → 62 % MFU on-chip.
    bs_best, k_best = (256, 2) if smoke else (8192, 4)
    tcfg_best = LifterTrainConfig(batch_size=bs_best, compute_dtype="bf16")
    _, _, epoch_best, _ = make_train_step(pipe.used_rig, rig_config.n_joints,
                                          lcfg, tcfg_best, tx)
    n_best = bs_best * k_best
    netb, errb = jax.jit(lambda k: (
        jax.random.normal(k, (n_best, lcfg.in_dim)) * 0.3,
        jnp.abs(jax.random.normal(k, (n_best, rig_config.loss_input_dim)))
    ))(jax.random.PRNGKey(4))
    lp_b = {"model": init_lifter(jax.random.PRNGKey(9), lcfg)}
    os_b = tx.init(lp_b)
    lp_b, os_b, lb, _ = epoch_best(lp_b, os_b, netb, errb,
                                   jax.random.PRNGKey(5),
                                   k_batches=k_best, batch_size=bs_best)
    float(lb.sum())
    kb = jax.random.PRNGKey(6)
    t0 = time.perf_counter()
    for _ in range(reps_t):
        kb, k = jax.random.split(kb)
        lp_b, os_b, lb, _ = epoch_best(lp_b, os_b, netb, errb, k,
                                       k_batches=k_best, batch_size=bs_best)
    float(lb.sum())
    sps_best = reps_t * n_best / (time.perf_counter() - t0)
    mfu_best = 3.0 * mm_flops_fwd * sps_best / 1e12 / PEAK_BF16_TFLOPS * 100

    # ---- matcher training throughput (round-3 VERDICT item 2) -----------
    # Scenes/s of the GAT matcher trainer through the SAME scan-chained
    # epoch program ``train_matcher`` runs (one dispatch per epoch, scene
    # bank device-resident).  The round-3 bench timed 10 INDIVIDUAL step
    # dispatches after a readback — through the relay each dispatch costs
    # ~25 ms RTT (CLAUDE.md), so that loop measured the relay, not the
    # trainer (BENCH_r03: 425.8 scenes/s / 0.41 "MFU").  MFU from XLA's
    # own cost analysis of the compiled epoch (the GAT's incidence-matmul
    # FLOPs depend on topology, so the analytic lifter model doesn't
    # apply).  Two ladder rows, mirroring the lifter's: the reference-
    # parity config (fp32 "highest" matmuls — serving-score numerics) and
    # the max-throughput config (bigger batch, bf16 matmul operands via
    # MatcherConfig.matmul_precision="default").
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.train.matcher import make_matcher_step

    import dataclasses as _dc

    S_m = 4
    topo_m = build_topology(len(pipe.match_idx), S_m)
    tx_m = optax.adamw(1e-4, weight_decay=1e-20)
    Cm, Jm, Em = len(pipe.match_idx), rig_config.n_joints, topo_m.n_pairs

    def matcher_row(batch, k_batches, precision):
        mcfg_t = _dc.replace(mcfg, feat_drop=0.0, attn_drop=0.0,
                             matmul_precision=precision)
        _, _, _, mepoch, _ = make_matcher_step(pipe.match_rig, rig_config,
                                               topo_m, mcfg_t, tx_m)
        n = batch * k_batches
        kmb = jax.random.PRNGKey(8)
        bank = jax.jit(lambda k: (
            jax.random.uniform(k, (n, Cm, S_m, Jm, 2)) * 500,
            jnp.ones((n, Cm, S_m, Jm)), jnp.ones((n, Cm, S_m, Jm)),
            jnp.ones((n, Cm, S_m, Jm), bool),
            jnp.ones((n, Cm, S_m), bool),
            jnp.zeros((n, Em)), jnp.ones((n, Em))))(kmb)
        mp = init_matcher(jax.random.PRNGKey(7), mcfg_t)
        mo = tx_m.init(mp)
        try:
            cost = mepoch.lower(mp, mo, bank, kmb, k_batches=k_batches,
                                batch_size=batch).compile().cost_analysis()
            flops_ep = float(cost.get("flops", 0.0))
        except Exception:
            flops_ep = 0.0
        mp, mo, ml = mepoch(mp, mo, bank, kmb, k_batches=k_batches,
                            batch_size=batch)          # warm (compile)
        float(ml.sum())
        mk = jax.random.PRNGKey(10)
        reps = 1 if smoke else 4
        t0 = time.perf_counter()
        for _ in range(reps):
            mk, k = jax.random.split(mk)
            mp, mo, ml = mepoch(mp, mo, bank, k, k_batches=k_batches,
                                batch_size=batch)
        float(ml.sum())
        wall = time.perf_counter() - t0
        sps = reps * n / wall
        mfu = (flops_ep * reps / wall / 1e12
               / PEAK_BF16_TFLOPS * 100.0) if flops_ep else -1.0
        return sps, mfu

    if smoke:
        m_sps, m_mfu = matcher_row(8, 2, "highest")
        m_sps_best, m_mfu_best = matcher_row(16, 2, "default")
        Bm, Bm_best = 8, 16
    else:
        m_sps, m_mfu = matcher_row(60, 16, "highest")
        m_sps_best, m_mfu_best = matcher_row(512, 8, "default")
        Bm, Bm_best = 60, 512

    # ---- on-device scene synthesis epoch (round-3 VERDICT item 3) -------
    # scenes/s of the matcher trainer when each batch is SYNTHESIZED ON
    # DEVICE inside the epoch scan (train/matcher_synth.py) — the epoch
    # wall includes composite synthesis, feature build, fwd+bwd, Adam.
    synth_sps = -1.0
    try:
        from mpe3d_tpu.data.frames import parse_frame as _pf  # noqa: F401
        from mpe3d_tpu.train.matcher_synth import (build_scene_bank,
                                                   synth_scenes)

        noise_s = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                             spurious_rate=0.08, camera_dropout=0.05)
        inputs_s = [generate_frames(rig_config, rig, 6 if smoke else 30,
                                    n_people=(1, 1), seed=60 + i,
                                    noise=noise_s, with_gt=False)
                    for i in range(3)]
        bank = build_scene_bank(inputs_s, rig_config)
        bank_res = jax.device_put(bank.device_arrays())
        segs, tops = bank.file_segments, bank.top_sets
        mcfg_s = _dc.replace(mcfg, feat_drop=0.0, attn_drop=0.0,
                             matmul_precision="default")
        mstep, _, _, _, _ = make_matcher_step(pipe.match_rig, rig_config,
                                              topo_m, mcfg_s, tx_m)
        Bs, Ks = (8, 2) if smoke else (60, 16)

        @jax.jit
        def synth_epoch(mp, mo, bank, key):
            # bank passes as an ARGUMENT — capturing device arrays in a
            # jit closure takes the relay's hidden-parameter slow path
            # and degrades the whole session (CLAUDE.md)
            def body(carry, k):
                p, o = carry
                batch = synth_scenes(bank, k, Bs, topo_m, segs, tops)
                p, o, loss = mstep(p, o, batch)
                return (p, o), loss
            keys = jax.random.split(key, Ks)
            (mp, mo), losses = jax.lax.scan(body, (mp, mo), keys)
            return mp, mo, losses

        mp_s = init_matcher(jax.random.PRNGKey(7), mcfg_s)
        mo_s = tx_m.init(mp_s)
        mp_s, mo_s, ls = synth_epoch(mp_s, mo_s, bank_res,
                                     jax.random.PRNGKey(11))
        float(ls.sum())
        reps_s = 1 if smoke else 4
        ks = jax.random.PRNGKey(12)
        t0 = time.perf_counter()
        for _ in range(reps_s):
            ks, k = jax.random.split(ks)
            mp_s, mo_s, ls = synth_epoch(mp_s, mo_s, bank_res, k)
        float(ls.sum())
        synth_sps = reps_s * Bs * Ks / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — auxiliary row must not kill
        print(f"[bench] synth row skipped: {e}", file=sys.stderr)

    # ---- crowded-bucket frame (S=16, the split frame kernel) ------------
    # The regime the reference's eval cannot score at all
    # (metrics_from_model.py:322-337); round 3 served it through the XLA
    # fallback at 2.21 ms — round 4's tiled-GAT split kernel is the
    # serving path (probe-resolved per bucket; falls back on rejection).
    crowded_us, crowded_variant = -1.0, "n/a"
    import os as _os_b   # `os` is a smoke-branch-local in main()
    if not smoke and _os_b.environ.get("MPE3D_BENCH_CROWDED", "1") != "0":
        try:
            from mpe3d_tpu.data.frames import parse_frame
            from mpe3d_tpu.pipeline import PoseEstimationPipeline

            pipe16 = PoseEstimationPipeline(
                rig_config, rig, pipe.matcher_params, mcfg,
                init_lifter(jax.random.PRNGKey(1), lcfg), lcfg,
                slot_buckets=(16,), person_buckets=(16,))
            P16 = pipe16._p_max(16)
            w16 = generate_frames(rig_config, rig, 1, n_people=(14, 14),
                                  seed=77, noise=SceneNoise(
                                      pixel_sigma=1.5, joint_dropout=0.05,
                                      spurious_rate=0.05,
                                      camera_dropout=0.03),
                                  with_gt=False)
            f16 = parse_frame(w16[0], rig_config, max_skeletons=16)
            core16 = pipe16._fused_fn(16, P16)
            v16 = pipe16._frame_kernel_on(16, P16)
            crowded_variant = v16 if v16 else "xla"
            lp16 = (pipe16.lifter_params_frame if v16
                    else pipe16.lifter_params_serve)
            ca16 = [jnp.asarray(a) for a in
                    (f16.kp, f16.valid, f16.prob, f16.in_view,
                     f16.present)]
            crowded_us = chained_frame_us(
                core16, (pipe16.matcher_params, lp16), ca16, 6, 24)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] crowded row skipped: {e}", file=sys.stderr)

    # session-robust headline (round-3 VERDICT #5): the relay's effective
    # rate varies ±25 % across sessions, so the headline is the MEDIAN of
    # this session + 2 sequential fresh-process probes (persistent compile
    # cache makes repeats cheap).  Probes run LAST: a probe child killed
    # at timeout can leave a relay backlog that stalls subsequent device
    # work (CLAUDE.md), so nothing measured may come after them.
    sessions = [ondevice_us_own]
    if not smoke:
        sessions += _session_probes(2)
    sessions_sorted = sorted(sessions)
    ondevice_us = sessions_sorted[len(sessions_sorted) // 2]
    spread_pct = (100.0 * (max(sessions) - min(sessions)) / ondevice_us
                  if ondevice_us > 0 else -1.0)

    # Primary metric: steady-state streaming per-frame latency.  The
    # reference's 51.32 ms is the average over a continuous evaluation loop
    # (metrics_from_model.py:178-300), so the sustained number is the
    # apples-to-apples comparison; the single-dispatch figure is dominated
    # by one remote-relay round trip (~25-50 ms, session-dependent) that
    # does not exist on a direct-attached TPU (measured 0.137 ms on-device).
    watchdog.cancel()
    print(json.dumps({
        "metric": "e2e_frame_latency_stream",
        "value": round(stream_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / stream_ms, 2),
        "backend": backend,
        "relay_rtt_ms": round(rtt_ms, 2),
        "single_dispatch_ms": round(ms, 3),
        "serve_frame_ms": round(serve_ms, 3),
        "batched_throughput_fps": round(fps, 1),
        "ondevice_frame_us": round(ondevice_us, 1),
        "ondevice_frame_us_sessions": [round(u, 1) for u in sessions],
        "ondevice_frame_spread_pct": round(spread_pct, 1),
        "served_weight_mb": round(wbytes / 2**20, 2),
        "hbm_roofline_pct": round(100.0 * hbm_floor_us / ondevice_us, 1),
        "ondevice_batched_frame_us": round(ondevice_batched_us, 1),
        "train_samples_per_s": round(sps, 1),
        "train_tflops": round(train_tflops, 2),
        "train_mfu_pct_bf16peak": round(mfu, 2),
        "train_batch": bs,
        "train_best_samples_per_s": round(sps_best, 1),
        "train_best_mfu_pct": round(mfu_best, 2),
        "train_best_config": f"batch{bs_best}_bf16",
        "matcher_train_scenes_per_s": round(m_sps, 1),
        "matcher_train_mfu_pct": round(m_mfu, 2),
        "matcher_train_batch": Bm,
        "matcher_train_best_scenes_per_s": round(m_sps_best, 1),
        "matcher_train_best_mfu_pct": round(m_mfu_best, 2),
        "matcher_train_best_config": f"batch{Bm_best}_bf16",
        "matcher_synth_train_scenes_per_s": round(synth_sps, 1),
        "crowded_frame_us": round(crowded_us, 1),
        "crowded_frame_variant": crowded_variant,
    }))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # noqa: BLE001 — the driver needs the JSON line
        print(json.dumps({"metric": "e2e_frame_latency_stream", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: {e}"}))
        sys.exit(1)
