"""Command-line interface — one entry point with subcommands mirroring the
reference's scripts (SURVEY.md §5 config plan):

  train-matcher             ≙ skeleton_matching/train_skeleton_matching.py
  train-lifter              ≙ pose_estimator/train_pose_estimator.py
  metrics-from-model        ≙ test/metrics_from_model.py
  metrics-from-triangulation≙ test/metrics_from_triangulation.py
  sm-metrics                ≙ test/sm_metrics.py
  sm-metrics-without-gt     ≙ test/sm_metrics_without_gt.py
  reprojection-error        ≙ test/reprojection_error.py
  show-results              ≙ test/show_results_from_{model,triangulation}.py
  merge-jsons               ≙ utils/merge_jsons.py
  infer                     (new) frames JSON → 3D poses JSON
  generate-synthetic        (new) synthetic wire-format data generator
  convert-torch             (new) reference torch checkpoints → npz

Run ``python -m mpe3d_tpu <subcommand> --help``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional
import numpy as np


# ---------------------------------------------------------------------------
# shared loading helpers
# ---------------------------------------------------------------------------


def load_rig(args):
    from mpe3d_tpu.config import get_rig
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig
    from mpe3d_tpu.geometry.calib_io import rig_from_files

    rig_config = get_rig(args.rig)
    tm = args.tm or rig_config.transformations_path
    if tm and os.path.exists(tm):
        return rig_config, rig_from_files(rig_config, tm)
    if args.tm:
        # an EXPLICIT --tm that doesn't resolve must fail loudly — a typo
        # silently evaluated against a synthetic ring rig produces
        # plausible-looking garbage metrics
        sys.exit(f"--tm {args.tm}: file not found")
    print(f"[mpe3d] calibration '{tm}' not found — using a synthetic ring "
          "rig", file=sys.stderr)
    return rig_config, synthetic_ring_rig(rig_config)


def load_models(models_dir: str, rig_config):
    """Load matcher + lifter from a directory holding either our npz
    checkpoints or the reference's torch files."""
    import jax

    from mpe3d_tpu.config import LifterConfig, MatcherConfig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    j = os.path.join

    if checkpoint_exists(j(models_dir, "skeleton_matching")):
        # architecture variants (hidden/heads/residual/dropout) the
        # checkpoint was trained with override the rig default
        mcfg = matcher_config_from_meta(
            read_meta(j(models_dir, "skeleton_matching")), mcfg)
        mparams, _, _ = load_checkpoint(
            j(models_dir, "skeleton_matching"),
            init_matcher(jax.random.PRNGKey(0), mcfg))
    elif os.path.exists(j(models_dir, "skeleton_matching.tch")):
        from mpe3d_tpu.convert.torch_import import load_reference_matcher
        mparams, mcfg = load_reference_matcher(
            j(models_dir, "skeleton_matching.tch"),
            j(models_dir, "skeleton_matching.prms"))
    else:
        print("[mpe3d] no matcher checkpoint found — using random init",
              file=sys.stderr)
        mparams = init_matcher(jax.random.PRNGKey(0), mcfg)

    lifter_prior = "mean"
    if checkpoint_exists(j(models_dir, "pose_estimator")):
        # any stored variant (fp32 / int8 / bf16 servable), architecture +
        # packing prior variant from the meta — shared with the serving
        # hot-reload path (train/checkpoint.py::load_lifter_checkpoint)
        from mpe3d_tpu.train.checkpoint import load_lifter_checkpoint
        lparams, lcfg, lifter_prior = load_lifter_checkpoint(
            j(models_dir, "pose_estimator"), lcfg)
    elif os.path.exists(j(models_dir, "pose_estimator.pytorch")):
        from mpe3d_tpu.convert.torch_import import load_reference_lifter
        lparams, lcfg = load_reference_lifter(
            j(models_dir, "pose_estimator.pytorch"))
    else:
        print("[mpe3d] no lifter checkpoint found — using random init",
              file=sys.stderr)
        lparams = init_lifter(jax.random.PRNGKey(1), lcfg)
    return mparams, mcfg, lparams, lcfg, lifter_prior


def resolve_auto_serve_dtype(lifter_cfg, backend: str,
                             matmul_precision) -> Optional[str]:
    """The serving front-end's ``--serve-dtype auto`` policy.

    Everything (serve included) keeps the pipeline default: bf16 on TPU —
    a bit-identical cast under default matmul precision (pipeline.py:158).
    int8 weight-only serving stays OPT-IN (`--serve-dtype int8`): although
    it halves HBM weight bytes again and is accuracy-free for
    residual-prior checkpoints (−0.03 mm, the fp32 prior rides outside
    the quantised stack; reports/serve_int8_residual_r2b.json), the
    measured v5e frame-time ladder at serving shapes is fp32 629 µs /
    bf16 268 µs / int8 499 µs (reports/chain4_logs/dec_def_*.log): the
    pallas dequant kernel's per-invocation overhead (~26 µs × 9 layers)
    exceeds the bandwidth it saves, so auto-selecting it would COST
    latency.  int8's remaining use case is HBM capacity (many models
    resident per chip), not speed — a deliberate deployment choice.

    Returns ``None`` (= keep the pipeline's own default); kept as the
    single policy hook should a faster dequant path change the call.
    """
    del lifter_cfg, backend, matmul_precision
    return None


def build_pipeline(args, backend: str):
    import jax

    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config, rig = load_rig(args)
    refined = (os.path.join(args.modelsdir, "refined_rig.npz")
               if getattr(args, "modelsdir", None) else None)
    if refined and os.path.exists(refined):
        # the checkpoint was trained with --optimise-matrices: pair it with
        # the co-adapted calibration, not the original --tm rig
        from mpe3d_tpu.geometry.camera import load_rig_npz
        rig = load_rig_npz(refined)
        print(f"[mpe3d] using refined calibration {refined} "
              "(trained with --optimise-matrices; overrides --tm)",
              file=sys.stderr)
    mparams, mcfg, lparams, lcfg, lifter_prior = load_models(
        args.modelsdir, rig_config)
    # forward only the geo flags this subcommand defines — the pipeline
    # signature stays the single source of the defaults
    geo_kw = {k: getattr(args, k)
              for k in ("geo_rerank", "geo_rescue", "geo_rescue_dist",
                        "prior_gate_px", "tri_variant")
              if hasattr(args, k)}
    if getattr(args, "serve_dtype", "auto") != "auto":
        import jax.numpy as jnp
        geo_kw["serve_dtype"] = {"fp32": False, "bf16": jnp.bfloat16,
                                 "int8": "int8"}[args.serve_dtype]
    elif getattr(args, "serve_auto_int8", False):
        # only the `serve` subcommand opts into the lossy auto step
        sd = resolve_auto_serve_dtype(
            lcfg, jax.default_backend(),
            jax.config.jax_default_matmul_precision)
        if sd is not None:
            print(f"[mpe3d] serve-dtype auto → {sd} "
                  "(residual-prior checkpoint; measured −0.03 mm)",
                  file=sys.stderr)
            geo_kw["serve_dtype"] = sd
    if getattr(args, "no_pallas_matcher", False):
        geo_kw["use_pallas_matcher"] = False
    if getattr(args, "no_frame_kernel", False):
        geo_kw["use_frame_kernel"] = False
    if getattr(args, "fused_mlp", False):
        # whole-network pallas serving kernel (ops/fused_mlp.py); opt-in
        # until the on-chip A/B flips the TPU default
        geo_kw["use_fused_mlp"] = True
    pipe = PoseEstimationPipeline(
        rig_config, rig, mparams, mcfg, lparams, lcfg, backend=backend,
        lifter_prior=lifter_prior, **geo_kw)
    return rig_config, rig, pipe


def _load_files(paths):
    """Raw wire dicts — only for consumers that need per-camera GT lists
    (sm-metrics' proximity clustering).  The pose-metric paths load through
    the native parser via ``_load_eval_files``."""
    from mpe3d_tpu.data.frames import load_frames
    frames = []
    for p in paths:
        frames.extend(load_frames(p))
    return frames


def _load_eval_files(paths, rig_config, max_skeletons: int = 10):
    """(FrameArrays, GroundTruth) lists via the C++ parser (one native pass
    per file; python fallback transparent)."""
    from mpe3d_tpu.data.frames import load_eval_frames
    return load_eval_frames(paths, rig_config, max_skeletons)


def _print_report(report: dict):
    print(json.dumps(report, indent=2, default=str))


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_train_matcher(args):
    from mpe3d_tpu.config import MatcherConfig, MatcherTrainConfig
    from mpe3d_tpu.data.frames import load_frames
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.train.matcher import train_matcher
    from mpe3d_tpu.train.matcher_data import build_matcher_scenes

    rig_config, rig = load_rig(args)
    topo = build_topology(rig_config.n_matching_cameras, args.slots)
    tcfg = MatcherTrainConfig(epochs=args.epochs, limit=args.limit,
                              batch_size=args.batch_size, seed=args.seed,
                              checkpoint_backend=args.ckpt_backend)
    cfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    train = bank = None
    if getattr(args, "device_synth", False):
        from mpe3d_tpu.train.matcher_synth import build_scene_bank
        bank = build_scene_bank([load_frames(p) for p in args.trainset],
                                rig_config)
        n_bank = int(bank.kp.shape[0])
        print(f"device-synth bank: {n_bank} frames, "
              f"{int(bank.aug_frame.shape[0])} augmented entries; "
              f"{tcfg.limit} scenes/epoch synthesized on device")
    else:
        train = build_matcher_scenes([load_frames(p) for p in args.trainset],
                                     rig_config, topo, limit=tcfg.limit,
                                     seed=tcfg.seed)
    dev = build_matcher_scenes([load_frames(p) for p in args.devset],
                               rig_config, topo, limit=tcfg.limit,
                               seed=tcfg.seed + 1)
    print(f"train scenes: "
          f"{'on-device synth' if bank is not None else len(train)}, "
          f"dev scenes: {len(dev)}")
    out = os.path.join(args.modelsdir, "skeleton_matching")
    params = opt_state = None
    if getattr(args, "resume", False):
        import jax
        import optax

        from mpe3d_tpu.models.gat import init_matcher
        from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                                load_checkpoint,
                                                matcher_config_from_meta,
                                                read_meta)
        if not checkpoint_exists(out):
            sys.exit(f"--resume: no checkpoint at {out} "
                     f"(.npz or .orbax/) — drop --resume to train fresh")
        # the checkpoint's architecture (residual/dropout/hidden) overrides
        # the default — the load template must match its leaves
        cfg = matcher_config_from_meta(read_meta(out), cfg)
        tmpl_p = init_matcher(jax.random.PRNGKey(0), cfg)
        tmpl_o = optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay) \
            .init(tmpl_p)
        params, opt_state, meta = load_checkpoint(out, tmpl_p, tmpl_o)
        print(f"resuming from {out} (epoch {meta.get('epoch')}, "
              f"val {meta.get('val_loss')}, "
              f"opt_state={'yes' if opt_state is not None else 'no'})")
    res = train_matcher(train, dev, rig_config, rig, topo, cfg, tcfg,
                        checkpoint_path=out, params=params,
                        opt_state=opt_state, synth_bank=bank)
    print(f"best dev loss {res.best_val_loss:.6f} after {res.epochs_run} "
          f"epochs → {out} [{tcfg.checkpoint_backend}]")
    if args.testset:
        test = build_matcher_scenes([load_frames(p) for p in args.testset],
                                    rig_config, topo, limit=tcfg.limit,
                                    seed=tcfg.seed + 2)
        from mpe3d_tpu.train.matcher import make_matcher_step
        import jax
        import jax.numpy as jnp
        import optax
        match_rig = rig.select(np.asarray(rig_config.matching_camera_indices()))
        _, eval_step, _, _, _ = make_matcher_step(
            match_rig, rig_config, topo, cfg,
            optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay))
        # device losses accumulate; ONE readback at the end (per-batch
        # float() would pay a ~25 ms relay RTT each — CLAUDE.md), and the
        # mean is batch-size weighted so a partial final batch doesn't
        # skew the headline number
        losses, sizes = [], []
        for i in range(0, len(test), tcfg.batch_size):
            s = test.select(slice(i, i + tcfg.batch_size))
            losses.append(eval_step(res.params, tuple(
                jnp.asarray(b) for b in (s.kp, s.valid, s.prob, s.observed,
                                         s.present, s.labels,
                                         s.pair_weight))))
            sizes.append(len(s.kp))
        lh = jax.device_get(losses)
        mse = float(np.average(lh, weights=sizes)) if sizes else float("nan")
        print(f"MSE for the test set {mse:.6f}")


def cmd_train_lifter(args):
    from mpe3d_tpu.config import LifterConfig, LifterTrainConfig
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset_from_files

    rig_config, rig = load_rig(args)
    tcfg = LifterTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                             optimise_matrices=args.optimise_matrices,
                             seed=args.seed, loss=args.loss,
                             checkpoint_backend=args.ckpt_backend,
                             ema_decay=args.ema,
                             compute_dtype=args.compute_dtype)
    from mpe3d_tpu.train.checkpoint import checkpoint_exists
    ckpt_path = os.path.join(args.modelsdir, "pose_estimator")
    refined_rig_path = os.path.join(args.modelsdir, "refined_rig.npz")
    if getattr(args, "resume", False):
        # checked BEFORE the (expensive) dataset build: a missing
        # checkpoint must fail in milliseconds, not minutes
        if not checkpoint_exists(ckpt_path):
            sys.exit(f"--resume: no checkpoint at {ckpt_path} "
                     f"(.npz or .orbax/) — drop --resume to train fresh")
        # the packer variant is baked into the checkpoint: resuming with a
        # different --prior would train on a different input distribution
        # AND overwrite the recorded prior at the next save
        from mpe3d_tpu.train.checkpoint import read_meta
        if read_meta(ckpt_path).get("stored"):
            sys.exit(f"{ckpt_path} is a serving-only export "
                     f"(stored={read_meta(ckpt_path).get('stored')}) — it has "
                     f"no fp32 master weights to resume from")
        ck_prior = read_meta(ckpt_path).get("prior", "mean")
        if ck_prior != args.prior:
            sys.exit(f"{ckpt_path} was trained with prior={ck_prior}; "
                     f"pass --prior {ck_prior} or use a fresh --modelsdir")
        if os.path.exists(refined_rig_path):
            # the loaded weights co-adapted to the refined calibration —
            # the resumed leg must pack data and compute its loss against
            # THAT rig, not the original --tm one
            from mpe3d_tpu.geometry.camera import load_rig_npz
            rig = load_rig_npz(refined_rig_path)
            print(f"[mpe3d] resuming with refined calibration "
                  f"{refined_rig_path}", file=sys.stderr)
    net_t, err_t = build_lifter_dataset_from_files(
        args.trainset, rig_config, rig, cache=args.cache, prior=args.prior)
    net_d, err_d = build_lifter_dataset_from_files(
        args.devset, rig_config, rig, cache=args.cache, prior=args.prior)
    print(f"dataset length: {len(net_t)} (dev {len(net_d)})")
    out = ckpt_path
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3,
                        residual_prior=getattr(args, "residual_prior", False))
    params = opt_state = None
    if getattr(args, "resume", False):
        import jax
        import optax

        from mpe3d_tpu.models.mlp import init_lifter
        from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                                load_checkpoint, read_meta)
        lcfg = lifter_config_from_meta(read_meta(out), lcfg)
        tmpl_p = init_lifter(jax.random.PRNGKey(0), lcfg)
        tmpl_o = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip_norm),
            optax.adam(tcfg.lr)).init({"model": tmpl_p})
        params, opt_state, meta = load_checkpoint(out, tmpl_p, tmpl_o)
        print(f"resuming from {out} (epoch {meta.get('epoch')}, "
              f"val {meta.get('val_loss')}, "
              f"opt_state={'yes' if opt_state is not None else 'no'})")
    res = train_lifter(net_t, err_t, net_d, err_d, rig_config, rig,
                       lcfg, tcfg, checkpoint_path=out, params=params,
                       opt_state=opt_state,
                       extra_meta={"prior": args.prior})
    print(f"best dev loss {res.best_val_loss:.6f} after {res.epochs_run} "
          f"epochs → {out} [{tcfg.checkpoint_backend}]")
    if res.rig is not None:
        # optimise_matrices: the MLP co-adapted to the refined calibration —
        # ship it next to the checkpoint; build_pipeline auto-loads it
        from mpe3d_tpu.geometry.camera import save_rig_npz
        save_rig_npz(refined_rig_path, res.rig)
        print(f"refined calibration (--optimise-matrices) → {refined_rig_path}")
    elif not getattr(args, "resume", False) \
            and os.path.exists(refined_rig_path):
        # a FRESH run trained against the original rig: a leftover refined
        # calibration from a previous occupant of this modelsdir would be
        # mispaired with the new checkpoint at inference
        os.remove(refined_rig_path)
        print(f"[mpe3d] removed stale {refined_rig_path} (this run did not "
              "refine the calibration)", file=sys.stderr)


def _pose_metrics(args, backend: str):
    from mpe3d_tpu.eval.runners import run_pose_metrics

    rig_config, rig, pipe = build_pipeline(args, backend)
    dataset_T = None
    if args.dataset_tm:
        from mpe3d_tpu.geometry.calib_io import load_transform_manager
        ts = load_transform_manager(args.dataset_tm)
        dataset_T = ts.get_transform("root", rig_config.camera_names[1])
    pipe.decode_on_device = getattr(args, "device_decode", False)
    report = run_pose_metrics(_load_eval_files(args.testfiles, rig_config),
                              rig_config, pipe, datastep=args.datastep,
                              dataset_T_wc1=dataset_T, fused=args.fused,
                              stream=getattr(args, "stream", 0),
                              dedup_gt=getattr(args, "dedup_gt", False))
    _print_report(report)


def cmd_metrics_from_model(args):
    _pose_metrics(args, "mlp")


def cmd_metrics_from_triangulation(args):
    _pose_metrics(args, "triangulation")


def cmd_sm_metrics(args):
    from mpe3d_tpu.eval.runners import run_sm_metrics

    rig_config, rig, pipe = build_pipeline(args, "triangulation")
    report = run_sm_metrics(_load_files(args.testfiles), rig_config, pipe,
                            datastep=args.datastep,
                            unassigned=getattr(args, "unassigned", "lump"))
    _print_report(report)


def cmd_sm_metrics_without_gt(args):
    from mpe3d_tpu.data.frames import load_frames
    from mpe3d_tpu.eval.runners import run_sm_metrics_without_gt

    rig_config, rig, pipe = build_pipeline(args, "triangulation")
    report = run_sm_metrics_without_gt(
        [load_frames(p) for p in args.testfiles], rig_config, pipe,
        limit=args.limit)
    _print_report(report)


def cmd_reprojection_error(args):
    from mpe3d_tpu.eval.runners import run_reprojection_error
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    rig_config, rig, pipe = build_pipeline(args, "mlp")
    tri = PoseEstimationPipeline(
        rig_config, rig, pipe.matcher_params, pipe.matcher_cfg,
        backend="triangulation",
        tri_variant=getattr(args, "tri_variant", "median"))
    report = run_reprojection_error(
        _load_eval_files(args.testfiles, rig_config), rig_config,
        pipe, tri, datastep=args.datastep, show_gt=args.showgt)
    _print_report(report)


def cmd_infer(args):
    """Run the frame→poses pipeline on wire-format JSON and emit 3D poses.

    (New surface — the reference only ships metric/viewer scripts; this is
    the library path of test/show_results_from_model.py:139-336 without the
    GL window.)  Output: JSON list of {frame, n_persons, persons, poses_m};
    with --track each frame also carries stable "track_ids" (and poses_m
    are EMA-smoothed when --track-smooth > 0; mpe3d_tpu/tracking.py).
    """
    from mpe3d_tpu.data.frames import parse_frames_file

    rig_config, rig, pipe = build_pipeline(args, args.backend)
    fas = []
    for p in args.testfiles:
        fas.extend(parse_frames_file(p, rig_config, args.max_skeletons))
    from contextlib import nullcontext

    trace_ctx = nullcontext()
    if getattr(args, "profile_trace", None):
        # TensorBoard-compatible device trace of the whole inference loop
        # (utils/logging.py::profiler_trace; SURVEY §5 tracing plan)
        from mpe3d_tpu.utils.logging import profiler_trace
        trace_ctx = profiler_trace(args.profile_trace)
    with trace_ctx:
        if len(pipe.match_idx) <= 1:
            # single matching camera: the fused decode needs ≥2 views — use
            # the staged path's bypass (one proposal per present skeleton),
            # like __call__ / run_pose_metrics do
            outs = [pipe(fa) for fa in fas]
        elif args.batch:
            outs = pipe.infer_batch(fas)
        else:
            outs = list(pipe.infer_stream(fas, depth=max(args.stream, 1)))
    from mpe3d_tpu.serve import gate_and_track

    tracker = _make_tracker(args)
    gate = getattr(args, "quality_gate", None)
    result = []
    for i, o in enumerate(outs):
        poses, quality, persons, ids, dropped = gate_and_track(
            o.poses, o.quality, gate=gate, tracker=tracker,
            persons=o.persons)
        rec = {"frame": i}
        if dropped:
            rec["dropped_low_quality"] = dropped
        rec["n_persons"] = int(len(persons))
        rec["persons"] = np.asarray(persons).tolist()
        if ids is not None:
            rec["track_ids"] = ids.tolist()
        if quality is not None:
            # per-pose confidence: mean reprojection residual (px) of the
            # RAW pose against its own 2D observations
            # (pipeline.pose_quality_px); with --track-smooth the reported
            # poses_m are EMA-blended and their residual differs slightly
            rec["quality_px"] = np.asarray(quality).round(2).tolist()
        rec["poses_m"] = poses.round(4).tolist()
        result.append(rec)
    text = json.dumps(result)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out} ({len(result)} frames)", file=sys.stderr)
    else:
        print(text)


def cmd_serve(args):
    """Long-lived serving front-end: newline-delimited JSON frames in,
    one JSON result line per frame out (poses + quality + track ids), over
    stdio or TCP.  mpe3d_tpu/serve.py; new surface — the reference's live
    path (test/show_results_from_model.py:78-374) replays recorded files
    in-process only."""
    from mpe3d_tpu.serve import PoseServer, serve_tcp

    rig_config, rig, pipe = build_pipeline(args, args.backend)
    depth = args.depth
    if args.multi_device:
        n = pipe.enable_multi_device_serving()
        depth = max(depth, 2 * n)   # keep every chip busy
        print(f"[mpe3d] round-robin serving over {n} devices "
              f"(depth {depth})", file=sys.stderr)
    if args.warmup:
        pipe.warmup(fused=True)   # compile what serving actually dispatches
    if args.batch_window > 1 and args.warmup:
        # compile the padded batch executable per slot bucket up front —
        # and per serving device (submit_batch round-robins after
        # enable_multi_device_serving; jit executables cache per device)
        from mpe3d_tpu.data.frames import FrameArrays
        import numpy as np
        C, J = rig_config.n_cameras, rig_config.n_joints
        n_dev = len(getattr(pipe, "_serve_devices", ()) or (None,))
        for S in pipe.slot_buckets:
            fa = FrameArrays(np.zeros((C, S, J, 2), np.float32),
                             np.zeros((C, S, J), np.float32),
                             np.zeros((C, S, J), np.float32),
                             np.zeros((C, S, J), bool),
                             np.zeros((C, S), bool), np.zeros(C))
            for _ in range(n_dev):
                pipe.collect_batch(pipe.submit_batch(
                    [fa], slots=S, pad_to=args.batch_window))
    # tracking state is per stream: a factory so every connection (and
    # every reconnect) starts with fresh track ids instead of inheriting
    # the previous client's
    tracker_factory = ((lambda: _make_tracker(args))
                       if getattr(args, "track", False) else None)
    server = PoseServer(pipe, rig_config, max_skeletons=args.max_skeletons,
                        depth=depth, tracker_factory=tracker_factory,
                        quality_gate=args.quality_gate,
                        batch_window=args.batch_window,
                        batch_linger_ms=args.batch_linger_ms)
    if args.tcp is not None:
        serve_tcp(server, host=args.host, port=args.tcp,
                  max_clients=args.max_clients)
    else:
        server.serve_stdio()


def cmd_show_results(args):
    from mpe3d_tpu.viz.viewer import render_sequence

    rig_config, rig, pipe = build_pipeline(args, args.backend)
    fas, frame_gts = _load_eval_files(args.testfiles, rig_config)
    fas, frame_gts = fas[: args.max_frames], frame_gts[: args.max_frames]
    from mpe3d_tpu.serve import gate_and_track

    tracker = _make_tracker(args)

    live_server = None
    if getattr(args, "live", None) is not None:
        # LIVE mode (≙ the reference's ANIMATED viewer window,
        # show_results_from_model.py:78-376): stream each frame to the
        # browser as the pipeline infers it, at --live-fps; --live-loop
        # replays the recording forever (Ctrl+C to stop)
        import time as _time

        from mpe3d_tpu.geometry.camera import cam_centers_world
        from mpe3d_tpu.viz.live_viewer import LiveViewerServer

        if not fas:
            sys.exit("--live: no frames parsed from the test files")
        args.live_fps = max(1, args.live_fps)
        live_server = LiveViewerServer(
            rig_config,
            camera_centers=np.asarray(cam_centers_world(rig.T_cw)),
            host=args.live_host, port=args.live,
            fps=args.live_fps,
            title=f"mpe3d_tpu live · {args.backend} · "
                  f"{os.path.basename(args.testfiles[0])}")
        print(f"[mpe3d] live viewer at {live_server.url} — open in a "
              f"browser; Ctrl+C stops", file=sys.stderr)
        try:
            loop = True
            while loop:
                # fresh tracker per replay: carrying track state across
                # the wrap seam would EMA-blend end-of-recording poses
                # into frame 0 (same rationale as serve.py's per-stream
                # tracker_factory)
                tracker = _make_tracker(args)
                for fa, gt in zip(fas, frame_gts):
                    t0 = _time.perf_counter()
                    out = pipe.infer_fused(fa)
                    p, q, _, ids, _ = gate_and_track(
                        out.poses, out.quality,
                        gate=getattr(args, "quality_gate", None),
                        tracker=tracker)
                    live_server.push(
                        p, gt=(gt.gt3d if (args.showgt and gt) else None),
                        track_ids=ids,
                        quality=q if args.show_quality else None)
                    _time.sleep(max(0.0, 1.0 / args.live_fps
                                    - (_time.perf_counter() - t0)))
                loop = args.live_loop
            # all frames streamed: keep the viewer up — the backlog
            # replays to any (re)connecting browser; Ctrl+C exits
            print("[mpe3d] all frames streamed — viewer stays up "
                  "(Ctrl+C to exit)", file=sys.stderr)
            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            live_server.close()
        return

    poses, gts, tids, quals = [], [], [], []
    for fa, gt in zip(fas, frame_gts):
        out = pipe(fa)
        p, q, _, ids, _ = gate_and_track(
            out.poses, out.quality,
            gate=getattr(args, "quality_gate", None), tracker=tracker)
        if ids is not None:
            tids.append(ids)
        poses.append(p)
        quals.append(q)
        gts.append(gt.gt3d if (args.showgt and gt) else None)
    if args.out.endswith(".html"):
        # interactive single-file viewer (≙ the reference's animated
        # pyqtgraph window, test/show_results_from_model.py:78-376)
        from mpe3d_tpu.geometry.camera import cam_centers_world
        from mpe3d_tpu.viz.html_viewer import write_html_viewer
        path = write_html_viewer(
            poses, rig_config, args.out,
            frames_gt=gts if args.showgt else None,
            frames_track_ids=tids if tracker else None,
            frames_quality=quals if args.show_quality else None,
            camera_centers=np.asarray(cam_centers_world(rig.T_cw)),
            title=f"mpe3d_tpu {args.backend} · "
                  f"{os.path.basename(args.testfiles[0])}")
    else:
        path = render_sequence(poses, rig_config, args.out,
                               gts if args.showgt else None,
                               frames_track_ids=tids if tracker else None,
                               frames_quality=quals if args.show_quality
                               else None)
    print(f"wrote {path}")


def cmd_merge_jsons(args):
    from mpe3d_tpu.data.frames import merge_frame_files
    n = merge_frame_files(args.inputs, args.output)
    print(f"wrote {n} frames to {args.output}")


def cmd_generate_synthetic(args):
    from mpe3d_tpu.data.synthetic import (generate_frames,
                                          generate_single_person_frames,
                                          write_frames)

    rig_config, rig = load_rig(args)
    if args.single_person:
        frames = generate_single_person_frames(rig_config, rig,
                                               args.frames, seed=args.seed)
    else:
        frames = generate_frames(rig_config, rig, args.frames,
                                 n_people=(args.min_people, args.max_people),
                                 seed=args.seed, with_gt=not args.no_gt)
    write_frames(frames, args.output)
    print(f"wrote {len(frames)} frames to {args.output}")


def cmd_convert_panoptic(args):
    """≙ panoptic_conversor/get_joints_from_panoptic_model[_multi].py."""
    from mpe3d_tpu.convert.panoptic import Detector2D, convert_sequence
    from mpe3d_tpu.convert.pose_resnet import (init_pose_resnet,
                                               load_torch_pose_resnet)

    if args.weights:
        params = load_torch_pose_resnet(args.weights)
    else:
        import jax
        print("[mpe3d] no --weights given — random backbone (layout checks "
              "only)", file=sys.stderr)
        params = init_pose_resnet(jax.random.PRNGKey(0))
    det = Detector2D(params)
    out = convert_sequence(args.seq_dir, det, nodes=tuple(args.nodes),
                           multi=not args.single, out_dir=args.out_dir,
                           max_frames=args.max_frames)
    print(f"wrote {out}")


def cmd_convert_torch(args):
    from mpe3d_tpu.train.checkpoint import save_checkpoint

    if args.lifter:
        from mpe3d_tpu.convert.torch_import import load_reference_lifter
        params, cfg = load_reference_lifter(args.lifter)
        out = os.path.join(args.modelsdir, "pose_estimator")
        save_checkpoint(out, params, meta={"lifter_config": cfg,
                                           "source": args.lifter})
        print(f"wrote {out}.npz")
    if args.matcher:
        from mpe3d_tpu.convert.torch_import import load_reference_matcher
        params, cfg = load_reference_matcher(args.matcher, args.prms)
        out = os.path.join(args.modelsdir, "skeleton_matching")
        save_checkpoint(out, params, meta={"matcher_config": cfg,
                                           "source": args.matcher})
        print(f"wrote {out}.npz")


def cmd_export_torch(args):
    """Inverse of convert-torch: our npz checkpoints → the reference's
    torch file formats (mpe3d_tpu/convert/torch_export.py), so weights
    trained here load straight into the reference's torch/DGL stack."""
    import jax

    from mpe3d_tpu.config import LifterConfig, MatcherConfig, get_rig
    from mpe3d_tpu.convert.torch_export import (export_reference_lifter,
                                                export_reference_matcher)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            lifter_config_from_meta,
                                            load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig_config = get_rig(args.rig)
    os.makedirs(args.out, exist_ok=True)
    j = os.path.join
    wrote = []
    if checkpoint_exists(j(args.modelsdir, "skeleton_matching")):
        mcfg = matcher_config_from_meta(
            read_meta(j(args.modelsdir, "skeleton_matching")),
            MatcherConfig(in_dim=rig_config.matcher_feature_dim))
        mparams, _, _ = load_checkpoint(
            j(args.modelsdir, "skeleton_matching"),
            init_matcher(jax.random.PRNGKey(0), mcfg))
        export_reference_matcher(mparams, mcfg,
                                 j(args.out, "skeleton_matching.tch"),
                                 j(args.out, "skeleton_matching.prms"))
        wrote += ["skeleton_matching.tch", "skeleton_matching.prms"]
    if checkpoint_exists(j(args.modelsdir, "pose_estimator")):
        lmeta = read_meta(j(args.modelsdir, "pose_estimator"))
        lcfg = lifter_config_from_meta(
            lmeta, LifterConfig(in_dim=rig_config.lifter_input_dim,
                                out_dim=rig_config.n_joints * 3))
        lparams, _, _ = load_checkpoint(
            j(args.modelsdir, "pose_estimator"),
            init_lifter(jax.random.PRNGKey(1), lcfg))
        try:
            export_reference_lifter(lparams,
                                    j(args.out, "pose_estimator.pytorch"),
                                    cfg=lcfg)
            wrote.append("pose_estimator.pytorch")
        except ValueError as e:
            print(f"[mpe3d] lifter not exported: {e}", file=sys.stderr)
    if not wrote:
        print(f"[mpe3d] no npz checkpoints in {args.modelsdir}",
              file=sys.stderr)
        return 1
    print(f"wrote {', '.join(wrote)} to {args.out}")


def cmd_export_servable(args):
    """Export a compact serving-only model directory.

    The fp32 lifter checkpoint is ~116 MB — too large to ship casually and
    lost with every scratch-volume wipe.  This writes a directory that
    `load_models` serves directly:

      * ``--dtype int8`` (default): two-sided int8 weight quantisation
        (models/mlp.py::quantize_lifter_weights) — ~29 MB, measured
        end-to-end accuracy delta −0.03/+1.4 mm MPJPE on residual-prior /
        absolute checkpoints (RESULTS.md).  Serving-only: resume refuses it.
      * ``--dtype bf16``: stored-bf16 weights (~58 MB) — bit-identical to
        the default TPU serving path (pipeline.py serve_dtype).

    The matcher (a few MB) and any refined calibration are copied verbatim.
    No reference counterpart (the reference ships fp32 torch files)."""
    import shutil

    import jax

    from mpe3d_tpu.config import LifterConfig, get_rig
    from mpe3d_tpu.models.mlp import (cast_lifter_weights, init_lifter,
                                      lifter_is_quantized,
                                      quantize_lifter_weights)
    from mpe3d_tpu.train.checkpoint import (checkpoint_exists,
                                            lifter_config_from_meta,
                                            load_checkpoint, read_meta,
                                            save_checkpoint)

    rig_config = get_rig(args.rig)
    os.makedirs(args.out, exist_ok=True)
    j = os.path.join
    wrote = []
    for name in ("skeleton_matching.npz", "skeleton_matching.json",
                 "refined_rig.npz"):
        src = j(args.modelsdir, name)
        if os.path.exists(src):
            shutil.copy2(src, j(args.out, name))
            wrote.append(name)
    if ("skeleton_matching.npz" not in wrote
            and checkpoint_exists(j(args.modelsdir, "skeleton_matching"))):
        # orbax-format matcher: re-save as npz (small, synchronous)
        from mpe3d_tpu.config import MatcherConfig
        from mpe3d_tpu.models.gat import init_matcher
        from mpe3d_tpu.train.checkpoint import matcher_config_from_meta
        mmeta = read_meta(j(args.modelsdir, "skeleton_matching"))
        mcfg = matcher_config_from_meta(
            mmeta, MatcherConfig(in_dim=rig_config.matcher_feature_dim))
        mparams, _, _ = load_checkpoint(
            j(args.modelsdir, "skeleton_matching"),
            init_matcher(jax.random.PRNGKey(0), mcfg))
        save_checkpoint(j(args.out, "skeleton_matching"), mparams, meta=mmeta)
        wrote += ["skeleton_matching.npz", "skeleton_matching.json"]
    lpath = j(args.modelsdir, "pose_estimator")
    if not checkpoint_exists(lpath):
        print(f"[mpe3d] no lifter checkpoint in {args.modelsdir}",
              file=sys.stderr)
        return 1
    lmeta = read_meta(lpath)
    if lmeta.get("stored"):
        sys.exit(f"{lpath} is already a serving export "
                 f"(stored={lmeta['stored']})")
    lcfg = lifter_config_from_meta(
        lmeta, LifterConfig(in_dim=rig_config.lifter_input_dim,
                            out_dim=rig_config.n_joints * 3))
    lparams, _, _ = load_checkpoint(
        lpath, init_lifter(jax.random.PRNGKey(1), lcfg))
    import jax.numpy as jnp
    import numpy as np
    if args.dtype == "int8":
        lparams = jax.tree.map(jnp.asarray, lparams)
        lparams = quantize_lifter_weights(lparams)
        assert lifter_is_quantized(lparams)
    else:
        # npz cannot represent ml_dtypes.bfloat16 (degrades to void) —
        # store the bit pattern as uint16; load_models views it back
        lparams = cast_lifter_weights(
            jax.tree.map(jnp.asarray, lparams), jnp.bfloat16)
        lparams = {"layers": [
            {"w": np.asarray(layer["w"]).view(np.uint16),
             "b": np.asarray(layer["b"])}
            for layer in lparams["layers"]]}
    meta = {k: v for k, v in lmeta.items() if k != "epoch"}
    meta["stored"] = args.dtype
    save_checkpoint(j(args.out, "pose_estimator"), lparams, meta=meta)
    wrote += ["pose_estimator.npz", "pose_estimator.json"]
    total = sum(os.path.getsize(j(args.out, n)) for n in wrote
                if os.path.exists(j(args.out, n)))
    print(f"wrote {', '.join(wrote)} to {args.out} "
          f"({total / 1e6:.1f} MB, lifter stored {args.dtype})")


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _add_track_flags(p):
    p.add_argument("--quality-gate", type=float, default=None, metavar="PX",
                   help="drop output poses whose quality column (mean "
                   "reprojection residual, px) exceeds PX — ghosts score "
                   "an order of magnitude above the detector noise floor; "
                   "applied before tracking")
    p.add_argument("--track", action="store_true",
                   help="assign stable person ids across frames "
                   "(mpe3d_tpu/tracking.py; extension — the reference "
                   "pipeline is frame-independent)")
    p.add_argument("--track-max-dist", type=float, default=0.5,
                   help="association gate: mean per-joint distance (m)")
    p.add_argument("--track-max-missed", type=int, default=10,
                   help="frames a track coasts before retiring")
    p.add_argument("--track-smooth", type=float, default=0.0,
                   help="EMA weight on history for reported joints "
                   "(0 = raw)")


def _make_tracker(args):
    if not getattr(args, "track", False):
        return None
    from mpe3d_tpu.tracking import PoseTracker
    return PoseTracker(max_dist=args.track_max_dist,
                       max_missed=args.track_max_missed,
                       smooth=args.track_smooth)


def _add_common(p, models=True):
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU jax backend — for hosts whose TPU "
                   "runtime is absent or wedged (applied in main() before "
                   "any backend initialises)")
    p.add_argument("--rig", default="PANOPTIC", help="rig preset name")
    p.add_argument("--tm", default=None,
                   help="calibration file (pytransform3d pickle or JSON)")
    if models:
        p.add_argument("--modelsdir", default="./models",
                       help="directory with model checkpoints")
        p.add_argument("--geo-rerank", type=float, default=0.0,
                       help="geometric decode rerank weight (0 = off; "
                       "docs/ARCHITECTURE.md)")
        p.add_argument("--geo-rescue", type=float, default=0.0,
                       help="geometric rescue low-score floor (0 = off; "
                       "0.001 ≈ geometry-only).  Forces the exact uncapped "
                       "device decode so capped top-k cannot diverge from "
                       "the host decode on dense scenes")
        p.add_argument("--geo-rescue-dist", type=float, default=0.05,
                       help="rescue ray-distance cut in metres")
        p.add_argument("--prior-gate", dest="prior_gate_px", type=float,
                       default=None, metavar="PX",
                       help="drop a joint's triangulated lifter prior when "
                       "it reprojects > PX pixels from its own 2D evidence "
                       "(catches the catastrophic triangulations OOD "
                       "scenes produce; pair with a --prior-dropout-"
                       "trained checkpoint so the no-prior fallback is "
                       "in-distribution; recommended 8; default off = "
                       "exact reference input semantics)")
        p.add_argument("--tri-variant", default="median",
                       choices=["median", "irls"],
                       help="classical-backend triangulator (backend="
                       "'triangulation' only): 'median' = reference-exact "
                       "coordinate-median pair filter; 'irls' = Huber-IRLS "
                       "all-view solve — better in every measured regime "
                       "(scripts/diag_triangulators.py), framework "
                       "extension")
        p.add_argument("--serve-dtype", default="auto",
                       choices=["auto", "fp32", "bf16", "int8"],
                       help="lifter weight serving: auto = bf16 on TPU "
                       "(bit-identical there) / fp32 elsewhere.  int8 = "
                       "opt-in two-sided weight-only quantisation: halves "
                       "HBM weight bytes (accuracy deltas in "
                       "reports/serve_int8_*.json; free for residual-prior "
                       "checkpoints) but measured SLOWER than bf16 at "
                       "serving shapes (RESULTS.md dtype ladder) — an "
                       "HBM-capacity tool, not a latency one")
        p.add_argument("--no-pallas-matcher", action="store_true",
                       help="escape hatch: keep the XLA matcher path even "
                       "on TPU (skips the GAT pallas megakernel, which is "
                       "otherwise auto-on after a compile probe; for "
                       "devices/toolchains where the probe itself "
                       "misbehaves)")
        p.add_argument("--no-frame-kernel", action="store_true",
                       help="escape hatch: keep the two-fusion XLA "
                       "serving program even on TPU (skips the "
                       "whole-frame pallas kernel, which is otherwise "
                       "auto-on per bucket after a compile probe; "
                       "RESULTS.md 'round 3b')")
        p.add_argument("--fused-mlp", action="store_true",
                       help="serve the lifter through the whole-network "
                       "pallas kernel (ops/fused_mlp.py): one launch, "
                       "weights streamed HBM→VMEM — opt-in pending the "
                       "on-chip A/B (scripts/bench_fused_mlp.py)")


def make_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="mpe3d_tpu", description="TPU-native multi-person 3D pose "
        "estimation (capabilities of gnns4hri/3D_multi_pose_estimator)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-matcher")
    _add_common(p)
    p.add_argument("--trainset", nargs="+", required=True)
    p.add_argument("--devset", nargs="+", required=True)
    p.add_argument("--testset", nargs="*", default=[])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=15)
    p.add_argument("--limit", type=int, default=120000)
    p.add_argument("--slots", type=int, default=4,
                   help="skeleton slots per camera in training scenes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume params + optimizer state from the "
                   "modelsdir checkpoint (the reference can only save)")
    p.add_argument("--ckpt-backend", default="npz",
                   choices=["npz", "orbax"],
                   help="checkpoint format: 'npz' = synchronous flat npz; "
                   "'orbax' = async background saves, sharded-aware "
                   "(train/checkpoint.py).  Loading auto-detects either.")
    p.add_argument("--device-synth", action="store_true",
                   help="synthesize training composites ON DEVICE each "
                   "epoch (jax RNG over a resident recording bank, "
                   "train/matcher_synth.py) instead of pre-building "
                   "--limit host scenes; the dev set stays host-built")
    p.set_defaults(fn=cmd_train_matcher)

    p = sub.add_parser("train-lifter")
    _add_common(p)
    p.add_argument("--trainset", nargs="+", required=True)
    p.add_argument("--devset", nargs="+", required=True)
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=2096)
    p.add_argument("--optimise-matrices", action="store_true")
    p.add_argument("--cache", action="store_true",
                   help="cache packed datasets next to the last input file")
    p.add_argument("--seed", type=int, default=58008)
    p.add_argument("--resume", action="store_true",
                   help="resume params (+ optimizer state when present) "
                   "from the modelsdir checkpoint")
    p.add_argument("--loss", default="reference",
                   choices=["reference", "per_term", "huber"],
                   help="reprojection-loss variant (lifting/loss.py): "
                   "'reference' = bit-parity summed-L1-squared; "
                   "'per_term'/'huber' = better-conditioned variants that "
                   "converge to the reprojection least-squares optimum")
    p.add_argument("--prior", default="mean",
                   choices=["mean", "median", "irls"],
                   help="triangulated-prior variant in the lifter input "
                   "(lifting/pack.py): 'mean' = reference-exact pair mean; "
                   "'median' = median-outlier-rejected — use on rigs with "
                   "near-degenerate camera pairs (e.g. ARP Lab's 11.5 cm "
                   "robot stereo pair).  Recorded in the checkpoint; "
                   "inference reads it back automatically.")
    p.add_argument("--residual-prior", action="store_true",
                   help="predict a correction to the triangulated prior "
                   "instead of absolute coordinates (zero-initialised head "
                   "starts training AT the prior; config.LifterConfig)."
                   "  Recorded in the checkpoint; loaders reconstruct it.")
    p.add_argument("--ckpt-backend", default="npz",
                   choices=["npz", "orbax"],
                   help="checkpoint format: 'npz' = synchronous flat npz; "
                   "'orbax' = async background saves of the DEVICE tree "
                   "(no blocking 116 MB host pull per save; "
                   "train/checkpoint.py).  Loading auto-detects either.")
    p.add_argument("--ema", type=float, default=0.0,
                   help="Polyak/EMA weight-averaging decay (0 = off; "
                   "typical 0.999).  The averaged tree is carried inside "
                   "the scan-epoch program; eval/early-stop/checkpoints "
                   "use it (LifterTrainConfig.ema_decay).")
    p.add_argument("--compute-dtype", default="fp32",
                   choices=["fp32", "bf16"],
                   help="training matmul operand dtype: 'bf16' (fp32 "
                   "master weights + fp32 accumulation — bit-identical on "
                   "the MXU, which rounds operands to bf16 anyway) halves "
                   "activation HBM traffic; measured 44→48%% MFU at the "
                   "reference batch and 62%% at batch 8192 (RESULTS "
                   "training ladder)")
    p.set_defaults(fn=cmd_train_lifter)

    for name, fn in (("metrics-from-model", cmd_metrics_from_model),
                     ("metrics-from-triangulation",
                      cmd_metrics_from_triangulation),
                     ("sm-metrics", cmd_sm_metrics)):
        p = sub.add_parser(name)
        _add_common(p)
        p.add_argument("--testfiles", nargs="+", required=True)
        p.add_argument("--datastep", type=int, default=12)
        p.add_argument("--dataset-tm", default=None,
                       help="dataset calibration if GT is in another frame")
        p.add_argument("--fused", action="store_true",
                       help="single-program pipeline (one device round trip)")
        p.add_argument("--stream", type=int, default=0,
                       help="pipelined inference with N frames in flight")
        p.add_argument("--device-decode", action="store_true",
                       help="staged path: fuse greedy decode into stage 1")
        p.add_argument("--dedup-gt", action="store_true",
                       help="drop duplicated GT rows before scoring (wire-"
                       "protocol artifact on dense scenes; data/frames.py::"
                       "dedup_ground_truth).  Default = the reference's "
                       "raw protocol.")
        if name == "sm-metrics":
            p.add_argument("--unassigned", default="lump",
                           choices=["lump", "singleton"],
                           help="label for heads the decode left "
                           "unassigned: 'lump' = reference protocol (one "
                           "shared label — on dense frames this artifact "
                           "alone depresses ARI); 'singleton' = unique "
                           "label per unassigned head (the ARI analog of "
                           "--dedup-gt)")
        p.set_defaults(fn=fn)

    p = sub.add_parser("sm-metrics-without-gt")
    _add_common(p)
    p.add_argument("--testfiles", nargs="+", required=True)
    p.add_argument("--limit", type=int, default=1000)
    p.set_defaults(fn=cmd_sm_metrics_without_gt)

    p = sub.add_parser("reprojection-error")
    _add_common(p)
    p.add_argument("--testfiles", nargs="+", required=True)
    p.add_argument("--datastep", type=int, default=1)
    p.add_argument("--showgt", action="store_true",
                   help="also reproject GT 3D when frames carry it")
    p.set_defaults(fn=cmd_reprojection_error)

    p = sub.add_parser("infer")
    _add_common(p)
    p.add_argument("--testfiles", nargs="+", required=True)
    p.add_argument("--backend", choices=("mlp", "triangulation"),
                   default="mlp")
    p.add_argument("--max-skeletons", type=int, default=10)
    p.add_argument("--out", default=None, help="output JSON path (default "
                   "stdout)")
    p.add_argument("--batch", action="store_true",
                   help="one batched dispatch instead of streaming")
    p.add_argument("--stream", type=int, default=3,
                   help="streaming depth (frames in flight)")
    p.add_argument("--profile-trace", default=None, metavar="DIR",
                   help="capture a jax profiler trace of the inference "
                   "loop to DIR (TensorBoard-compatible)")
    _add_track_flags(p)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("serve")
    _add_common(p)
    p.add_argument("--backend", choices=("mlp", "triangulation"),
                   default="mlp")
    p.add_argument("--max-skeletons", type=int, default=10)
    p.add_argument("--depth", type=int, default=3,
                   help="in-flight dispatch window (1 = synchronous)")
    p.add_argument("--tcp", type=int, default=None, metavar="PORT",
                   help="serve on a TCP port (0 = ephemeral) instead of "
                   "stdio")
    p.add_argument("--max-clients", type=int, default=1,
                   help="concurrent TCP connections served (each stream "
                   "gets its own in-flight window and tracker; >1 pairs "
                   "naturally with --multi-device — streams round-robin "
                   "over the chips).  Excess clients wait, not refused")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--warmup", action="store_true",
                   help="compile all shape buckets before accepting input")
    p.add_argument("--multi-device", action="store_true",
                   help="round-robin frames across all local devices "
                   "(params replicated, no collectives; streaming "
                   "throughput ~= one frame per RTT per chip)")
    p.add_argument("--batch-window", type=int, default=1,
                   help="micro-batching: group up to N consecutive frames "
                   "into one batched dispatch (amortizes the lifter "
                   "weight stream and, on remote links, the round trip); "
                   "a partial window flushes after --batch-linger-ms")
    p.add_argument("--batch-linger-ms", type=float, default=5.0,
                   help="max time a partial batch window may wait for "
                   "more frames (the batcher's added-latency ceiling)")
    _add_track_flags(p)
    # serve routes --serve-dtype auto through resolve_auto_serve_dtype —
    # currently a no-op policy hook (int8 measured slower than bf16 at
    # serving shapes; see the function docstring)
    p.set_defaults(fn=cmd_serve, serve_auto_int8=True)

    p = sub.add_parser("show-results")
    _add_common(p)
    p.add_argument("--testfiles", nargs="+", required=True)
    p.add_argument("--backend", choices=["mlp", "triangulation"],
                   default="mlp")
    p.add_argument("--out", default="results.gif")
    p.add_argument("--showgt", action="store_true")
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--show-quality", action="store_true",
                   help="overlay each pose's quality column (px)")
    p.add_argument("--live", type=int, default=None, metavar="PORT",
                   help="LIVE viewer (≙ the reference's animated window): "
                   "serve the interactive canvas viewer over HTTP on this "
                   "port (0 = auto) and stream poses to it via SSE as the "
                   "pipeline infers them — no display/GL stack needed on "
                   "the TPU host (viz/live_viewer.py)")
    p.add_argument("--live-host", default="127.0.0.1",
                   help="live viewer bind address (0.0.0.0 to expose)")
    p.add_argument("--live-fps", type=int, default=10)
    p.add_argument("--live-loop", action="store_true",
                   help="replay the recording forever (Ctrl+C stops)")
    _add_track_flags(p)
    p.set_defaults(fn=cmd_show_results)

    p = sub.add_parser("merge-jsons")
    p.add_argument("inputs", nargs="+")
    p.add_argument("output")
    p.set_defaults(fn=cmd_merge_jsons)

    p = sub.add_parser("generate-synthetic")
    _add_common(p, models=False)
    p.add_argument("--output", required=True)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--single-person", action="store_true")
    p.add_argument("--min-people", type=int, default=1)
    p.add_argument("--max-people", type=int, default=4)
    p.add_argument("--no-gt", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_generate_synthetic)

    p = sub.add_parser("convert-panoptic")
    p.add_argument("seq_dir", help="CMU Panoptic sequence directory")
    p.add_argument("--weights", default=None,
                   help="pose_resnet50_panoptic.pth.tar (torch)")
    p.add_argument("--nodes", type=int, nargs="+",
                   default=[3, 6, 12, 13, 23])
    p.add_argument("--single", action="store_true",
                   help="emit the per-person training format")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--max-frames", type=int, default=None)
    p.set_defaults(fn=cmd_convert_panoptic)

    p = sub.add_parser("convert-torch")
    p.add_argument("--lifter", default=None,
                   help="path to pose_estimator.pytorch")
    p.add_argument("--matcher", default=None,
                   help="path to skeleton_matching.tch")
    p.add_argument("--prms", default=None,
                   help="path to skeleton_matching.prms")
    p.add_argument("--modelsdir", default="./models")
    p.set_defaults(fn=cmd_convert_torch)

    p = sub.add_parser("export-torch")
    p.add_argument("--modelsdir", default="./models",
                   help="directory with our npz checkpoints")
    p.add_argument("--out", required=True,
                   help="directory for the reference-format torch files")
    p.add_argument("--rig", default="PANOPTIC")
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser(
        "export-servable",
        help="write a compact serving-only model directory (int8 ~29 MB / "
             "bf16 ~58 MB lifter vs 116 MB fp32); load_models serves it "
             "directly, training resume refuses it")
    p.add_argument("--modelsdir", default="./models",
                   help="directory with our npz checkpoints")
    p.add_argument("--out", required=True,
                   help="output directory for the servable export")
    p.add_argument("--dtype", choices=("int8", "bf16"), default="int8",
                   help="stored lifter weight format (int8: two-sided "
                   "quantisation, measured -0.03/+1.4 mm; bf16: "
                   "bit-identical to default TPU serving)")
    p.add_argument("--rig", default="PANOPTIC")
    p.set_defaults(fn=cmd_export_servable)

    return ap


def main(argv=None):
    args = make_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        # must precede any backend query; subcommands import jax lazily.
        # (a site-installed TPU plugin overrides the JAX_PLATFORMS env var,
        # so the config update is the reliable lever.)
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(getattr(args, "modelsdir", ".") or ".", exist_ok=True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
