"""CLI `export-servable`: compact serving-only model directories.

Framework extension (no reference counterpart — the reference ships fp32
torch files, utils/mlp.py:3-31): the fp32 lifter checkpoint is ~116 MB;
the export stores int8-quantised (~29 MB) or bf16 (~58 MB) weights that
`cli.load_models` serves directly and training resume refuses.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.cli import load_models, main
from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
from mpe3d_tpu.models.gat import init_matcher
from mpe3d_tpu.models.mlp import (apply_lifter, cast_lifter_weights,
                                  init_lifter, lifter_is_quantized,
                                  quantize_lifter_weights)
from mpe3d_tpu.train.checkpoint import read_meta, save_checkpoint


@pytest.fixture()
def small_models_dir(tmp_path):
    """A models dir holding a SMALL lifter + matcher checkpoint (the
    config override via meta makes load_models rebuild the right shapes)."""
    d = tmp_path / "models"
    d.mkdir()
    lcfg = LifterConfig(in_dim=PANOPTIC.lifter_input_dim,
                        out_dim=PANOPTIC.n_joints * 3, widths=(64, 32))
    lparams = init_lifter(jax.random.PRNGKey(3), lcfg)
    save_checkpoint(str(d / "pose_estimator"), lparams,
                    meta={"lifter_config": lcfg, "prior": "median",
                          "epoch": 7})
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim)
    mparams = init_matcher(jax.random.PRNGKey(4), mcfg)
    save_checkpoint(str(d / "skeleton_matching"), mparams,
                    meta={"matcher_config": mcfg})
    return d, lcfg, lparams


def test_export_int8_roundtrip(small_models_dir, tmp_path):
    d, lcfg, lparams = small_models_dir
    out = tmp_path / "servable"
    main(["export-servable", "--modelsdir", str(d), "--out", str(out)])

    meta = read_meta(str(out / "pose_estimator"))
    assert meta["stored"] == "int8"
    assert meta["prior"] == "median"        # packing variant preserved
    assert "epoch" not in meta              # training-state field dropped
    # the int8 artifact must actually be small (hidden weights 1 B/param)
    assert (out / "pose_estimator.npz").stat().st_size \
        < 0.5 * (d / "pose_estimator.npz").stat().st_size
    assert (out / "skeleton_matching.npz").exists()   # matcher copied

    _, _, loaded, loaded_cfg, prior = load_models(str(out), PANOPTIC)
    assert prior == "median"
    assert loaded_cfg.widths == lcfg.widths
    assert lifter_is_quantized(loaded)
    ref = quantize_lifter_weights(jax.tree.map(jnp.asarray, lparams))
    for got, want in zip(loaded["layers"], ref["layers"]):
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]), err_msg=k)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                     (3, lcfg.in_dim)), np.float32)
    np.testing.assert_allclose(
        np.asarray(apply_lifter(loaded, jnp.asarray(x), lcfg)),
        np.asarray(apply_lifter(ref, jnp.asarray(x), lcfg)), rtol=0, atol=0)


def test_export_bf16_roundtrip(small_models_dir, tmp_path):
    d, lcfg, lparams = small_models_dir
    out = tmp_path / "servable16"
    main(["export-servable", "--modelsdir", str(d), "--out", str(out),
          "--dtype", "bf16"])
    assert read_meta(str(out / "pose_estimator"))["stored"] == "bf16"
    _, _, loaded, _, _ = load_models(str(out), PANOPTIC)
    ref = cast_lifter_weights(jax.tree.map(jnp.asarray, lparams),
                              jnp.bfloat16)
    for got, want in zip(loaded["layers"], ref["layers"]):
        assert got["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got["w"]).view(np.uint16),
            np.asarray(want["w"]).view(np.uint16))
        np.testing.assert_array_equal(np.asarray(got["b"]),
                                      np.asarray(want["b"]))


def test_pipeline_forces_int8_for_quantized_tree(small_models_dir,
                                                 panoptic_rig):
    d, lcfg, lparams = small_models_dir
    from mpe3d_tpu.pipeline import PoseEstimationPipeline

    q = quantize_lifter_weights(jax.tree.map(jnp.asarray, lparams))
    mcfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim)
    pipe = PoseEstimationPipeline(
        PANOPTIC, panoptic_rig, init_matcher(jax.random.PRNGKey(0), mcfg),
        mcfg, lifter_params=q, lifter_cfg=lcfg,
        serve_dtype=jnp.bfloat16)          # request overridden: no fp32 copy
    assert pipe.serve_dtype == jnp.int8
    assert lifter_is_quantized(pipe.lifter_params)


def test_resume_refuses_servable_export(small_models_dir, tmp_path):
    d, _, _ = small_models_dir
    out = tmp_path / "servable"
    main(["export-servable", "--modelsdir", str(d), "--out", str(out)])
    with pytest.raises(SystemExit) as e:
        main(["train-lifter", "--modelsdir", str(out), "--resume",
              "--trainset", "nonexistent.json",
              "--devset", "nonexistent.json"])
    assert "serving-only" in str(e.value)


def test_export_refuses_double_export(small_models_dir, tmp_path):
    d, _, _ = small_models_dir
    out = tmp_path / "servable"
    main(["export-servable", "--modelsdir", str(d), "--out", str(out)])
    with pytest.raises(SystemExit):
        main(["export-servable", "--modelsdir", str(out),
              "--out", str(tmp_path / "twice")])
