"""CLI acceptance test: the full user workflow on synthetic data.

Mirrors how a reference user works (SURVEY.md §4 acceptance layer): generate
data → train both models (tiny budgets) → run every metrics subcommand →
render results.
"""

import json
import os

import numpy as np
import pytest

from mpe3d_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


@pytest.fixture(scope="module")
def datasets(workdir):
    paths = {}
    for name, seed in (("train", 0), ("dev", 1), ("test_sp", 2)):
        p = str(workdir / f"{name}.json")
        main(["generate-synthetic", "--output", p, "--frames", "25",
              "--single-person", "--seed", str(seed)])
        paths[name] = p
    p = str(workdir / "test_multi.json")
    main(["generate-synthetic", "--output", p, "--frames", "10",
          "--min-people", "2", "--max-people", "3", "--seed", "5"])
    paths["test_multi"] = p
    return paths


@pytest.fixture(scope="module")
def modelsdir(workdir, datasets):
    md = str(workdir / "models")
    main(["train-matcher", "--modelsdir", md,
          "--trainset", datasets["train"], "--devset", datasets["dev"],
          "--epochs", "6", "--limit", "60", "--batch-size", "16"])
    main(["train-lifter", "--modelsdir", md,
          "--trainset", datasets["train"], "--devset", datasets["dev"],
          "--epochs", "4", "--batch-size", "64"])
    assert os.path.exists(md + "/skeleton_matching.npz")
    assert os.path.exists(md + "/pose_estimator.npz")
    return md


def test_metrics_subcommands(datasets, modelsdir, capsys):
    main(["metrics-from-triangulation", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--datastep", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_frames"] > 0
    assert np.isfinite(out["t_pp_ms"])

    main(["sm-metrics", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--datastep", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_frames"] > 0
    assert -1.0 <= out["ari"] <= 1.0

    main(["sm-metrics-without-gt", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_sp"], "--limit", "15"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_scenes"] > 0

    main(["metrics-from-model", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--datastep", "3"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_frames"] > 0

    main(["reprojection-error", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--datastep", "3"])
    out = json.loads(capsys.readouterr().out)
    assert "mlp" in out and "triangulation" in out


def test_infer_subcommand(datasets, modelsdir, workdir, capsys):
    out_json = str(workdir / "poses.json")
    main(["infer", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--backend",
          "triangulation", "--out", out_json])
    capsys.readouterr()
    with open(out_json) as f:
        result = json.load(f)
    assert len(result) == 10
    found = [r for r in result if r["n_persons"] > 0]
    assert found, "no persons found in any frame"
    for r in found:
        poses = np.asarray(r["poses_m"])
        assert poses.shape[1:] == (18, 3)
        assert np.isfinite(poses).all()

    # batched mode agrees on person counts
    main(["infer", "--modelsdir", modelsdir, "--testfiles",
          datasets["test_multi"], "--backend", "triangulation", "--batch"])
    batched = json.loads(capsys.readouterr().out)
    assert [r["n_persons"] for r in batched] == \
        [r["n_persons"] for r in result]


def test_show_results_and_merge(datasets, modelsdir, workdir, capsys):
    gif = str(workdir / "vis.gif")
    main(["show-results", "--modelsdir", modelsdir,
          "--testfiles", datasets["test_multi"], "--backend",
          "triangulation", "--out", gif, "--max-frames", "3", "--showgt"])
    assert os.path.exists(gif) and os.path.getsize(gif) > 1000
    capsys.readouterr()

    merged = str(workdir / "merged.json")
    main(["merge-jsons", datasets["train"], datasets["dev"], merged])
    with open(merged) as f:
        assert len(json.load(f)) == 50
    capsys.readouterr()


def test_cpu_flag_parses():
    """--cpu is a common flag on every jax-using subcommand (forces the CPU
    backend in main() before any backend initialises)."""
    from mpe3d_tpu.cli import make_parser
    args = make_parser().parse_args(
        ["infer", "--cpu", "--testfiles", "x.json"])
    assert args.cpu is True
    args = make_parser().parse_args(
        ["metrics-from-model", "--testfiles", "x.json"])
    assert args.cpu is False
