"""The one-command reference weight-parity harness
(scripts/reference_weight_parity.py) exercised end-to-end on synthetic
stand-in checkpoints written through convert.torch_export — so the day
the reference's blocked Dropbox artifacts appear on disk, parity is one
command that is already known to work."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _harness():
    if SCRIPTS not in sys.path:
        sys.path.insert(0, SCRIPTS)
    import reference_weight_parity
    return reference_weight_parity


def test_selfcheck_roundtrip(tmp_path):
    """Stand-in checkpoints in the reference wire formats pass both
    forward-parity gates."""
    import jax

    from mpe3d_tpu.config import LifterConfig, MatcherConfig
    from mpe3d_tpu.convert.torch_export import (export_reference_lifter,
                                                export_reference_matcher)
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter

    h = _harness()
    mcfg = MatcherConfig(in_dim=24, hidden=(8, 6), heads=(2, 2))
    lcfg = LifterConfig(in_dim=120, out_dim=18, widths=(64, 48))
    mp = init_matcher(jax.random.PRNGKey(0), mcfg)
    lp = init_lifter(jax.random.PRNGKey(1), lcfg)
    export_reference_matcher(mp, mcfg, str(tmp_path / "m.tch"),
                             str(tmp_path / "m.prms"))
    export_reference_lifter(lp, str(tmp_path / "l.pytorch"), lcfg)

    _, lcfg2, dl = h.lifter_parity(str(tmp_path / "l.pytorch"))
    assert tuple(lcfg2.widths) == (64, 48)
    assert dl < h.FWD_TOL, dl

    _, mcfg2, dm = h.matcher_parity(str(tmp_path / "m.tch"),
                                    str(tmp_path / "m.prms"))
    assert tuple(mcfg2.hidden) == (8, 6)
    assert dm < h.FWD_TOL, dm


def test_reference_mlp_class_import_path():
    """When /root/reference is present, the harness drives the
    reference's OWN PoseEstimatorMLP (strict load) for the hard-coded
    architecture; otherwise it falls back to a width-matched mirror."""
    h = _harness()
    if not os.path.isdir("/root/reference/utils"):
        pytest.skip("reference tree not mounted")
    cls = h._ref_mlp_module()
    m = cls(12, 6)
    names = [k for k, _ in m.named_parameters()]
    assert any(k.startswith("layers.") for k in names)
