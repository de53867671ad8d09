"""Pallas kernel tests (interpret mode on CPU) — fused projection parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.ops.fused_proj import fused_linear_leaky_linear, xla_proj


@pytest.mark.parametrize("shape", [(20, 902, 400), (5, 150, 1), (128, 128, 128)])
def test_fused_proj_interpret_matches_xla(shape):
    N, D, F = shape
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, D)).astype(np.float32)
    w1 = rng.normal(size=(D, D)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(D,)).astype(np.float32)
    w2 = rng.normal(size=(D, F)).astype(np.float32) * 0.05
    b2 = rng.normal(size=(F,)).astype(np.float32)

    ref = np.asarray(xla_proj(jnp.asarray(x), jnp.asarray(w1),
                              jnp.asarray(b1), jnp.asarray(w2),
                              jnp.asarray(b2), 0.15))
    got = np.asarray(fused_linear_leaky_linear(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
        jnp.asarray(b2), 0.15, interpret=True))
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=2e-3), np.abs(got - ref).max()


def test_fused_proj_no_bias():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(9, 64)).astype(np.float32)
    w1 = rng.normal(size=(64, 64)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
    ref = np.asarray(xla_proj(jnp.asarray(x), jnp.asarray(w1), None,
                              jnp.asarray(w2), None, 0.1))
    got = np.asarray(fused_linear_leaky_linear(
        jnp.asarray(x), jnp.asarray(w1), None, jnp.asarray(w2), None, 0.1,
        interpret=True))
    assert np.allclose(got, ref, atol=2e-3)


def _megakernel_case(pair_kw, cfg_kw=None, seed=3):
    """Score the same random matcher through the XLA path and the
    whole-stack pallas megakernel (interpret mode on CPU); return both."""
    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher,
                                      init_matcher)

    cfg_kw = cfg_kw or {}
    cfg_x = MatcherConfig(in_dim=32, hidden=(8, 8), heads=(2, 2), **cfg_kw)
    cfg_p = MatcherConfig(in_dim=32, hidden=(8, 8), heads=(2, 2),
                          use_pallas_matcher=True, **cfg_kw)
    topo = build_topology(3, 2)
    params = init_matcher(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(seed)
    fh = jnp.asarray(rng.normal(size=(topo.n_heads, 32)).astype(np.float32))
    fe = jnp.asarray(rng.normal(size=(topo.n_pairs, 32)).astype(np.float32))
    td = TopologyArrays.from_topology(topo)
    kw = dict(pair_kw)
    pm = kw.pop("pair_mask", jnp.ones(topo.n_pairs))
    s_x = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_x, **kw))
    s_p = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_p, **kw))
    return s_x, s_p, topo


def test_matcher_megakernel_matches_xla():
    """use_pallas_matcher (whole-stack megakernel) == XLA path, all-live."""
    s_x, s_p, _ = _megakernel_case({})
    assert s_p.shape == s_x.shape
    assert np.allclose(s_x, s_p, atol=1e-4), np.abs(s_x - s_p).max()


def test_matcher_megakernel_masked_and_multiplicity():
    """Megakernel honours zeroed pairs and per-pair softmax multiplicities
    (the reference's training-graph pair duplication, graph_generator.py)."""
    from mpe3d_tpu.matching.features import build_topology
    topo = build_topology(3, 2)
    rng = np.random.default_rng(7)
    w = rng.choice([0.0, 1.0, 2.0], size=topo.n_pairs,
                   p=[0.3, 0.4, 0.3]).astype(np.float32)
    w[0] = 0.0  # guarantee at least one dead pair
    s_x, s_p, _ = _megakernel_case(
        {"pair_softmax_weight": jnp.asarray(w)})
    assert np.allclose(s_x, s_p, atol=1e-4), np.abs(s_x - s_p).max()
    # duplicate_pairs flag path (pair_w = 2*mask)
    mask = (w > 0).astype(np.float32)
    s_x2, s_p2, _ = _megakernel_case(
        {"pair_mask": jnp.asarray(mask), "duplicate_pairs": True})
    assert np.allclose(s_x2, s_p2, atol=1e-4), np.abs(s_x2 - s_p2).max()


def test_matcher_with_pallas_proj_matches():
    """apply_matcher(use_pallas_proj) == plain XLA path (interpret mode)."""
    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher,
                                      init_matcher)
    from mpe3d_tpu.ops import fused_proj

    # route the kernel through interpret mode on CPU
    orig = fused_proj.fused_linear_leaky_linear

    def interp(*a, **kw):
        kw["use_pallas"] = False
        kw["interpret"] = True
        return orig(*a, **kw)

    fused_proj.fused_linear_leaky_linear = interp
    try:
        cfg_x = MatcherConfig(in_dim=32, hidden=(8,), heads=(2,))
        cfg_p = MatcherConfig(in_dim=32, hidden=(8,), heads=(2,),
                              use_pallas_proj=True)
        topo = build_topology(3, 2)
        params = init_matcher(jax.random.PRNGKey(0), cfg_x)
        rng = np.random.default_rng(2)
        fh = jnp.asarray(rng.normal(size=(topo.n_heads, 32)).astype(np.float32))
        fe = jnp.asarray(rng.normal(size=(topo.n_pairs, 32)).astype(np.float32))
        pm = jnp.ones(topo.n_pairs)
        td = TopologyArrays.from_topology(topo)
        s_x = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_x))
        s_p = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_p))
        assert np.allclose(s_x, s_p, atol=1e-4), np.abs(s_x - s_p).max()
    finally:
        fused_proj.fused_linear_leaky_linear = orig


def test_matcher_megakernel_matches_xla_large_bucket():
    """Megakernel == XLA at a crowded topology (C=5, S=10 -> E=1000) where
    gat_stack_values takes the chunked head-max branch."""
    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher,
                                      init_matcher)

    cfg_x = MatcherConfig(in_dim=16, hidden=(6, 6), heads=(2, 2))
    cfg_p = MatcherConfig(in_dim=16, hidden=(6, 6), heads=(2, 2),
                          use_pallas_matcher=True)
    topo = build_topology(5, 10)
    assert topo.n_pairs == 1000
    params = init_matcher(jax.random.PRNGKey(4), cfg_x)
    rng = np.random.default_rng(5)
    fh = jnp.asarray(rng.normal(size=(topo.n_heads, 16)).astype(np.float32))
    fe = jnp.asarray(rng.normal(size=(topo.n_pairs, 16)).astype(np.float32))
    pm = jnp.asarray((rng.random(topo.n_pairs) < 0.7).astype(np.float32))
    td = TopologyArrays.from_topology(topo)
    s_x = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_x))
    s_p = np.asarray(apply_matcher(params, fh, fe, td, pm, cfg_p))
    assert np.allclose(s_x, s_p, atol=1e-4), np.abs(s_x - s_p).max()


def test_matcher_tiled_matches_xla():
    """Grid-tiled stack (ops/gat_tiled.py) == XLA path at a crowded
    topology, through both the general and the constant-edge-projection
    forms (the serving path passes the shared alt-3 one-hot as host
    numpy, which triggers the project-once fast path)."""
    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.matching.features import build_topology, edge_node_features
    from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher,
                                      init_matcher)
    from mpe3d_tpu.ops.gat_tiled import apply_matcher_tiled

    cfg = MatcherConfig(in_dim=20, hidden=(6, 6), heads=(2, 2))
    topo = build_topology(5, 10)
    params = init_matcher(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(9)
    fh = jnp.asarray(rng.normal(size=(topo.n_heads, 20)).astype(np.float32))
    pm = jnp.asarray((rng.random(topo.n_pairs) < 0.8).astype(np.float32))
    td = TopologyArrays.from_topology(topo)

    # general (traced, varying) edge features
    fe_var = jnp.asarray(rng.normal(size=(topo.n_pairs, 20))
                         .astype(np.float32))
    s_x = np.asarray(apply_matcher(params, fh, fe_var, td, pm, cfg))
    s_t = np.asarray(apply_matcher_tiled(params, fh, fe_var, topo, pm, cfg))
    assert np.allclose(s_x, s_t, atol=2e-5), np.abs(s_x - s_t).max()

    # constant-edge fast path (host numpy one-hot block)
    fe_const = edge_node_features(topo.n_pairs, 20)
    s_x = np.asarray(apply_matcher(params, fh, jnp.asarray(fe_const), td,
                                   pm, cfg))
    s_t = np.asarray(apply_matcher_tiled(params, fh, fe_const, topo, pm,
                                         cfg))
    assert np.allclose(s_x, s_t, atol=2e-5), np.abs(s_x - s_t).max()


def test_perlane_head_max_matches_rank3():
    """_perlane_head_max == the one-shot rank-3 masked max (exact)."""
    from mpe3d_tpu.ops.gat_kernel import _perlane_head_max

    H, E, nh = 50, 1000, 10
    rng = np.random.default_rng(13)
    inc1 = jnp.asarray((rng.random((E, H)) < 0.05).astype(np.float32))
    inc2 = jnp.asarray((rng.random((E, H)) < 0.05).astype(np.float32))
    neg = jnp.float32(-jnp.inf)
    l1 = rng.normal(size=(E, nh)).astype(np.float32)
    l2 = rng.normal(size=(E, nh)).astype(np.float32)
    l1[rng.random(E) < 0.1] = -np.inf
    l1m, l2m = jnp.asarray(l1), jnp.asarray(l2)
    r1 = jnp.max(jnp.where(jnp.asarray(inc1).T[:, :, None] > 0,
                           l1m[None, :, :], neg), axis=1)
    r2 = jnp.max(jnp.where(jnp.asarray(inc2).T[:, :, None] > 0,
                           l2m[None, :, :], neg), axis=1)
    m1, m2 = _perlane_head_max(inc1, inc2, l1m, l2m, H, nh)
    assert np.array_equal(np.asarray(r1), np.asarray(m1))
    assert np.array_equal(np.asarray(r2), np.asarray(m2))
