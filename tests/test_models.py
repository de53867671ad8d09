"""Unit tests for the MLP lifter and the structured GAT matcher.

The GAT is validated against a naive edge-list implementation of the
reference semantics (per-destination edge softmax over {self-loop, link
edges}; reference: skeleton_matching/gat2.py:50-88) built here in pure numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import LifterConfig, MatcherConfig
from mpe3d_tpu.matching.features import build_topology
from mpe3d_tpu.models.gat import (TopologyArrays, apply_matcher, init_matcher,
                                  matcher_num_params)
from mpe3d_tpu.models.mlp import apply_lifter, init_lifter, lifter_num_params


def test_lifter_shapes_and_param_count():
    cfg = LifterConfig()
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((4, cfg.in_dim))
    y = apply_lifter(params, x, cfg)
    assert y.shape == (4, cfg.out_dim)
    # exact torch param count of the reference architecture (utils/mlp.py)
    dims = (cfg.in_dim, *cfg.widths, cfg.out_dim)
    expected = sum(a * b + b for a, b in zip(dims[:-1], dims[1:]))
    assert lifter_num_params(params) == expected
    assert expected == 29_106_230  # ≈29.1M params (SURVEY.md §2a)


def test_lifter_residual_prior_head():
    """residual_prior=True adds the packed triangulated prior (fields 11:14
    of camera block 0) to the network output; zero-init starts AT the prior."""
    from mpe3d_tpu.models.mlp import extract_prior

    cfg = LifterConfig(in_dim=5 * 18 * 14, out_dim=54)
    rcfg = LifterConfig(in_dim=cfg.in_dim, out_dim=54, residual_prior=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.in_dim))

    # prior extraction reads block 0's fields 11:14 per joint
    prior = extract_prior(x, cfg)
    blocks = np.asarray(x).reshape(3, 5, 18, 14)
    assert np.allclose(prior, blocks[:, 0, :, 11:14].reshape(3, 54))

    # same params: residual output == absolute output + prior
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    y_abs = apply_lifter(params, x, cfg)
    y_res = apply_lifter(params, x, rcfg)
    assert np.allclose(y_res, y_abs + prior, atol=1e-6)

    # zero-initialised head: initial prediction IS the prior exactly
    rparams = init_lifter(jax.random.PRNGKey(0), rcfg)
    assert np.allclose(apply_lifter(rparams, x, rcfg), prior)
    # ...and still has gradients into the body after the head (head weight
    # receives gradient immediately; body follows once the head is nonzero)
    g = jax.grad(lambda p: jnp.sum(apply_lifter(p, x, rcfg) ** 2))(rparams)
    assert float(jnp.abs(g["layers"][-1]["w"]).max()) > 0


def test_lifter_config_meta_roundtrip(tmp_path):
    """A residual_prior checkpoint reloads with the right architecture even
    when the caller's default config says absolute (silent-wrong-function
    guard; train/checkpoint.py::lifter_config_from_meta)."""
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            read_meta, save_checkpoint)

    cfg = LifterConfig(in_dim=140, out_dim=30, widths=(16,),
                       residual_prior=True)
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "pose_estimator")
    save_checkpoint(path, params, meta={"lifter_config": cfg, "prior": "mean"})

    default = LifterConfig(in_dim=140, out_dim=30, widths=(16,))
    lcfg = lifter_config_from_meta(read_meta(path), default)
    assert lcfg.residual_prior is True
    assert lcfg.widths == (16,)
    hash(lcfg)  # must stay hashable (jit static arg)
    # old checkpoints without the field keep the default
    assert lifter_config_from_meta({}, default) == default


def test_lifter_bf16_close_to_fp32():
    cfg = LifterConfig()
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.in_dim))
    y32 = apply_lifter(params, x, cfg)
    y16 = apply_lifter(params, x, cfg, compute_dtype=jnp.bfloat16)
    assert np.allclose(y32, y16, atol=0.15, rtol=0.05)


# ---------------------------------------------------------------------------
# naive reference GAT over an explicit edge list
# ---------------------------------------------------------------------------


def _naive_gat_layer(layer, x, edges, nh, d_out, alpha, residual=False):
    """x: [N, Din]; edges: list of (src, dst).  Reference semantics:
    fc1+leaky(alpha) → fc2 → per-edge logits leaky(alpha, a_l·z_src+a_r·z_dst)
    → softmax per dst → weighted sum of z_src (+ residual shortcut,
    gat2.py:69-75)."""
    def leaky(v):
        return np.where(v > 0, v, alpha * v)

    h2 = leaky(x @ np.asarray(layer["w1"]) + np.asarray(layer["b1"]))
    z = (h2 @ np.asarray(layer["w2"]) + np.asarray(layer["b2"])).reshape(
        len(x), nh, d_out)
    a1 = np.einsum("nhd,hd->nh", z, np.asarray(layer["attn_l"]))
    a2 = np.einsum("nhd,hd->nh", z, np.asarray(layer["attn_r"]))
    out = np.zeros_like(z)
    for dst in set(d for _, d in edges):
        srcs = [s for s, d in edges if d == dst]
        logits = leaky(a1[srcs] + a2[dst])           # [k, nh]
        e = np.exp(logits - logits.max(axis=0, keepdims=True))
        att = e / e.sum(axis=0, keepdims=True)
        out[dst] = np.einsum("kh,khd->hd", att, z[srcs])
    if residual:
        if "wr" in layer:
            r = (x @ np.asarray(layer["wr"]) + np.asarray(layer["br"])
                 ).reshape(len(x), nh, d_out)
        else:
            r = x[:, None, :]
        out = out + r
    return out


def _naive_matcher(params, feats_h, feats_e, pairs, cfg, duplicate=False,
                   residual=False):
    """Full naive stack over the explicit alt-3 edge list.

    With ``duplicate=True`` each pair gets TWO feature-identical edge-nodes,
    exactly like the reference's training graphs instantiate both orders
    (graph_generator.py:753-798); scores are read from the first copy.
    """
    H = len(feats_h)
    reps = 2 if duplicate else 1
    all_pairs = list(pairs) * reps
    feats_e_all = np.concatenate([feats_e[:len(pairs)]] * reps, axis=0)
    x = np.concatenate([feats_h, feats_e_all], axis=0)
    edges = [(h, h) for h in range(H)]               # head self-loops
    for k, (h1, h2) in enumerate(all_pairs):
        e = H + k
        edges += [(h1, e), (e, h1), (h2, e), (e, h2), (e, e)]
    dims = []
    d_in = cfg.in_dim
    for l in range(len(cfg.hidden)):
        dims.append((d_in, cfg.hidden[l], cfg.heads[l]))
        d_in = cfg.hidden[l] * cfg.heads[l]
    dims.append((d_in, cfg.n_classes, 1))
    for l, (din, dout, nh) in enumerate(dims):
        out = _naive_gat_layer(params["layers"][l], x, edges, nh, dout,
                               cfg.alpha, residual=residual and l > 0)
        if l < len(dims) - 1:
            x = np.where(out > 0, out, cfg.hidden_slope * out).reshape(
                len(x), nh * dout)
        else:
            x = out.reshape(len(x))
    return 1.0 / (1.0 + np.exp(-x[H:H + len(pairs)]))


@pytest.mark.parametrize("duplicate,residual", [(False, False), (True, False),
                                                (False, True)])
def test_gat_matches_naive_edge_list(duplicate, residual):
    """Structured masked attention == explicit edge-list GAT.

    Runs in float64 so the comparison isolates *semantics* from fp32
    accumulation-order noise; agreement is ~1e-14."""
    C, S = 3, 2
    cfg = MatcherConfig(in_dim=16, hidden=(8, 6), heads=(2, 3),
                        residual=residual)
    topo = build_topology(C, S)
    rng = np.random.default_rng(0)

    present = np.array([[1, 1], [1, 0], [1, 1]], bool)
    head_mask = present.reshape(-1)
    feats_h = rng.normal(size=(topo.n_heads, cfg.in_dim))
    feats_h[~head_mask] = 0.0
    feats_h[:, 0] = head_mask
    feats_h[:, 1] = 0.0
    feats_e_full = np.zeros((topo.n_pairs, cfg.in_dim))
    feats_e_full[:, 1] = 1.0
    pair_mask = (head_mask[topo.e1] & head_mask[topo.e2]).astype(np.float64)

    jax.config.update("jax_enable_x64", True)
    try:
        params = init_matcher(jax.random.PRNGKey(3), cfg)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), params)
        scores = apply_matcher(params, jnp.asarray(feats_h),
                               jnp.asarray(feats_e_full),
                               TopologyArrays.from_topology(topo),
                               jnp.asarray(pair_mask), cfg,
                               duplicate_pairs=duplicate)
        got = np.asarray(scores)
    finally:
        jax.config.update("jax_enable_x64", False)

    # naive graph: only REAL heads and REAL pairs exist
    real_heads = np.nonzero(head_mask)[0]
    remap = {int(h): i for i, h in enumerate(real_heads)}
    real_pairs = [k for k in range(topo.n_pairs) if pair_mask[k] > 0]
    pairs = [(remap[int(topo.e1[k])], remap[int(topo.e2[k])])
             for k in real_pairs]
    naive = _naive_matcher(
        jax.tree_util.tree_map(np.asarray, params),
        feats_h[real_heads], feats_e_full[:len(pairs)], pairs, cfg,
        duplicate=duplicate, residual=residual)

    got = got[real_pairs]
    assert np.allclose(got, naive, atol=1e-10), np.abs(got - naive).max()


def test_gat_residual_changes_output_and_adds_params():
    """residual=True must actually change the computed function (VERDICT
    round-1 'dead config branch' fix) and add res_fc parameters."""
    cfg0 = MatcherConfig(in_dim=16, hidden=(8, 6), heads=(2, 3))
    cfg1 = MatcherConfig(in_dim=16, hidden=(8, 6), heads=(2, 3),
                         residual=True)
    topo = build_topology(3, 2)
    p1 = init_matcher(jax.random.PRNGKey(0), cfg1)
    assert "wr" in p1["layers"][1] and "wr" not in p1["layers"][0]
    # drop the shortcut weights → same tree as cfg0
    p0 = {"layers": [{k: v for k, v in l.items() if k not in ("wr", "br")}
                     for l in p1["layers"]]}
    fh = jax.random.normal(jax.random.PRNGKey(1), (topo.n_heads, cfg0.in_dim))
    fe = jnp.zeros((topo.n_pairs, cfg0.in_dim)).at[:, 1].set(1.0)
    ta = TopologyArrays.from_topology(topo)
    pm = jnp.ones(topo.n_pairs)
    s0 = apply_matcher(p0, fh, fe, ta, pm, cfg0)
    s1 = apply_matcher(p1, fh, fe, ta, pm, cfg1)
    assert not np.allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_gat_dropout_train_vs_eval():
    """feat/attn dropout fires only with a dropout_key (train mode), is
    stochastic across keys, and eval mode stays deterministic."""
    cfg = MatcherConfig(in_dim=16, hidden=(8, 6), heads=(2, 3),
                        feat_drop=0.3, attn_drop=0.3)
    topo = build_topology(3, 2)
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    fh = jax.random.normal(jax.random.PRNGKey(1), (topo.n_heads, cfg.in_dim))
    fe = jnp.zeros((topo.n_pairs, cfg.in_dim)).at[:, 1].set(1.0)
    ta = TopologyArrays.from_topology(topo)
    pm = jnp.ones(topo.n_pairs)
    e1 = apply_matcher(params, fh, fe, ta, pm, cfg)
    e2 = apply_matcher(params, fh, fe, ta, pm, cfg)
    assert np.allclose(np.asarray(e1), np.asarray(e2))      # eval: no key
    t1 = apply_matcher(params, fh, fe, ta, pm, cfg,
                       dropout_key=jax.random.PRNGKey(7))
    t2 = apply_matcher(params, fh, fe, ta, pm, cfg,
                       dropout_key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(t1), np.asarray(e1), atol=1e-6)
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
    # same key → reproducible
    t1b = apply_matcher(params, fh, fe, ta, pm, cfg,
                        dropout_key=jax.random.PRNGKey(7))
    assert np.allclose(np.asarray(t1), np.asarray(t1b))


def test_matcher_default_config_runs():
    cfg = MatcherConfig()
    topo = build_topology(5, 2)
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    fh = jnp.zeros((topo.n_heads, cfg.in_dim)).at[:, 0].set(1.0)
    fe = jnp.zeros((topo.n_pairs, cfg.in_dim)).at[:, 1].set(1.0)
    scores = apply_matcher(params, fh, fe, TopologyArrays.from_topology(topo),
                           jnp.ones(topo.n_pairs), cfg)
    assert scores.shape == (topo.n_pairs,)
    assert np.all((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1))
    assert matcher_num_params(params) > 0


def test_cast_lifter_weights_bit_identity():
    """Stored-bf16 weights are BIT-identical to casting fp32 weights at the
    matmul (the TPU default-precision path) — the serving claim behind
    PoseEstimationPipeline(serve_dtype=...)."""
    from mpe3d_tpu.models.mlp import cast_lifter_weights

    cfg = LifterConfig(in_dim=140, out_dim=30, widths=(32, 16))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    stored = cast_lifter_weights(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.in_dim))
    y_cast = apply_lifter(params, x, cfg, compute_dtype=jnp.bfloat16)
    y_stored = apply_lifter(stored, x, cfg, compute_dtype=jnp.bfloat16)
    assert np.array_equal(np.asarray(y_cast), np.asarray(y_stored))


def test_matcher_config_roundtrips_through_checkpoint(tmp_path):
    """A matcher checkpoint trained with non-default architecture flags
    (residual, dropout, custom hidden/heads) reconstructs its config at
    load time (train/checkpoint.py::matcher_config_from_meta) — otherwise
    a residual=True checkpoint would load shape-compatibly into the
    default config and silently compute the wrong function."""
    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.checkpoint import (matcher_config_from_meta,
                                            read_meta, save_checkpoint)

    cfg = MatcherConfig(in_dim=902, hidden=(8, 8), heads=(2, 2),
                        residual=True, feat_drop=0.1, attn_drop=0.2,
                        use_pallas_proj=True)
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "skeleton_matching")
    save_checkpoint(path, params, meta={"matcher_config": cfg, "n_slots": 6})

    default = MatcherConfig(in_dim=902)
    mcfg = matcher_config_from_meta(read_meta(path), default)
    assert mcfg.residual is True
    assert mcfg.hidden == (8, 8) and mcfg.heads == (2, 2)
    assert mcfg.feat_drop == 0.1 and mcfg.attn_drop == 0.2
    # serving-only knob keeps the CALLER's default, not the checkpoint's
    assert mcfg.use_pallas_proj == default.use_pallas_proj
    hash(mcfg)  # must stay hashable (jit static arg)
    assert matcher_config_from_meta({}, default) == default
