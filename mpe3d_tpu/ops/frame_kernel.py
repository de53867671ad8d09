"""Pallas TPU whole-frame kernel: match + decode + pack + lift in ONE launch.

The round-3 stage ledger (RESULTS.md "round-3 ledger") accounts the fused
serving frame to ~176 µs: GAT megakernel ~80 µs (compute-bound serial
path), device decode ~13 µs, prior pack ~9 µs, then the lifter MLP at its
weight-stream floor (~83 µs for 55.5 MB of bf16 weights at the measured
~690 GB/s achievable HBM rate).  The two dominant terms — match compute
and the MLP weight stream — are INDEPENDENT resources (VPU/MXU vs the DMA
engine), but as separate XLA fusions they serialize, because the MLP
cannot *dispatch* until the decode's output exists.

This kernel removes that serialization: one ``pallas_call`` issues the
DMAs for ALL lifter layer weights HBM→VMEM at kernel entry, then runs the
GAT stack (ops/gat_kernel.py::gat_stack_values — the same code the
matcher megakernel runs, scores identical by construction), the greedy
camera-consistent decode (same semantics as
matching/decode_device.py::decode_person_proposals_device), the
per-person gather + lifter-input pack (same math as
lifting/pack.py::pack_lifter_input, prior="mean"), and finally the MLP
with the by-then-resident weights.  The weight stream rides entirely
under the match/decode/pack compute, so the frame's critical path is
max(compute, stream) instead of compute + stream.

Reference parity: the end-to-end semantics re-implemented here are the
reference's per-frame inference loop (test/metrics_from_model.py:176-300:
GAT → networkx decode → per-person dataset → MLP), under the same
reproduced quirks as the XLA paths (joint-0 prior skip, merge-quirk camera
lists — see the cited modules).  tests/test_frame_kernel.py asserts
equality against the staged/fused XLA pipeline on random frames.

Mosaic design notes (validated on-chip by scripts/probe_mosaic.py):
  * the decode is a dynamic-trip ``fori_loop`` (n_live iterations) whose
    per-candidate scalars are extracted by masked reductions over tiny
    [E,1]/[H,1] tiles — no scatters, no sorts (iterated argmax replaces
    the XLA path's argsort/top_k, same order incl. tie-breaking);
  * per-slot feature blocks (fields 0-9) are precomputed OUTSIDE the
    kernel (XLA prologue, lifting/pack.py::pack_slot_fields09) in
    per-camera 128-aligned blocks of width BW = roundup(J·14, 128); the
    per-person gather is a rank-3 broadcast-sum against slot one-hots,
    and every ``net`` store is 128-lane aligned;
  * the triangulated prior (fields 10-13) is computed in-kernel from the
    gathered observations in component (x/y/z-plane) form — the
    small-contraction rule (CLAUDE.md): explicit VPU multiply-sums, no
    einsum/dot on 3/4-element axes — and scattered into the stride-14
    net layout with static 0/1 expansion matrices (Ek), avoiding
    unsupported lane-merge reshapes;
  * camera calibration enters as STATIC python floats baked into the
    kernel (the rig is a construction-time constant of every serving
    program — same rationale as the host-numpy CameraRig).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import MatcherConfig
from mpe3d_tpu.ops.tiles import round_up as _round_up

M_TILE = 16     # MLP activation rows — person buckets are <= 16


# ---------------------------------------------------------------------------
# serving-tree packing (host-side, once per pipeline)
# ---------------------------------------------------------------------------


def frame_block_width(n_joints: int) -> int:
    """Per-camera net block width: J*14 rounded up to the 128-lane tile."""
    return _round_up(n_joints * 14, 128)


def pack_frame_layers(layers: Sequence[dict], n_used_cameras: int,
                      n_joints: int):
    """Pack a lifter serving layer list for the whole-frame kernel.

    Identical to ops/fused_mlp.py::pack_fused_layers except layer 0's K
    axis is re-laid out to the kernel's per-camera aligned block format:
    input feature (c, j, k) moves from row c*(J*14) + j*14 + k to row
    c*BW + j*14 + k with BW = roundup(J*14, 128) (pad rows zero).  The
    kernel assembles its ``net`` activation in exactly that layout with
    aligned stores only.  Quantised layer-0 trees may arrive K-prepadded
    (models/mlp.py::prepad_quantized_lifter appends zero rows) — the true
    K rows are re-laid out and the pad discarded; ``rscale`` is re-laid
    out alongside so the fold matches the activation columns.

    Returns (flat arrays, kinds, padded dims) like pack_fused_layers.
    """
    per_cam = n_joints * 14
    true_k0 = n_used_cameras * per_cam
    bw = frame_block_width(n_joints)
    k0p = n_used_cameras * bw

    def relayout_rows(w):
        w = jnp.asarray(w)
        if w.shape[0] < true_k0:
            raise ValueError(f"layer-0 K {w.shape[0]} < expected {true_k0}")
        w = w[:true_k0]
        w = w.reshape(n_used_cameras, per_cam, w.shape[-1])
        out = jnp.zeros((n_used_cameras, bw, w.shape[-1]), w.dtype)
        out = out.at[:, :per_cam, :].set(w)
        return out.reshape(k0p, w.shape[-1])

    flat, kinds, dims = [], [], []
    prev_n = None
    for i, layer in enumerate(layers):
        quant = "wq" in layer
        w = jnp.asarray(layer["wq"] if quant else layer["w"])
        if quant and w.dtype != jnp.int8:
            raise ValueError("wq must be int8")
        if not quant:
            w = w.astype(jnp.bfloat16)
        K, N = w.shape
        Np = _round_up(N, 128)
        if i == 0:
            w = relayout_rows(w)
            Kp = k0p
        else:
            ok = (prev_n is None or K == prev_n
                  or (quant and K == _round_up(prev_n, 128)))
            if not ok:
                raise ValueError(f"layer boundary mismatch: K {K} != "
                                 f"previous layer's N {prev_n}")
            Kp = _round_up(K, 128)
        prev_n = N
        if w.shape != (Kp, Np):
            w = jnp.zeros((Kp, Np), w.dtype).at[:w.shape[0], :N].set(w)
        b = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
            jnp.asarray(layer["b"], jnp.float32))
        if quant:
            scale = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
                jnp.asarray(layer["scale"], jnp.float32))
            rs = layer.get("rscale")
            rs = (jnp.ones((K,), jnp.float32) if rs is None
                  else jnp.asarray(rs, jnp.float32))
            if i == 0:
                rsr = jnp.zeros((n_used_cameras, bw), jnp.float32)
                rsr = rsr.at[:, :per_cam].set(
                    rs[:true_k0].reshape(n_used_cameras, per_cam))
                rscale = rsr.reshape(1, k0p)
            else:
                rscale = jnp.zeros((1, Kp),
                                   jnp.float32).at[0, :rs.shape[0]].set(rs)
            flat += [w, scale, rscale, b]
            kinds.append("q")
        else:
            flat += [w, b]
            kinds.append("w")
        dims.append((Kp, Np))
    return flat, tuple(kinds), tuple(dims)


def _cam_consts(rig) -> Tuple[Tuple[float, ...], ...]:
    """Per-used-camera static floats baked into the kernel:
    (fx, fy, cx, cy, k1, k2, p1, p2, k3, P[3x4] row-major) — 21 each."""
    out = []
    K = np.asarray(rig.K, np.float64)
    dist = np.asarray(rig.dist, np.float64)
    T = np.asarray(rig.T_wc, np.float64)
    for c in range(K.shape[0]):
        out.append(tuple(
            float(v) for v in (
                K[c, 0, 0], K[c, 1, 1], K[c, 0, 2], K[c, 1, 2],
                dist[c, 0], dist[c, 1], dist[c, 2], dist[c, 3], dist[c, 4],
                *T[c, :3, :].reshape(-1))))
    return tuple(out)


def _expansion_matrices(n_joints: int) -> np.ndarray:
    """Static 0/1 matrices scattering per-joint prior values into the
    stride-14 block layout: ek[k'*J + j, j*14 + 10 + k'] = 1 for the four
    prior fields k' in {0: ok flag, 1..3: xyz/10}."""
    bw = frame_block_width(n_joints)
    ek = np.zeros((4 * n_joints, bw), np.float32)
    for kprime in range(4):
        for j in range(n_joints):
            ek[kprime * n_joints + j, j * 14 + 10 + kprime] = 1.0
    return ek


# ---------------------------------------------------------------------------
# in-kernel component geometry (same math as geometry/triangulate.py)
# ---------------------------------------------------------------------------


def _undistort_component(gx, gy, cc, iters: int = 10):
    """cv2-style fixed-point undistortion on [P, J] component planes.
    ``cc``: the camera's static float tuple.  Mirrors
    geometry/camera.py::undistort_points exactly."""
    fx, fy, cx, cy, k1, k2, p1, p2, k3 = cc[:9]
    xd = (gx - cx) / fx
    yd = (gy - cy) / fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        f = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / f
        y = (yd - dy) / f
    return x, y


def _solve3x3_component(M, b):
    """geometry/triangulate.py::_solve3x3 on component planes.
    M: dict of 9 [P, J] entries keyed (r, c); b: 3-list."""
    a, d, g = M[0, 0], M[0, 1], M[0, 2]
    e, h, c = M[1, 1], M[1, 2], M[1, 0]
    f, i, k = M[2, 0], M[2, 1], M[2, 2]
    A00 = e * k - h * i
    A01 = h * f - c * k
    A02 = c * i - e * f
    A10 = g * i - d * k
    A11 = a * k - g * f
    A12 = d * f - a * i
    A20 = d * h - g * e
    A21 = g * c - a * h
    A22 = a * e - d * c
    det = a * A00 + d * A01 + g * A02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x0 = (A00 * b[0] + A10 * b[1] + A20 * b[2]) / det
    x1 = (A01 * b[0] + A11 * b[1] + A21 * b[2]) / det
    x2 = (A02 * b[0] + A12 * b[1] + A22 * b[2]) / det
    return [x0, x1, x2]


def _select_rank_component(values, valid, target, big):
    """Counting selection on a static list of [P, J] planes: the element
    whose ascending rank (invalid → ``big``, ties broken by list index —
    value-identical to a sort, which mosaic lacks) equals ``target``
    ([P, J] plane).  Returns the selected value plane."""
    masked = [jnp.where(v > 0.5, x, big) for x, v in zip(values, valid)]
    out = None
    for q, vq in enumerate(masked):
        rank = None
        for qp, vqp in enumerate(masked):
            less = ((vqp < vq) | ((vqp == vq) & (qp < q))).astype(vq.dtype)
            rank = less if rank is None else rank + less
        pick = jnp.where(rank == target, vq, 0.0)
        out = pick if out is None else out + pick
    return out


def _irls_component(xns, tobs, cam_consts, n_iters: int = 5,
                    delta_px: float = 4.0):
    """geometry/triangulate.py::triangulate_irls on [P, J] component
    planes.  xns: per-camera (x, y) undistorted normalized planes; tobs:
    per-camera validity planes.  Returns ([x, y, z], ok_float)."""
    Cu = len(xns)
    v = [(t > 0.5).astype(t.dtype) for t in tobs]
    B1, d1, B2, d2, deltas, Pmats = [], [], [], [], [], []
    for cu in range(Cu):
        cc = cam_consts[cu]
        fmean = (cc[0] + cc[1]) * 0.5
        deltas.append(delta_px / fmean)
        Pm = cc[9:21]
        Pmats.append(Pm)
        p0 = Pm[0:4]
        p1r = Pm[4:8]
        p2r = Pm[8:12]
        xnx, xny = xns[cu]
        B1.append([xnx * p2r[k] - p0[k] for k in range(3)])
        d1.append(xnx * p2r[3] - p0[3])
        B2.append([xny * p2r[k] - p1r[k] for k in range(3)])
        d2.append(xny * p2r[3] - p1r[3])

    def solve(w):
        M, bvec = {}, [0.0, 0.0, 0.0]
        for a in range(3):
            for c in range(3):
                M[a, c] = 0.0
        for cu in range(Cu):
            wj = w[cu] * v[cu]
            for a in range(3):
                for c in range(3):
                    M[a, c] = M[a, c] + wj * (B1[cu][a] * B1[cu][c]
                                              + B2[cu][a] * B2[cu][c])
                bvec[a] = bvec[a] + wj * (B1[cu][a] * d1[cu]
                                          + B2[cu][a] * d2[cu])
        for a in range(3):
            M[a, a] = M[a, a] + 1e-8
        return _solve3x3_component(M, [-b for b in bvec])

    ones = [jnp.ones_like(v[0]) for _ in range(Cu)]
    x = solve(ones)
    for _ in range(n_iters):
        w, wz, wb, xc2s = [], [], [], []
        for cu in range(Cu):
            Pm = Pmats[cu]
            xc = [Pm[4 * k] * x[0] + Pm[4 * k + 1] * x[1]
                  + Pm[4 * k + 2] * x[2] + Pm[4 * k + 3] for k in range(3)]
            z = jnp.maximum(xc[2], 1e-4)
            rx = xc[0] / z - xns[cu][0]
            ry = xc[1] / z - xns[cu][1]
            r = jnp.sqrt(rx * rx + ry * ry)
            wc = jnp.minimum(1.0, deltas[cu] / jnp.maximum(r, 1e-12))
            w.append(wc)
            wz.append(jnp.where(r > 10.0 * deltas[cu], 0.0, wc))
            xc2s.append(xc[2])
        nz = sum(((wzc > 0) & (vc > 0)).astype(wzc.dtype)
                 for wzc, vc in zip(wz, v))
        w = [jnp.where(nz >= 3, wzc, wc) for wzc, wc in zip(wz, w)]
        wb = [jnp.where(xc2 > 1e-4, wc, 0.0) for xc2, wc in zip(xc2s, w)]
        nzb = sum(((wbc > 0) & (vc > 0)).astype(wbc.dtype)
                  for wbc, vc in zip(wb, v))
        w = [jnp.where(nzb >= 2, wbc, wc) for wbc, wc in zip(wb, w)]
        x = solve(w)
    ok = (sum(v) > 1.5).astype(x[0].dtype)
    return x, ok


def _tri_pair_component(xn1, xn2, P1, P2, refine_steps: int = 2):
    """geometry/triangulate.py::triangulate_pair on [P, J] planes.
    xn1/xn2: (x, y) undistorted normalized planes; P1/P2: 12 static floats
    (3x4 row-major).  Returns [x, y, z] planes."""
    def prow(P, r):
        return (P[4 * r], P[4 * r + 1], P[4 * r + 2], P[4 * r + 3])

    rows = []           # B rows as 3-component lists + d scalar-plane
    for (xn, Pm) in ((xn1, P1), (xn2, P2)):
        p0, p1r, p2r = prow(Pm, 0), prow(Pm, 1), prow(Pm, 2)
        for comp, pr in ((xn[0], p0), (xn[1], p1r)):
            B = [comp * p2r[k] - pr[k] for k in range(3)]
            dd = comp * p2r[3] - pr[3]
            rows.append((B, dd))

    M = {}
    for a in range(3):
        for c in range(3):
            M[a, c] = sum(B[a] * B[c] for B, _ in rows)
    bvec = [-sum(B[a] * dd for B, dd in rows) for a in range(3)]
    x = _solve3x3_component(M, bvec)
    for _ in range(refine_steps):
        res = [sum(B[k] * x[k] for k in range(3)) + dd for B, dd in rows]
        corr = _solve3x3_component(
            M, [-sum(rows[r][0][a] * res[r] for r in range(4))
                for a in range(3)])
        x = [x[k] + corr[k] for k in range(3)]
    return x


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "H", "E", "C", "S", "J", "Cu", "P",
                     "min_views", "threshold", "k_cap", "kinds", "dims",
                     "alpha_l", "out_dim", "used_pos", "cam_consts",
                     "prior", "gate_px", "stage", "interpret", "skip_gat"))
def _frame_kernel_call(flat_inputs, *, mcfg: MatcherConfig, H: int, E: int,
                       C: int, S: int, J: int, Cu: int, P: int,
                       min_views: int, threshold: float, k_cap: int,
                       kinds, dims, alpha_l: float, out_dim: int,
                       used_pos, cam_consts, prior: str = "mean",
                       gate_px: Optional[float] = None,
                       stage: str = "full", interpret: bool = False,
                       skip_gat: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpe3d_tpu.ops.gat_kernel import _layer_dims, gat_stack_values

    gat_dims = _layer_dims(mcfg)
    n_gat = len(gat_dims)
    n_mlp = len(kinds)
    # GAT layers >= 1 stream their big matrices (w1 [d,d], w2 [d,F])
    # HBM->VMEM under layer 0's compute instead of sitting in the serial
    # pallas input prologue; layer 0 stays a VMEM input (nothing runs
    # before it).  ~3 MB of the ~7.5 MB fp32 GAT prologue moves off the
    # critical path (round-3 VERDICT #4 stream-wall item).
    #
    # ``skip_gat`` (the crowded-bucket SPLIT variant): the GAT stack runs
    # OUTSIDE as the grid-tiled pallas program (ops/gat_tiled.py — the
    # single-body stack exceeds VMEM at S=10/16 via Mosaic register-spill
    # slots) and the masked sigmoid scores enter as an operand; this
    # kernel then runs decode + pack + lift with the lifter weight DMAs
    # issued at entry, so the ~60 MB weight stream hides under the
    # DECODE compute instead of the match compute.
    n_gb = 0 if skip_gat else 2 * (n_gat - 1)
    bw = frame_block_width(J)
    k0p = Cu * bw
    assert dims[0][0] == k0p, (dims[0], k0p)
    assert P <= M_TILE
    nmax = max(n for _, n in dims)
    pairs = [(i, j) for i in range(Cu) for j in range(i + 1, Cu)]
    f32 = jnp.float32

    # operand layout (indices into refs)
    i_gat0 = 2 if skip_gat else 6    # skip_gat: [s_eff, pw] lead instead
    i_dec = i_gat0 + (0 if skip_gat else 8 * n_gat)
    # decode operands:               e1f, e2f, cam1f, cam2f, hcam_r, hcam_c,
    i_gath = i_dec + 7           # hslot_r | F09, kpx, kpy, kval, kobs
    i_ek = i_gath + 5            # | ek4
    i_mlp = i_ek + 1
    n_out = 9

    def kernel(*refs):
        n_scr = n_mlp + n_gb + 3
        ins = refs[:-(n_out + n_scr)]
        # scratch: wbufs (n_mlp), gbufs (n_gb), act0, act1, sem
        scr = refs[len(refs) - n_scr:]
        wbufs = scr[:n_mlp]
        gbufs = scr[n_mlp:n_mlp + n_gb]
        act0, act1, sem = scr[-3], scr[-2], scr[-1]
        outs = refs[len(ins):len(ins) + n_out]
        (scores_ref, persons_ref, pmask_ref, net_ref, out_ref,
         gx_ref, gy_ref, gv_ref, go_ref) = outs

        # MLP weight refs (HBM) are interleaved with VMEM aux per kind
        mrefs = list(ins[i_mlp:])
        w_hbm, mlp_aux = [], []
        off = 0
        for kind in kinds:
            if kind == "q":
                w_hbm.append(mrefs[off])
                mlp_aux.append(mrefs[off + 1:off + 4])   # scale, rscale, b
                off += 4
            else:
                w_hbm.append(mrefs[off])
                mlp_aux.append(mrefs[off + 1:off + 2])   # b
                off += 2

        # ---- 1. issue ALL weight DMAs before any compute ---------------
        # GAT layers >= 1 first (consumed within a few µs by the stack),
        # then the lifter layers (consumed only after match+decode+pack)
        gat_dmas = []
        if not skip_gat:
            for l in range(1, n_gat):
                for j, off in enumerate((0, 2)):         # w1, w2
                    gat_dmas.append(pltpu.make_async_copy(
                        ins[i_gat0 + 8 * l + off],
                        gbufs[2 * (l - 1) + j],
                        sem.at[n_mlp + 2 * (l - 1) + j]))
        dmas = [pltpu.make_async_copy(w_hbm[l], wbufs[l], sem.at[l])
                for l in range(n_mlp)]
        for d in gat_dmas:
            d.start()
        for d in dmas:
            d.start()

        # ---- 2. GAT stack (shared body => scores identical) ------------
        if skip_gat:
            s_eff = ins[0][:]                            # masked sigmoids
            pw = ins[1][:]                               # [E, 1] pair mask
        else:
            x_all = ins[0][:]
            pw = ins[1][:]                               # [E, 1] pair mask
            inc1, inc2 = ins[2][:], ins[3][:]
            inc1T, inc2T = ins[4][:], ins[5][:]

            def layer_tuple(l):
                base = ins[i_gat0 + 8 * l: i_gat0 + 8 * (l + 1)]
                if l == 0:
                    return tuple(r[:] for r in base)

                def lv(l=l, base=base):
                    # first use of this layer's weights: wait its DMAs
                    gat_dmas[2 * (l - 1)].wait()
                    gat_dmas[2 * (l - 1) + 1].wait()
                    return (gbufs[2 * (l - 1)][:], base[1][:],
                            gbufs[2 * (l - 1) + 1][:], base[3][:],
                            base[4][:], base[5][:], base[6][:], base[7][:])
                return lv
            layer_vals = [layer_tuple(l) for l in range(n_gat)]
            logits = gat_stack_values(x_all, pw, inc1, inc2, inc1T, inc2T,
                                      layer_vals, mcfg, H)
            s_eff = jax.nn.sigmoid(logits) * pw          # [E, 1]
        scores_ref[:] = s_eff

        # ``stage`` truncation points for the in-kernel ledger
        # (scripts/bench_frame_kernel.py --stages): every output ref is
        # still written (zeros) and every issued DMA awaited, so partial
        # variants are well-formed programs whose chained-time DELTAS
        # isolate decode / gather+pack / MLP-tail costs.
        def _finish_early(skip_persons=False, skip_net=False):
            if not skip_persons:
                persons_ref[:] = jnp.full((P, C), -1, jnp.int32)
                pmask_ref[:] = jnp.zeros((P, 1), f32)
            if not skip_net:
                net_ref[:] = jnp.zeros((M_TILE, k0p), f32)
                for r in (gx_ref, gy_ref, gv_ref, go_ref):
                    r[:] = jnp.zeros((Cu * P, J), f32)
            # the "poses" output must DEPEND on the computed stage —
            # a constant zero would let the chained-timing harness's
            # loop body simplify to identity and elide the kernel
            out_ref[:] = jnp.broadcast_to(jnp.sum(s_eff) * 1e-9,
                                          (M_TILE, out_dim))
            for d in dmas:
                d.wait()

        if stage == "gat":
            _finish_early()
            return

        # ---- 3. greedy decode (decode_device.py semantics) --------------
        e1f, e2f = ins[i_dec][:], ins[i_dec + 1][:]      # [E, 1] f32 ids
        cam1f, cam2f = ins[i_dec + 2][:], ins[i_dec + 3][:]  # [E, 1] f32
        hcam_r = ins[i_dec + 4][:]                       # [1, H]
        hcam_c = ins[i_dec + 5][:]                       # [H, 1]
        hslot_r = ins[i_dec + 6][:]                      # [1, H]

        # tpu.iota is integer-only — build int32 and cast
        def fiota(shape, dim):
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(f32)

        iota_e = fiota((E, 1), 0)
        iota_hc = fiota((H, 1), 0)
        iota_hr = fiota((1, H), 1)
        iota_cr = fiota((1, C), 1)
        eye_h = (fiota((H, H), 0) == fiota((H, H), 1)).astype(f32)
        le_h = (fiota((H, H), 0) <= fiota((H, H), 1)).astype(f32)

        eligible = (pw > 0.5) & (s_eff > threshold)
        n_live = jnp.minimum(jnp.sum(eligible.astype(jnp.int32)),
                             jnp.int32(k_cap))
        neg = jnp.asarray(-jnp.inf, f32)
        remaining0 = jnp.where(eligible, s_eff, neg)

        cluster0 = jnp.full((H, 1), -1.0, f32)
        linked0 = (hcam_c == iota_cr).astype(f32)        # [H, C] own cam
        ccams0 = jnp.zeros((H, C), f32)

        def body(_, carry):
            remaining, cluster, linked, ccams = carry
            m = jnp.max(remaining)
            idx = jnp.min(jnp.where(remaining >= m, iota_e, f32(E + 1)))
            ohe = (iota_e == idx).astype(f32)            # [E, 1]
            a = jnp.sum(e1f * ohe)
            b = jnp.sum(e2f * ohe)
            ca = jnp.sum(cam1f * ohe)
            cb = jnp.sum(cam2f * ohe)
            oa = (iota_hc == a).astype(f32)              # [H, 1]
            ob = (iota_hc == b).astype(f32)
            oca = (iota_cr == ca).astype(f32)            # [1, C]
            ocb = (iota_cr == cb).astype(f32)
            ka = jnp.sum(cluster * oa)
            kb = jnp.sum(cluster * ob)
            a_has, b_has = ka >= 0, kb >= 0
            rowa = (iota_hc == jnp.maximum(ka, 0.0)).astype(f32)
            rowb = (iota_hc == jnp.maximum(kb, 0.0)).astype(f32)
            ccams_a = jnp.sum(ccams * rowa, axis=0, keepdims=True)  # [1, C]
            ccams_b = jnp.sum(ccams * rowb, axis=0, keepdims=True)
            lka = jnp.sum(linked * oa, axis=0, keepdims=True)
            lkb = jnp.sum(linked * ob, axis=0, keepdims=True)

            reject = ((jnp.sum(lkb * oca) > 0)
                      | (jnp.sum(lka * ocb) > 0)
                      | (a_has & (jnp.sum(ccams_a * ocb) > 0))
                      | (b_has & (jnp.sum(ccams_b * oca) > 0))
                      | (a_has & b_has & (jnp.sum(ccams_a * ccams_b) > 0)))
            do = ~reject
            dof = do.astype(f32)

            root = jnp.where(a_has, ka, jnp.where(b_has, kb, a))
            oroot = (iota_hc == root).astype(f32)        # [H, 1]
            merge = a_has & b_has
            relabel = (((merge & (cluster == kb)).astype(f32) + oa + ob)
                       > 0.5)
            cluster = jnp.where(do & relabel, root, cluster)

            # camera-set update under the reference merge quirk
            # (matching/decode_device.py:155-163)
            both_new = (~a_has) & (~b_has)
            add = jnp.where(both_new, jnp.maximum(oca, ocb),
                            jnp.where(merge, jnp.zeros((1, C), f32),
                                      jnp.where(a_has, ocb, oca)))
            okb = (iota_hc == jnp.maximum(kb, 0.0)).astype(f32)
            clearf = (do & merge & (kb != root)).astype(f32)
            ccams = jnp.maximum(ccams, (dof * oroot) * add)
            ccams = ccams * (1.0 - clearf * okb)

            linked = jnp.maximum(linked, dof * (oa * ocb + ob * oca))
            remaining = jnp.where(ohe > 0.5, neg, remaining)
            return remaining, cluster, linked, ccams

        _, cluster, _, _ = jax.lax.fori_loop(
            0, n_live, body, (remaining0, cluster0, linked0, ccams0))

        # ---- 4. components -> persons (dense, no scatters) --------------
        assigned = (cluster >= 0).astype(f32)            # [H, 1]
        member = (cluster == iota_hr).astype(f32) * assigned  # [H, H]
        counts_r = jnp.sum(member, axis=0, keepdims=True)     # [1, H]
        root_ok_r = (counts_r >= min_views).astype(f32)
        # inclusive prefix sum via the static LE mask (no cumsum in mosaic)
        rank_r = jnp.sum(root_ok_r[:, :, None] * le_h[None, :, :],
                         axis=1) - 1.0                        # [1, H]
        ok_head = jnp.sum(member * root_ok_r, axis=1, keepdims=True)
        rank_head = jnp.sum(member * rank_r, axis=1, keepdims=True)
        poh_c = jnp.where((assigned > 0.5) & (ok_head > 0.5),
                          rank_head, -1.0)               # [H, 1]
        n_persons = jnp.sum(root_ok_r)
        poh_r = jnp.sum(eye_h * poh_c, axis=0, keepdims=True)  # [1, H]

        iota_pc = fiota((P, 1), 0)
        sel_ph = (iota_pc == poh_r)                      # [P, H] bool
        pcols = []
        for c in range(C):
            mc = jnp.abs(hcam_r - c) < 0.5               # [1, H]
            val = jnp.where(sel_ph & mc, hslot_r, -1.0)  # [P, H]
            col = jnp.max(val, axis=1, keepdims=True)    # [P, 1]
            pcols.append(col)
            persons_ref[:, c:c + 1] = col.astype(jnp.int32)
        pmask = (iota_pc < n_persons).astype(f32)
        pmask_ref[:] = pmask

        if stage == "decode":
            _finish_early(skip_persons=True)
            return

        # ---- 5. per-person gather (rank-3 broadcast-sums) ---------------
        net_ref[:] = jnp.zeros((M_TILE, k0p), f32)
        iota_sr = fiota((1, S), 1)
        F09 = ins[i_gath][:]
        kpx, kpy = ins[i_gath + 1][:], ins[i_gath + 2][:]
        kval, kobs = ins[i_gath + 3][:], ins[i_gath + 4][:]

        blocks, g = [], {"x": [], "y": [], "v": [], "o": []}
        for cu in range(Cu):
            mcol = used_pos[cu]
            if mcol < 0:
                sel = jnp.zeros((P, S), f32)
            else:
                slot = pcols[mcol]                       # [P, 1]
                sel = ((slot == iota_sr) & (slot >= 0)).astype(f32)
            lo, hi = cu * S, (cu + 1) * S

            def gather(src):
                return jnp.sum(sel[:, :, None] * src[lo:hi][None, :, :],
                               axis=1)                   # [P, J]/[P, BW]

            blocks.append(gather(F09))
            for key, src in (("x", kpx), ("y", kpy),
                             ("v", kval), ("o", kobs)):
                val = gather(src)
                g[key].append(val)
            gx_ref[cu * P:(cu + 1) * P, :] = g["x"][-1]
            gy_ref[cu * P:(cu + 1) * P, :] = g["y"][-1]
            gv_ref[cu * P:(cu + 1) * P, :] = g["v"][-1]
            go_ref[cu * P:(cu + 1) * P, :] = g["o"][-1]

        # ---- 6. triangulated prior (lifting/pack.py variants) ------------
        iota_jr = fiota((1, J), 1)
        jointgate = (iota_jr > 0.5).astype(f32)          # joint-0 quirk
        tobs = [g["o"][cu] * jointgate for cu in range(Cu)]
        xns = [_undistort_component(g["x"][cu], g["y"][cu], cam_consts[cu])
               for cu in range(Cu)]
        if prior == "irls":
            X, okf = _irls_component(xns, tobs, cam_consts)
            # triangulate_irls returns where(ok, x, 0)
            xg, yg, zg = X[0] * okf, X[1] * okf, X[2] * okf
        else:
            pts, pvs = [], []
            for (ci, cj) in pairs:
                pts.append(_tri_pair_component(xns[ci], xns[cj],
                                               cam_consts[ci][9:21],
                                               cam_consts[cj][9:21]))
                pvs.append(((tobs[ci] > 0.5)
                            & (tobs[cj] > 0.5)).astype(f32))
            n_valid = sum(pvs)
            if prior == "median":
                # coordinate-median pair filter (triangulate_median_
                # filtered: check_axis 0, reference median sorted[n//2])
                big = float(np.finfo(np.float32).max)
                target = jnp.floor(n_valid / 2.0)
                median = _select_rank_component([p[0] for p in pts], pvs,
                                                target, big)
                keep = [pv * (jnp.abs(p[0] - median) < 0.05).astype(f32)
                        for p, pv in zip(pts, pvs)]
            else:                                        # "mean"
                keep = pvs
            sn = sum(keep)
            denom = jnp.maximum(sn, 1.0)
            okf = (n_valid > 0.5).astype(f32)
            xg = sum(p[0] * k for p, k in zip(pts, keep)) / denom * okf
            yg = sum(p[1] * k for p, k in zip(pts, keep)) / denom * okf
            zg = sum(p[2] * k for p, k in zip(pts, keep)) / denom * okf

        if gate_px is not None:
            # per-joint prior-quality gate (pack_lifter_input
            # prior_gate_px): reproject the (ok-masked) prior into every
            # packed camera, reject joints whose masked LOWER-MEDIAN
            # residual exceeds the gate
            ds, mgs = [], []
            for cu in range(Cu):
                cc = cam_consts[cu]
                Pm = cc[9:21]
                pc = [Pm[4 * k] * xg + Pm[4 * k + 1] * yg
                      + Pm[4 * k + 2] * zg + Pm[4 * k + 3]
                      for k in range(3)]
                z = pc[2]
                z = jnp.where(jnp.abs(z) < 1e-4,
                              jnp.where(z < 0, -1e-4, 1e-4), z)
                x0, y0 = pc[0] / z, pc[1] / z
                r2 = x0 * x0 + y0 * y0
                fd = 1.0 + r2 * (cc[4] + r2 * (cc[5] + r2 * cc[8]))
                u = x0 * fd * cc[0] + cc[2]
                vpx = y0 * fd * cc[1] + cc[3]
                du = jnp.clip(g["x"][cu] - u, -1e5, 1e5)
                dv = jnp.clip(g["y"][cu] - vpx, -1e5, 1e5)
                ds.append(jnp.sqrt(du * du + dv * dv))
                mgs.append(g["o"][cu])                   # include mask
            nv = sum(mgs)
            tgt = jnp.maximum(jnp.ceil(nv / 2.0) - 1.0, 0.0)
            resid = _select_rank_component(ds, mgs, tgt, jnp.inf)
            okf = okf * (1.0 - ((nv > 0) & (resid > gate_px)).astype(f32))

        prx = xg * okf / 10.0
        pry = yg * okf / 10.0
        prz = zg * okf / 10.0

        ek = ins[i_ek][:]                                # [4J, BW]
        def expand(vals, k):
            ekk = ek[k * J:(k + 1) * J, :]               # [J, BW]
            return jnp.sum(vals[:, :, None] * ekk[None, :, :], axis=1)

        plane = (expand(okf, 0) + expand(prx, 1)
                 + expand(pry, 2) + expand(prz, 3))      # [P, BW]
        for cu in range(Cu):
            net_ref[0:P, cu * bw:(cu + 1) * bw] = blocks[cu] + plane

        if stage == "pack":
            _finish_early(skip_persons=True, skip_net=True)
            return

        # ---- 7. MLP with resident weights --------------------------------
        acts = (act0, act1)
        x0 = net_ref[:]
        for li, kind in enumerate(kinds):
            Kp, Np = dims[li]
            dmas[li].wait()
            src = x0 if li == 0 else acts[(li + 1) % 2][:, :Kp]
            xin = src.astype(f32)
            aux = mlp_aux[li]
            if kind == "q":
                scale_v, rscale_v, b_v = (a[:] for a in aux)
                xin = xin * rscale_v
            else:
                b_v = aux[0][:]
                scale_v = None
            acc = jnp.dot(xin.astype(jnp.bfloat16),
                          wbufs[li][:].astype(jnp.bfloat16),
                          preferred_element_type=f32)
            if scale_v is not None:
                acc = acc * scale_v
            out = acc + b_v
            if li == n_mlp - 1:
                out_ref[:] = out[:, :out_dim]
            else:
                acts[li % 2][:, :Np] = jnp.where(out > 0, out,
                                                 alpha_l * out)

    # ---- pallas_call assembly ------------------------------------------
    vm = {} if interpret else {"memory_space": pltpu.VMEM}
    anym = {} if interpret else {"memory_space": pltpu.ANY}
    in_specs = []
    for idx in range(i_mlp):
        spec = vm
        if not skip_gat and i_gat0 <= idx < i_gat0 + 8 * n_gat:
            l, off = divmod(idx - i_gat0, 8)
            if l >= 1 and off in (0, 2):                 # w1/w2: HBM+DMA
                spec = anym
        in_specs.append(pl.BlockSpec(**spec))
    for kind in kinds:
        in_specs.append(pl.BlockSpec(**anym))            # weights: HBM
        n_aux = 3 if kind == "q" else 1
        in_specs += [pl.BlockSpec(**vm)] * n_aux

    wdtypes = [jnp.int8 if k == "q" else jnp.bfloat16 for k in kinds]
    scratch = [pltpu.VMEM(dims[l], wdtypes[l]) for l in range(n_mlp)]
    if not skip_gat:
        for (d_in, d_out, nh) in gat_dims[1:]:
            scratch.append(pltpu.VMEM((d_in, d_in), jnp.float32))
            scratch.append(pltpu.VMEM((d_in, nh * d_out), jnp.float32))
    scratch += [pltpu.VMEM((M_TILE, nmax), jnp.float32),
                pltpu.VMEM((M_TILE, nmax), jnp.float32),
                pltpu.SemaphoreType.DMA((n_mlp + n_gb,))]

    out_shape = (
        jax.ShapeDtypeStruct((E, 1), jnp.float32),       # scores
        jax.ShapeDtypeStruct((P, C), jnp.int32),         # persons
        jax.ShapeDtypeStruct((P, 1), jnp.float32),       # person mask
        jax.ShapeDtypeStruct((M_TILE, k0p), jnp.float32),  # net
        jax.ShapeDtypeStruct((M_TILE, out_dim), jnp.float32),  # mlp out
        jax.ShapeDtypeStruct((Cu * P, J), jnp.float32),  # gathered x
        jax.ShapeDtypeStruct((Cu * P, J), jnp.float32),  # gathered y
        jax.ShapeDtypeStruct((Cu * P, J), jnp.float32),  # gathered valid
        jax.ShapeDtypeStruct((Cu * P, J), jnp.float32),  # gathered observed
    )
    out_specs = tuple(pl.BlockSpec(**vm) for _ in out_shape)

    # VMEM budget: GAT weights/activations + all resident lifter weights
    # + the net/activation buffers; sized for v5e-class VMEM like the
    # matcher megakernel (probe-guarded per bucket by the pipeline).
    kw = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)}
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(*flat_inputs)


# ---------------------------------------------------------------------------
# program builder (XLA prologue/epilogue around the kernel)
# ---------------------------------------------------------------------------


def frame_kernel_supported(pipe) -> bool:
    """Static config gate: which pipeline configurations this kernel
    serves (the rest keep the two-program XLA path)."""
    return (pipe.backend == "mlp"
            and pipe.lifter_params is not None
            and pipe.rig_config.graph_alternative == "3"
            and not pipe.matcher_cfg.residual
            and not pipe._geo_active()
            and pipe.lifter_prior in ("mean", "median", "irls")
            and pipe.person_buckets[-1] <= M_TILE
            and pipe.serve_dtype is not None)


def pack_frame_serving(lifter_params: Dict[str, Any], n_used_cameras: int,
                       n_joints: int) -> List:
    """Host-side once-per-pipeline packing of the lifter serving tree for
    the kernel (see pack_frame_layers)."""
    flat, _, _ = pack_frame_layers(lifter_params["layers"],
                                   n_used_cameras, n_joints)
    return list(flat)


def parse_frame_flat(flat) -> Tuple[Tuple[str, ...], Tuple]:
    """Recover (kinds, dims) statically from a packed flat list (same
    convention as models/mlp.py::_parse_fused_flat)."""
    kinds, dims, i = [], [], 0
    while i < len(flat):
        w = flat[i]
        if w.dtype == jnp.int8:
            kinds.append("q")
            i += 4
        else:
            kinds.append("w")
            i += 2
        dims.append(tuple(w.shape))
    return tuple(kinds), tuple(dims)


def build_frame_program(pipe, slots: int, p_max: int,
                        interpret: Optional[bool] = None,
                        stage: str = "full", matcher: str = "inkernel"):
    """Build the traced (mparams, lflat, kp, valid, prob, observed,
    present) → (poses, persons, person_mask, scores, quality) program:
    XLA prologue (features, per-slot field blocks), the whole-frame
    kernel, XLA epilogue (pose scaling, residual prior, quality).

    ``lflat`` is the frame-packed serving list (pack_frame_serving).
    Semantics ≡ pipeline._fused_impl's XLA program for supported configs
    (tests/test_frame_kernel.py).

    ``matcher``: "inkernel" (the GAT stack runs inside the whole-frame
    kernel — small buckets) or "tiled" (the SPLIT crowded-bucket
    variant: the grid-tiled GAT programs of ops/gat_tiled.py score the
    pairs, and the kernel runs decode+pack+lift with the lifter weight
    stream hidden under the decode)."""
    from mpe3d_tpu.lifting.pack import pack_slot_fields09
    from mpe3d_tpu.matching.decode import reference_pair_order
    from mpe3d_tpu.matching.features import (build_topology,
                                             edge_node_features,
                                             pair_mask_from_present,
                                             head_features)
    from mpe3d_tpu.ops.gat_kernel import gat_layer_arrays
    from mpe3d_tpu.pipeline import pose_quality_px

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rc = pipe.rig_config
    topo = pipe.topology(slots)
    C, S, J = topo.n_cameras, slots, rc.n_joints
    H, E = topo.n_heads, topo.n_pairs
    Cu = len(pipe.used_idx)
    alt = rc.graph_alternative
    bw = frame_block_width(J)

    pe1, pe2 = reference_pair_order(topo.e1, topo.e2)
    e1f = jnp.asarray(pe1, jnp.float32).reshape(E, 1)
    e2f = jnp.asarray(pe2, jnp.float32).reshape(E, 1)
    cam1f = jnp.asarray(pe1 // S, jnp.float32).reshape(E, 1)
    cam2f = jnp.asarray(pe2 // S, jnp.float32).reshape(E, 1)
    hcam_r = jnp.asarray(np.arange(H) // S, jnp.float32).reshape(1, H)
    hcam_c = hcam_r.reshape(H, 1)
    hslot_r = jnp.asarray(np.arange(H) % S, jnp.float32).reshape(1, H)
    ek4 = jnp.asarray(_expansion_matrices(J))
    efeats = edge_node_features(E, rc.matcher_feature_dim_alt(alt))
    inc1 = np.asarray(topo.inc1, np.float32)
    inc2 = np.asarray(topo.inc2, np.float32)

    match_names = [rc.camera_names[i] for i in pipe.match_idx]
    used_pos = tuple(
        match_names.index(rc.camera_names[i])
        if rc.camera_names[i] in match_names else -1
        for i in pipe.used_idx)
    cam_consts = _cam_consts(pipe.used_rig)
    match_sel = np.asarray(pipe.match_idx)
    used_sel = np.asarray(pipe.used_idx)
    threshold = float(pipe.threshold)
    top_k = pipe._decode_top_k_eff
    k_cap = min(top_k, E) if top_k else E
    min_views = rc.min_number_of_views
    lcfg = pipe.lifter_cfg
    mcfg = pipe.matcher_cfg
    used_rig = pipe.used_rig
    image_size = pipe.image_size

    skip_gat = matcher == "tiled"

    def run(mparams, lflat, kp, valid, prob, observed, present):
        kinds, dims = parse_frame_flat(lflat)
        km, vm_ = kp[match_sel], valid[match_sel]
        pmm, om = prob[match_sel], observed[match_sel]
        prm = present[match_sel]
        hfeats, _ = head_features(km, vm_, pmm, om, prm, pipe.match_rig,
                                  image_size, alt=alt)
        pm = pair_mask_from_present(prm, topo)
        x_all = jnp.concatenate([hfeats, jnp.asarray(efeats)]).astype(
            jnp.float32)

        ku, vu = kp[used_sel], valid[used_sel]
        pu, ou = prob[used_sel], observed[used_sel]
        f09 = pack_slot_fields09(ku, vu, pu, ou, used_rig, image_size)
        f09 = f09.reshape(Cu * S, J * 14)
        f09 = jnp.zeros((Cu * S, bw), jnp.float32).at[:, :J * 14].set(f09)
        kpx = ku[..., 0].reshape(Cu * S, J)
        kpy = ku[..., 1].reshape(Cu * S, J)
        kval = vu.reshape(Cu * S, J)
        kobs = ou.reshape(Cu * S, J).astype(jnp.float32)

        pwc = pm.reshape(E, 1).astype(jnp.float32)
        if skip_gat:
            from mpe3d_tpu.ops.gat_tiled import gat_stack_tiled
            # efeats rows are the shared alt-3 one-hot -> layer 0's edge
            # projection computes once (gat_tiled edge_const)
            logits = gat_stack_tiled(
                x_all, pwc, jnp.asarray(inc1), jnp.asarray(inc2),
                gat_layer_arrays(mparams, mcfg), mcfg, H,
                interpret=interpret, edge_const=True)
            s_eff = jax.nn.sigmoid(logits.reshape(E, 1)) * pwc
            flat = [s_eff, pwc]
        else:
            flat = [x_all, pwc,
                    jnp.asarray(inc1), jnp.asarray(inc2),
                    jnp.asarray(inc1.T.copy()), jnp.asarray(inc2.T.copy())]
            for lv in gat_layer_arrays(mparams, mcfg):
                flat += list(lv)
        flat += [e1f, e2f, cam1f, cam2f, hcam_r, hcam_c, hslot_r]
        flat += [f09, kpx, kpy, kval, kobs]
        flat += [ek4]
        flat += list(lflat)

        (scores, persons, pmask, net, mlp_out,
         gx, gy, gv, go) = _frame_kernel_call(
            tuple(flat), mcfg=mcfg, H=H, E=E, C=C, S=S, J=J, Cu=Cu,
            P=p_max, min_views=min_views, threshold=threshold,
            k_cap=k_cap, kinds=kinds, dims=dims,
            alpha_l=lcfg.negative_slope, out_dim=lcfg.out_dim,
            used_pos=used_pos, cam_consts=cam_consts,
            prior=pipe.lifter_prior,
            gate_px=(None if pipe.prior_gate_px is None
                     else float(pipe.prior_gate_px)),
            stage=stage, interpret=interpret, skip_gat=skip_gat)

        poses = mlp_out[:p_max]
        if lcfg.residual_prior:
            # extract_prior equivalent on the kernel's block-padded net
            # layout: block 0's fields 11:14 per joint
            blocks0 = net[:p_max, :bw].reshape(p_max, -1)[:, :J * 14]
            prior = blocks0.reshape(p_max, J, 14)[..., 11:14]
            poses = poses + prior.reshape(p_max, J * 3)
        poses = poses.reshape(p_max, J, 3) * 10.0

        pkp = jnp.stack([gx.reshape(Cu, p_max, J),
                         gy.reshape(Cu, p_max, J)],
                        axis=-1).transpose(1, 0, 2, 3)   # [P, Cu, J, 2]
        pval = gv.reshape(Cu, p_max, J).transpose(1, 0, 2)
        pobs = go.reshape(Cu, p_max, J).transpose(1, 0, 2) > 0.5
        quality = pose_quality_px(poses, pkp, pval, pobs, used_rig)
        poses = poses * pmask.reshape(p_max, 1, 1)
        person_mask = pmask.reshape(p_max) > 0.5
        return poses, persons, person_mask, scores.reshape(E), quality

    return run
