"""On-device person-proposal decode — the greedy merge as a lax.fori_loop.

Same semantics as the host decoder (matching/decode.py ≙ reference
utils/skeleton_matching_utils.py:12-132), restructured for XLA: fixed-size
state arrays indexed by head, a static score-sorted candidate order
(jnp.argsort), and branch-free masked updates instead of python control flow.
This puts the entire frame→poses path into ONE compiled program — no host
round trip between matching and lifting (SURVEY.md §7's riskiest piece; also
the only way to reach single-RTT latency through remote-TPU relays).

State (H = heads, C = matching cameras):
  cluster   [H] int32   cluster id of each head (-1 = unassigned); cluster
                        ids are head indices (the first head that founded it)
  linked    [H, C] bool 'heads_linked_in_cameras' — starts as the head's own
                        camera one-hot
  ccams     [H, C] bool cameras covered by the cluster rooted at each id

Per candidate (score-descending), the reference's four cases collapse to
masked updates:
  * reject if either endpoint is linked to the other's camera, or an
    endpoint's cluster already covers the other camera, or (both assigned)
    the two clusters' camera sets intersect (covers the same-cluster case);
  * otherwise: unify cluster ids (new/join/merge), OR the camera sets into
    the surviving root, and mark the cross links.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mpe3d_tpu.matching.features import PairTopology


def decode_person_proposals_device(
        scores: jnp.ndarray, pair_mask: jnp.ndarray, topo: PairTopology,
        min_views: int = 2, threshold: float = 0.5,
        max_persons: int = 0, top_k: int = 0,
        order_scores: jnp.ndarray = None,
        reference_merge_quirk: bool = True
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy camera-consistent clustering, fully on device.

    scores/pair_mask: [E].  Returns (persons [P_max, C] int32 slot per camera
    with -1 = none, person_mask [P_max] bool), P_max = max_persons or H // min_views.

    ``top_k`` bounds the sequential loop to the K best candidates (0 = all E)
    — the loop is the latency-critical piece; K ≥ the number of
    above-threshold pairs gives exact results.

    ``order_scores`` (optional, [E]) replaces ``scores`` for the greedy
    ordering only (geometric rerank); eligibility still uses ``scores``.

    ``reference_merge_quirk``: reproduce the reference's cluster-merge
    camera-list loss (see matching/decode.py docstring) — default matches
    the host decoder's default for path equivalence.

    Jit-safe: all shapes static, one fori_loop over the candidates.
    """
    E = topo.n_pairs
    H = topo.n_heads
    C = topo.n_cameras
    S = topo.n_slots
    P_max = max_persons or max(H // max(min_views, 1), 1)
    K = min(top_k, E) if top_k else E

    if reference_merge_quirk:
        # endpoint roles in the reference's set-iteration order — decides
        # merge survivorship under the quirk (decode.py docstring); static
        # host numpy, inlines as HLO literals
        from mpe3d_tpu.matching.decode import reference_pair_order
        pe1, pe2 = reference_pair_order(topo.e1, topo.e2)
    else:
        pe1, pe2 = topo.e1, topo.e2
    e1 = jnp.asarray(pe1, jnp.int32)
    e2 = jnp.asarray(pe2, jnp.int32)
    cam1 = jnp.asarray(pe1 // S, jnp.int32)
    cam2 = jnp.asarray(pe2 // S, jnp.int32)

    eligible = (pair_mask > 0.5) & (scores > threshold)
    rank = scores if order_scores is None else order_scores
    neg = jnp.asarray(-jnp.inf, rank.dtype)
    masked = jnp.where(eligible, rank, neg)
    if K < E:
        _, order = jax.lax.top_k(masked, K)                    # [K], desc
    else:
        order = jnp.argsort(masked, descending=True, stable=True)  # [E]
    n_live = jnp.minimum(jnp.sum(eligible.astype(jnp.int32)), K)

    cluster0 = jnp.full((H,), -1, jnp.int32)
    linked0 = jax.nn.one_hot(jnp.arange(H) // S, C, dtype=bool)  # own camera
    ccams0 = jnp.zeros((H, C), bool)

    # The loop body is the latency-critical serial section: every update is
    # a DENSE masked op on the tiny [H]/[C]/[H,C] state (iota-compare
    # one-hots + where/or), never a scatter — dynamic-index scatters are
    # the slowest op class on TPU and an earlier scatter-based body
    # measured ~20 µs/iteration (3.4 ms/frame at E=160, the whole fused
    # frame's budget).  Semantics are identical (tests/test_decode_device.py
    # asserts host≡device over randomized fields either way).
    iota_h = jnp.arange(H, dtype=jnp.int32)
    iota_c = jnp.arange(C, dtype=jnp.int32)

    # per-candidate constants pre-gathered in greedy order OUTSIDE the loop
    # (one vectorized pass), so each iteration pays single-row dynamic
    # slices instead of rebuilding indices/one-hots — at ~0.3-0.5 µs issue
    # latency per tiny op on the serial path, op COUNT is the decode's
    # cost model, not FLOPs
    oe = jnp.stack([e1[order], e2[order]], 1)                     # [K, 2]
    oh_head = iota_h[None, None, :] == oe[:, :, None]             # [K, 2, H]
    ocam = jnp.stack([cam1[order], cam2[order]], 1)               # [K, 2]
    oh_cam = iota_c[None, None, :] == ocam[:, :, None]            # [K, 2, C]

    def body(i, state):
        cluster, linked, ccams = state
        ab = oe[i]                                  # [2] = (a, b)
        a, b = ab[0], ab[1]
        ohh = oh_head[i]
        oa, ob = ohh[0], ohh[1]                     # [H] head one-hots
        ohc = oh_cam[i]
        oca, ocb = ohc[0], ohc[1]                   # [C] camera one-hots

        kab = cluster[ab]                           # [2] one gather
        ka, kb = kab[0], kab[1]
        a_has, b_has = ka >= 0, kb >= 0
        # cluster camera sets (root -1 → harmless row 0, gated below)
        cc = ccams[jnp.maximum(kab, 0)]             # [2, C] one gather
        ccams_a, ccams_b = cc[0], cc[1]
        lk = linked[ab]                             # [2, C] one gather

        # all five rejection clauses as one fused [5C] reduction
        reject = jnp.any(jnp.concatenate([
            lk[1] & oca, lk[0] & ocb,
            a_has & ccams_a & ocb,
            b_has & ccams_b & oca,
            (a_has & b_has) & ccams_a & ccams_b]))
        do = ~reject

        # surviving root: a's cluster if any, else b's cluster, else head a
        root = jnp.where(a_has, ka, jnp.where(b_has, kb, a))
        oroot = iota_h == root                     # [H] root-row one-hot
        merge = a_has & b_has
        # merge case relabels kb's members to root; a and b always join it
        relabel = (merge & (cluster == kb)) | oa | ob
        new_cluster = jnp.where(do & relabel, root, cluster)

        # camera set of the surviving root (matching/decode.py semantics):
        # new pair → {ca, cb}; extension → ONLY the other endpoint's camera
        # (the member's own camera may have been forgotten by an earlier
        # quirk merge and must STAY forgotten — reference
        # skeleton_matching_utils.py:85-99); cluster-cluster merge adds
        # NOTHING under the quirk (:100-104), b's whole set when corrected
        if reference_merge_quirk:
            add = jnp.where(~a_has & ~b_has, oca | ocb,
                  jnp.where(merge, jnp.zeros((C,), bool),
                  jnp.where(a_has, ocb, oca)))
        else:
            add = oca | ocb | jnp.where(merge, ccams_b, False)
        # (No need to re-OR the root's own row into `add`: when a_has the
        # root IS ka so ccams_a is already the destination row, and
        # b_has & ~merge implies root == kb likewise — the OR below keeps
        # every existing bit.  Two fewer ops on the serial critical path.)
        # OR `add` into the root's row; zero the absorbed root's row so
        # later pairs don't see stale sets (clear ⇒ kb ≠ root, so the two
        # row updates commute)
        okb = iota_h == jnp.maximum(kb, 0)
        clear = do & merge & (kb != root)
        new_ccams = ((ccams | ((do & oroot)[:, None] & add[None, :]))
                     & ~(clear & okb)[:, None])

        new_linked = linked | (do & ((oa[:, None] & ocb[None, :])
                                     | (ob[:, None] & oca[None, :])))
        return new_cluster, new_linked, new_ccams

    # dynamic trip count: the serial loop is the frame's latency floor
    # (~15 µs/iteration measured on v5e — tiny-op issue latency, not
    # FLOPs/bytes), and iterations past n_live were branch-free no-ops
    # anyway.  A while_loop exits at the LIVE candidate count — on real
    # serving scenes (trained matcher, threshold 0.5) that is ~10-30
    # pairs, not the static K=64 cap, so typical decode time drops 2-6×
    # while dense/stress scenes are unchanged.  (Under vmap — infer_batch
    # — jax runs the combined loop to the batch's max trip count.)
    def wbody(carry):
        i, state = carry
        return i + 1, body(i, state)

    _, (cluster, _, _) = jax.lax.while_loop(
        lambda c: c[0] < n_live, wbody,
        (jnp.int32(0), (cluster0, linked0, ccams0)))

    # --- components → persons (fixed P_max slots, cluster ids are head ids)
    # member count per cluster id
    assigned = cluster >= 0
    counts = jnp.zeros((H,), jnp.int32).at[
        jnp.maximum(cluster, 0)].add(assigned.astype(jnp.int32))
    root_ok = counts >= min_views                                # [H]
    # rank roots in ascending head-id order → stable person indices
    root_rank = jnp.cumsum(root_ok.astype(jnp.int32)) - 1        # [H]
    person_of_head = jnp.where(
        assigned & root_ok[jnp.maximum(cluster, 0)],
        root_rank[jnp.maximum(cluster, 0)], -1)                  # [H]
    n_persons = jnp.sum(root_ok.astype(jnp.int32))

    # persons[p, c] = slot of the member head in camera c (or -1)
    head_cam = jnp.arange(H) // S
    head_slot = (jnp.arange(H) % S).astype(jnp.int32)
    valid_head = person_of_head >= 0
    p_idx = jnp.where(valid_head, person_of_head, P_max)   # P_max row = dump
    # .max: under the merge quirk a cluster can hold TWO heads of one
    # camera; the reference's last-writer-wins over ascending head ids
    # (decode.py docstring) is exactly the max slot here — and scatter-set
    # with duplicate indices would be nondeterministic anyway
    persons = jnp.full((P_max + 1, C), -1, jnp.int32).at[
        p_idx, head_cam].max(jnp.where(valid_head, head_slot, -1))[:P_max]
    person_mask = jnp.arange(P_max) < n_persons
    return persons, person_mask
