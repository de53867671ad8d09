"""Person-proposal decoding from matcher pair scores.

Re-implementation of the reference's greedy decode (reference:
utils/skeleton_matching_utils.py:12-132): keep candidate pairs whose score
exceeds the classification threshold, sort by score descending, greedily
merge heads into person clusters under the camera-consistency constraints

  * a cluster may contain at most one head per camera,
  * two clusters may only merge if their camera sets are disjoint,
  * a head pair is skipped if either head is already linked to the other's
    camera,

then keep the connected components with at least ``min_views`` members.

The host version below operates on the static pair topology (numpy; no
networkx — components follow directly from the cluster labels, which *are*
connected components since an edge is only added when its endpoints' clusters
merge).  An on-device ``lax`` variant lives in ``decode_device.py``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from mpe3d_tpu.matching.features import PairTopology


def _cpython_set2_order(x: int, y: int):
    """Iteration order of the CPython set ``{x, y}`` built by add(x) then
    add(y), for non-negative ints (hash(int) == int here).

    The reference reads pair endpoints as ``list(node_for_matching)`` of a
    2-element set (skeleton_matching_utils.py:52,62-63), and under the
    merge quirk WHICH endpoint is 'a' decides which cluster's camera list
    survives — so bit-parity needs CPython's 8-slot open-addressed set
    semantics: slot = hash & 7; on collision the perturbed jump
    i = i*5 + 1 + (perturb >>= 5).  (setobject.c's LINEAR_PROBES block is
    skipped whenever i + 9 > mask — always true for an 8-slot table.)
    """
    mask = 7
    table = {}
    for v in (x, y):
        i = v & mask
        perturb = v
        while i in table:
            perturb >>= 5
            i = (i * 5 + 1 + perturb) & mask
        table[i] = v
    out = [table[i] for i in sorted(table)]
    return out[0], out[1]


_PAIR_ORDER_CACHE: dict = {}


def reference_pair_order(e1: np.ndarray, e2: np.ndarray):
    """Per-pair (a, b) endpoint roles in the reference's set-iteration
    order (see _cpython_set2_order) — host numpy.  Memoised on the edge
    lists: a pure function of the topology, but the staged host-decode
    path calls it per frame (~E python iterations that never change)."""
    key = (e1.tobytes(), e2.tobytes())
    hit = _PAIR_ORDER_CACHE.get(key)
    if hit is not None:
        return hit
    a = np.empty_like(e1)
    b = np.empty_like(e2)
    for k in range(len(e1)):
        a[k], b[k] = _cpython_set2_order(int(e1[k]), int(e2[k]))
    if len(_PAIR_ORDER_CACHE) > 32:      # a handful of topologies exist
        _PAIR_ORDER_CACHE.clear()
    _PAIR_ORDER_CACHE[key] = (a, b)
    return a, b


def decode_person_proposals(scores: np.ndarray, pair_mask: np.ndarray,
                            topo: PairTopology, min_views: int = 2,
                            threshold: float = 0.5,
                            order_scores: Optional[np.ndarray] = None,
                            reference_merge_quirk: bool = True
                            ) -> np.ndarray:
    """Greedy camera-consistent clustering of heads.

    scores: [E] matcher outputs; pair_mask: [E] 0/1; topo: static topology.
    ``order_scores`` (optional, [E]) replaces ``scores`` for the greedy
    ordering only — eligibility still thresholds the raw scores.  Used by
    the geometric rerank (features.pair_ray_distances).
    Returns persons as an int array [P, C] of skeleton-slot indices per
    matching camera, -1 where the person has no view in that camera
    (equivalent to the reference's ``{camera: head or None}`` dicts).

    ``reference_merge_quirk`` (default, bit-parity): on a cluster-cluster
    merge the reference DELETES the absorbed cluster's camera list without
    folding it into the survivor (skeleton_matching_utils.py:100-104), so
    later pairs can attach a second head from one of the forgotten cameras.
    For such duplicate-camera components the reference's final slot is
    last-writer-wins over CPython-set iteration order of the component
    (:119-129); we deterministically take the LARGEST head id per camera.
    The two agree whenever the member ids don't wrap the set's hash table
    (ids < 8 for components of ≤5 members — covered by the golden parity
    test); for wrapping ids the reference's choice depends on networkx's
    BFS insertion order and can differ — a tie-break among heads of one
    camera inside behaviour that is itself a reproduced reference bug, so
    we keep the deterministic rule rather than emulate set internals.
    False = corrected behaviour (camera sets union on merge;
    duplicate-camera members impossible).
    """
    S = topo.n_slots
    C = topo.n_cameras
    keep = (np.asarray(pair_mask) > 0.5) & (np.asarray(scores) > threshold)
    idx = np.nonzero(keep)[0]
    rank = np.asarray(scores if order_scores is None else order_scores)
    order = idx[np.argsort(-rank[idx], kind="stable")]
    if reference_merge_quirk:
        pe1, pe2 = reference_pair_order(topo.e1, topo.e2)
    else:
        pe1, pe2 = topo.e1, topo.e2

    H = topo.n_heads
    cluster = -np.ones(H, np.int64)          # head -> cluster id
    cams_of_cluster: List[set] = []
    linked_cams = [{int(h) // S} for h in range(H)]   # reference's
    # heads_linked_in_cameras: starts as the head's own camera

    for e in order:
        a, b = int(pe1[e]), int(pe2[e])
        ca, cb = a // S, b // S
        if ca in linked_cams[b] or cb in linked_cams[a]:
            continue
        if cluster[a] >= 0 and cb in cams_of_cluster[cluster[a]]:
            continue
        if cluster[b] >= 0 and ca in cams_of_cluster[cluster[b]]:
            continue
        if cluster[a] < 0 and cluster[b] < 0:
            cid = len(cams_of_cluster)
            cams_of_cluster.append({ca, cb})
            cluster[a] = cluster[b] = cid
        elif cluster[a] >= 0 and cluster[b] < 0:
            cluster[b] = cluster[a]
            cams_of_cluster[cluster[a]].add(cb)
        elif cluster[b] >= 0 and cluster[a] < 0:
            cluster[a] = cluster[b]
            cams_of_cluster[cluster[b]].add(ca)
        else:
            ka, kb = cluster[a], cluster[b]
            # same cluster shares all cameras → the intersection test below
            # rejects it, exactly like the reference (which therefore never
            # updates linked_cams for an already-merged pair,
            # skeleton_matching_utils.py:90-104)
            if cams_of_cluster[ka] & cams_of_cluster[kb]:
                continue                      # conflicting merge
            if not reference_merge_quirk:
                cams_of_cluster[ka] |= cams_of_cluster[kb]
            # quirk: the reference deletes kb's camera list WITHOUT folding
            # it into ka (skeleton_matching_utils.py:104)
            cluster[cluster == kb] = ka
            cams_of_cluster[kb] = set()
        linked_cams[a].add(cb)
        linked_cams[b].add(ca)

    persons = []
    for cid in sorted(set(cluster[cluster >= 0].tolist())):
        members = np.nonzero(cluster == cid)[0]
        if len(members) < min_views:
            continue
        person = -np.ones(C, np.int64)
        for h in members:
            person[h // S] = h % S
        persons.append(person)
    if not persons:
        return np.zeros((0, C), np.int64)
    return np.stack(persons)


def single_camera_bypass(present: np.ndarray) -> np.ndarray:
    """Single-camera mode: every detected skeleton is its own person
    (reference: test/metrics_from_model.py:218-228).  present: [1, S]."""
    slots = np.nonzero(present[0])[0]
    persons = -np.ones((len(slots), 1), np.int64)
    persons[:, 0] = slots
    return persons
