"""Wide (BVH8) collapse of the binary threaded BVH for packet traversal.

Why: the packet kernels' cost is `iterations x per-iteration cost`, and an
incoherent packet's union walk approaches the whole tree (bench/ROOFLINE.md).
A binary tree over T triangles has ~T/2 interior nodes; an 8-wide tree with
merged leaves of up to 16 triangles has ~T/16 leaf entries and ~T/100
interior nodes, so the union walk shrinks ~5-8x while each iteration does
8 box tests / up to 16 triangle tests of pure VPU work — trading the
latency-bound scalar chain (node pointer -> row load -> branch) for dense
vector math the VPU is otherwise idle for. This is the fix ROOFLINE.md
prescribes (wide nodes, fatter iterations).

The collapse reuses the binary SAH build (geometry/bvh.py) and its
triangle ordering — every binary subtree owns a contiguous triangle range
(DFS leaf emission), so any subtree with <= `wide_leaf` triangles becomes
ONE merged leaf entry without touching triangle order. Other traversal
backends (stream/gather, MAX_LEAF=4 unroll) keep working off the same
arrays unchanged.

Layout (consumed by ops/pallas_wide.py):
  wboxes (Nw, 8*6) f32 : child AABBs, child k at [k*6 : k*6+6] =
                         [minx miny minz maxx maxy maxz]; empty slots get
                         [+inf..,-inf..] so the slab test never passes.
  wmeta  (Nw, 8)   i32 : child k's *stack entry*:
                         >= 0 : merged leaf, first | count << 24
                         <  0 : interior wide node, index = -meta - 2
  winst  (Nw, 8)   i32 : instance id the child switches the packet to
                         (-1 = keep current). Only bridge children of a
                         two-level scene set this (scene/instances.py).

Traversal contract: pop entry (+ current instance id); entry >= 0 tests
its triangle range, entry < 0 box-tests the 8 children of wide node
-entry-2 and pushes every child whose box any lane hits. The root entry
is always -2 (wide node 0).
"""
from __future__ import annotations

import dataclasses
import sys

import numpy as np

WIDTH = 8
WIDE_LEAF = 64
_COUNT_SHIFT = 24
_BIG = 1 << 30


@dataclasses.dataclass
class WideBVH:
    wboxes: np.ndarray  # (Nw, WIDTH*6) f32
    wmeta: np.ndarray  # (Nw, WIDTH) i32
    winst: np.ndarray  # (Nw, WIDTH) i32
    worder: np.ndarray  # (Nw, 8) i32 — per direction-octant child push
    # order, 4-bit slot ids packed far-to-near (LIFO stack pops nearest
    # first, tightening t for the rest of the walk)
    max_depth: int  # wide-tree depth (stack sizing)
    max_leaf: int

    @property
    def num_nodes(self) -> int:
        return self.wmeta.shape[0]


def _pack_orders(wboxes: np.ndarray, width: int) -> np.ndarray:
    """Per-octant far-to-near child RANKS, 4 bits per child slot.

    Nibble k of worder[n, oct] = position of child k in the far-to-near
    ordering along the octant direction (0 = farthest = pushed deepest,
    so the LIFO stack pops nearest first). Ranks (not slot orders) so the
    kernel's push loop stays STATIC over k — Mosaic forbids dynamic lane
    indices, each child computes its own stack position from the ranks.
    """
    n = wboxes.shape[0]
    boxes = wboxes.reshape(n, width, 6)
    centers = (boxes[:, :, 0:3] + boxes[:, :, 3:6]) * 0.5  # (N, W, 3)
    out = np.zeros((n, 8), np.int32)
    rows = np.arange(n)[:, None]
    for oct_ in range(8):
        sign = np.array([1.0 if oct_ & 1 else -1.0,
                         1.0 if oct_ & 2 else -1.0,
                         1.0 if oct_ & 4 else -1.0])
        key = centers @ sign  # (N, W): distance along the ray direction
        order = np.argsort(-key, axis=1, kind="stable")  # far first
        rank = np.empty((n, width), np.int64)
        rank[rows, order] = np.arange(width)[None, :]
        packed = np.zeros(n, np.int64)
        for k in range(width):
            packed |= rank[:, k] << (4 * k)
        out[:, oct_] = packed.astype(np.int32) if width <= 8 else 0
    return out


def build_wide_bvh(node_min: np.ndarray, node_max: np.ndarray,
                   skip: np.ndarray, first: np.ndarray, count: np.ndarray,
                   descend: np.ndarray | None = None,
                   node_inst: np.ndarray | None = None,
                   bridge: np.ndarray | None = None,
                   width: int = WIDTH, wide_leaf: int = WIDE_LEAF) -> WideBVH:
    """Collapse a (possibly fused two-level) threaded binary BVH.

    descend: per-node first-child index (defaults to i+1, the plain DFS
    layout). A *bridge* (TLAS leaf jumping into a BLAS root,
    scene/instances.py) switches the traversal's instance space, so it is
    never expanded in place and never merged into a bigger leaf; pass the
    exact mask via `bridge` (defaults to descend != i+1, which two-level
    callers must not rely on — a BLAS can legally sit right after its
    bridge).
    node_inst: instance id per node (-1 = world/TLAS).
    """
    N = skip.shape[0]
    if int(np.sum(count)) == 0:
        # Zero-triangle geometry (everything welded/degenerated away):
        # return the "no wide tree" placeholder (matches the GeometryData
        # defaults; fits_wide rejects it and traversal falls back).
        return WideBVH(
            wboxes=np.zeros((1, 6), np.float32),
            wmeta=np.full((1, 1), 0x7FFFFFFF, np.int32),
            winst=np.full((1, 1), -1, np.int32),
            worder=np.zeros((1, 8), np.int32),
            max_depth=0, max_leaf=wide_leaf)
    if descend is None:
        descend = np.arange(1, N + 1, dtype=np.int64)
    descend = np.asarray(descend, np.int64)
    if node_inst is None:
        node_inst = np.full(N, -1, np.int32)
    is_leaf = count > 0
    idx = np.arange(N, dtype=np.int64)
    if bridge is None:
        is_bridge = (~is_leaf) & (descend != idx + 1)
    else:
        is_bridge = np.asarray(bridge, bool) & ~is_leaf

    # children of plain interior nodes: left = i+1, right = skip[i+1]
    left = descend
    right = np.where(
        (~is_leaf) & (~is_bridge),
        skip[np.clip(descend, 0, N - 1)], -1).astype(np.int64)

    # Subtree triangle range (contiguous in DFS order). Fast path for the
    # plain single-level layout: leaves emit triangles in DFS node order,
    # so the range of subtree i is [P[i], P[end_i]) with P = prefix-sum of
    # leaf counts and end_i = skip-threaded subtree end.
    if not np.any(is_bridge):
        P = np.concatenate([[0], np.cumsum(count.astype(np.int64))])
        end = np.where(skip >= 0, skip, N).astype(np.int64)
        sub_first = P[idx]
        sub_count = np.minimum(P[end] - P[idx], _BIG)
    else:
        sub_first = np.where(is_leaf, first, 0).astype(np.int64)
        sub_count = np.where(is_leaf, count, 0).astype(np.int64)
        for i in range(N - 1, -1, -1):
            if is_leaf[i]:
                continue
            if is_bridge[i]:
                # different coordinate space below: never merged
                sub_first[i] = 0
                sub_count[i] = _BIG
            else:
                l, r = left[i], right[i]
                sub_first[i] = sub_first[l]
                sub_count[i] = min(sub_count[l] + sub_count[r], _BIG)

    d = np.maximum(node_max - node_min, 0.0)
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    wboxes: list[np.ndarray] = []
    wmeta: list[np.ndarray] = []
    winst: list[np.ndarray] = []

    assert wide_leaf < (1 << (31 - _COUNT_SHIFT)), wide_leaf

    sys.setrecursionlimit(max(10000, N + 100))

    def leaf_entry(n: int) -> int:
        f, c = sub_first[n], sub_count[n]
        assert 0 < c <= wide_leaf and f < (1 << _COUNT_SHIFT)
        return int(f | (c << _COUNT_SHIFT))

    def mergeable(n: int) -> bool:
        return sub_count[n] <= wide_leaf

    memo: dict = {}

    def build_node(n: int) -> int:
        """Create the wide node for binary interior node n; returns index.

        Memoized: two-level scenes whose bridges share a BLAS (instanced
        assemblies, scene/instances.py round-4 dedup) emit the shared
        subtree ONCE — its boxes/metas are object-space and instance-
        independent (the instance id rides the stack, set at the bridge)."""
        if n in memo:
            return memo[n]
        wid = len(wmeta)
        memo[n] = wid
        wboxes.append(np.empty(width * 6, np.float32))
        wmeta.append(np.empty(width, np.int32))
        winst.append(np.empty(width, np.int32))

        if mergeable(n) or is_leaf[n] or is_bridge[n]:
            # degenerate roots: tiny scene, or a single-instance TLAS whose
            # root is a bridge — the bridge stays ONE slot (its child's
            # boxes live in another coordinate space, never inlined here).
            slots = [n]
        else:
            slots = [int(left[n]), int(right[n])]
            while len(slots) < width:
                cand = [s for s in slots
                        if not is_leaf[s] and not is_bridge[s]
                        and not mergeable(s)]
                if not cand:
                    break
                s = max(cand, key=lambda q: area[q])
                slots.remove(s)
                slots.extend((int(left[s]), int(right[s])))

        box = np.empty(width * 6, np.float32)
        meta = np.empty(width, np.int32)
        inst = np.full(width, -1, np.int32)
        for k in range(width):
            if k >= len(slots):
                # degenerate far-away point box: t_near == t_far ~ 3e37,
                # beyond any t_max, for EVERY ray direction ([+inf,-inf]
                # boxes would falsely hit negative-direction rays because
                # (inf - o) * inv_d flips sign). The kernel additionally
                # masks the sentinel meta before pushing.
                box[k * 6:k * 6 + 6] = 3e37
                meta[k] = 0x7FFFFFFF
                continue
            s = slots[k]
            box[k * 6:k * 6 + 3] = node_min[s]
            box[k * 6 + 3:k * 6 + 6] = node_max[s]
            if is_bridge[s]:
                child = int(descend[s])
                # instance id: from the bridge node itself when set (the
                # shared-BLAS layout, where the child is shared and cannot
                # carry a per-instance id), else from the child (legacy
                # per-instance-copy layout)
                iv = int(node_inst[s])
                inst[k] = iv if iv >= 0 else node_inst[child]
                if mergeable(child) or is_leaf[child]:
                    meta[k] = leaf_entry(child)
                else:
                    meta[k] = -build_node(child) - 2
            elif is_leaf[s] or mergeable(s):
                meta[k] = leaf_entry(s)
            else:
                meta[k] = -build_node(s) - 2
        wboxes[wid] = box
        wmeta[wid] = meta
        winst[wid] = inst
        return wid

    build_node(0)

    wb = np.stack(wboxes)
    wm = np.stack(wmeta)
    wi = np.stack(winst)
    wo = _pack_orders(wb, width)

    # wide-tree depth for kernel stack sizing (children-per-push bound).
    # Recursive over the (possibly shared-subtree DAG) node graph — a
    # reverse index sweep would read shared children before computing
    # them (their indices can be LOWER than a later referencing bridge).
    dcache: dict = {}

    def node_depth(i: int) -> int:
        if i in dcache:
            return dcache[i]
        dcache[i] = 1  # cycle guard (trees/DAGs only; never hit)
        dmax = 0
        for m in wm[i]:
            if m < -1:
                dmax = max(dmax, node_depth(-m - 2))
        dcache[i] = dmax + 1
        return dcache[i]

    return WideBVH(wboxes=wb, wmeta=wm, winst=wi, worder=wo,
                   max_depth=node_depth(0), max_leaf=wide_leaf)


def wide_stats(w: WideBVH) -> dict:
    """Host-side diagnostics for tuning (tests/bench)."""
    leaf = (w.wmeta >= 0) & (w.wmeta != 0x7FFFFFFF)
    interior = w.wmeta < -1
    counts = (w.wmeta[leaf] >> _COUNT_SHIFT)
    return {
        "nodes": int(w.num_nodes),
        "leaf_entries": int(leaf.sum()),
        "interior_entries": int(interior.sum()),
        "avg_leaf": float(counts.mean()) if counts.size else 0.0,
        "max_depth": w.max_depth,
    }
