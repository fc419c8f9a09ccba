"""Stackless threaded-BVH traversal over a ray wavefront.

One `lax.while_loop` executes the skip-link walk for every ray in
lockstep (see geometry/bvh.py for the layout rationale). Divergence costs
idle iterations on finished lanes but never touches dynamic shapes, so the
whole thing jits once per scene. Hit topology (triangle ids) is integer
output — naturally non-differentiable; differentiable hit attributes are
recomputed from the ids in ops/hit.py, which is where gradients flow.

HBM layout: the loop reads the *packed* tables (GeometryData.nodes_packed
(N,8): box + skip + leaf bits in one row; tris_packed (T,12): p0/e1/e2 —
see scene/flatten.py), so each iteration performs exactly one node-row
gather plus up-to-MAX_LEAF triangle-row gathers — the minimum possible
HBM traffic for an incoherent wavefront. A Pallas VMEM-resident variant
lives in ops/pallas_traverse.py for scenes that fit on-chip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cadrays_tpu.ops.intersect import INF, safe_inv_dir
from cadrays_tpu.scene.flatten import GeometryData

MAX_LEAF = 4  # must match geometry/bvh.py build

_EPS = 1e-7
_LEAF_MASK = (1 << 24) - 1


def _tri_intersect_packed(origin, direction, trow):
    """Moller-Trumbore against a packed triangle row [p0|e1|e2|...]."""
    p0 = trow[..., 0:3]
    e1 = trow[..., 3:6]
    e2 = trow[..., 6:9]
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= -_EPS)
        & (v >= -_EPS)
        & (u + v <= 1.0 + _EPS)
        & (t > _EPS)
    )
    return jnp.where(hit, t, INF), u, v, hit


@partial(jax.jit, static_argnames=("any_hit",))
def trace(geom: GeometryData, origin, direction, t_max, any_hit: bool = False):
    """Trace a wavefront of rays against the scene.

    origin/direction: (R, 3); t_max: (R,).
    Returns dict: t (R,), tri (R,) int32 (-1 miss), u, v (R,).
    With any_hit=True, lanes stop at the first hit (occlusion query) —
    `tri >= 0` then means "occluded", t/u/v are that first hit's.
    """
    R = origin.shape[0]
    inv_dir = safe_inv_dir(direction)
    nodes = geom.nodes_packed
    tris = geom.tris_packed

    state = dict(
        node=jnp.zeros(R, jnp.int32),
        t=jnp.minimum(jnp.broadcast_to(t_max, (R,)), INF),
        tri=jnp.full(R, -1, jnp.int32),
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
    )

    def cond(s):
        return jnp.any(s["node"] >= 0)

    def body(s):
        node = jnp.maximum(s["node"], 0)  # clamp finished lanes
        alive = s["node"] >= 0

        row = nodes[node]  # (R, 8) — single gather
        bmin = row[:, 0:3]
        bmax = row[:, 3:6]
        skip = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        leafbits = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        is_leaf = leafbits >= 0
        first = leafbits & _LEAF_MASK
        count = jnp.where(is_leaf, leafbits >> 24, 0)

        # slab test against the current best t
        t0 = (bmin - origin) * inv_dir
        t1 = (bmax - origin) * inv_dir
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit_box = (jnp.maximum(t_near, 0.0) <= jnp.minimum(t_far, s["t"])) \
            & alive
        at_leaf = hit_box & is_leaf

        # --- leaf: test up to MAX_LEAF triangles (masked unroll) ---------
        t_best, tri_best, u_best, v_best = s["t"], s["tri"], s["u"], s["v"]
        for k in range(MAX_LEAF):
            tid = first + k
            live = at_leaf & (k < count)
            tid_c = jnp.where(live, tid, 0)
            t, u, v, hit = _tri_intersect_packed(origin, direction,
                                                 tris[tid_c])
            better = live & hit & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, tid_c, tri_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)

        # --- next node ---------------------------------------------------
        descend = hit_box & (~is_leaf)
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(alive, nxt, -1)
        if any_hit:
            nxt = jnp.where(tri_best >= 0, -1, nxt)

        return dict(node=nxt, t=t_best, tri=tri_best, u=u_best, v=v_best)

    out = jax.lax.while_loop(cond, body, state)
    return {"t": out["t"], "tri": out["tri"], "u": out["u"], "v": out["v"]}


def occluded(geom: GeometryData, origin, direction, t_max):
    """Boolean shadow query along (origin, direction) up to t_max."""
    res = trace(geom, origin, direction, t_max, any_hit=True)
    return res["tri"] >= 0
