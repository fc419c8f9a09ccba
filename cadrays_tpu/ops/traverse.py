"""Stackless threaded-BVH traversal over a ray wavefront.

One `lax.while_loop` executes the skip-link walk for every ray in
lockstep (see geometry/bvh.py for the layout rationale). Divergence costs
idle iterations on finished lanes but never touches dynamic shapes, so the
whole thing jits once per scene. Hit topology (triangle ids) is integer
output — naturally non-differentiable; differentiable hit attributes are
recomputed from the ids in ops/hit.py, which is where gradients flow.

A Pallas kernel version with VMEM-resident BVH levels lives in
ops/pallas/traverse_pl.py; this XLA version is the portable reference and
the CPU/test path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cadrays_tpu.ops.intersect import (
    INF,
    ray_aabb,
    ray_triangle,
    safe_inv_dir,
)
from cadrays_tpu.scene.flatten import GeometryData

MAX_LEAF = 4  # must match geometry/bvh.py build


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

    node0 = jnp.zeros(R, jnp.int32)
    state = dict(
        node=node0,
        t=jnp.minimum(jnp.broadcast_to(t_max, (R,)), INF),
        tri=jnp.full(R, -1, jnp.int32),
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
    )

    tri_v = geom.tri_v
    verts = geom.vertices

    def cond(s):
        return jnp.any(s["node"] >= 0)

    def body(s):
        node = jnp.maximum(s["node"], 0)  # clamp finished lanes
        alive = s["node"] >= 0

        bmin = geom.bvh_min[node]
        bmax = geom.bvh_max[node]
        skip = geom.bvh_skip[node]
        first = geom.bvh_first[node]
        count = geom.bvh_count[node]

        hit_box = ray_aabb(origin, inv_dir, bmin, bmax, 0.0, s["t"]) & alive
        is_leaf = count > 0
        at_leaf = hit_box & is_leaf

        # --- leaf: test up to MAX_LEAF triangles (masked unroll) ---------
        t_best, tri_best, u_best, v_best = s["t"], s["tri"], s["u"], s["v"]
        for k in range(MAX_LEAF):
            tid = first + k
            live = at_leaf & (k < count)
            tid_c = jnp.where(live, tid, 0)
            i0 = tri_v[tid_c, 0]
            i1 = tri_v[tid_c, 1]
            i2 = tri_v[tid_c, 2]
            t, u, v, hit = ray_triangle(
                origin, direction, verts[i0], verts[i1], verts[i2]
            )
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
