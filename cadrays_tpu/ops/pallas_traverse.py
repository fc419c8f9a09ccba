"""Pallas traversal kernel: VMEM-resident scene, per-block early exit.

Why this exists (measured on v5e, see bench history): the XLA stream
traversal is HBM-bound — every while-loop iteration re-streams the whole
ray wavefront's state (~25 MB) from HBM, capping it at ~20 us/iteration
regardless of FLOPs. This kernel moves the inner loop on-chip:

* the packed node table and triangle table are copied to VMEM once per
  program (they are reused across hundreds of iterations — reuse the XLA
  version cannot express);
* each grid program owns one block of B rays whose state lives in VMEM
  for the whole walk;
* the node pointer is a *scalar* per program, so node/triangle rows are
  scalar dynamic slices (TPU-legal), broadcast against (B,)-lane ray
  vectors — zero vector gathers;
* `lax.while_loop` terminates per program: a finished block exits
  immediately instead of idling in lockstep with the slowest block
  (the XLA version's tail latency).

Scene-size limit: nodes + triangles must fit VMEM alongside the ray
block (~150k triangles at f32); `fits_vmem` gates dispatch and the
dispatcher falls back to the XLA stream path for bigger scenes.
Instanced (TLAS/BLAS) scenes currently also use the XLA path.

Ray layout: fields are passed as (rows, R) planes so each field is a
(B,) lane vector per program — no 3-wide minor dims.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadrays_tpu.scene.flatten import GeometryData

import os

# Block size trades scalar-loop amortization (bigger) against traversal
# divergence — a block walks the union of its rays' node visits (smaller
# is better for incoherent bounce rays). 1024 = one full VPU vreg row.
BLOCK = int(os.environ.get("CADRAYS_TRACE_BLOCK", "2048"))
_LEAF_MASK = (1 << 24) - 1
MAX_LEAF = 4
_VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(geom: GeometryData) -> bool:
    if geom.instanced:
        return False
    nodes_b = geom.nodes_packed.size * 4
    tris_b = geom.tris_packed.size * 4
    node_i_b = geom.nodes_packed.shape[0] * 8
    ray_b = BLOCK * 4 * 16
    return nodes_b + tris_b + node_i_b + ray_b < _VMEM_BUDGET


def _traverse_kernel(nodes_ref, nodei_ref, tris_ref, rays_ref, tm_ref,
                     out_ref, *, any_hit):
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    def inv(c):
        safe = jnp.where(jnp.abs(c) < 1e-12,
                         jnp.where(c >= 0, 1e-12, -1e-12), c)
        return 1.0 / safe

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    tm = tm_ref[0, :]
    lane_live = tm > 0.0
    B = ox.shape[0]

    def tri_test(tid, live_k, ray_hit, t, trif, u, v):
        trow = tris_ref[tid, :]  # (12,) scalar row
        pvx = dy * trow[8] - dz * trow[7]
        pvy = dz * trow[6] - dx * trow[8]
        pvz = dx * trow[7] - dy * trow[6]
        det = trow[3] * pvx + trow[4] * pvy + trow[5] * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox - trow[0]
        tvy = oy - trow[1]
        tvz = oz - trow[2]
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * trow[5] - tvz * trow[4]
        qvy = tvz * trow[3] - tvx * trow[5]
        qvz = tvx * trow[4] - tvy * trow[3]
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (trow[6] * qvx + trow[7] * qvy + trow[8] * qvz) * inv_det
        eps = 1e-7
        hit = ((jnp.abs(det) > 1e-12) & (uu >= -eps) & (vv >= -eps)
               & (uu + vv <= 1.0 + eps) & (tt > eps))
        better = live_k & ray_hit & hit & (tt < t)
        t = jnp.where(better, tt, t)
        trif = jnp.where(better, jnp.float32(tid), trif)
        u = jnp.where(better, uu, u)
        v = jnp.where(better, vv, v)
        return t, trif, u, v

    def cond(s):
        return s[0] >= 0

    def body(s):
        node, t, trif, u, v = s
        nrow = nodes_ref[node, :]  # (8,)
        skip = nodei_ref[node, 0]
        leafbits = nodei_ref[node, 1]
        is_leaf = leafbits >= 0
        first = leafbits & _LEAF_MASK
        count = jnp.where(is_leaf, leafbits >> 24, 0)
        descend_to = -leafbits - 2

        tx0 = (nrow[0] - ox) * ix
        tx1 = (nrow[3] - ox) * ix
        ty0 = (nrow[1] - oy) * iy
        ty1 = (nrow[4] - oy) * iy
        tz0 = (nrow[2] - oz) * iz
        tz1 = (nrow[5] - oz) * iz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
        if any_hit:
            ray_open = lane_live & (trif < 0)
        else:
            ray_open = lane_live
        ray_hit = (jnp.maximum(t_near * 0.9999996, 0.0)
                   <= jnp.minimum(t_far * 1.0000004, t)) \
            & ray_open
        blk_hit = jnp.any(ray_hit)

        # Leaf triangle tests only run when this node IS a hit leaf —
        # scalar-predicated branch, so interior nodes pay only the slab
        # test (the unconditional version wasted ~6x the VPU work).
        def do_leaf(args):
            t, trif, u, v = args
            for k in range(MAX_LEAF):
                live_k = k < count
                tid = jnp.where(live_k, first + k, 0)
                t, trif, u, v = tri_test(tid, live_k, ray_hit, t, trif, u, v)
            return t, trif, u, v

        t, trif, u, v = jax.lax.cond(
            is_leaf & blk_hit, do_leaf, lambda a: a, (t, trif, u, v))

        go_down = blk_hit & (~is_leaf)
        nxt = jnp.where(go_down, descend_to, skip)
        if any_hit:
            all_done = ~jnp.any((trif < 0) & lane_live)
            nxt = jnp.where(all_done, jnp.int32(-1), nxt)
        return (nxt, t, trif, u, v)

    state = (
        jnp.int32(0),
        jnp.minimum(tm, 1e30),
        jnp.full((B,), -1.0, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
    )
    _, t, trif, u, v = jax.lax.while_loop(cond, body, state)
    out_ref[0, :] = t
    out_ref[1, :] = trif
    out_ref[2, :] = u
    out_ref[3, :] = v


@functools.partial(jax.jit, static_argnames=("any_hit",))
def trace_pallas(geom: GeometryData, origin, direction, t_max,
                 any_hit: bool = False):
    """Pallas VMEM traversal; same contract as ops.traverse.trace."""
    R = origin.shape[0]
    B = BLOCK
    nb = -(-R // B)
    pad = nb * B - R

    rays = jnp.concatenate([origin.T, direction.T], axis=0)  # (6, R)
    rays = jnp.pad(rays, ((0, 0), (0, pad)))
    tm = jnp.pad(jnp.broadcast_to(t_max, (R,)), (0, pad))[None]

    nodes = geom.nodes_packed
    nodei = jnp.stack([
        jax.lax.bitcast_convert_type(nodes[:, 6], jnp.int32),
        jax.lax.bitcast_convert_type(nodes[:, 7], jnp.int32),
    ], axis=1)
    tris = geom.tris_packed

    out = pl.pallas_call(
        functools.partial(_traverse_kernel, any_hit=any_hit),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodei.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, nb * B), jnp.float32),
    )(nodes, nodei, tris, rays, tm)

    t = out[0, :R]
    tri = out[1, :R].astype(jnp.int32)
    return {"t": t, "tri": tri, "u": out[2, :R], "v": out[3, :R]}
