"""Brute-force MXU ray-triangle intersection (matmul formulation).

The TPU-first answer to BVH traversal for moderate scenes: instead of a
divergent tree walk (hostile to a lockstep vector machine), test EVERY
ray against EVERY triangle — as a single matrix multiply on the MXU.

Möller–Trumbore is four scalar triple products per (ray, triangle) pair,
and every triple product [a,b,c] is linear in each argument. With the
per-ray feature vector

    X = [o, d, m, 1, pad]          m = o × d        (R, 16)

all four intersection quantities become columns of one matmul
`X @ W (16, 4T)` against per-triangle constants (n = e1×e2, k = p0·n,
c2 = e2×p0, c3 = p0×e1):

    det = e1·(d×e2)        = -d·n
    t·det = o·n - k
    u·det = m·e2 - d·c2
    v·det = -m·e1 - d·c3

The epilogue (sign-folded comparisons + running argmin over triangle
tiles) is pure VPU work with zero gathers and zero data-dependent control
flow — exactly what the hardware wants. Work is O(R·T), but on TPU the
constant is so small that for scenes up to tens of thousands of triangles
this beats the packet BVH walk (which degenerates to "every block visits
every node" once rays diverge), and it is completely insensitive to ray
coherence, so bounce rays cost the same as primary rays and no ray
sorting is needed.

Reference capability covered: the OCCT GPU two-level BVH's *role* —
closest-hit and any-hit queries for the path tracer [OCCT-contract,
SURVEY.md §2.5]; the acceleration-structure choice is free, and on TPU
the right structure for small scenes is no structure at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadrays_tpu.scene.flatten import GeometryData

RAY_TILE = 256
TRI_TILE = 512
MAX_TRIS = 24576  # W table: 4*16*T*4B = 6 MB at the cap
_INF = 1e30  # python float: kernels must not capture traced constants
_EPS = 1e-7


def fits_bruteforce(geom: GeometryData) -> bool:
    return (not geom.instanced) and geom.tris_packed.shape[0] <= MAX_TRIS


@functools.partial(jax.jit, static_argnames=())
def _tri_tables(tris_packed):
    """(T,12) packed p0|e1|e2 rows -> W (4, 16, Tpad) matmul table."""
    p0 = tris_packed[:, 0:3]
    e1 = tris_packed[:, 3:6]
    e2 = tris_packed[:, 6:9]
    n = jnp.cross(e1, e2)
    k = jnp.sum(p0 * n, axis=-1)
    c2 = jnp.cross(e2, p0)
    c3 = jnp.cross(p0, e1)
    T = p0.shape[0]
    Z = jnp.zeros((T, 3), jnp.float32)
    z1 = jnp.zeros((T, 1), jnp.float32)
    o1 = jnp.ones((T, 1), jnp.float32)

    def col(w_o, w_d, w_m, w_1):
        # feature order: o(3) d(3) m(3) 1 pad(6) -> (T, 16)
        return jnp.concatenate(
            [w_o, w_d, w_m, w_1, jnp.zeros((T, 6), jnp.float32)], axis=-1)

    w_det = col(Z, -n, Z, z1 * 0.0)
    w_t = col(n, Z, Z, -k[:, None])
    w_u = col(Z, -c2, e2, z1 * 0.0)
    w_v = col(Z, -c3, -e1, z1 * 0.0)
    W = jnp.stack([w_det, w_t, w_u, w_v], axis=0)  # (4, T, 16)
    Tpad = -(-T // TRI_TILE) * TRI_TILE
    W = jnp.pad(W, ((0, 0), (0, Tpad - T), (0, 0)))
    # degenerate padding rows: all-zero -> det==0 -> never hit
    return jnp.transpose(W, (0, 2, 1))  # (4, 16, Tpad)


def _intersect_kernel(x_ref, w_ref, tm_ref, out_ref, *, n_tri_tiles,
                      any_hit):
    # All tensors stay 2D: Mosaic's layout inference rejects mixed
    # 1D/2D elementwise joins.
    x = x_ref[:]            # (RAY_TILE, 16)
    tmax = tm_ref[:]        # (RAY_TILE, 1)

    def tile_step(j, carry):
        best_t, best_i = carry                           # (RAY_TILE, 1)
        w = w_ref[:, :, pl.ds(j * TRI_TILE, TRI_TILE)]  # (4, 16, TRI_TILE)
        det = jnp.dot(x, w[0], preferred_element_type=jnp.float32)
        tt = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
        uu = jnp.dot(x, w[2], preferred_element_type=jnp.float32)
        vv = jnp.dot(x, w[3], preferred_element_type=jnp.float32)

        s = jnp.where(det >= 0.0, 1.0, -1.0)
        dabs = jnp.abs(det)
        a = uu * s
        b = vv * s
        c = tt * s
        tol = _EPS * dabs
        hit = ((dabs > 1e-12) & (a >= -tol) & (b >= -tol)
               & (a + b <= dabs * (1.0 + _EPS))
               & (c > _EPS * dabs)
               & (c < tmax * dabs))
        tval = jnp.where(
            hit, c * pl.reciprocal(jnp.maximum(dabs, 1e-30), approx=False),
            _INF)
        tile_t = jnp.min(tval, axis=-1, keepdims=True)   # (RAY_TILE, 1)
        # argmin without lax.argmin: smallest column index attaining the min
        ids = jax.lax.broadcasted_iota(jnp.int32, tval.shape, 1)
        tile_arg = jnp.min(jnp.where(tval <= tile_t, ids, TRI_TILE),
                           axis=-1, keepdims=True)
        better = tile_t < best_t
        best_t = jnp.where(better, tile_t, best_t)
        best_i = jnp.where(better, tile_arg + j * TRI_TILE, best_i)
        return best_t, best_i

    init = (jnp.minimum(tmax, _INF),
            jnp.full((RAY_TILE, 1), -1, jnp.int32))
    # any_hit uses the same reduction (callers only read `tri >= 0`);
    # the epilogue is cheap enough that early exit is not worth a cond.
    best_t, best_i = jax.lax.fori_loop(0, n_tri_tiles, tile_step, init)
    best_i = jnp.where(best_t < jnp.minimum(tmax, _INF), best_i, -1)
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_i.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("any_hit",))
def trace_bruteforce(geom: GeometryData, origin, direction, t_max,
                     any_hit: bool = False):
    """Same contract as ops.traverse.trace (t, tri, u, v)."""
    R = origin.shape[0]
    W = _tri_tables(geom.tris_packed)
    n_tri_tiles = W.shape[2] // TRI_TILE

    nrt = -(-R // RAY_TILE)
    pad = nrt * RAY_TILE - R
    m = jnp.cross(origin, direction)
    ones = jnp.ones((R, 1), jnp.float32)
    X = jnp.concatenate(
        [origin, direction, m, ones, jnp.zeros((R, 6), jnp.float32)],
        axis=-1)
    X = jnp.pad(X, ((0, pad), (0, 0)))
    tm = jnp.pad(jnp.broadcast_to(t_max, (R,)), (0, pad))[:, None]

    out = pl.pallas_call(
        functools.partial(_intersect_kernel, n_tri_tiles=n_tri_tiles,
                          any_hit=any_hit),
        grid=(nrt,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((RAY_TILE, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrt * RAY_TILE, 2), jnp.float32),
    )(X, W, tm)

    tri = out[:R, 1].astype(jnp.int32)
    # Exact t/u/v recomputed on the winning triangle (one row-gather per
    # ray) — the kernel's t is reciprocal-approximate and u/v are folded
    # away by the argmin.
    trow = geom.tris_packed[jnp.maximum(tri, 0)]
    p0, e1, e2 = trow[:, 0:3], trow[:, 3:6], trow[:, 6:9]
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    miss = tri < 0
    return {
        "t": jnp.where(miss, jnp.minimum(jnp.broadcast_to(t_max, (R,)),
                                         _INF), t),
        "tri": tri,
        "u": jnp.where(miss, 0.0, u),
        "v": jnp.where(miss, 0.0, v),
    }
