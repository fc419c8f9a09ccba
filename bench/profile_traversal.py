#!/usr/bin/env python
"""Traversal-backend shootout + sort-alternative timing on the real chip."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from cadrays_tpu.ops.mxu_intersect import trace_bruteforce
    from cadrays_tpu.ops.pallas_traverse import trace_pallas
    from cadrays_tpu.ops.traverse import trace_stream, _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    T = geom.tris_packed.shape[0]
    print(f"tris={T} nodes={geom.nodes_packed.shape[0]}")

    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o, d = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R), W, H)
    tmax = jnp.full((R,), 1e30)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    o_inc = jax.random.uniform(k1, (R, 3)) * 500.0
    d_inc = jax.random.normal(k2, (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    bf = jax.jit(lambda o, d, t: trace_bruteforce(geom, o, d, t))
    pv = jax.jit(lambda o, d, t: trace_pallas(geom, o, d, t))
    st = jax.jit(lambda o, d, t: trace_stream(geom, o, d, t))

    for name, fn in [("bruteforce", bf), ("pallas", pv), ("stream", st)]:
        try:
            dt_c = timeit(fn, o, d, tmax)
            dt_i = timeit(fn, o_inc, d_inc, tmax)
            print(f"{name:12s} coherent {dt_c*1e3:8.2f} ms ({R/dt_c/1e6:7.2f} M/s)"
                  f"  incoherent {dt_i*1e3:8.2f} ms ({R/dt_i/1e6:7.2f} M/s)")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")

    # cross-check hits agree
    h_bf = bf(o, d, tmax)
    h_pv = pv(o, d, tmax)
    import numpy as np
    agree = np.mean(np.asarray(h_bf["tri"]) == np.asarray(h_pv["tri"]))
    print(f"bf vs pallas tri agreement: {agree:.4f}")

    # --- sort alternatives over a 20-col state matrix -------------------
    m20 = jnp.concatenate([o, d, o, d, o, d, o[:, :2]], axis=1)
    alive = jax.random.uniform(k1, (R,)) < 0.5

    def full_argsort(m, o, d, alive):
        key = _coherence_key(geom, o, d)
        key = jnp.where(alive, key, jnp.int32(1 << 24))
        perm = jnp.argsort(key)
        return m[perm]

    def partition_only(m, o, d, alive):
        # stable alive-first partition via two cumsums — no comparator sort
        a = alive.astype(jnp.int32)
        n_alive = jnp.sum(a)
        pos_a = jnp.cumsum(a) - 1
        pos_d = n_alive + jnp.cumsum(1 - a) - 1
        pos = jnp.where(alive, pos_a, pos_d)
        return jnp.zeros_like(m).at[pos].set(m)

    def sort_u16key(m, o, d, alive):
        # same key but packed into the value: sort one uint32 array where
        # high bits = key, low bits = lane id, then gather
        key = _coherence_key(geom, o, d)
        key = jnp.where(alive, key, jnp.int32(1 << 24))
        lane = jnp.arange(R, dtype=jnp.int32)
        packed = (key.astype(jnp.uint32) << 18) | lane.astype(jnp.uint32)
        s = jnp.sort(packed)
        perm = (s & 0x3FFFF).astype(jnp.int32)
        return m[perm]

    for name, fn in [("full_argsort", full_argsort),
                     ("partition_only", partition_only),
                     ("sort_u16key", sort_u16key)]:
        f = jax.jit(fn)
        dt = timeit(f, m20, o_inc, d_inc, alive)
        print(f"{name:16s} {dt*1e3:8.2f} ms ({R/dt/1e6:7.2f} M/s)")


if __name__ == "__main__":
    main()
