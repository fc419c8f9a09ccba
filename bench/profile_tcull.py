#!/usr/bin/env python
"""A/B the leaf t-cull on the production wide config (slope-timed)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(make_loop, iters=(1, 8)):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        float(jnp.sum(f()))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(f()))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from cadrays_tpu.ops.pallas_wide import trace_wide
    from cadrays_tpu.ops.traverse import _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    print(f"tris={geom.tris_packed.shape[0]} wide_leaf={geom.wide_leaf}",
          flush=True)

    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o_coh, d_coh = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R),
                                     W, H)
    tmax = jnp.full((R,), 1e30)

    # bounce-like rays: random origins inside the box, random dirs, SORTED
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o_inc = jax.random.uniform(k1, (R, 3)) * jnp.array([1.0, 1.0, 1.0])
    d_inc = jax.random.normal(k2, (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    key = _coherence_key(geom, o_inc, d_inc)
    perm = jnp.argsort(key)
    o_srt, d_srt = o_inc[perm], d_inc[perm]

    def loop(o, d, **kw):
        def make(n):
            @jax.jit
            def run():
                def body(i, carry):
                    oo, acc = carry
                    r = trace_wide(geom, oo, d, tmax, **kw)
                    return oo + 0.0 * r["t"][:, None], acc + r["t"]
                _, acc = jax.lax.fori_loop(0, n, body, (o, jnp.zeros(R)))
                return acc
            return run
        return make

    for name, o, d, kw in [
        ("coh", o_coh, d_coh, {}),
        ("srt", o_srt, d_srt, {}),
        ("srt_anyhit", o_srt, d_srt, {"any_hit": True}),
    ]:
        dt = slope_time(loop(o, d, **kw))
        print(f"{name:12s} {dt*1e3:9.3f} ms   {R/dt/1e6:9.2f} Mray/s",
              flush=True)


if __name__ == "__main__":
    main()
