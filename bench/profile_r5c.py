#!/usr/bin/env python
"""Traversal-launch A/B (bf16 slab tests): closest + any-hit slopes on
warm realistic bounce-ray state. Run twice:
    python bench/profile_r5c.py
    CADRAYS_WIDE_BF16=1 python bench/profile_r5c.py
Also checks image parity: bf16 slabs must not change any hit result
beyond the conservative-widening contract (identical tri ids expected
on Cornell).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(make_loop, iters=(1, 8), reps=3):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        float(f())
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.wavefront import build_wavefront
    from cadrays_tpu.ops.traverse import trace
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    INF = jnp.float32(3e30)
    params = RenderParams(ray_depth=5)
    st0, bounce_fn = build_wavefront(data, cam, params, W, H,
                                     jnp.uint32(0), pids)

    @jax.jit
    def warm(st):
        def body(c, t):
            c2, _ = bounce_fn(c, t)
            return c2, None
        st, _ = jax.lax.scan(body, st, jnp.arange(3), length=3)
        return st

    stw = jax.tree.map(jnp.copy, warm(st0))
    o, d = stw["origin"], stw["direction"]
    tm = jnp.where(stw["alive"], INF, 0.0)

    def chained_trace(any_hit):
        def make(n):
            @jax.jit
            def run():
                def body(c, t):
                    res = trace(data.geometry, c, d, tm, any_hit=any_hit)
                    return c + res["t"][:, None] * 1e-30, None
                c, _ = jax.lax.scan(body, o, jnp.arange(n), length=n)
                return jnp.sum(c)
            return run
        return make

    t_c = slope(chained_trace(False))
    t_a = slope(chained_trace(True))
    res = jax.jit(lambda: trace(data.geometry, o, d, tm))()
    tri = np.asarray(res["tri"])
    tsum = float(np.where(np.asarray(res["t"]) < 1e30,
                          np.asarray(res["t"]), 0).sum())
    print(f"bf16={bool(os.environ.get('CADRAYS_WIDE_BF16'))}: "
          f"closest {t_c*1e3:.3f} ms  anyhit {t_a*1e3:.3f} ms  "
          f"hits {int((tri >= 0).sum())}  tsum {tsum:.3f}", flush=True)


if __name__ == "__main__":
    main()
