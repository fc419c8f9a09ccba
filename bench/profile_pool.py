#!/usr/bin/env python
"""Where does the pool scheduler's per-step overhead go?

Slope-times (N=1 vs N=6 chained scan steps in one jit, fwd only and
fwd+bwd) four step variants at the bench shape (262k lanes, Cornell):

  classic       render_persistent's step (26-col sorted state)
  classic+pad   classic with a DEAD 22-col extra riding the sort
                -> isolates the cost of the wider permutation alone
  pool          render_persistent_pool's step (banking + cumsum + pops)
  pool-nosort   pool with sort_rays=False (upper bound on sort share)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(make_loop, iters=(1, 6), reps=3):
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
    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator import persistent as pers
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    spp, depth = 32, 5

    def classic(n, s, pad=False):
        params = RenderParams(ray_depth=depth)
        img, cnt = pers.render_persistent(
            s, cam, params, W, H, spp, n, pixel_ids=pids)
        return img, cnt

    def run_fn(fn, n, bwd):
        @jax.jit
        def run():
            if not bwd:
                img, cnt = fn(n, data)
                return jnp.sum(img) + jnp.sum(cnt).astype(jnp.float32)

            def loss(s):
                img, cnt = fn(n, s)
                return l2_image_loss(
                    img / jnp.maximum(cnt[:, None].astype(jnp.float32),
                                      1.0), jnp.zeros_like(img))
            l, g = jax.value_and_grad(loss, allow_int=True)(data)
            return l + jnp.sum(g.materials.kd) * 1e-30
        return run

    def pool(n, s, g=16, sort=True):
        params = RenderParams(ray_depth=depth, sort_rays=sort)
        img, cnt = pers.render_persistent_pool(
            s, cam, params, W, H, spp, n, pixel_ids=pids, granularity=g)
        return img, cnt

    variants = [
        ("classic", lambda n, s: classic(n, s)),
        ("pool_g16", lambda n, s: pool(n, s)),
        ("pool_g32", lambda n, s: pool(n, s, g=32)),
        ("pool_nosort", lambda n, s: pool(n, s, sort=False)),
    ]
    out = {}
    for bwd in (False, True):
        for name, fn in variants:
            key = f"{name}_{'fwdbwd' if bwd else 'fwd'}"
            dt = slope(lambda n: run_fn(fn, n, bwd))
            out[key] = dt * 1e3
            print(f"{key:24s} {dt*1e3:8.2f} ms/step", flush=True)
    import json

    with open(os.path.join(os.path.dirname(__file__),
                           "profile_pool.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
