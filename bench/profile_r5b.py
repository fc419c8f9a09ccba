#!/usr/bin/env python
"""A/B: fwd+bwd per-step cost of the bench bounce under
(a) CADRAYS_SAVE_SHADE residuals and (b) sort_every cadence.
Run via: python bench/profile_r5b.py [sort_every]
(the env var must be set before import, so each variant is a process).
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
    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.wavefront import build_wavefront
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    se = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    params = RenderParams(ray_depth=5, sort_every=se)

    def make_bwd(n):
        @jax.jit
        def run():
            def loss_fn(s):
                stb, bounce_fn = build_wavefront(
                    s, cam, params, W, H, jnp.uint32(0), pids)

                def body(c, t):
                    c2, _ = bounce_fn(c, t)
                    return c2, None
                stf, _ = jax.lax.scan(body, stb, jnp.arange(n), length=n)
                return l2_image_loss(stf["radiance"],
                                     jnp.zeros_like(stf["radiance"]))
            loss, g = jax.value_and_grad(loss_fn, allow_int=True)(data)
            return loss + jnp.sum(g.materials.kd) * 1e-30
        return run

    def make_fwd(n):
        @jax.jit
        def run():
            stb, bounce_fn = build_wavefront(
                data, cam, params, W, H, jnp.uint32(0), pids)

            def body(c, t):
                c2, _ = bounce_fn(c, t)
                return c2, None
            stf, _ = jax.lax.scan(body, stb, jnp.arange(n), length=n)
            return jnp.sum(stf["radiance"])
        return run

    t_f = slope(make_fwd)
    t_b = slope(make_bwd)
    print(f"save_shade={bool(os.environ.get('CADRAYS_SAVE_SHADE'))} "
          f"sort_every={se}: fwd {t_f*1e3:.2f} ms  fwd+bwd {t_b*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
