#!/usr/bin/env python
"""Persistent-wavefront timing: samples/s fwd and fwd+bwd (slope)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(make_loop, iters=(1, 4)):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        float(f())
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.persistent import render_persistent
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    import itertools
    CONFIGS = [(4, 17, 1), (8, 28, 1), (16, 50, 1), (16, 50, 2),
               (32, 96, 1)]

    for SPP, T, se in CONFIGS:
        params = RenderParams(ray_depth=5, sort_every=se)

        @jax.jit
        def stats(params=params, SPP=SPP, T=T):
            sum_img, cnt, n_alive = render_persistent(
                data, cam, params, W, H, SPP, T, pixel_ids=pids,
                return_stats=True)
            return jnp.sum(cnt), jnp.sum(n_alive), jnp.sum(sum_img)
        c, a, _ = stats()
        print(f"spp={SPP} T={T} se={se}: completed "
              f"{100 * int(c) / (R * SPP):.2f}%, "
              f"af {int(a) / (R * T):.3f}", flush=True)

        def loop(bwd, params=params, SPP=SPP, T=T):
            def make(n):
                @jax.jit
                def run():
                    def body(i, acc):
                        pp = params.replace(seed=jnp.uint32(i))
                        if bwd:
                            def loss_fn(s):
                                img, cnt = render_persistent(
                                    s, cam, pp, W, H, SPP, T,
                                    pixel_ids=pids)
                                return l2_image_loss(
                                    img / SPP, jnp.zeros_like(img))
                            loss, g = jax.value_and_grad(
                                loss_fn, allow_int=True)(data)
                            return acc + loss + jnp.sum(g.materials.kd)
                        img, cnt = render_persistent(data, cam, pp, W, H,
                                                     SPP, T,
                                                     pixel_ids=pids)
                        return acc + jnp.sum(img)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
                return run
            return make

        iters = (1, 2) if SPP >= 16 else (1, 4)
        for name, bwd in [("fwd", False), ("fwdbwd", True)]:
            dt = slope_time(loop(bwd), iters=iters)
            srate = R * SPP / dt
            print(f"  persist_{name:8s} {dt*1e3:9.1f} ms  "
                  f"{srate/1e6:6.3f} Msmp/s  "
                  f"issued-equiv {srate*10/1e6:6.2f} Mq/s  "
                  f"active {int(a)/(R*SPP)*2*srate/1e6:6.2f} Mq/s",
                  flush=True)


if __name__ == "__main__":
    main()
