#!/usr/bin/env python
"""Round-4 ablation: fwd/bwd cost vs sort cadence on current code."""
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
    from cadrays_tpu.integrator.wavefront import render_sample
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)

    def render_loop(pp, bwd):
        def make(n):
            @jax.jit
            def run():
                def body(i, acc):
                    sid = jnp.uint32(i)
                    if bwd:
                        def loss_fn(s):
                            img = render_sample(s, cam, pp, W, H, sid,
                                                pixel_ids=pids)
                            return l2_image_loss(img, jnp.zeros_like(img))
                        loss, g = jax.value_and_grad(
                            loss_fn, allow_int=True)(data)
                        return acc + loss + jnp.sum(g.materials.kd)
                    img = render_sample(data, cam, pp, W, H, sid,
                                        pixel_ids=pids)
                    return acc + jnp.sum(img)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return run
        return make

    for name, pp, bwd in [
        ("fwd_se1", RenderParams(ray_depth=5, sort_every=1), False),
        ("fwd_se2", RenderParams(ray_depth=5, sort_every=2), False),
        ("fwd_nosort", RenderParams(ray_depth=5, sort_rays=False), False),
        ("fwdbwd_se1", RenderParams(ray_depth=5, sort_every=1), True),
        ("fwdbwd_se2", RenderParams(ray_depth=5, sort_every=2), True),
        ("fwdbwd_nosort", RenderParams(ray_depth=5, sort_rays=False), True),
    ]:
        dt = slope_time(render_loop(pp, bwd))
        q = R * 5 * 2
        print(f"{name:16s} {dt*1e3:9.1f} ms  {q/dt/1e6:7.2f} Mq/s",
              flush=True)


if __name__ == "__main__":
    main()
