#!/usr/bin/env python
"""Component-level timing breakdown for the Cornell bench config.

The axon tunnel adds ~25 ms round-trip latency to every host readback and
`block_until_ready` does not synchronize, so naive per-call timing is
meaningless. Every measurement here is slope-based: the op under test is
chained N times inside one jitted `lax.fori_loop` (output feeds input so
nothing is DCE'd), timed with a single forced scalar readback, and the
per-iteration cost is (t_N - t_1) / (N - 1).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def slope_time(make_loop, iters=(1, 8)):
    """make_loop(n) -> jitted fn running n chained iterations."""
    lo, hi = iters
    f_lo, f_hi = make_loop(lo), make_loop(hi)
    ts = {}
    for n, f in ((lo, f_lo), (hi, f_hi)):
        sync(f())  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.wavefront import render_sample
    from cadrays_tpu.ops.mxu_intersect import trace_bruteforce
    from cadrays_tpu.ops.pallas_traverse import trace_pallas
    from cadrays_tpu.ops.traverse import trace_stream, _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    print(f"tris={geom.tris_packed.shape[0]} nodes={geom.nodes_packed.shape[0]}",
          flush=True)

    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o_coh, d_coh = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R), W, H)
    tmax = jnp.full((R,), 1e30)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o_inc = jax.random.uniform(k1, (R, 3)) * 500.0
    d_inc = jax.random.normal(k2, (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    res = {}

    def trace_loop(trace_fn, o, d, **kw):
        def make(n):
            @jax.jit
            def run():
                def body(i, carry):
                    oo, acc = carry
                    r = trace_fn(geom, oo, d, tmax, **kw)
                    # feed t back into origin so iterations chain
                    oo = oo + 0.0 * r["t"][:, None]
                    return oo, acc + r["t"]
                _, acc = jax.lax.fori_loop(0, n, body, (o, jnp.zeros(R)))
                return acc
            return run
        return make

    for name, fn, o, d in [
        ("pallas_coh", trace_pallas, o_coh, d_coh),
        ("pallas_inc", trace_pallas, o_inc, d_inc),
        ("stream_coh", trace_stream, o_coh, d_coh),
        ("bruteforce_coh", trace_bruteforce, o_coh, d_coh),
        ("bruteforce_inc", trace_bruteforce, o_inc, d_inc),
    ]:
        dt = slope_time(trace_loop(fn, o, d))
        res[name] = (dt, R / dt)
        print(f"{name:20s} {dt*1e3:9.3f} ms   {R/dt/1e6:9.2f} Mray/s",
              flush=True)

    # sort / permutation alternatives
    m20 = jnp.concatenate([o_inc, d_inc, o_inc, d_inc, o_inc, d_inc,
                           o_inc[:, :2]], axis=1)
    alive = jax.random.uniform(k1, (R,)) < 0.5

    def sort_loop(which):
        def make(n):
            @jax.jit
            def run():
                def body(i, m):
                    o, d = m[:, 0:3], m[:, 3:6]
                    if which == "argsort":
                        key = _coherence_key(geom, o, d)
                        key = jnp.where(alive, key, jnp.int32(1 << 24))
                        perm = jnp.argsort(key)
                        return m[perm]
                    else:
                        a = alive.astype(jnp.int32)
                        n_alive = jnp.sum(a)
                        pos = jnp.where(
                            alive, jnp.cumsum(a) - 1,
                            n_alive + jnp.cumsum(1 - a) - 1)
                        return jnp.zeros_like(m).at[pos].set(m)
                return jax.lax.fori_loop(0, n, body, m20)
            return run
        return make

    for name in ("argsort", "partition"):
        dt = slope_time(sort_loop(name))
        res[f"sort_{name}"] = (dt, R / dt)
        print(f"sort_{name:15s} {dt*1e3:9.3f} ms   {R/dt/1e6:9.2f} M/s",
              flush=True)

    # full renders: chain over sample_id
    params = RenderParams(ray_depth=5)
    p1 = RenderParams(ray_depth=1)

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

    for name, pp, bwd in [("fwd_d5", params, False),
                          ("fwd_d1", p1, False),
                          ("fwd_bwd_d5", params, True)]:
        dt = slope_time(render_loop(pp, bwd), iters=(1, 4))
        q = R * (pp.ray_depth * 2)
        res[f"render_{name}"] = (dt, q / dt)
        print(f"render_{name:13s} {dt*1e3:9.3f} ms   {q/dt/1e6:9.2f} Mq/s",
              flush=True)

    out = {k: {"ms": dt * 1e3, "M_per_s": rate / 1e6}
           for k, (dt, rate) in res.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
