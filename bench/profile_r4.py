#!/usr/bin/env python
"""Round-4 lever profiling: per-bounce permutation cost, material-grad
scatter cost, and end-to-end ablations. Slope-timed (see ROOFLINE.md:
the axon tunnel makes per-call wall timing meaningless).

Usage: bench/tpu_run.sh python bench/profile_r4.py [--quick]
"""
from __future__ import annotations

import argparse
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
    lo, hi = iters
    f_lo, f_hi = make_loop(lo), make_loop(hi)
    ts = {}
    for n, f in ((lo, f_lo), (hi, f_hi)):
        sync(f())
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    args = ap.parse_args()

    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.wavefront import render_sample
    from cadrays_tpu.ops.traverse import _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    T = geom.tris_packed.shape[0]
    print(f"tris={T}", flush=True)

    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    o_inc = jax.random.uniform(k1, (R, 3)) * 500.0
    d_inc = jax.random.normal(k2, (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    tid = jax.random.randint(k3, (R,), 0, T)
    C = 56
    ct = jax.random.normal(k1, (R, C))
    key0 = _coherence_key(geom, o_inc, d_inc)
    m20 = jnp.concatenate([o_inc, d_inc, o_inc, d_inc, o_inc, d_inc,
                           o_inc[:, :2]], axis=1)

    res = {}

    def rec(name, dt):
        res[name] = dt * 1e3
        print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)

    # ---- permutation alternatives --------------------------------------
    def loop_over(f, x0):
        def make(n):
            @jax.jit
            def run():
                return jax.lax.fori_loop(
                    0, n, lambda i, x: f(x, i), x0)
            return run
        return make

    # full argsort + apply (the current per-bounce cost)
    def f_argsort(m, i):
        key = _coherence_key(geom, m[:, 0:3], m[:, 3:6])
        perm = jnp.argsort(key)
        return m[perm]
    rec("perm_argsort_apply", slope_time(loop_over(f_argsort, m20)))

    # chunked sort: vmapped sort_key_val over 8192-lane chunks
    for chunk in (8192, 16384, 32768):
        nc = R // chunk
        def f_chunk(m, i, chunk=chunk, nc=nc):
            key = _coherence_key(geom, m[:, 0:3], m[:, 3:6])
            iota = jnp.arange(R, dtype=jnp.int32)
            _, perm = jax.lax.sort_key_val(key.reshape(nc, chunk),
                                           iota.reshape(nc, chunk))
            return m[perm.reshape(R)]
        rec(f"perm_chunk{chunk}_apply", slope_time(loop_over(f_chunk, m20)))

    # key computation alone
    def f_key(m, i):
        key = _coherence_key(geom, m[:, 0:3], m[:, 3:6])
        return m + key[:, None].astype(jnp.float32) * 1e-30
    rec("key_only", slope_time(loop_over(f_key, m20)))

    # apply-only (given a fixed perm)
    perm0 = jnp.argsort(key0)
    def f_apply(m, i):
        return m[perm0] * (1.0 + 1e-12 * i)
    rec("apply_only_gather", slope_time(loop_over(f_apply, m20)))

    # inverse-permutation scatter (backward of the apply)
    def f_scatter_perm(m, i):
        return jnp.zeros_like(m).at[perm0].set(m)
    rec("apply_scatter_unique", slope_time(loop_over(f_scatter_perm, m20)))

    # ---- material-gradient scatter alternatives ------------------------
    # backward of rows = table[tid]: dtable = zeros.at[tid].add(drows)
    def f_scatter_add(x, i):
        tab = jnp.zeros((T, C), jnp.float32).at[tid].add(x)
        return x + tab[0, 0] * 1e-30
    rec("grad_scatter_add", slope_time(loop_over(f_scatter_add, ct)))

    def f_segsum(x, i):
        tab = jax.ops.segment_sum(x, tid, num_segments=T)
        return x + tab[0, 0] * 1e-30
    rec("grad_segment_sum", slope_time(loop_over(f_segsum, ct)))

    # one-hot matmul (chunked, bf16 accum f32)
    for chunk in (16384,):
        nc = R // chunk
        def f_onehot(x, i, chunk=chunk, nc=nc):
            def body(c, acc):
                ids = jax.lax.dynamic_slice(tid, (c * chunk,), (chunk,))
                xs = jax.lax.dynamic_slice(x, (c * chunk, 0), (chunk, C))
                oh = (ids[:, None] == jnp.arange(T)[None, :]).astype(
                    jnp.bfloat16)
                return acc + jax.lax.dot(
                    oh.T, xs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            tab = jax.lax.fori_loop(0, nc, body,
                                    jnp.zeros((T, C), jnp.float32))
            return x + tab[0, 0] * 1e-30
        rec(f"grad_onehot_mm{chunk}", slope_time(loop_over(f_onehot, ct)))

    # sorted segment_sum (ids presorted; measures the best case)
    tid_sorted = jnp.sort(tid)
    def f_segsum_sorted(x, i):
        tab = jax.ops.segment_sum(x, tid_sorted, num_segments=T,
                                  indices_are_sorted=True)
        return x + tab[0, 0] * 1e-30
    rec("grad_segsum_sorted", slope_time(loop_over(f_segsum_sorted, ct)))

    if args.skip_render:
        print(json.dumps(res))
        return

    # ---- end-to-end ablations ------------------------------------------
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

    p5 = RenderParams(ray_depth=5)
    p5ns = RenderParams(ray_depth=5, sort_rays=False)
    iters = (1, 2) if args.quick else (1, 4)
    for name, pp, bwd in [
        ("fwd_d5", p5, False),
        ("fwd_d5_nosort", p5ns, False),
        ("fwdbwd_d5", p5, True),
        ("fwdbwd_d5_nosort", p5ns, True),
    ]:
        dt = slope_time(render_loop(pp, bwd), iters=iters)
        q = R * pp.ray_depth * 2
        rec(f"render_{name}", dt)
        print(f"    -> {q/dt/1e6:.2f} Mq/s", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
