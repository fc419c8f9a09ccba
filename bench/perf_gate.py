#!/usr/bin/env python
"""TPU performance gate — the chip-side counterpart of the CPU golden
gate (tests/test_golden.py gates pixels; CADRAYS_PERF_GATE there can
only compare CPU numbers, which say nothing about a TPU kernel
regression — round-3 verdict weak #5).

Run ON the chip:   bench/tpu_run.sh python bench/perf_gate.py
Record goldens:    ... perf_gate.py --update

Measures three slope-timed probes chosen to cover the distinct perf
surfaces (each catches regressions the others cannot):
  wide_sorted_ms   — the wide-BVH kernel on sorted bounce rays
                     (traversal: tree layout, t-cull, Mosaic codegen)
  fixed_fwdbwd_ms  — render_sample fwd+bwd, 262k chunk (remat policy,
                     gather VJPs, sort cadence, backward sweeps)
  persist_fwdbwd_ms — the persistent-wavefront headline config
                     (regeneration, occupancy, scan structure)

Gate: each probe within +tol (default 10%) of its stored golden.
Exit code 1 on regression. Goldens live in bench/tpu_perf_golden.json
with the chip name; a different chip model refuses to gate (records
are not transferable across hardware).
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

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tpu_perf_golden.json")


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


def probes():
    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.persistent import render_persistent
    from cadrays_tpu.integrator.wavefront import render_sample
    from cadrays_tpu.ops.pallas_wide import trace_wide
    from cadrays_tpu.ops.traverse import _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    tmax = jnp.full((R,), 1e30)
    params = RenderParams(ray_depth=5)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o = jax.random.uniform(k1, (R, 3))
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    perm = jnp.argsort(_coherence_key(geom, o, d))
    o_s, d_s = o[perm], d[perm]

    out = {}

    def wide_loop(n):
        @jax.jit
        def run():
            def body(i, carry):
                oo, acc = carry
                r = trace_wide(geom, oo, d_s, tmax)
                return oo + 0.0 * r["t"][:, None], acc + r["t"]
            _, acc = jax.lax.fori_loop(0, n, body, (o_s, jnp.zeros(R)))
            return jnp.sum(acc)
        return run
    out["wide_sorted_ms"] = slope_time(wide_loop, iters=(1, 8)) * 1e3

    def fixed_loop(n):
        @jax.jit
        def run():
            def body(i, acc):
                def loss_fn(s):
                    img = render_sample(s, cam, params, W, H,
                                        jnp.uint32(i), pixel_ids=pids)
                    return l2_image_loss(img, jnp.zeros_like(img))
                loss, g = jax.value_and_grad(loss_fn, allow_int=True)(data)
                return acc + loss + jnp.sum(g.materials.kd)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    out["fixed_fwdbwd_ms"] = slope_time(fixed_loop) * 1e3

    spp, T = 32, 96

    def persist_loop(n):
        @jax.jit
        def run():
            def body(i, acc):
                pp = params.replace(seed=jnp.uint32(i))

                def loss_fn(s):
                    img, cnt = render_persistent(s, cam, pp, W, H, spp,
                                                 T, pixel_ids=pids)
                    img = img / jnp.maximum(
                        cnt[:, None].astype(jnp.float32), 1.0)
                    return l2_image_loss(img, jnp.zeros_like(img))
                loss, g = jax.value_and_grad(loss_fn, allow_int=True)(data)
                return acc + loss + jnp.sum(g.materials.kd)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    out["persist_fwdbwd_ms"] = slope_time(persist_loop, iters=(1, 2)) * 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()

    if jax.default_backend() not in ("tpu",):
        print(json.dumps({"skipped": "not on TPU",
                          "backend": jax.default_backend()}))
        return 0
    chip = jax.devices()[0].device_kind

    res = probes()
    res["chip"] = chip
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))

    if args.update or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump({k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in res.items()}, f, indent=1)
        print("golden recorded")
        return 0

    with open(GOLDEN) as f:
        gold = json.load(f)
    if gold.get("chip") != chip:
        print(f"golden chip {gold.get('chip')!r} != {chip!r}; not gating")
        return 0
    bad = []
    for k, v in res.items():
        if not isinstance(v, float) or k not in gold:
            continue
        delta = v / gold[k] - 1.0
        status = "OK" if delta < args.tol else "REGRESSED"
        print(f"{k:20s} {v:9.2f} ms vs {gold[k]:9.2f} "
              f"({delta * 100:+.1f}%) {status}")
        if delta >= args.tol:
            bad.append(k)
    if bad:
        print(f"PERF GATE FAILED: {bad}")
        return 1
    print("perf gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
