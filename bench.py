#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, 1024x1024 Cornell.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N}

Ray accounting: the wavefront integrator issues, per pixel per sample per
bounce, 1 closest-hit query + 1 shadow query per active NEE strategy
(analytic light / emissive / env). We report *issued ray queries per
second*.

Timing: on the axon-tunneled TPU, `block_until_ready` does NOT
synchronize and every host readback costs ~25 ms of tunnel latency, so
per-call wall timing is meaningless (round 1's number was polluted by
it). This bench therefore runs the whole sample loop ON DEVICE (one jit,
`lax.fori_loop` over sample ids, radiance accumulated into a scalar) and
times two loop lengths with a forced scalar readback each; the
per-sample cost is the slope, which cancels tunnel latency, dispatch and
upload costs exactly.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=8,
                    help="samples for the long timing loop")
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=4,
                    help="pixel chunks per pass (bwd memory)")
    ap.add_argument("--quick", action="store_true",
                    help="small config for smoke testing")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.res, args.spp, args.chunks = 128, 2, 1

    import jax
    import jax.numpy as jnp

    from cadrays_tpu.diff.optimize import l2_image_loss
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.wavefront import render_sample
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    params = RenderParams(ray_depth=args.depth)

    W = H = args.res
    total = W * H
    n_chunks = args.chunks
    chunk = total // n_chunks
    pixel_sets = jnp.stack([
        jnp.arange(i * chunk, (i + 1) * chunk, dtype=jnp.int32)
        for i in range(n_chunks)
    ])

    # per pixel-sample-bounce: 1 closest + 1 NEE shadow (positional light;
    # no env, no emissive tris in this scene).
    queries_per_sample = args.depth * 2

    fwd_only = args.fwd_only

    def one_sample(sid, acc):
        def chunk_body(i, a):
            pids = pixel_sets[i]
            if fwd_only:
                img = render_sample(data, cam, params, W, H, sid,
                                    pixel_ids=pids)
                return a + jnp.sum(img)
            def loss_fn(s):
                img = render_sample(s, cam, params, W, H, sid,
                                    pixel_ids=pids)
                return l2_image_loss(img, jnp.zeros_like(img))
            loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(data)
            return a + loss + jnp.sum(grads.materials.kd)
        return jax.lax.fori_loop(0, n_chunks, chunk_body, acc)

    def make_loop(n):
        @jax.jit
        def run():
            def body(s, acc):
                return one_sample(jnp.uint32(s + 1), acc)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    def timed(f):
        float(f())  # compile + warm (upload flushes here)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        return best

    n_lo, n_hi = 1, max(args.spp, 2)
    t_lo = timed(make_loop(n_lo))
    t_hi = timed(make_loop(n_hi))
    per_sample = (t_hi - t_lo) / (n_hi - n_lo)

    rays = total * queries_per_sample
    rays_per_s = rays / max(per_sample, 1e-9)

    # Honest accounting (round-2 review): `rays` counts ISSUED queries —
    # depth x (1 closest + 1 NEE shadow) per pixel-sample, including
    # masked lanes after termination (the wavefront is statically
    # shaped). Also report the ACTIVE-query rate from the measured
    # per-bounce live-lane counts: bounce b issues alive_b closest +
    # alive_b shadow queries on this scene (one positional light).
    @jax.jit
    def count_alive():
        _, n_alive = render_sample(data, cam, params, W, H, jnp.uint32(1),
                                   pixel_ids=pixel_sets[0],
                                   return_stats=True)
        return n_alive

    alive = np.asarray(count_alive())
    active_q = float(total * 2 * np.sum(alive) / len(pixel_sets[0]))
    active_per_s = active_q / max(per_sample, 1e-9)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f).get("value", rays_per_s)
            vs = rays_per_s / max(base, 1e-9)
        except Exception:
            pass

    mode = "fwd" if args.fwd_only else "fwd+bwd"
    print(json.dumps({
        "metric": f"rays/s/chip {mode} {args.res}x{args.res} Cornell depth={args.depth}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "active_rays_per_s": round(active_per_s, 1),
        "active_fraction": round(active_q / rays, 4),
    }))


if __name__ == "__main__":
    main()
