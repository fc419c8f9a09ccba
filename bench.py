#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, 1024x1024 Cornell.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N}

Ray accounting: the wavefront integrator issues, per pixel per sample per
bounce, 1 closest-hit query + 1 shadow query per active NEE strategy
(analytic light / emissive / env). We report *issued ray queries per
second* — the same convention every round, so vs_baseline tracks real
progress. The stored baseline (bench_baseline.json) is round 1's number;
update it when the kernel gets faster to keep the ratio honest.
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
    ap.add_argument("--spp", type=int, default=4)
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
    pixel_sets = [
        jnp.arange(i * chunk, (i + 1) * chunk, dtype=jnp.int32)
        for i in range(n_chunks)
    ]

    # per pixel-sample-bounce: 1 closest + 1 NEE shadow (positional light;
    # no env, no emissive tris in this scene).
    queries_per_sample = args.depth * 2

    @jax.jit
    def fwd(scene_, pids, sid):
        return render_sample(scene_, cam, params, W, H, sid, pixel_ids=pids)

    @jax.jit
    def fwd_bwd(scene_, pids, sid):
        def loss_fn(s):
            img = render_sample(s, cam, params, W, H, sid, pixel_ids=pids)
            return l2_image_loss(img, jnp.zeros_like(img))

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(scene_)
        return loss, grads.materials.kd

    step = fwd if args.fwd_only else fwd_bwd

    # warmup/compile
    out = step(data, pixel_sets[0], jnp.uint32(0))
    jax.block_until_ready(out)

    def one_pass(sid0):
        outs = []
        for i, pids in enumerate(pixel_sets):
            outs.append(step(data, pids, jnp.uint32(sid0)))
        jax.block_until_ready(outs)

    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        for s in range(args.spp):
            one_pass(rep * args.spp + s + 1)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rays = total * args.spp * queries_per_sample
    rays_per_s = rays / dt

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
    }))


if __name__ == "__main__":
    main()
