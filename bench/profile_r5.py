#!/usr/bin/env python
"""Round-5 per-step breakdown of the persistent bench config.

Slope-timed (N vs 1 chained steps inside one jit — the tunnel makes
per-call timing meaningless) component A/Bs:

  full         one persistent bounce step (fwd), the production config
  nosort       same with sort_rays=False      -> sort cost by difference
  closest      the closest-hit launch alone on frozen realistic state
  shadow3      the fused 3R any-hit launch alone
  fwd+bwd      grad through K chained steps   -> backward by difference

Realistic state: run the real persistent scan for `warm` steps at the
bench config, freeze the state, and drive the A/B steps from it (ray
mix = production mix: sorted bounce rays + regen camera rays + dead
tail).
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
    from cadrays_tpu.ops.traverse import trace
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    depth = 5
    INF = jnp.float32(3e30)
    out = {}

    def make_stepper(params):
        st0, bounce_fn = build_wavefront(
            data, cam, params, W, H, jnp.uint32(0), pids)

        def persistent_step(st, t, spp=32):
            # regen identical to integrator/persistent.py (trimmed)
            st2, n_alive = bounce_fn(st, t)
            died = ~st2["alive"]
            retire = died & (st2["sid"] < spp) & (st2["done_cnt"] < spp)
            done_sum = st2["done_sum"] + jnp.where(
                retire[..., None], st2["radiance"], 0.0)
            next_sid = st2["sid"] + 1
            regen = retire & (next_sid < spp)
            w = regen[..., None]
            from cadrays_tpu.core import rng as crng
            from cadrays_tpu.integrator.wavefront import _DIM_PIXEL
            jx, jy, u0, u1 = crng.sample4(st2["pix"], next_sid, _DIM_PIXEL,
                                          params.seed)
            px = (st2["pix"] % W).astype(jnp.float32)
            py = (st2["pix"] // W).astype(jnp.float32)
            o_new, d_new = cam.generate_rays(px + jx, py + jy, u0, u1, W, H)
            return dict(
                st2,
                origin=jnp.where(w, o_new, st2["origin"]),
                direction=jnp.where(w, d_new, st2["direction"]),
                throughput=jnp.where(w, 1.0, st2["throughput"]),
                radiance=jnp.where(w, 0.0, st2["radiance"]),
                alive=st2["alive"] | regen,
                sid=jnp.where(retire, next_sid, st2["sid"]),
                bdepth=jnp.where(regen, 0, st2["bdepth"]),
                done_sum=done_sum,
                done_cnt=st2["done_cnt"] + retire.astype(jnp.int32),
            ), n_alive
        return st0, persistent_step

    params = RenderParams(ray_depth=depth)
    st0, step = make_stepper(params)

    # warm the state to the steady-state ray mix
    @jax.jit
    def warm(st):
        def body(c, t):
            c2, _ = step(c, t)
            return c2, None
        st, _ = jax.lax.scan(body, st, jnp.arange(12), length=12)
        return st

    st_warm = jax.tree.map(jnp.copy, warm(st0))
    n_live = int(jnp.sum(st_warm["alive"].astype(jnp.int32)))
    print(f"warm state: {n_live}/{R} live", flush=True)

    def chained(fn):
        """fn(state)->state; time per application."""
        def make(n):
            @jax.jit
            def run():
                def body(c, t):
                    return fn(c), None
                c, _ = jax.lax.scan(body, st_warm, jnp.arange(n), length=n)
                return jnp.sum(c["radiance"]) + jnp.sum(
                    c["origin"]) * 1e-30
            return run
        return make

    # --- full fwd step -----------------------------------------------
    out["fwd_step"] = slope(chained(lambda c: step(c, 3)[0]))
    print("fwd_step", out["fwd_step"], flush=True)

    # --- no-sort step ------------------------------------------------
    _, step_ns = make_stepper(RenderParams(ray_depth=depth,
                                           sort_rays=False))
    out["fwd_step_nosort"] = slope(chained(lambda c: step_ns(c, 3)[0]))
    print("fwd_step_nosort", out["fwd_step_nosort"], flush=True)

    # --- traversal launches on the frozen state ----------------------
    o, d = st_warm["origin"], st_warm["direction"]
    tm = jnp.where(st_warm["alive"], INF, 0.0)

    def closest_once(c):
        res = trace(data.geometry, c["origin"], c["direction"],
                    jnp.where(c["alive"], INF, 0.0))
        return dict(c, origin=c["origin"] + res["t"][:, None] * 1e-30)
    out["closest"] = slope(chained(closest_once))
    print("closest", out["closest"], flush=True)

    def shadow_once(c):
        o3 = jnp.concatenate([c["origin"]] * 3, axis=0)
        d3 = jnp.concatenate([c["direction"]] * 3, axis=0)
        t3 = jnp.concatenate([jnp.where(c["alive"], INF, 0.0)] * 3, axis=0)
        occ = trace(data.geometry, o3, d3, t3, any_hit=True)["tri"] >= 0
        return dict(c, origin=c["origin"]
                    + occ[:R].astype(jnp.float32)[:, None] * 1e-30)
    out["shadow3"] = slope(chained(shadow_once))
    print("shadow3", out["shadow3"], flush=True)

    # --- fwd+bwd -----------------------------------------------------
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
    out["fwdbwd_step"] = slope(make_bwd)
    print("fwdbwd_step", out["fwdbwd_step"], flush=True)

    out["derived"] = {
        "sort_cost_fwd": out["fwd_step"] - out["fwd_step_nosort"],
        "traversal_fwd": out["closest"] + out["shadow3"],
        "elementwise_fwd": (out["fwd_step_nosort"] - out["closest"]
                            - out["shadow3"]),
        "backward": out["fwdbwd_step"] - out["fwd_step"],
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(__file__),
                           "profile_r5.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
