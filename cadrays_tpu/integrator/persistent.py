"""Persistent wavefront: sample-staggered lane regeneration.

The fixed-depth wavefront (integrator/wavefront.render_sample) masks
retired lanes for the rest of its scan, so its average active fraction
at depth 5 is ~0.55 — nearly half of every bounce's O(R) work (sort,
shading, backward sweeps) services dead lanes. This renderer keeps the
machine full the standard wavefront way: each lane owns ONE pixel and a
per-lane quota of `spp` samples; when its path retires (miss, Russian
roulette, depth cutoff), the lane banks the sample's radiance into a
per-lane accumulator and immediately regenerates a camera ray for the
next sample id — all inside the same `lax.scan`, with the exact same
bounce physics (`render_sample`'s bounce body reads the per-lane
sid/bdepth fields, so the two paths share every shading/NEE/RR rule).

Estimator: EXACTLY `spp` samples per pixel (quota-capped, each started
sample runs to its own termination), so the mean is the same unbiased
estimator as `spp` calls to `render_sample` — only the RNG dimension
pairing differs (bounce dims are indexed by global step, not
bounce-in-sample, which keeps streams decorrelated but makes the two
paths statistically rather than bitwise equal). Lanes that finish their
quota go dead (t_max=0, sorted to the wavefront tail — near-free in the
packet kernels); `n_steps` bounds the scan, and the returned `done_cnt`
says how many samples actually completed (callers loop until the quota
is met, integrator/progressive-style, or size n_steps with slack:
average path length is ~2.7 bounces at depth 5, so
n_steps ≈ spp * 3 + depth completes ~100% on Cornell-like scenes and
~99% on glass-heavy ones — measured in
tests/test_persistent.py::test_glass_scene_completion; the sid0/done0
top-up below covers the tail exactly).

Differentiable end-to-end like render_sample (same remat policy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadrays_tpu.core import rng as crng
from cadrays_tpu.core.camera import Camera
from cadrays_tpu.integrator.params import RenderParams
from cadrays_tpu.integrator.wavefront import _DIM_PIXEL, build_wavefront
from cadrays_tpu.scene.flatten import SceneData


def render_persistent(scene: SceneData, camera: Camera,
                      params: RenderParams, width: int, height: int,
                      spp: int, n_steps: int, pixel_ids=None,
                      return_stats: bool = False, sid_base=0,
                      sid0=None, done0=None):
    """Render `spp` samples per pixel with lane regeneration.

    Returns (sum_image (R, 3), done_cnt (R,)) in pixel_ids order —
    callers divide by done_cnt (== spp when n_steps has slack).
    return_stats: also return per-step live-lane counts (n_steps,).
    sid_base: first sample id (progressive accumulation passes the
    running spp so repeated calls draw fresh samples).

    Truncation note: when n_steps runs out, samples still in flight are
    DROPPED and done_cnt reports the completed count. Because a sample's
    inclusion correlates (negatively) with its own path length, the mean
    over completed samples is slightly selection-biased toward
    short-path radiance whenever done_cnt < spp. Callers that need the
    exact spp-sample estimator must TOP-UP: pass per-lane `sid0`
    (uint32, first sample id still owed — sid_base + previous done_cnt)
    and `done0` (int32, samples already completed) and the lane restarts
    the dropped sample from scratch — unbiased, since partial radiance
    is never banked. A top-up of `m` missing samples completes with a
    hard guarantee in n_steps = m * ray_depth (every sample retires
    within ray_depth bounce steps). integrator/progressive.py does this
    automatically.
    """
    if pixel_ids is None:
        pixel_ids = jnp.arange(width * height, dtype=jnp.int32)
    R = pixel_ids.shape[0]
    seed = params.seed

    px = (pixel_ids % width).astype(jnp.float32)
    py = (pixel_ids // width).astype(jnp.float32)

    def camera_rays(pix, sid):
        jx, jy, ul0, ul1 = crng.sample4(pix, sid, _DIM_PIXEL, seed)
        pxx = (pix % width).astype(jnp.float32)
        pyy = (pix // width).astype(jnp.float32)
        return camera.generate_rays(pxx + jx, pyy + jy, ul0, ul1,
                                    width, height)

    sid_base = jnp.asarray(sid_base, jnp.uint32)
    sid_limit = sid_base + jnp.uint32(spp)
    state, bounce_fn = build_wavefront(scene, camera, params, width,
                                       height, sid_base, pixel_ids)
    if sid0 is not None:
        # Top-up entry: lanes resume at per-lane sample ids. Lanes whose
        # quota is already met start dead (t_max=0 → sorted to the tail).
        sid0 = jnp.asarray(sid0, jnp.uint32)
        done0 = jnp.zeros((R,), jnp.int32) if done0 is None \
            else jnp.asarray(done0, jnp.int32)
        resumed = sid0 != sid_base
        o0, d0 = camera_rays(state["pix"], sid0)
        w = resumed[..., None]
        state = dict(
            state,
            origin=jnp.where(w, o0, state["origin"]),
            direction=jnp.where(w, d0, state["direction"]),
            alive=sid0 < sid_limit,
            sid=sid0,
            done_cnt=done0,
        )

    def step(carry, t):
        st = carry
        st2, n_alive = bounce_fn(st, t)

        # ---- retire + regenerate ---------------------------------------
        died = ~st2["alive"]
        in_flight = st2["sid"] < sid_limit
        retire = died & in_flight & (st2["done_cnt"] < spp)
        # per-sample radiance clamping at banking time — identical to
        # render_sample's post-scan clamp (SettingsWidget.cxx:318-326)
        clamp = jnp.maximum(params.radiance_clamp, 1.0)
        rad = st2["radiance"]
        peak = jnp.max(rad, axis=-1, keepdims=True)
        rad = rad * jnp.where(peak > clamp,
                              clamp / jnp.maximum(peak, 1e-12), 1.0)
        done_sum = st2["done_sum"] + jnp.where(retire[..., None], rad, 0.0)
        done_cnt = st2["done_cnt"] + retire.astype(jnp.int32)

        next_sid = st2["sid"] + 1
        regen = retire & (next_sid < sid_limit)
        o_new, d_new = camera_rays(st2["pix"], next_sid)

        w = regen[..., None]
        st3 = dict(
            origin=jnp.where(w, o_new, st2["origin"]),
            direction=jnp.where(w, d_new, st2["direction"]),
            throughput=jnp.where(w, 1.0, st2["throughput"]),
            radiance=jnp.where(w, 0.0, st2["radiance"]),
            alive=st2["alive"] | regen,
            prev_pdf=jnp.where(regen, 0.0, st2["prev_pdf"]),
            prev_delta=st2["prev_delta"] | regen,
            sigma=jnp.where(w, 0.0, st2["sigma"]),
            pix=st2["pix"],
            lane=st2["lane"],
            sid=jnp.where(retire, next_sid, st2["sid"]),
            bdepth=jnp.where(regen, 0, st2["bdepth"]),
            done_sum=done_sum,
            done_cnt=done_cnt,
        )
        return st3, n_alive

    state, n_alive = jax.lax.scan(
        step, state, jnp.arange(n_steps), length=n_steps)

    # Bank any sample still in flight? No — quota samples must COMPLETE;
    # in-flight radiance at cutoff is dropped and done_cnt reports the
    # true count, keeping every counted sample unbiased.
    sum_img = jnp.zeros((R, 3), jnp.float32).at[state["lane"]].set(
        state["done_sum"])
    cnt = jnp.zeros((R,), jnp.int32).at[state["lane"]].set(
        state["done_cnt"])
    if sid0 is not None:
        # report NEW completions only (done_sum holds only new radiance)
        cnt = cnt - done0
    sum_img = jnp.nan_to_num(sum_img, nan=0.0, posinf=0.0, neginf=0.0)
    if return_stats:
        return sum_img, cnt, n_alive
    return sum_img, cnt
