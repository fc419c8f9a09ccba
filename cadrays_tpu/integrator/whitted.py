"""Whitted ray tracing and rasterization-preview modes.

Contract: the reference's render-mode switch offers GI (path tracing),
RT (Whitted ray tracing with toggles for shadows / specular reflections /
depth 1-10) and OpenGL rasterization (SettingsWidget.cxx:261-302,
575-618). The TPU equivalents share the scene/material/traversal stack
with the GI integrator:

* RT: deterministic primary + mirror-reflection chain (`lax.scan` over
  depth), direct lighting with optional shadow rays, no randomness.
* RASTER: one primary hit, Lambert + Blinn-style direct shading, no
  shadow rays — the "preview" mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadrays_tpu.core import vecmath as vm
from cadrays_tpu.core.bsdf import eval_bsdf
from cadrays_tpu.core.camera import Camera
from cadrays_tpu.core.fresnel import eval_fresnel
from cadrays_tpu.core.lights import LIGHT_DIRECTIONAL
from cadrays_tpu.integrator.params import RenderParams
from cadrays_tpu.ops import envmap as envops
from cadrays_tpu.ops.hit import hit_attributes
from cadrays_tpu.ops.intersect import INF, offset_ray_origin
from cadrays_tpu.ops.texture import sample_texture
from cadrays_tpu.ops.traverse import trace
from cadrays_tpu.scene.flatten import SceneData


def _direct_lighting(scene: SceneData, h, wo, mat, params: RenderParams,
                     shadows: bool):
    """Sum direct contributions of every analytic light (no sampling)."""
    R = h["t"].shape[0]
    n = h["n_shade"]
    total = jnp.zeros((R, 3), jnp.float32)
    L = scene.lights.count
    for li in range(L):
        lt = scene.lights.gather(jnp.full((R,), li, jnp.int32))
        is_dir = lt.kind == LIGHT_DIRECTIONAL
        to_l_dir = -lt.vec
        to_c = lt.vec - h["position"]
        d2 = jnp.maximum(vm.dot(to_c, to_c), 1e-12)
        dist = jnp.sqrt(d2)
        wi = jnp.where(is_dir[..., None], vm.normalize(to_l_dir),
                       to_c / dist[..., None])
        falloff = jnp.where(is_dir, 1.0, 1.0 / d2)
        radiant = lt.color * (lt.intensity * lt.enabled * falloff)[..., None]
        f, _ = eval_bsdf(mat, wo, wi, n)
        cos_i = jnp.clip(vm.dot(wi, n), 0.0, 1.0)
        contrib = radiant * f * cos_i[..., None]
        if shadows:
            t_shadow = jnp.where(is_dir, INF, dist * (1.0 - 1e-4))
            occ = trace(
                scene.geometry,
                offset_ray_origin(h["position"], h["n_geom"], wi),
                wi, jnp.where(h["hit"] & (cos_i > 0), t_shadow, 0.0),
                any_hit=True,
            )["tri"] >= 0
            contrib = jnp.where(occ[..., None], 0.0, contrib)
        total = total + contrib
    return total


def render_whitted(scene: SceneData, camera: Camera, params: RenderParams,
                   width: int, height: int):
    """Deterministic Whitted pass -> (H*W, 3) radiance."""
    pixel_ids = jnp.arange(width * height, dtype=jnp.int32)
    px = (pixel_ids % width).astype(jnp.float32) + 0.5
    py = (pixel_ids // width).astype(jnp.float32) + 0.5
    z = jnp.zeros_like(px)
    origin, direction = camera.generate_rays(px - 0.5, py - 0.5, z, z,
                                             width, height)
    R = origin.shape[0]

    state = dict(
        origin=origin, direction=direction,
        throughput=jnp.ones((R, 3), jnp.float32),
        radiance=jnp.zeros((R, 3), jnp.float32),
        alive=jnp.ones((R,), bool),
    )
    depth = params.ray_depth if params.rt_reflections else 1

    def step(state, bounce):
        o, d = state["origin"], state["direction"]
        res = trace(scene.geometry, o, d, jnp.full((R,), INF))
        h = hit_attributes(scene.geometry, o, d, res["tri"])
        hit = h["hit"] & state["alive"]
        miss = (~h["hit"]) & state["alive"]
        throughput = state["throughput"]
        radiance = state["radiance"]

        if scene.envmap.enabled and scene.envmap.background:
            env = envops.eval_env(scene.envmap, d)
            radiance = radiance + jnp.where(miss[..., None],
                                            throughput * env, 0.0)
        else:
            radiance = radiance + jnp.where(
                miss[..., None] & (bounce == 0),
                throughput * params.background_color, 0.0)

        mat = scene.materials.gather(h["mat_id"])
        tex = sample_texture(scene.textures, mat.tex_id, h["uv"], mat.uv_scale)
        mat = mat.replace(kd=mat.kd * tex)
        wo = -d

        direct = _direct_lighting(scene, h, wo, mat, params,
                                  shadows=params.rt_shadows)
        radiance = radiance + jnp.where(hit[..., None],
                                        throughput * (direct + mat.le), 0.0)

        # Mirror bounce weighted by Ks * Fresnel.
        n = h["n_shade"]
        cos_o = jnp.clip(vm.dot(wo, n), 1e-6, 1.0)
        fb = eval_fresnel(mat.base_ftype, mat.base_fparams, cos_o)
        refl = mat.ks * fb
        new_dir = vm.normalize(vm.reflect(d, n))
        alive = hit & (vm.luminance(refl) > 1e-3) if params.rt_reflections \
            else jnp.zeros((R,), bool)
        return dict(
            origin=offset_ray_origin(h["position"], h["n_geom"], new_dir),
            direction=new_dir,
            throughput=jnp.where(alive[..., None], throughput * refl, 0.0),
            radiance=radiance,
            alive=alive,
        ), None

    state, _ = jax.lax.scan(step, state, jnp.arange(depth), length=depth)
    return jnp.nan_to_num(state["radiance"], nan=0.0, posinf=0.0, neginf=0.0)


def render_raster(scene: SceneData, camera: Camera, params: RenderParams,
                  width: int, height: int):
    """Rasterization-style preview: primary hit + unshadowed direct shading."""
    p = params.replace(rt_shadows=False, rt_reflections=False)
    return render_whitted(scene, camera, p, width, height)
