"""Whitted integrator.

Reference: rustracer-core/src/integrator/whitted.rs:41-99 — emitted + per-
light unshadowed direct lighting + specular reflect/transmit recursion. The
recursion is flattened to a masked bounce loop; at each depth the specular
continuation is sampled from the specular lobes (FresnelSpecular picks
reflect/transmit by Fresnel weight), which is an unbiased estimator of the
deterministic two-branch recursion.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import absdot
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..scene import lights as L
from ..scene.tables import scene_intersect
from .common import unoccluded


@dataclasses.dataclass(frozen=True)
class WhittedIntegrator:
    mat_set: object
    max_depth: int = 5

    def li(self, ctx, ray, lanes, sampler, dims):
        types = self.mat_set.types_present()
        bs = ray.t_max.shape
        Lrad = jnp.zeros(bs + (3,), jnp.float32)
        beta = jnp.ones(bs + (3,), jnp.float32)
        alive = jnp.ones(bs, bool)
        lt = ctx.lights

        for depth in range(self.max_depth):
            si = scene_intersect(ctx.geom, ray)
            if depth == 0:
                from ..core.interaction import compute_differentials
                si = compute_differentials(si, ray)
            # escaped: sum of infinite light le (whitted.rs early-out)
            le_esc = L.infinite_le(lt, ray.d)
            Lrad = Lrad + jnp.where((alive & ~si.valid)[..., None],
                                    beta * le_esc, 0.0)
            alive = alive & si.valid & (si.material >= 0)

            # emitted at the hit
            le = L.arealight_le(lt, si.arealight, si.n, si.wo)
            Lrad = Lrad + jnp.where(alive[..., None], beta * le, 0.0)

            si_s, lobes = self.mat_set.shade(si, ctx)
            lobes = lobes._replace(active=lobes.active & alive[..., None])

            # direct lighting: every light, one sample, no MIS (whitted.rs:60-85)
            for i in range(lt.n_lights):
                lid = jnp.full(bs, i, jnp.int32)
                u = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                   dims.next_2d())
                ls = L.sample_li(lt, ctx.geom, lid, si_s, u)
                f = B.bsdf_f(lobes, si_s, si_s.wo, ls.wi, types) * \
                    absdot(ls.wi, si_s.ns)[..., None]
                possible = alive & (ls.pdf > 0.0) & ~is_black(ls.li) & ~is_black(f)
                vis = unoccluded(ctx.geom, si_s, ls) & possible
                Lrad = Lrad + jnp.where(
                    vis[..., None],
                    beta * f * ls.li / jnp.maximum(ls.pdf, 1e-12)[..., None],
                    0.0)

            if depth == self.max_depth - 1:
                break
            # specular continuation (whitted.rs:87-97)
            u_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx,
                                    dims.next_1d())
            u2 = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                dims.next_2d())
            wi, f, pdf, flags, ok = B.bsdf_sample_f(
                lobes, si_s, si_s.wo, u_lobe, u2, types, flags=B.SPECULAR | B.REFLECTION | B.TRANSMISSION)
            contrib = f * (absdot(wi, si_s.ns) / jnp.maximum(pdf, 1e-12))[..., None]
            alive = alive & ok & ~is_black(f) & (pdf > 0.0)
            beta = jnp.where(alive[..., None], beta * contrib, beta)
            ray = si_s.spawn_ray(wi)
        return Lrad
