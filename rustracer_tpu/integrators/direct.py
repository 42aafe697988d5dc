"""Direct-lighting integrator.

Reference: rustracer-core/src/integrator/directlighting.rs:17-144 —
strategies UniformSampleAll / UniformSampleOne with MIS estimate_direct,
plus the shared specular recursion (flattened, as in whitted.py).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import absdot
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..scene import lights as L
from ..scene.tables import scene_intersect
from .common import uniform_sample_all_lights, uniform_sample_one_light


@dataclasses.dataclass(frozen=True)
class DirectLightingIntegrator:
    mat_set: object
    strategy: str = "all"      # "all" | "one"
    max_depth: int = 5

    def li(self, ctx, ray, lanes, sampler, dims):
        bs = ray.t_max.shape
        Lrad = jnp.zeros(bs + (3,), jnp.float32)
        beta = jnp.ones(bs + (3,), jnp.float32)
        alive = jnp.ones(bs, bool)
        lt = ctx.lights
        types = self.mat_set.types_present()

        for depth in range(self.max_depth):
            si = scene_intersect(ctx.geom, ray)
            if depth == 0:
                from ..core.interaction import compute_differentials
                si = compute_differentials(si, ray)
            le_esc = L.infinite_le(lt, ray.d)
            Lrad = Lrad + jnp.where((alive & ~si.valid)[..., None],
                                    beta * le_esc, 0.0)
            alive = alive & si.valid & (si.material >= 0)
            le = L.arealight_le(lt, si.arealight, si.n, si.wo)
            Lrad = Lrad + jnp.where(alive[..., None], beta * le, 0.0)

            si_s, lobes = self.mat_set.shade(si, ctx)
            lobes = lobes._replace(active=lobes.active & alive[..., None])
            if self.strategy == "all":
                ld = uniform_sample_all_lights(ctx, self.mat_set, si_s, lobes,
                                               sampler, lanes, dims)
            else:
                ld = uniform_sample_one_light(ctx, self.mat_set, si_s, lobes,
                                              sampler, lanes, dims)
            Lrad = Lrad + jnp.where(alive[..., None], beta * ld, 0.0)

            if depth == self.max_depth - 1:
                break
            u_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx,
                                    dims.next_1d())
            u2 = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                dims.next_2d())
            wi, f, pdf, flags, ok = B.bsdf_sample_f(
                lobes, si_s, si_s.wo, u_lobe, u2, types,
                flags=B.SPECULAR | B.REFLECTION | B.TRANSMISSION)
            contrib = f * (absdot(wi, si_s.ns) / jnp.maximum(pdf, 1e-12))[..., None]
            alive = alive & ok & ~is_black(f) & (pdf > 0.0)
            beta = jnp.where(alive[..., None], beta * contrib, beta)
            ray = si_s.spawn_ray(wi)
        return Lrad
