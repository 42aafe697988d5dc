"""Path integrator: iterative NEE+MIS path tracing over masked wavefronts.

Reference: rustracer-core/src/integrator/path.rs:96-216. The per-sample
recursion becomes a statically-unrolled bounce loop over SoA lane state
{ray, beta, alive, specular_bounce, eta_scale} — dead lanes are masked, not
compacted (compaction via sorting is a later optimization; see SURVEY §7).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import absdot
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..scene import lights as L
from ..scene.tables import scene_intersect
from .common import sample_one_light


@dataclasses.dataclass(frozen=True)
class PathIntegrator:
    mat_set: object
    max_depth: int = 5
    rr_threshold: float = 1.0

    def li(self, ctx, ray, lanes, sampler, dims):
        return self._run(ctx, ray, lanes, sampler, dims)[0]

    def li_aux(self, ctx, ray, lanes, sampler, dims):
        """li plus per-lane auxiliary stats (path length — the bounce count
        the reference's path.rs:18-19 int-distribution reports)."""
        return self._run(ctx, ray, lanes, sampler, dims)

    def tests_per_lane(self):
        """Static intersection-test call counts per camera-ray lane in the
        wavefront model (every lane executes every test): per bounce one
        closest hit; per NEE one shadow probe + one BSDF-side closest hit
        (reference counters scene.rs:9-20)."""
        d = self.max_depth
        return {"regular": 2 * d - 1, "shadow": d - 1}

    def _run(self, ctx, ray, lanes, sampler, dims):
        types = self.mat_set.types_present()
        bs = ray.t_max.shape
        Lrad = jnp.zeros(bs + (3,), jnp.float32)
        beta = jnp.ones(bs + (3,), jnp.float32)
        eta_scale = jnp.ones(bs, jnp.float32)
        alive = jnp.ones(bs, bool)
        specular_bounce = jnp.zeros(bs, bool)
        path_len = jnp.zeros(bs, jnp.int32)

        for bounce in range(self.max_depth):
            si = scene_intersect(ctx.geom, ray)
            si = si._replace(valid=si.valid & alive)

            # emitted radiance on first/specular bounces (path.rs:127-136)
            if bounce == 0:
                from ..core.interaction import compute_differentials
                si = compute_differentials(si, ray)
                add_emit = alive
            else:
                add_emit = alive & specular_bounce
            le_hit = L.arealight_le(ctx.lights, si.arealight, si.n, si.wo)
            le_hit = jnp.where((si.valid & add_emit)[..., None], le_hit, 0.0)
            le_esc = L.infinite_le(ctx.lights, ray.d)
            le_esc = jnp.where((~si.valid & alive & add_emit)[..., None],
                               le_esc, 0.0)
            Lrad = Lrad + beta * (le_hit + le_esc)

            alive = alive & si.valid & (si.material >= 0)
            path_len = path_len + alive.astype(jnp.int32)
            if bounce == self.max_depth - 1:
                break

            si_s, lobes = self.mat_set.shade(si, ctx)
            lobes = lobes._replace(active=lobes.active & alive[..., None])

            # NEE (path.rs:154-169); skip if only specular lobes
            n_nonspec = B.num_matching(lobes, B.ALL & ~B.SPECULAR)
            ld = sample_one_light(ctx, self.mat_set, si_s, lobes,
                                  sampler, lanes, dims)
            Lrad = Lrad + jnp.where((alive & (n_nonspec > 0))[..., None],
                                    beta * ld, 0.0)

            # BSDF sampling for the next bounce (path.rs:172-196)
            u_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx,
                                    dims.next_1d())
            u2 = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                dims.next_2d())
            wi, f, pdf, flags, ok = B.bsdf_sample_f(lobes, si_s, si_s.wo,
                                                    u_lobe, u2, types)
            contrib = f * (absdot(wi, si_s.ns) /
                           jnp.maximum(pdf, 1e-12))[..., None]
            alive = alive & ok & ~is_black(f) & (pdf > 0.0)
            beta = jnp.where(alive[..., None], beta * contrib, beta)
            specular_bounce = (flags & B.SPECULAR) != 0
            is_spec_trans = specular_bounce & ((flags & B.TRANSMISSION) != 0)
            from ..core.math import dot
            eta = lobes.eta
            entering = dot(si_s.wo, si_s.ns) > 0.0
            eta_scale = jnp.where(
                is_spec_trans,
                eta_scale * jnp.where(entering, eta * eta,
                                      1.0 / jnp.maximum(eta * eta, 1e-8)),
                eta_scale)
            ray = si_s.spawn_ray(wi)
            # dead lanes must not traverse (their wi is garbage and can
            # stretch the lockstep BVH loop arbitrarily)
            ray = ray._replace(t_max=jnp.where(alive, ray.t_max, 0.0))

            # Russian roulette (path.rs:199-209)
            if bounce > 3:
                rr_beta_max = jnp.max(beta * eta_scale[..., None], axis=-1)
                q = jnp.maximum(0.05, 1.0 - rr_beta_max)
                u_rr = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx,
                                      dims.next_1d())
                do_rr = rr_beta_max < self.rr_threshold
                killed = do_rr & (u_rr < q)
                alive = alive & ~killed
                beta = jnp.where((do_rr & alive)[..., None],
                                 beta / jnp.maximum(1.0 - q, 1e-3)[..., None],
                                 beta)

        return Lrad, path_len
