"""Whitted integrator.

Reference: rustracer-core/src/integrator/whitted.rs:41-99 — emitted + per-
light unshadowed direct lighting + DETERMINISTIC specular reflect AND
transmit recursion (both branches evaluated each depth, whitted.rs:87-97 via
integrator/mod.rs specular_reflection/specular_transmission). The recursion
statically unrolls into a tree of wavefronts with ray differentials
propagated through every specular bounce, so texture filtering (EWA /
checkerboard closed-form AA) stays sharp in mirror/glass chains.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import absdot
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..scene import lights as L
from .common import trace_specular_tree, unoccluded


@dataclasses.dataclass(frozen=True)
class WhittedIntegrator:
    mat_set: object
    max_depth: int = 5

    def li(self, ctx, ray, lanes, sampler, dims):
        types = self.mat_set.types_present()
        lt = ctx.lights

        def direct(si_s, lobes, dims):
            """Every light, one sample, no MIS (whitted.rs:60-85)."""
            bs = si_s.t.shape
            total = jnp.zeros(bs + (3,), jnp.float32)
            for i in range(lt.n_lights):
                lid = jnp.full(bs, i, jnp.int32)
                u = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                   dims.next_2d())
                ls = L.sample_li(lt, ctx.geom, lid, si_s, u)
                f = B.bsdf_f(lobes, si_s, si_s.wo, ls.wi, types) * \
                    absdot(ls.wi, si_s.ns)[..., None]
                possible = (ls.pdf > 0.0) & ~is_black(ls.li) & ~is_black(f)
                vis = unoccluded(ctx.geom, si_s, ls) & possible
                pdf_safe = jnp.where(possible,
                                     jnp.maximum(ls.pdf, 1e-12), 1.0)
                total = total + jnp.where(
                    vis[..., None], f * ls.li / pdf_safe[..., None], 0.0)
            return total

        return trace_specular_tree(ctx, self.mat_set, ray, lanes, sampler,
                                   dims, self.max_depth, direct)
