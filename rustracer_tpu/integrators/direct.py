"""Direct-lighting integrator.

Reference: rustracer-core/src/integrator/directlighting.rs:17-144 —
strategies UniformSampleAll / UniformSampleOne with MIS estimate_direct,
plus the shared deterministic specular reflect/transmit recursion
(integrator/mod.rs:49-142) with ray-differential propagation.
"""
from __future__ import annotations

import dataclasses

from .common import (trace_specular_tree, uniform_sample_all_lights,
                     uniform_sample_one_light)


@dataclasses.dataclass(frozen=True)
class DirectLightingIntegrator:
    mat_set: object
    strategy: str = "all"      # "all" | "one"
    max_depth: int = 5
    # static per-light sample counts aligned with the light-table rows
    # (diffuse.rs:46-50 "samples"); () → one sample per light
    light_nsamples: tuple = ()

    def li(self, ctx, ray, lanes, sampler, dims):
        def direct(si_s, lobes, dims):
            if self.strategy == "all":
                return uniform_sample_all_lights(ctx, self.mat_set, si_s,
                                                 lobes, sampler, lanes, dims,
                                                 self.light_nsamples or None)
            return uniform_sample_one_light(ctx, self.mat_set, si_s, lobes,
                                            sampler, lanes, dims)

        return trace_specular_tree(ctx, self.mat_set, ray, lanes, sampler,
                                   dims, self.max_depth, direct)
