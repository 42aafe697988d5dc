"""Normal (debug) integrator: grey(|d . ns|).

Reference: rustracer-core/src/integrator/normal.rs:20-34.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import absdot
from ..scene.tables import scene_intersect


@dataclasses.dataclass(frozen=True)
class NormalIntegrator:
    mat_set: object = None

    def li(self, ctx, ray, lanes, sampler, dims):
        return li(ctx, ray, lanes, sampler, dims, mat_set=self.mat_set)


def li(ctx, ray, lanes, sampler, dims, mat_set=None):
    si = scene_intersect(ctx.geom, ray)
    if mat_set is not None:
        si, _ = mat_set.shade(si, ctx)   # bump-mapped shading normal
    v = absdot(ray.d, si.ns)
    v = jnp.where(si.valid, v, 0.0)
    return jnp.stack([v, v, v], axis=-1)
