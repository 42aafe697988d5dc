"""Ambient-occlusion integrator.

Reference: rustracer-core/src/integrator/ao.rs:32-58 — n_samples
cosine-weighted hemisphere occlusion probes from the first hit.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import face_forward
from ..core.sampling import cosine_sample_hemisphere
from ..scene.tables import scene_intersect, scene_intersect_p


@dataclasses.dataclass(frozen=True)
class AOIntegrator:
    """Class form with material plumbing: bump-mapped shading normals
    shift the occlusion hemisphere exactly as the reference's
    compute_scattering_functions does before ao.rs:32-58 probes."""
    mat_set: object = None
    n_samples: int = 16

    def li(self, ctx, ray, lanes, sampler, dims):
        return li(ctx, ray, lanes, sampler, dims, n_samples=self.n_samples,
                  mat_set=self.mat_set)


def li(ctx, ray, lanes, sampler, dims, n_samples=16, mat_set=None):
    si = scene_intersect(ctx.geom, ray)
    if mat_set is not None:
        si, _ = mat_set.shade(si, ctx)   # bump-mapped ns/ss/ts
    n = face_forward(si.ns, si.wo)
    occ = jnp.zeros_like(si.t)
    for _ in range(n_samples):
        u = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
        w_local = cosine_sample_hemisphere(u)
        w = w_local[..., 0, None] * si.ss + w_local[..., 1, None] * si.ts \
            + w_local[..., 2, None] * n
        shadow = si.spawn_ray(w)
        shadow = shadow._replace(t_max=jnp.where(si.valid, shadow.t_max, 0.0))
        blocked = scene_intersect_p(ctx.geom, shadow)
        occ = occ + jnp.where(blocked, 0.0, 1.0)
    v = jnp.where(si.valid, occ / n_samples, 0.0)
    return jnp.stack([v, v, v], axis=-1)
