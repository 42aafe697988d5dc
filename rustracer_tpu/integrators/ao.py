"""Ambient-occlusion integrator.

Reference: rustracer-core/src/integrator/ao.rs:32-58 — n_samples
cosine-weighted hemisphere occlusion probes from the first hit.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import face_forward
from ..core.sampling import cosine_sample_hemisphere
from ..scene.tables import scene_intersect, scene_intersect_p


def li(ctx, ray, lanes, sampler, dims, n_samples=16):
    si = scene_intersect(ctx.geom, ray)
    n = face_forward(si.ns, si.wo)
    occ = jnp.zeros_like(si.t)
    for _ in range(n_samples):
        u = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
        w_local = cosine_sample_hemisphere(u)
        w = w_local[..., 0, None] * si.ss + w_local[..., 1, None] * si.ts \
            + w_local[..., 2, None] * n
        shadow = si.spawn_ray(w)
        blocked = scene_intersect_p(ctx.geom, shadow)
        occ = occ + jnp.where(blocked, 0.0, 1.0)
    v = jnp.where(si.valid, occ / n_samples, 0.0)
    return jnp.stack([v, v, v], axis=-1)
