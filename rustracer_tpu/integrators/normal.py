"""Normal (debug) integrator: grey(|d . ns|).

Reference: rustracer-core/src/integrator/normal.rs:20-34.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import absdot
from ..scene.tables import scene_intersect


def li(ctx, ray, lanes, sampler, dims):
    si = scene_intersect(ctx.geom, ray)
    v = absdot(ray.d, si.ns)
    v = jnp.where(si.valid, v, 0.0)
    return jnp.stack([v, v, v], axis=-1)
