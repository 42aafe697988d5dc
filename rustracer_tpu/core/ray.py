"""SoA ray batches.

Reference: rustracer-core/src/ray.rs. A Ray batch is a NamedTuple of
(..., 3) / (...) arrays — the wavefront unit flowing through all kernels.
Differentials (reference RayDifferential) are carried as optional extra
fields; `has_differentials` is a static bool at trace time.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .math import INFINITY


class Ray(NamedTuple):
    o: jnp.ndarray          # (..., 3)
    d: jnp.ndarray          # (..., 3)
    t_max: jnp.ndarray      # (...)
    # differentials (zeros when not tracked)
    rx_origin: Optional[jnp.ndarray] = None
    rx_direction: Optional[jnp.ndarray] = None
    ry_origin: Optional[jnp.ndarray] = None
    ry_direction: Optional[jnp.ndarray] = None

    def at(self, t):
        return self.o + t[..., None] * self.d

    @property
    def has_differentials(self):
        return self.rx_origin is not None

    def scaled_differentials(self, s):
        """Scale differentials for spp>1 (reference ray.rs scale_differentials)."""
        if not self.has_differentials:
            return self
        return self._replace(
            rx_origin=self.o + (self.rx_origin - self.o) * s,
            ry_origin=self.o + (self.ry_origin - self.o) * s,
            rx_direction=self.d + (self.rx_direction - self.d) * s,
            ry_direction=self.d + (self.ry_direction - self.d) * s,
        )


def make_ray(o, d, t_max=None):
    if t_max is None:
        t_max = jnp.full(o.shape[:-1], INFINITY, o.dtype)
    return Ray(o=o, d=d, t_max=t_max)
