"""SurfaceInteraction as a SoA batch.

Reference: rustracer-core/src/interaction.rs. One NamedTuple of arrays per
wavefront; `valid` masks lanes that missed. Shading geometry, texture
differentials and spawned rays are computed by pure helpers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math import (INFINITY, coordinate_system, cross, dot, face_forward,
                   normalize, offset_ray_origin)
from .ray import Ray


class Interaction(NamedTuple):
    valid: jnp.ndarray        # (...) bool — did the ray hit anything
    t: jnp.ndarray            # (...)
    p: jnp.ndarray            # (..., 3)
    p_error: jnp.ndarray      # (..., 3)
    wo: jnp.ndarray           # (..., 3)
    n: jnp.ndarray            # (..., 3) geometric normal
    uv: jnp.ndarray           # (..., 2)
    dpdu: jnp.ndarray         # (..., 3)
    dpdv: jnp.ndarray         # (..., 3)
    ns: jnp.ndarray           # (..., 3) shading normal
    ss: jnp.ndarray           # (..., 3) shading tangent
    ts: jnp.ndarray           # (..., 3) shading bitangent
    material: jnp.ndarray     # (...) int32 material id (-1 = none)
    arealight: jnp.ndarray    # (...) int32 area-light id (-1 = none)
    prim_id: jnp.ndarray      # (...) int32 global primitive id
    # texture differentials (zeros without ray differentials)
    dudx: jnp.ndarray
    dvdx: jnp.ndarray
    dudy: jnp.ndarray
    dvdy: jnp.ndarray
    dpdx: jnp.ndarray         # (..., 3)
    dpdy: jnp.ndarray         # (..., 3)
    # shading-normal derivatives (interaction.rs shading.dndu/dndv) — drive
    # specular ray-differential propagation (integrator/mod.rs:49-142)
    dndu: jnp.ndarray = None  # (..., 3)
    dndv: jnp.ndarray = None  # (..., 3)

    def spawn_ray(self, d):
        """Robustly offset a new ray (reference interaction.rs:205)."""
        o = offset_ray_origin(self.p, self.p_error, self.n, d)
        return Ray(o=o, d=d, t_max=jnp.full(self.t.shape, INFINITY, jnp.float32))

    def spawn_ray_to(self, p_target, target_error=None, target_n=None):
        """Shadow ray toward a point; t_max short of the target
        (reference light/mod.rs VisibilityTester + interaction.rs spawn_ray_to)."""
        d = p_target - self.p
        o = offset_ray_origin(self.p, self.p_error, self.n, d)
        if target_n is not None and target_error is not None:
            p_t = offset_ray_origin(p_target, target_error, target_n, o - p_target)
        else:
            p_t = p_target
        d = p_t - o
        return Ray(o=o, d=d, t_max=jnp.full(self.t.shape, 1.0 - 1e-3, jnp.float32))


def make_shading_frame(n, dpdu):
    """Orthonormal shading frame with z = n, x ≈ dpdu (bsdf/mod.rs:253)."""
    ss = normalize(dpdu - dot(dpdu, n)[..., None] * n)
    degenerate = jnp.sum(ss * ss, axis=-1) < 1e-12
    fb_u, _ = coordinate_system(n)
    ss = jnp.where(degenerate[..., None], fb_u, ss)
    ts = cross(n, ss)
    return ss, ts


def compute_differentials(si: Interaction, ray: Ray) -> Interaction:
    """Forward-difference texture differentials (interaction.rs
    compute_differentials / PBRT 10.1.1): intersect the x/y offset rays with
    the tangent plane at p and solve the 2x2 system for du/dv."""
    if not ray.has_differentials:
        return si
    n, p = si.n, si.p
    d_dot = lambda o, d: (dot(n, p) - dot(n, o)) / jnp.where(dot(n, d) == 0.0, 1.0, dot(n, d))
    tx = d_dot(ray.rx_origin, ray.rx_direction)
    ty = d_dot(ray.ry_origin, ray.ry_direction)
    px = ray.rx_origin + tx[..., None] * ray.rx_direction
    py = ray.ry_origin + ty[..., None] * ray.ry_direction
    dpdx = px - p
    dpdy = py - p
    # pick the two dims where the normal is smallest
    an = jnp.abs(n)
    # dim indices: drop argmax of |n|
    k = jnp.argmax(an, axis=-1)
    d0 = jnp.where(k == 0, 1, 0)
    d1 = jnp.where(k == 2, 1, 2)
    take = lambda v, i: jnp.take_along_axis(v, i[..., None], axis=-1)[..., 0]
    a00 = take(si.dpdu, d0)
    a01 = take(si.dpdv, d0)
    a10 = take(si.dpdu, d1)
    a11 = take(si.dpdv, d1)
    det = a00 * a11 - a01 * a10
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)

    def solve(b0, b1):
        x0 = (a11 * b0 - a01 * b1) * inv
        x1 = (a00 * b1 - a10 * b0) * inv
        return jnp.where(ok, x0, 0.0), jnp.where(ok, x1, 0.0)

    dudx, dvdx = solve(take(dpdx, d0), take(dpdx, d1))
    dudy, dvdy = solve(take(dpdy, d0), take(dpdy, d1))
    bad = ~(jnp.isfinite(dudx) & jnp.isfinite(dvdx) & jnp.isfinite(dudy) & jnp.isfinite(dvdy))
    z = jnp.zeros_like(dudx)
    return si._replace(
        dudx=jnp.where(bad, z, dudx), dvdx=jnp.where(bad, z, dvdx),
        dudy=jnp.where(bad, z, dudy), dvdy=jnp.where(bad, z, dvdy),
        dpdx=jnp.where(bad[..., None], jnp.zeros_like(dpdx), dpdx),
        dpdy=jnp.where(bad[..., None], jnp.zeros_like(dpdy), dpdy),
    )
