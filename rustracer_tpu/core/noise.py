"""Perlin noise, fbm and turbulence, batched.

Reference: rustracer-core/src/noise.rs:4-45 (ported PBRT noise). We use a
hash-based gradient lattice instead of the reference's permutation table —
same statistical character, no 256-entry table gathers, fully vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .rng import hash_u32


def _grad(hx, hy, hz, x, y, z):
    h = hash_u32(hx, hy, hz) & jnp.uint32(15)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    u = jnp.where((h & 1) != 0, -u, u)
    v = jnp.where((h & 2) != 0, -v, v)
    return u + v


def _smooth(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def noise3(p):
    """Perlin noise at p (..., 3) → (...) in about [-1, 1]."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32).astype(jnp.uint32)
    iy = pi[..., 1].astype(jnp.int32).astype(jnp.uint32)
    iz = pi[..., 2].astype(jnp.int32).astype(jnp.uint32)
    x, y, z = pf[..., 0], pf[..., 1], pf[..., 2]
    u, v, w = _smooth(x), _smooth(y), _smooth(z)

    def g(dx, dy, dz):
        return _grad(ix + jnp.uint32(dx), iy + jnp.uint32(dy), iz + jnp.uint32(dz),
                     x - dx, y - dy, z - dz)

    lerp = lambda t, a, b: a + t * (b - a)
    x00 = lerp(u, g(0, 0, 0), g(1, 0, 0))
    x10 = lerp(u, g(0, 1, 0), g(1, 1, 0))
    x01 = lerp(u, g(0, 0, 1), g(1, 0, 1))
    x11 = lerp(u, g(0, 1, 1), g(1, 1, 1))
    y0 = lerp(v, x00, x10)
    y1 = lerp(v, x01, x11)
    return lerp(w, y0, y1)


def fbm(p, dpdx, dpdy, omega, max_octaves):
    """Fractional Brownian motion (noise.rs fbm), with octave clamping from
    the footprint size for antialiasing."""
    len2 = jnp.maximum(jnp.sum(dpdx * dpdx, -1), jnp.sum(dpdy * dpdy, -1))
    n = jnp.clip(-1.0 - 0.5 * jnp.log2(jnp.maximum(len2, 1e-24)), 0.0,
                 float(max_octaves))
    n_int = jnp.floor(n)
    sum_v = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = 1.0
    for i in range(max_octaves):
        active = i < n_int
        sum_v = sum_v + jnp.where(active, o * noise3(p * lam), 0.0)
        lam *= 1.99
        o *= omega
    n_partial = n - n_int
    sum_v = sum_v + o * (_smooth(n_partial) * noise3(p * lam))
    return sum_v


def turbulence(p, dpdx, dpdy, omega, max_octaves):
    """Absolute-value fbm (noise.rs turbulence)."""
    len2 = jnp.maximum(jnp.sum(dpdx * dpdx, -1), jnp.sum(dpdy * dpdy, -1))
    n = jnp.clip(-1.0 - 0.5 * jnp.log2(jnp.maximum(len2, 1e-24)), 0.0,
                 float(max_octaves))
    n_int = jnp.floor(n)
    sum_v = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = 1.0
    for i in range(max_octaves):
        active = i < n_int
        sum_v = sum_v + jnp.where(active, o * jnp.abs(noise3(p * lam)), 0.0)
        lam *= 1.99
        o *= omega
    n_partial = n - n_int
    sum_v = sum_v + o * jnp.abs(_smooth(n_partial) * noise3(p * lam))
    return sum_v
