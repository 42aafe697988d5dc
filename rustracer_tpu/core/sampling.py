"""Monte-Carlo warps and sampling distributions.

Reference: rustracer-core/src/sampling/{mod,distribution1d,distribution2d}.rs.
All functions are batched over leading axes; distributions are built with
jnp.cumsum (device-side, differentiable through `func`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import PI, PI_OVER_2, PI_OVER_4, INV_PI, INV_2_PI, INV_4_PI, find_interval


# --- warps (reference sampling/mod.rs:14-63) ---

def uniform_sample_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return INV_2_PI


def uniform_sample_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return INV_4_PI


def uniform_sample_disk(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def concentric_sample_disk(u):
    """Shirley's concentric disk warp (reference sampling/mod.rs)."""
    u_off = 2.0 * u - 1.0
    ux, uy = u_off[..., 0], u_off[..., 1]
    both_zero = (ux == 0.0) & (uy == 0.0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    safe = lambda d: jnp.where(d == 0.0, 1.0, d)
    theta = jnp.where(use_x,
                      PI_OVER_4 * (uy / safe(ux)),
                      PI_OVER_2 - PI_OVER_4 * (ux / safe(uy)))
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(both_zero[..., None], jnp.zeros_like(p), p)


def cosine_sample_hemisphere(u):
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([jnp.cos(phi) * sin_theta,
                      jnp.sin(phi) * sin_theta,
                      cos_theta], axis=-1)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def uniform_sample_triangle(u):
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic, beta=2 (reference sampling/mod.rs power_heuristic)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, (f * f) / jnp.where(denom > 0.0, denom, 1.0), 0.0)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    denom = nf * f_pdf + ng * g_pdf
    return jnp.where(denom > 0.0, (nf * f_pdf) / jnp.where(denom > 0.0, denom, 1.0), 0.0)


# --- Distribution1D (reference sampling/distribution1d.rs) ---

class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution over [0, 1).

    func: (..., N) nonnegative; cdf: (..., N+1); func_int: (...)
    """
    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @property
    def count(self):
        return self.func.shape[-1]

    @staticmethod
    def create(func):
        func = jnp.asarray(func, jnp.float32)
        n = func.shape[-1]
        cdf = jnp.cumsum(func, axis=-1) / n
        zeros = jnp.zeros_like(cdf[..., :1])
        cdf = jnp.concatenate([zeros, cdf], axis=-1)
        func_int = cdf[..., -1]
        # degenerate (all-zero) → uniform cdf
        uniform = jnp.arange(n + 1, dtype=jnp.float32) / n
        safe_int = jnp.where(func_int > 0.0, func_int, 1.0)
        cdf = jnp.where(func_int[..., None] > 0.0,
                        cdf / safe_int[..., None],
                        jnp.broadcast_to(uniform, cdf.shape))
        return Distribution1D(func, cdf, func_int)

    def sample_continuous(self, u):
        """Returns (x in [0,1), pdf, offset)."""
        off = find_interval(self.cdf, u)
        c0 = jnp.take_along_axis(self.cdf, off[..., None], axis=-1)[..., 0] if self.cdf.ndim > 1 \
            else self.cdf[off]
        c1 = jnp.take_along_axis(self.cdf, off[..., None] + 1, axis=-1)[..., 0] if self.cdf.ndim > 1 \
            else self.cdf[off + 1]
        f = jnp.take_along_axis(self.func, off[..., None], axis=-1)[..., 0] if self.func.ndim > 1 \
            else self.func[off]
        du = u - c0
        denom = c1 - c0
        du = jnp.where(denom > 0.0, du / jnp.where(denom > 0.0, denom, 1.0), du)
        safe_int = jnp.where(self.func_int > 0.0, self.func_int, 1.0)
        pdf = jnp.where(self.func_int > 0.0, f / safe_int, 0.0)
        x = (off.astype(jnp.float32) + du) / self.count
        return x, pdf, off

    def sample_discrete(self, u):
        """Returns (offset, pdf, u_remapped)."""
        off = find_interval(self.cdf, u)
        if self.cdf.ndim > 1:
            c0 = jnp.take_along_axis(self.cdf, off[..., None], axis=-1)[..., 0]
            c1 = jnp.take_along_axis(self.cdf, off[..., None] + 1, axis=-1)[..., 0]
            f = jnp.take_along_axis(self.func, off[..., None], axis=-1)[..., 0]
        else:
            c0, c1, f = self.cdf[off], self.cdf[off + 1], self.func[off]
        safe_int = jnp.where(self.func_int > 0.0, self.func_int, 1.0)
        pdf = jnp.where(self.func_int > 0.0, f / (safe_int * self.count), 0.0)
        denom = c1 - c0
        u_rm = jnp.where(denom > 0.0, (u - c0) / jnp.where(denom > 0.0, denom, 1.0), u)
        return off, pdf, u_rm

    def discrete_pdf(self, index):
        safe_int = jnp.where(self.func_int > 0.0, self.func_int, 1.0)
        f = jnp.take(self.func, index, axis=-1) if self.func.ndim == 1 else \
            jnp.take_along_axis(self.func, index[..., None], axis=-1)[..., 0]
        return jnp.where(self.func_int > 0.0, f / (safe_int * self.count), 0.0)


class Distribution2D(NamedTuple):
    """2D piecewise-constant distribution (reference distribution2d.rs).

    conditional: Distribution1D over rows stacked, shape (H, W)
    marginal: Distribution1D over row integrals, shape (H,)
    """
    conditional: Distribution1D
    marginal: Distribution1D

    @staticmethod
    def create(func):
        """func: (H, W) nonnegative."""
        func = jnp.asarray(func, jnp.float32)
        cond = Distribution1D.create(func)          # batched over rows
        marg = Distribution1D.create(cond.func_int)  # (H,)
        return Distribution2D(cond, marg)

    def sample_continuous(self, u):
        """u: (..., 2) → ((..., 2) point in [0,1)^2, pdf)."""
        d1, pdf1, v_idx = self.marginal.sample_continuous(u[..., 1])
        # gather the conditional row for each lane
        cond_func = self.conditional.func[v_idx]          # (..., W)
        cond_cdf = self.conditional.cdf[v_idx]            # (..., W+1)
        cond_int = self.conditional.func_int[v_idx]       # (...)
        row = Distribution1D(cond_func, cond_cdf, cond_int)
        d0, pdf0, _ = row.sample_continuous(u[..., 0])
        return jnp.stack([d0, d1], axis=-1), pdf0 * pdf1

    def pdf(self, p):
        """PDF at continuous point p in [0,1)^2."""
        h, w = self.conditional.func.shape
        iu = jnp.clip((p[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iv = jnp.clip((p[..., 1] * h).astype(jnp.int32), 0, h - 1)
        f = self.conditional.func[iv, iu]
        total = self.marginal.func_int
        safe = jnp.where(total > 0.0, total, 1.0)
        return jnp.where(total > 0.0, f / safe, 0.0)
