"""Fresnel reflectance functions, batched.

Reference: rustracer-core/src/bsdf/fresnel.rs:14-120 (fr_dielectric,
fr_conductor and the Fresnel trait). All functions are elementwise over
arbitrary batch shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

# fresnel_type codes used in lobe params
FR_NOOP, FR_DIELECTRIC, FR_CONDUCTOR, FR_DISNEY = 0, 1, 2, 3


def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel (fresnel.rs fr_dielectric).

    Handles rays exiting the medium (cos_theta_i < 0) by swapping etas.
    """
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_theta_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_theta_i)
    sin_theta_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_theta_t = ei / et * sin_theta_i
    tir = sin_theta_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_t * sin_theta_t))
    r_parl = ((et * ci) - (ei * ct)) / jnp.maximum((et * ci) + (ei * ct), 1e-20)
    r_perp = ((ei * ci) - (et * ct)) / jnp.maximum((ei * ci) + (et * ct), 1e-20)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_theta_i, eta_i, eta_t, k):
    """Conductor Fresnel with complex IOR (fresnel.rs fr_conductor).

    eta_i scalar/rgb, eta_t/k rgb; cos_theta_i broadcasts against the last
    (color) axis of eta/k.
    """
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    cos2 = ci * ci
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2plusb2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2plusb2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2plusb2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = cos2 * a2plusb2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def schlick_fresnel(cos_theta, r0):
    """Schlick approximation (used by Disney lobes, disney.rs)."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    m2 = m * m
    return r0 + (1.0 - r0) * (m2 * m2 * m)
