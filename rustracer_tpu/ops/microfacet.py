"""Microfacet distributions: Beckmann and Trowbridge-Reitz (GGX), batched.

Reference: rustracer-core/src/bsdf/microfacet.rs:15-650 — D, Lambda, G,
visible-normal sampling (sample_wh) and roughness_to_alpha, plus the Disney
GTR1 clearcoat distribution (disney.rs). All in shading space (z = normal).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.math import (PI, abs_cos_theta, cos2_phi, cos2_theta, cos_phi,
                         cos_theta, erf, erf_inv, sin2_phi, sin_phi,
                         tan2_theta, tan_theta, normalize)

BECKMANN, TROWBRIDGE, GTR1 = 0, 1, 2


def roughness_to_alpha(roughness):
    """PBRT's remap (microfacet.rs roughness_to_alpha)."""
    roughness = jnp.maximum(roughness, 1e-3)
    x = jnp.log(roughness)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


def distribution_d(dist, wh, alpha_x, alpha_y):
    """Differential area D(wh), selected by dist code (elementwise)."""
    t2 = tan2_theta(wh)
    c2 = cos2_theta(wh)
    c4 = c2 * c2
    finite = jnp.isfinite(t2)
    ax2 = alpha_x * alpha_x
    ay2 = alpha_y * alpha_y
    # Beckmann
    beck = jnp.exp(-t2 * (cos2_phi(wh) / ax2 + sin2_phi(wh) / ay2)) / \
        (PI * alpha_x * alpha_y * c4)
    # Trowbridge-Reitz
    e = (cos2_phi(wh) / ax2 + sin2_phi(wh) / ay2) * t2
    tr = 1.0 / (PI * alpha_x * alpha_y * c4 * (1.0 + e) ** 2)
    # GTR1 (Disney clearcoat; alpha_x used as alpha)
    a2 = ax2
    denom = PI * jnp.log(jnp.maximum(a2, 1e-8)) * (1.0 + (a2 - 1.0) * c2)
    gtr1 = (a2 - 1.0) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    d = jnp.where(dist == BECKMANN, beck, jnp.where(dist == TROWBRIDGE, tr, gtr1))
    return jnp.where(finite, d, 0.0)


def distribution_lambda(dist, w, alpha_x, alpha_y):
    """Shadowing auxiliary Lambda(w)."""
    abs_tan = jnp.abs(tan_theta(w))
    finite = jnp.isfinite(abs_tan)
    abs_tan_safe = jnp.where(finite, abs_tan, 0.0)
    alpha = jnp.sqrt(jnp.maximum(
        cos2_phi(w) * alpha_x * alpha_x + sin2_phi(w) * alpha_y * alpha_y, 1e-20))
    # Beckmann rational approximation
    a = 1.0 / jnp.maximum(alpha * abs_tan_safe, 1e-20)
    beck = jnp.where(a >= 1.6, 0.0,
                     (1.0 - 1.259 * a + 0.396 * a * a)
                     / jnp.maximum(3.535 * a + 2.181 * a * a, 1e-20))
    # Trowbridge-Reitz closed form (also used for GTR1 per Disney)
    a2t2 = (alpha * abs_tan_safe) ** 2
    tr = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    lam = jnp.where(dist == BECKMANN, beck, tr)
    return jnp.where(finite, lam, 0.0)


def distribution_g1(dist, w, alpha_x, alpha_y):
    return 1.0 / (1.0 + distribution_lambda(dist, w, alpha_x, alpha_y))


def distribution_g(dist, wo, wi, alpha_x, alpha_y):
    return 1.0 / (1.0 + distribution_lambda(dist, wo, alpha_x, alpha_y)
                  + distribution_lambda(dist, wi, alpha_x, alpha_y))


def distribution_pdf(dist, wo, wh, alpha_x, alpha_y):
    """PDF of sample_wh (visible-normal sampling for Beckmann/TR; plain
    D cos for GTR1, matching disney.rs)."""
    d = distribution_d(dist, wh, alpha_x, alpha_y)
    vis = d * distribution_g1(dist, wo, alpha_x, alpha_y) * \
        jnp.abs(jnp.sum(wo * wh, axis=-1)) / jnp.maximum(abs_cos_theta(wo), 1e-8)
    plain = d * abs_cos_theta(wh)
    # TR uses visible-normal sampling; Beckmann and GTR1 sample the full
    # distribution (pdf = D |cos wh|)
    return jnp.where(dist == TROWBRIDGE, vis, plain)


def _sample_beckmann_full(u, alpha_x, alpha_y):
    """Full-distribution Beckmann wh sample (isotropic + anisotropic)."""
    log_u = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
    iso = jnp.isclose(alpha_x, alpha_y)
    # isotropic
    tan2_iso = -alpha_x * alpha_x * log_u
    phi_iso = u[..., 1] * 2.0 * PI
    # anisotropic
    phi_a = jnp.arctan(alpha_y / alpha_x *
                       jnp.tan(2.0 * PI * u[..., 1] + 0.5 * PI))
    phi_a = jnp.where(u[..., 1] > 0.5, phi_a + PI, phi_a)
    sp, cp = jnp.sin(phi_a), jnp.cos(phi_a)
    tan2_a = -log_u / (cp * cp / (alpha_x * alpha_x) + sp * sp / (alpha_y * alpha_y))
    tan2 = jnp.where(iso, tan2_iso, tan2_a)
    phi = jnp.where(iso, phi_iso, phi_a)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _sample_tr_full(u, alpha_x, alpha_y):
    """Full-distribution Trowbridge-Reitz wh sample."""
    iso = jnp.isclose(alpha_x, alpha_y)
    phi_iso = 2.0 * PI * u[..., 1]
    tan2_iso = alpha_x * alpha_x * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-20)
    phi_a = jnp.arctan(alpha_y / alpha_x *
                       jnp.tan(2.0 * PI * u[..., 1] + 0.5 * PI))
    phi_a = jnp.where(u[..., 1] > 0.5, phi_a + PI, phi_a)
    sp, cp = jnp.sin(phi_a), jnp.cos(phi_a)
    a2 = 1.0 / (cp * cp / (alpha_x * alpha_x) + sp * sp / (alpha_y * alpha_y))
    tan2_a = a2 * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-20)
    tan2 = jnp.where(iso, tan2_iso, tan2_a)
    phi = jnp.where(iso, phi_iso, phi_a)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _sample_gtr1(u, alpha):
    a2 = alpha * alpha
    ct = jnp.sqrt(jnp.maximum(
        (1.0 - jnp.power(jnp.maximum(a2, 1e-8), 1.0 - u[..., 0])) /
        jnp.maximum(1.0 - a2, 1e-8), 0.0))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _sample_visible_area(dist, wo, u, alpha_x, alpha_y):
    """Heitz visible-normal sampling for Beckmann/TR (microfacet.rs
    trowbridge_reitz_sample / beckmann_sample), via the TR slope method;
    Beckmann uses the erf-based slope sampling."""
    flip = cos_theta(wo) < 0.0
    wo_f = jnp.where(flip[..., None], -wo, wo)
    # stretch wo
    wi_s = normalize(jnp.stack([alpha_x * wo_f[..., 0], alpha_y * wo_f[..., 1],
                                wo_f[..., 2]], axis=-1))
    ct = cos_theta(wi_s)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    tan_t = st / jnp.maximum(ct, 1e-8)
    cp = jnp.where(st < 1e-7, 1.0, wi_s[..., 0] / jnp.maximum(st, 1e-7))
    sp = jnp.where(st < 1e-7, 0.0, wi_s[..., 1] / jnp.maximum(st, 1e-7))
    u1, u2 = u[..., 0], u[..., 1]

    # --- TR slope sampling (Heitz & d'Eon) ---
    def tr_slopes():
        # special case: normal incidence
        normal_inc = ct > 0.9999
        r = jnp.sqrt(jnp.maximum(u1 / jnp.maximum(1.0 - u1, 1e-20), 0.0))
        phi = 2.0 * PI * u2
        sx_n = r * jnp.cos(phi)
        sy_n = r * jnp.sin(phi)
        a = 1.0 / jnp.maximum(tan_t, 1e-20)
        g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / jnp.maximum(a * a, 1e-20)))
        A = 2.0 * u1 / jnp.maximum(g1, 1e-20) - 1.0
        A = jnp.clip(A, -0.9999, 0.9999)
        tmp = 1.0 / (A * A - 1.0)
        tmp = jnp.where(jnp.abs(tmp) > 1e10, jnp.sign(tmp) * 1e10, tmp)
        b = tan_t
        d = jnp.sqrt(jnp.maximum(b * b * tmp * tmp - (A * A - b * b) * tmp, 0.0))
        sx1 = b * tmp - d
        sx2 = b * tmp + d
        sx = jnp.where((A < 0.0) | (sx2 > 1.0 / jnp.maximum(tan_t, 1e-20)), sx1, sx2)
        # sample y slope
        S = jnp.where(u2 > 0.5, 1.0, -1.0)
        u2b = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
        z = (u2b * (u2b * (u2b * 0.27385 - 0.73369) + 0.46341)) / \
            (u2b * (u2b * (u2b * 0.093073 + 0.309420) - 1.0) + 0.597999)
        sy = S * z * jnp.sqrt(1.0 + sx * sx)
        return jnp.where(normal_inc, sx_n, sx), jnp.where(normal_inc, sy_n, sy)

    slope_x, slope_y = tr_slopes()
    # rotate
    rx = cp * slope_x - sp * slope_y
    ry = sp * slope_x + cp * slope_y
    # unstretch
    rx = rx * alpha_x
    ry = ry * alpha_y
    wh = normalize(jnp.stack([-rx, -ry, jnp.ones_like(rx)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def distribution_sample_wh(dist, wo, u, alpha_x, alpha_y):
    """Sample a half-vector wh.

    TR: Heitz visible-normal sampling. Beckmann: full-distribution sampling.
    GTR1: plain clearcoat sampling. Each pairs with distribution_pdf."""
    wh_vis = _sample_visible_area(dist, wo, u, alpha_x, alpha_y)
    wh_beck = _sample_beckmann_full(u, alpha_x, alpha_y)
    wh_gtr = _sample_gtr1(u, alpha_x)
    wh = jnp.where((dist == TROWBRIDGE)[..., None], wh_vis,
                   jnp.where((dist == BECKMANN)[..., None], wh_beck, wh_gtr))
    # full-distribution samples must land in wo's hemisphere
    flip_full = (dist != TROWBRIDGE) & (cos_theta(wo) < 0.0)
    return jnp.where(flip_full[..., None], -wh, wh)
