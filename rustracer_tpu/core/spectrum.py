"""RGB spectrum type and color conversions.

Reference: rustracer-core/src/spectrum.rs (+ cie.rs). A Spectrum is any
(..., 3) float array holding linear RGB. Instead of shipping the 471-sample
CIE tables, we use the analytic multi-lobe Gaussian fits to the CIE 1931
color-matching functions (Wyman, Sloan & Shirley 2013), which are accurate to
well under 1% for SPD→XYZ integration (used for metal eta/k spectra and
blackbody emitters).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CIE_Y_INTEGRAL = 106.856895


def _gauss(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_cmf(lam):
    """Analytic CIE 1931 2-deg color matching functions at wavelength lam (nm)."""
    lam = np.asarray(lam, dtype=np.float64)
    x = (_gauss(lam, 1.056, 599.8, 37.9, 31.0)
         + _gauss(lam, 0.362, 442.0, 16.0, 26.7)
         + _gauss(lam, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss(lam, 0.821, 568.8, 46.9, 40.5)
         + _gauss(lam, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss(lam, 1.217, 437.0, 11.8, 36.0)
         + _gauss(lam, 0.681, 459.0, 26.0, 13.8))
    return x, y, z


def from_sampled(lams, vals):
    """SPD samples → linear RGB (reference spectrum.rs from_sampled).

    Integrates the SPD against the CMFs over [360, 830] nm with piecewise-
    linear interpolation of the samples. Host-side (numpy), returns np (3,).
    """
    lams = np.asarray(lams, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    order = np.argsort(lams)
    lams, vals = lams[order], vals[order]
    grid = np.arange(360.0, 831.0, 1.0)
    v = np.interp(grid, lams, vals)
    xb, yb, zb = cie_xyz_cmf(grid)
    scale = 1.0 / np.trapezoid(yb, grid)
    X = np.trapezoid(v * xb, grid) * scale
    Y = np.trapezoid(v * yb, grid) * scale
    Z = np.trapezoid(v * zb, grid) * scale
    return xyz_to_rgb_np(np.array([X, Y, Z]))


def blackbody_rgb(temperature_k, normalize=True):
    """Planck blackbody SPD → RGB, optionally normalized to peak 1."""
    grid = np.arange(360.0, 831.0, 1.0)
    lam_m = grid * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    le = (2.0 * h * c * c) / (lam_m ** 5 * (np.exp(h * c / (lam_m * kb * float(temperature_k))) - 1.0))
    if normalize:
        le = le / le.max()
    return from_sampled(grid, le)


# sRGB (D65) matrices — standard colorimetry constants
_XYZ_TO_RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], dtype=np.float32)
_RGB_TO_XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], dtype=np.float32)


def _mat3_apply(mat, v):
    # scalar-unrolled (no dot_general — see core/transform.py note)
    m = jnp.asarray(mat)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
                      m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
                      m[2, 0] * x + m[2, 1] * y + m[2, 2] * z], axis=-1)


def xyz_to_rgb(xyz):
    return _mat3_apply(_XYZ_TO_RGB, xyz)


def rgb_to_xyz(rgb):
    return _mat3_apply(_RGB_TO_XYZ, rgb)


def xyz_to_rgb_np(xyz):
    return (_XYZ_TO_RGB.astype(np.float64) @ np.asarray(xyz, np.float64)).astype(np.float32)


def rgb_to_xyz_np(rgb):
    return (_RGB_TO_XYZ.astype(np.float64) @ np.asarray(rgb, np.float64)).astype(np.float32)


def luminance(rgb):
    """y() luminance (reference spectrum.rs y())."""
    w = jnp.asarray(_RGB_TO_XYZ[1], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def srgb_encode(linear):
    """Linear → sRGB gamma (reference imageio.rs write path)."""
    linear = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(linear <= 0.0031308,
                     12.92 * linear,
                     1.055 * jnp.power(jnp.maximum(linear, 1e-8), 1.0 / 2.4) - 0.055)


def srgb_decode(encoded):
    """sRGB gamma → linear (reference imageio.rs read path)."""
    return jnp.where(encoded <= 0.04045,
                     encoded / 12.92,
                     jnp.power((encoded + 0.055) / 1.055, 2.4))


def srgb_decode_np(encoded):
    encoded = np.asarray(encoded, np.float32)
    return np.where(encoded <= 0.04045,
                    encoded / 12.92,
                    ((encoded + 0.055) / 1.055) ** 2.4).astype(np.float32)


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


# Named metal spectra (eta, k) for the metal material, sampled SPDs.
# Physical measurement data (Palik / CRC handbooks) at a coarse wavelength grid;
# converted to RGB once at scene build (reference material/metal.rs default Cu).
_CU_LAMS = [360, 400, 440, 480, 520, 560, 600, 640, 680, 720, 760, 830]
_CU_ETA = [1.38, 1.25, 1.18, 1.15, 1.12, 1.05, 0.43, 0.26, 0.24, 0.23, 0.23, 0.24]
_CU_K = [1.72, 2.04, 2.21, 2.36, 2.49, 2.60, 3.21, 3.67, 4.05, 4.35, 4.62, 4.95]
_AU_LAMS = [360, 400, 440, 480, 520, 560, 600, 640, 680, 720, 760, 830]
_AU_ETA = [1.68, 1.66, 1.54, 1.36, 0.83, 0.43, 0.25, 0.20, 0.17, 0.16, 0.16, 0.17]
_AU_K = [1.94, 1.96, 1.85, 1.80, 2.12, 2.46, 2.92, 3.37, 3.81, 4.22, 4.60, 5.26]
_AG_LAMS = [360, 400, 440, 480, 520, 560, 600, 640, 680, 720, 760, 830]
_AG_ETA = [0.19, 0.17, 0.15, 0.14, 0.13, 0.12, 0.12, 0.13, 0.14, 0.15, 0.15, 0.16]
_AG_K = [1.64, 2.00, 2.36, 2.70, 3.01, 3.31, 3.66, 3.96, 4.26, 4.56, 4.86, 5.36]


def metal_eta_k(name="Cu"):
    tables = {
        "Cu": (_CU_LAMS, _CU_ETA, _CU_K),
        "Au": (_AU_LAMS, _AU_ETA, _AU_K),
        "Ag": (_AG_LAMS, _AG_ETA, _AG_K),
    }
    lams, eta, k = tables.get(name, tables["Cu"])
    return from_sampled(lams, eta), from_sampled(lams, k)
