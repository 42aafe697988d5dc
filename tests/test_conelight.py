"""Sphere-light cone sampling (sphere.rs:245-340).

Full spheres seen from outside must be sampled over their subtended cone
(uniform solid angle), with pdf_li / pdf_li_hit reporting the matching
cone density on the BSDF/emission sides of MIS.
"""
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.scene import lights as L
from rustracer_tpu.scene.tables import make_geometry


def _sphere_light(radius, center=(0.0, 0.0, 0.0), emit=1.0, twosided=False):
    t = Transform.translate(*center)
    quad = dict(
        q_type=np.zeros(1, np.int32),
        q_o2w=t.m[None], q_w2o=t.m_inv[None],
        q_params=np.array([[radius, -radius, radius, 2 * np.pi]], np.float32),
        q_material=np.full(1, -1, np.int32),
        q_arealight=np.zeros(1, np.int32),
        q_reverse=np.zeros(1, bool),
    )
    geom = make_geometry(quadrics=quad)
    lights = L.make_lights(
        [dict(type=L.LIGHT_AREA, pos=(0, 0, 0), emit=(emit,) * 3, prim=0,
              twosided=twosided)], world_radius=10.0)
    return geom, lights


def _si_at(p0, n0, n):
    return SimpleNamespace(
        t=jnp.zeros(n),
        p=jnp.asarray(np.tile(p0, (n, 1)).astype(np.float32)),
        p_error=jnp.full((n, 3), 1e-6, jnp.float32),
        n=jnp.asarray(np.tile(n0, (n, 1)).astype(np.float32)),
        valid=jnp.ones(n, bool))


def test_cone_samples_land_on_visible_cap():
    """Every cone sample sits on the hemisphere facing the receiver — the
    structural win over area sampling (which wastes ~half its samples on
    backfacing points)."""
    geom, lights = _sphere_light(0.5)
    n = 4096
    rs = np.random.RandomState(0)
    si = _si_at([3.0, 0.0, 0.0], [-1.0, 0.0, 0.0], n)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    ls = L.sample_li(lights, geom, jnp.zeros(n, jnp.int32), si, u)
    li = np.asarray(ls.li)
    pdf = np.asarray(ls.pdf)
    assert (li[:, 0] > 0.0).all(), "cone sample hit the far hemisphere"
    # uniform-cone pdf is one constant for a fixed receiver
    sin2max = 0.5 ** 2 / 9.0
    expect = 1.0 / (2 * np.pi * (1.0 - np.sqrt(1.0 - sin2max)))
    np.testing.assert_allclose(pdf, expect, rtol=1e-4)
    # sampled points are on the sphere, visible side
    p = np.asarray(ls.p_target)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 0.5, atol=1e-4)
    assert (p[:, 0] > -1e-5).all()


def test_cone_pdf_consistency_sample_vs_pdf_li_vs_hit():
    """ls.pdf == pdf_li(wi) == pdf_li_hit for cone-sampled directions: the
    NEE, BSDF-MIS, and emission-MIS sides must quote one density."""
    geom, lights = _sphere_light(0.3, center=(0.0, 1.0, 0.0))
    n = 256
    rs = np.random.RandomState(1)
    p0 = [1.5, -0.5, 0.25]
    si = _si_at(p0, [0.0, 1.0, 0.0], n)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    lid = jnp.zeros(n, jnp.int32)
    ls = L.sample_li(lights, geom, lid, si, u)
    pdf2 = np.asarray(L.pdf_li(lights, geom, lid, si, ls.wi))
    np.testing.assert_allclose(np.asarray(ls.pdf), pdf2, rtol=1e-4)
    pdf3 = np.asarray(L.pdf_li_hit(lights, geom, lid, si.p, ls.wi,
                                   ls.p_target, ls.n_target))
    np.testing.assert_allclose(np.asarray(ls.pdf), pdf3, rtol=1e-4)


def test_cone_estimator_matches_analytic_irradiance():
    """Small distant sphere: E = L·π·r²/d² onto a receiver facing the
    center. The cone estimator must land within ~1% at 8k samples (area
    sampling needs orders of magnitude more for this configuration —
    that IS the reason sphere.rs:245-310 exists)."""
    r, d = 0.05, 3.0
    geom, lights = _sphere_light(r, emit=1.0)
    n = 1 << 13
    rs = np.random.RandomState(2)
    si = _si_at([d, 0.0, 0.0], [-1.0, 0.0, 0.0], n)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    ls = L.sample_li(lights, geom, jnp.zeros(n, jnp.int32), si, u)
    cos_r = np.maximum(np.asarray(ls.wi) @ np.array([-1.0, 0.0, 0.0]), 0.0)
    w = np.asarray(ls.li)[:, 0] * cos_r / np.maximum(np.asarray(ls.pdf),
                                                     1e-12)
    est = w.mean()
    analytic = np.pi * r * r / (d * d)
    np.testing.assert_allclose(est, analytic, rtol=1e-2)
    # and the estimator is LOW variance: relative std of the per-sample
    # weights stays in the few-percent range inside the cone
    assert w.std() / w.mean() < 0.05


def test_interior_point_falls_back_to_area_sampling():
    """From inside the sphere the cone is undefined; sampling must fall
    back to uniform area with the area→solid-angle pdf (sphere.rs inside
    branch)."""
    geom, lights = _sphere_light(2.0, twosided=True)
    n = 2048
    rs = np.random.RandomState(3)
    si = _si_at([0.2, 0.1, 0.0], [1.0, 0.0, 0.0], n)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    lid = jnp.zeros(n, jnp.int32)
    ls = L.sample_li(lights, geom, lid, si, u)
    p = np.asarray(ls.p_target)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 2.0, rtol=1e-4)
    # pdf round-trips through the intersection-based pdf_li
    pdf2 = np.asarray(L.pdf_li(lights, geom, lid, si, ls.wi))
    m = np.asarray(ls.pdf) > 0
    np.testing.assert_allclose(np.asarray(ls.pdf)[m], pdf2[m], rtol=2e-3)
