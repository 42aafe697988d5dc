"""Math substrate tests (mirrors reference inline tests, SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.core import math as m
from rustracer_tpu.core.transform import Transform, xform_normal, xform_point, xform_vector


class TestVectors:
    def test_dot_cross(self):
        a = m.vec(1.0, 0.0, 0.0)
        b = m.vec(0.0, 1.0, 0.0)
        assert float(m.dot(a, b)) == 0.0
        np.testing.assert_allclose(np.asarray(m.cross(a, b)), [0, 0, 1])

    def test_normalize_batched(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
        n = m.normalize(v)
        np.testing.assert_allclose(np.asarray(n[0]), [0.6, 0, 0.8], atol=1e-6)
        assert np.all(np.isfinite(np.asarray(n[1])))  # zero vec stays finite

    def test_coordinate_system_orthonormal(self):
        rng = np.random.default_rng(0)
        v1 = m.normalize(jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)))
        v2, v3 = m.coordinate_system(v1)
        for a, b in [(v1, v2), (v1, v3), (v2, v3)]:
            np.testing.assert_allclose(np.asarray(m.dot(a, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.length(v2)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.cross(v1, v2)), np.asarray(v3), atol=1e-5)

    def test_face_forward(self):
        n = m.vec(0.0, 0.0, 1.0)
        v = m.vec(0.0, 0.0, -1.0)
        np.testing.assert_allclose(np.asarray(m.face_forward(n, v)), [0, 0, -1])

    def test_reflect(self):
        wo = m.normalize(m.vec(1.0, 0.0, 1.0))
        n = m.vec(0.0, 0.0, 1.0)
        r = m.reflect(wo, n)
        np.testing.assert_allclose(np.asarray(r), np.asarray(
            m.normalize(m.vec(-1.0, 0.0, 1.0))), atol=1e-6)

    def test_refract_tir(self):
        n = m.vec(0.0, 0.0, 1.0)
        wi = m.normalize(m.vec(1.0, 0.0, 0.05))
        _, valid = m.refract(wi, n, jnp.asarray(1.5))  # dense->sparse grazing
        assert not bool(valid)

    def test_spherical_roundtrip(self):
        rng = np.random.default_rng(1)
        v = m.normalize(jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)))
        theta = m.spherical_theta(v)
        phi = m.spherical_phi(v)
        v2 = m.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)


class TestNextFloat:
    def test_up_down(self):
        x = jnp.float32(1.0)
        up = m.next_float_up(x)
        down = m.next_float_down(x)
        assert float(up) > 1.0 and float(down) < 1.0
        assert float(up) == np.nextafter(np.float32(1.0), np.float32(2.0))

    def test_negative(self):
        x = jnp.float32(-1.0)
        assert float(m.next_float_up(x)) > -1.0
        assert float(m.next_float_down(x)) < -1.0


class TestQuadratic:
    def test_simple(self):
        t0, t1, has = m.quadratic(jnp.float32(1.0), jnp.float32(-3.0), jnp.float32(2.0))
        assert bool(has)
        np.testing.assert_allclose([float(t0), float(t1)], [1.0, 2.0], atol=1e-5)

    def test_no_solution(self):
        _, _, has = m.quadratic(jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
        assert not bool(has)

    def test_catastrophic_cancellation(self):
        # roots 1e-4 and 1e4: naive formula loses the small root in f32
        a, b, c = 1.0, -(1e4 + 1e-4), 1.0
        t0, t1, has = m.quadratic(jnp.float32(a), jnp.float32(b), jnp.float32(c))
        np.testing.assert_allclose(float(t0), 1e-4, rtol=1e-4)
        np.testing.assert_allclose(float(t1), 1e4, rtol=1e-4)


class TestFindInterval:
    def test_basic(self):
        cdf = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
        x = jnp.asarray([0.3, 0.0, 0.99, 1.5, -1.0])
        idx = m.find_interval(jnp.broadcast_to(cdf, (5, 5)), x)
        np.testing.assert_array_equal(np.asarray(idx), [1, 0, 3, 3, 0])


class TestTransform:
    def test_translate_point(self):
        t = Transform.translate(1.0, 2.0, 3.0)
        p = xform_point(jnp.asarray(t.m), m.vec(0.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(p), [1, 2, 3])
        v = xform_vector(jnp.asarray(t.m), m.vec(1.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(v), [1, 0, 0])

    def test_inverse_roundtrip(self):
        t = Transform.rotate(33.0, 1.0, 2.0, 3.0) * Transform.translate(4.0, 5.0, 6.0) \
            * Transform.scale(2.0, 2.0, 2.0)
        p = m.vec(1.0, 2.0, 3.0)
        q = xform_point(jnp.asarray(t.m), p)
        back = xform_point(jnp.asarray(t.m_inv), q)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)

    def test_normal_transform(self):
        # scale must transform normals by the inverse transpose
        t = Transform.scale(2.0, 1.0, 1.0)
        n = m.normalize(m.vec(1.0, 1.0, 0.0))
        nt = m.normalize(xform_normal(jnp.asarray(t.m_inv), n))
        # tangent (1,-1,0) -> (2,-1,0); normal must stay perpendicular
        tangent = xform_vector(jnp.asarray(t.m), m.vec(1.0, -1.0, 0.0))
        assert abs(float(m.dot(nt, tangent))) < 1e-5

    def test_look_at(self):
        t = Transform.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
        # camera-space +z maps to world +z here
        d = xform_vector(jnp.asarray(t.m), m.vec(0.0, 0.0, 1.0))
        np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-6)
        o = xform_point(jnp.asarray(t.m), m.vec(0.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(o), [0, 0, -5], atol=1e-6)

    def test_swaps_handedness(self):
        assert Transform.scale(-1.0, 1.0, 1.0).swaps_handedness()
        assert not Transform.scale(1.0, 1.0, 1.0).swaps_handedness()

    def test_rotate_matches_axis_constructors(self):
        for deg in (0.0, 30.0, 123.0):
            np.testing.assert_allclose(
                Transform.rotate(deg, 1, 0, 0).m, Transform.rotate_x(deg).m, atol=1e-6)
            np.testing.assert_allclose(
                Transform.rotate(deg, 0, 1, 0).m, Transform.rotate_y(deg).m, atol=1e-6)
            np.testing.assert_allclose(
                Transform.rotate(deg, 0, 0, 1).m, Transform.rotate_z(deg).m, atol=1e-6)


class TestOffsetRayOrigin:
    def test_moves_off_surface(self):
        p = m.vec(1.0, 1.0, 1.0)
        err = jnp.full((3,), 1e-4, jnp.float32)
        n = m.vec(0.0, 0.0, 1.0)
        w = m.vec(0.0, 0.0, 1.0)
        po = m.offset_ray_origin(p, err, n, w)
        assert float(po[2]) > 1.0
        w2 = m.vec(0.0, 0.0, -1.0)
        po2 = m.offset_ray_origin(p, err, n, w2)
        assert float(po2[2]) < 1.0
