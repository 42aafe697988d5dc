"""Shape intersection tests, incl. the reintersection property test from the
reference (rustracer-core/tests/shapes.rs:16-54)."""
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.core.math import normalize, offset_ray_origin
from rustracer_tpu.core.ray import Ray, make_ray
from rustracer_tpu.core.transform import Transform
from rustracer_tpu.ops.quadrics import (cylinder_intersect, disk_intersect,
                                        sphere_intersect)
from rustracer_tpu.ops.triangle import (triangle_area, triangle_intersect,
                                        triangle_partial_derivs)
from rustracer_tpu.scene.tables import make_geometry, scene_intersect, scene_intersect_p

TWO_PI = 2.0 * np.pi


def _f(x):
    return jnp.asarray(x, jnp.float32)


class TestSphere:
    def test_direct_hit(self):
        o = _f([[0.0, 0.0, -5.0]])
        d = _f([[0.0, 0.0, 1.0]])
        h = sphere_intersect(o, d, _f([1e9]), _f(1.0), _f(-1.0), _f(1.0), _f(TWO_PI))
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h.p[0]), [0, 0, -1], atol=1e-4)

    def test_miss(self):
        o = _f([[0.0, 2.0, -5.0]])
        d = _f([[0.0, 0.0, 1.0]])
        h = sphere_intersect(o, d, _f([1e9]), _f(1.0), _f(-1.0), _f(1.0), _f(TWO_PI))
        assert not bool(h.hit[0])

    def test_inside_hit_far_side(self):
        o = _f([[0.0, 0.0, 0.0]])
        d = _f([[0.0, 0.0, 1.0]])
        h = sphere_intersect(o, d, _f([1e9]), _f(1.0), _f(-1.0), _f(1.0), _f(TWO_PI))
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)

    def test_z_clipped(self):
        # cap z in [0.5, 1]; off-axis ray crosses at |z| = 0.436 -> clipped away
        o = _f([[0.9, 0.0, -5.0]])
        d = _f([[0.0, 0.0, 1.0]])
        h = sphere_intersect(o, d, _f([1e9]), _f(1.0), _f(0.5), _f(1.0), _f(TWO_PI))
        assert not bool(h.hit[0])
        # but the axis ray does hit the far cap at z=+1
        h2 = sphere_intersect(_f([[0.0, 0.0, -5.0]]), d, _f([1e9]),
                              _f(1.0), _f(0.5), _f(1.0), _f(TWO_PI))
        assert bool(h2.hit[0])
        np.testing.assert_allclose(float(h2.t[0]), 6.0, atol=1e-4)

    def test_t_max_respected(self):
        o = _f([[0.0, 0.0, -5.0]])
        d = _f([[0.0, 0.0, 1.0]])
        h = sphere_intersect(o, d, _f([3.0]), _f(1.0), _f(-1.0), _f(1.0), _f(TWO_PI))
        assert not bool(h.hit[0])

    def test_normal_direction(self):
        h = sphere_intersect(_f([[0.0, 0.0, -5.0]]), _f([[0.0, 0.0, 1.0]]),
                             _f([1e9]), _f(1.0), _f(-1.0), _f(1.0), _f(TWO_PI))
        n = np.asarray(normalize(jnp.cross(h.dpdu, h.dpdv)))[0]
        np.testing.assert_allclose(n, [0, 0, -1], atol=1e-3)


class TestCylinder:
    def test_hit(self):
        h = cylinder_intersect(_f([[0.0, -5.0, 0.5]]), _f([[0.0, 1.0, 0.0]]),
                               _f([1e9]), _f(1.0), _f(0.0), _f(1.0), _f(TWO_PI))
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-4)

    def test_z_clip(self):
        h = cylinder_intersect(_f([[0.0, -5.0, 2.0]]), _f([[0.0, 1.0, 0.0]]),
                               _f([1e9]), _f(1.0), _f(0.0), _f(1.0), _f(TWO_PI))
        assert not bool(h.hit[0])


class TestDisk:
    def test_hit(self):
        h = disk_intersect(_f([[0.3, 0.0, 5.0]]), _f([[0.0, 0.0, -1.0]]),
                           _f([1e9]), _f(0.0), _f(1.0), _f(0.0), _f(TWO_PI))
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 5.0, atol=1e-4)

    def test_inner_radius_hole(self):
        h = disk_intersect(_f([[0.1, 0.0, 5.0]]), _f([[0.0, 0.0, -1.0]]),
                           _f([1e9]), _f(0.0), _f(1.0), _f(0.5), _f(TWO_PI))
        assert not bool(h.hit[0])

    def test_parallel_miss(self):
        h = disk_intersect(_f([[0.0, -5.0, 0.0]]), _f([[0.0, 1.0, 0.0]]),
                           _f([1e9]), _f(0.0), _f(1.0), _f(0.0), _f(TWO_PI))
        assert not bool(h.hit[0])


class TestTriangle:
    def test_hit_barycentrics(self):
        p0 = _f([0.0, 0.0, 0.0])
        p1 = _f([1.0, 0.0, 0.0])
        p2 = _f([0.0, 1.0, 0.0])
        h = triangle_intersect(_f([0.25, 0.25, -1.0]), _f([0.0, 0.0, 1.0]),
                               _f(1e9), p0, p1, p2)
        assert bool(h.hit)
        np.testing.assert_allclose(float(h.t), 1.0, atol=1e-5)
        b = np.array([float(h.b0), float(h.b1), float(h.b2)])
        np.testing.assert_allclose(b.sum(), 1.0, atol=1e-5)
        np.testing.assert_allclose(b, [0.5, 0.25, 0.25], atol=1e-5)

    def test_edge_and_outside(self):
        p0 = _f([0.0, 0.0, 0.0])
        p1 = _f([1.0, 0.0, 0.0])
        p2 = _f([0.0, 1.0, 0.0])
        h = triangle_intersect(_f([0.9, 0.9, -1.0]), _f([0.0, 0.0, 1.0]),
                               _f(1e9), p0, p1, p2)
        assert not bool(h.hit)

    def test_watertight_shared_edge(self):
        """A ray through a shared edge must hit exactly one of two abutting
        triangles (the watertightness guarantee of mesh.rs:214)."""
        q = [np.array([0, 0, 0.0]), np.array([1, 0, 0.0]),
             np.array([1, 1, 0.0]), np.array([0, 1, 0.0])]
        rng = np.random.default_rng(7)
        n = 256
        a = rng.random(n)
        pts = q[0][None, :] * (1 - a)[:, None] + q[2][None, :] * a[:, None]
        o = _f(pts + np.array([0.0, 0.0, -1.0]))
        d = _f(np.tile([0.0, 0.0, 1.0], (n, 1)))
        h1 = triangle_intersect(o, d, _f(np.full(n, 1e9)),
                                _f(q[0]), _f(q[1]), _f(q[2]))
        h2 = triangle_intersect(o, d, _f(np.full(n, 1e9)),
                                _f(q[0]), _f(q[2]), _f(q[3]))
        # watertight = no ray slips through the shared edge unseen
        # (double hits exactly on the edge are fine; closest-hit picks one)
        missed = ~(np.asarray(h1.hit) | np.asarray(h2.hit))
        assert not missed.any(), f"{missed.sum()}/{n} shared-edge rays missed both"

    def test_area(self):
        a = triangle_area(_f([0, 0, 0]), _f([2, 0, 0]), _f([0, 2, 0]))
        assert abs(float(a) - 2.0) < 1e-6

    def test_partial_derivs_orthogonal_to_normal(self):
        p0, p1, p2 = _f([0, 0, 0]), _f([1, 0, 0.5]), _f([0, 1, 0.25])
        uv0, uv1, uv2 = _f([0, 0]), _f([1, 0]), _f([0, 1])
        dpdu, dpdv = triangle_partial_derivs(p0, p1, p2, uv0, uv1, uv2)
        n = np.cross(np.asarray(p1 - p0), np.asarray(p2 - p0))
        assert abs(np.dot(np.asarray(dpdu), n)) < 1e-5
        assert abs(np.dot(np.asarray(dpdv), n)) < 1e-5


class TestSceneIntersect:
    def _one_sphere_scene(self):
        o2w = Transform.translate(0, 0, 0)
        quad = dict(
            q_type=np.array([0], np.int32),
            q_o2w=o2w.m[None], q_w2o=o2w.m_inv[None],
            q_params=np.array([[1.0, -1.0, 1.0, TWO_PI]], np.float32),
            q_material=np.array([3], np.int32),
            q_arealight=np.array([-1], np.int32),
            q_reverse=np.array([False]),
        )
        return make_geometry(quadrics=quad)

    def test_interaction_fields(self):
        geom = self._one_sphere_scene()
        ray = make_ray(_f([[0, 0, -5.0]]), _f([[0, 0, 1.0]]))
        si = scene_intersect(geom, ray)
        assert bool(si.valid[0])
        np.testing.assert_allclose(np.asarray(si.p[0]), [0, 0, -1], atol=1e-4)
        np.testing.assert_allclose(np.asarray(si.n[0]), [0, 0, -1], atol=1e-3)
        assert int(si.material[0]) == 3
        assert int(si.prim_id[0]) == 0
        np.testing.assert_allclose(np.asarray(si.wo[0]), [0, 0, -1], atol=1e-6)

    def test_closest_of_quadric_and_triangle(self):
        o2w = Transform.translate(0, 0, 0)
        quad = dict(
            q_type=np.array([0], np.int32),
            q_o2w=o2w.m[None], q_w2o=o2w.m_inv[None],
            q_params=np.array([[1.0, -1.0, 1.0, TWO_PI]], np.float32),
            q_material=np.array([0], np.int32),
            q_arealight=np.array([-1], np.int32),
            q_reverse=np.array([False]),
        )
        # big triangle in front of the sphere at z=-2
        tris = dict(
            tv_p=np.array([[-5, -5, -2], [5, -5, -2], [0, 5, -2]], np.float32),
            tv_n=np.zeros((3, 3), np.float32),
            tv_uv=np.zeros((3, 2), np.float32),
            tv_s=np.zeros((3, 3), np.float32),
            t_idx=np.array([[0, 1, 2]], np.int32),
            t_material=np.array([1], np.int32),
            t_arealight=np.array([-1], np.int32),
            t_reverse=np.array([False]),
            t_has_n=np.array([False]),
            t_has_uv=np.array([False]),
            t_alpha_tex=np.array([-1], np.int32),
        )
        geom = make_geometry(quadrics=quad, tris=tris)
        ray = make_ray(_f([[0, 0, -5.0]]), _f([[0, 0, 1.0]]))
        si = scene_intersect(geom, ray)
        assert bool(si.valid[0])
        np.testing.assert_allclose(float(si.t[0]), 3.0, atol=1e-4)  # triangle first
        assert int(si.material[0]) == 1
        assert int(si.prim_id[0]) == 1  # global id: 1 quadric + tri 0

    def test_shadow_ray(self):
        geom = self._one_sphere_scene()
        ray = make_ray(_f([[0, 0, -5.0]]), _f([[0, 0, 1.0]]))
        assert bool(scene_intersect_p(geom, ray)[0])
        ray2 = make_ray(_f([[0, 3.0, -5.0]]), _f([[0, 0, 1.0]]))
        assert not bool(scene_intersect_p(geom, ray2)[0])

    def test_reintersection_property(self):
        """From every hit, a ray spawned with offset_ray_origin must never
        re-hit the same convex shape (reference tests/shapes.rs:16-54)."""
        rng = np.random.default_rng(11)
        n = 512
        # random unit-sphere scene, rays from random points at radius 5
        geom = self._one_sphere_scene()
        o = rng.normal(size=(n, 3))
        o = 5.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        target = rng.normal(size=(n, 3))
        target = 0.5 * target / np.linalg.norm(target, axis=-1, keepdims=True)
        d = target - o
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        ray = make_ray(_f(o), _f(d))
        si = scene_intersect(geom, ray)
        assert np.asarray(si.valid).all()
        # spawn reflected rays outward along the normal hemisphere
        w = rng.normal(size=(n, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True)
        ns = np.asarray(si.n)
        w = np.where((w * ns).sum(-1, keepdims=True) < 0, -w, w)
        spawned = si.spawn_ray(_f(w))
        re_hit = scene_intersect_p(geom, spawned)
        assert not np.asarray(re_hit).any(), \
            f"{int(np.asarray(re_hit).sum())}/{n} spawned rays re-hit the sphere"
