"""Multiple infinite lights + clipped-quadric area-light sampling.

Reference: scene.rs:28-49 caches a VECTOR of infinite lights and sums their
le for escaped rays (scene.rs:51-63); sphere.rs sample/area defines the
area-light sampling contract. Round 1 kept a single infinite slot and
sampled clipped spheres as full spheres with a mismatched pdf; these gate
the fixes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from helpers import quad_dict
from rustracer_tpu.core.ray import Ray
from rustracer_tpu.scene import lights as L
from rustracer_tpu.scene.tables import make_geometry, scene_intersect
from rustracer_tpu.core.sampling import uniform_sample_sphere


class TestMultipleInfiniteLights:
    def _two_light_tables(self):
        m1 = np.full((4, 8, 3), 0.5, np.float32)
        m2 = np.full((6, 12, 3), 0.25, np.float32)
        return L.make_lights(
            [], world_radius=10.0,
            infinite=[dict(map=m1, l2w=None, scale=(1.0, 1.0, 1.0)),
                      dict(map=m2, l2w=None, scale=(2.0, 2.0, 2.0))])

    def test_escaped_radiance_sums(self):
        lt = self._two_light_tables()
        assert lt.n_infinite == 2 and lt.n_lights == 2
        d = jnp.asarray(np.random.RandomState(0)
                        .normal(size=(16, 3)).astype(np.float32))
        le = np.asarray(L.infinite_le(lt, d))
        # 0.5*1 + 0.25*2 = 1.0 in every direction (constant maps)
        np.testing.assert_allclose(le, 1.0, rtol=1e-5)

    def test_per_light_le_and_pdf(self):
        lt = self._two_light_tables()
        geom = make_geometry()
        d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32))
        lid0 = jnp.zeros(4, jnp.int32)
        lid1 = jnp.ones(4, jnp.int32)
        le0 = np.asarray(L.infinite_le_one(lt, lid0, d))
        le1 = np.asarray(L.infinite_le_one(lt, lid1, d))
        np.testing.assert_allclose(le0, 0.5, rtol=1e-5)
        np.testing.assert_allclose(le1, 0.5, rtol=1e-5)  # 0.25 * scale 2

        class SI:  # minimal shading-point stand-in
            t = jnp.zeros(4)
            p = jnp.zeros((4, 3))
            p_error = jnp.zeros((4, 3))
            n = jnp.asarray(np.tile([[0, 0, 1]], (4, 1)).astype(np.float32))
            valid = jnp.ones(4, bool)

        u = jnp.asarray(np.random.RandomState(1).rand(4, 2).astype(np.float32))
        for lid in (lid0, lid1):
            ls = L.sample_li(lt, geom, lid, SI(), u)
            pdf2 = np.asarray(L.pdf_li(lt, geom, lid, SI(), ls.wi))
            np.testing.assert_allclose(np.asarray(ls.pdf), pdf2, rtol=1e-4)
        # constant maps: both lights sample isotropically with pdf 1/4pi
        ls = L.sample_li(lt, geom, lid1, SI(), u)
        np.testing.assert_allclose(np.asarray(ls.pdf), 1.0 / (4 * np.pi),
                                   rtol=0.35)


class TestClippedSphereLight:
    def _scene(self, z_min_frac):
        """Sphere light at origin, radius 1, clipped at z >= z_min_frac."""
        import numpy as np
        from rustracer_tpu.core.transform import Transform
        t = Transform()
        quad = dict(
            q_type=np.zeros(1, np.int32),
            q_o2w=t.m[None], q_w2o=t.m_inv[None],
            q_params=np.array([[1.0, z_min_frac, 1.0, 2 * np.pi]],
                              np.float32),
            q_material=np.full(1, -1, np.int32),
            q_arealight=np.zeros(1, np.int32),
            q_reverse=np.zeros(1, bool),
        )
        geom = make_geometry(quadrics=quad)
        lights = L.make_lights(
            [dict(type=L.LIGHT_AREA, pos=(0, 0, 0), emit=(1.0, 1.0, 1.0),
                  prim=0, twosided=False)], world_radius=10.0)
        return geom, lights

    def test_samples_respect_clipping(self):
        geom, lights = self._scene(0.0)  # upper hemisphere only
        n = 512
        rs = np.random.RandomState(2)
        u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
        prim = jnp.zeros(n, jnp.int32)
        p, ng, err, area = L._sample_prim(geom, prim, u)
        p = np.asarray(p)
        assert (p[:, 2] >= -1e-5).all(), "sampled below the clip plane"
        # clipped area = phimax * r * (zmax - zmin) = 2pi
        np.testing.assert_allclose(np.asarray(area), 2 * np.pi, rtol=1e-5)

    @pytest.mark.parametrize("zmin", [-1.0, 0.0])
    def test_irradiance_matches_bruteforce(self, zmin):
        """Area-sampled irradiance (sample_li with the clipped pdf) must
        agree with brute-force directional MC through scene_intersect —
        an end-to-end check that pdf, area, and visibility are consistent."""
        geom, lights = self._scene(zmin)
        n = 1 << 14
        rs = np.random.RandomState(3)
        # shading point to the side so the clip plane matters
        p0 = np.array([3.0, 0.0, 0.5], np.float32)

        from types import SimpleNamespace
        si = SimpleNamespace(
            t=jnp.zeros(n),
            p=jnp.asarray(np.tile(p0, (n, 1))),
            p_error=jnp.full((n, 3), 1e-5, jnp.float32),
            n=jnp.asarray(np.tile([[-1.0, 0.0, 0.0]], (n, 1))
                          .astype(np.float32)),
            valid=jnp.ones(n, bool))
        u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
        lid = jnp.zeros(n, jnp.int32)
        ls = L.sample_li(lights, geom, lid, si, u)
        from rustracer_tpu.integrators.common import unoccluded
        vis = np.asarray(unoccluded(geom, si, ls))
        w = np.asarray(ls.li)[:, 0] * vis / np.maximum(np.asarray(ls.pdf),
                                                       1e-12)
        # cosine at the receiver w.r.t. its normal (-x toward the sphere)
        cos_r = np.maximum(np.asarray(ls.wi) @ np.array([-1.0, 0, 0]), 0.0)
        est_area = (w * cos_r).mean()

        # brute force: uniform sphere directions, closest hit, le if light
        d = np.asarray(uniform_sample_sphere(
            jnp.asarray(rs.rand(n, 2).astype(np.float32))))
        ray = Ray(o=jnp.asarray(np.tile(p0, (n, 1))), d=jnp.asarray(d),
                  t_max=jnp.full(n, np.inf, jnp.float32))
        hit = scene_intersect(geom, ray)
        le = np.asarray(L.arealight_le(lights, hit.arealight, hit.n,
                                       hit.wo))[:, 0]
        le = le * np.asarray(hit.valid)
        cos_r2 = np.maximum(d @ np.array([-1.0, 0, 0]), 0.0)
        est_brute = (le * cos_r2).mean() * 4.0 * np.pi

        assert est_area == pytest.approx(est_brute, rel=0.08), \
            f"zmin={zmin}: area {est_area} vs brute {est_brute}"
