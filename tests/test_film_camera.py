"""Film, filter, camera, and end-to-end normal-integrator tests."""
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.integrators import ao as ao_int
from rustracer_tpu.integrators import normal as normal_int
from rustracer_tpu.render.camera import PerspectiveCamera
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import RenderContext, render
from rustracer_tpu.render.sampler import SamplerConfig
from rustracer_tpu.scene.tables import make_geometry

TWO_PI = 2.0 * np.pi


def sphere_geom(radius=1.0, material=0):
    o2w = Transform()
    quad = dict(
        q_type=np.array([0], np.int32),
        q_o2w=o2w.m[None], q_w2o=o2w.m_inv[None],
        q_params=np.array([[radius, -radius, radius, TWO_PI]], np.float32),
        q_material=np.array([material], np.int32),
        q_arealight=np.array([-1], np.int32),
        q_reverse=np.array([False]),
    )
    return make_geometry(quadrics=quad)


class TestFilters:
    def test_box(self):
        f = Filter("box", 0.5, 0.5)
        assert float(f.evaluate(jnp.float32(0.0), jnp.float32(0.0))) == 1.0
        assert float(f.evaluate(jnp.float32(0.6), jnp.float32(0.0))) == 0.0

    def test_triangle(self):
        f = Filter("triangle", 2.0, 2.0)
        assert float(f.evaluate(jnp.float32(0.0), jnp.float32(0.0))) == 4.0
        assert float(f.evaluate(jnp.float32(2.1), jnp.float32(0.0))) == 0.0

    def test_gaussian_positive_inside(self):
        f = Filter("gaussian", 2.0, 2.0)
        assert float(f.evaluate(jnp.float32(1.0), jnp.float32(1.0))) > 0.0
        assert float(f.evaluate(jnp.float32(2.0), jnp.float32(0.0))) <= 1e-6

    def test_mitchell_negative_lobe(self):
        f = Filter("mitchell", 2.0, 2.0)
        assert float(f.evaluate(jnp.float32(0.0), jnp.float32(0.0))) > 0.0
        # Mitchell has negative lobes around |x| ~ 1.2/2*width
        v = float(f.evaluate(jnp.float32(1.3), jnp.float32(0.0)))
        assert v < 0.0


class TestFilm:
    def test_add_sample_box(self):
        film = Film(full_resolution=(4, 4), filter=Filter("box", 0.5, 0.5))
        st = film.init_state()
        p = jnp.asarray([[1.5, 2.5]])  # center of pixel (1, 2)
        L = jnp.asarray([[1.0, 2.0, 3.0]])
        st = film.add_samples(st, p, L)
        img = np.asarray(film.to_image(st))
        np.testing.assert_allclose(img[2, 1], [1, 2, 3], atol=1e-6)
        assert np.count_nonzero(img.sum(-1)) == 1

    def test_average_of_samples(self):
        film = Film(full_resolution=(2, 2), filter=Filter("box", 0.5, 0.5))
        st = film.init_state()
        p = jnp.asarray([[0.5, 0.5], [0.5, 0.5]])
        L = jnp.asarray([[1.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
        st = film.add_samples(st, p, L)
        img = np.asarray(film.to_image(st))
        np.testing.assert_allclose(img[0, 0, 0], 2.0, atol=1e-6)

    def test_wide_filter_spreads(self):
        film = Film(full_resolution=(5, 5), filter=Filter("triangle", 2.0, 2.0))
        st = film.init_state()
        st = film.add_samples(st, jnp.asarray([[2.5, 2.5]]),
                              jnp.asarray([[1.0, 1.0, 1.0]]))
        img = np.asarray(film.to_image(st))
        assert img[2, 2, 0] > 0
        assert img[2, 1, 0] > 0  # neighbors got weight
        # normalized: pixel value = weighted avg of one sample = 1 everywhere hit
        np.testing.assert_allclose(img[2, 2, 0], 1.0, atol=1e-5)

    def test_crop_window(self):
        film = Film(full_resolution=(8, 8), crop_window=(0.25, 0.25, 0.75, 0.75),
                    filter=Filter("box", 0.5, 0.5))
        assert film.cropped_pixel_bounds == (2, 2, 6, 6)
        assert film.cropped_resolution == (4, 4)

    def test_max_sample_luminance(self):
        film = Film(full_resolution=(2, 2), filter=Filter("box", 0.5, 0.5),
                    max_sample_luminance=1.0)
        st = film.init_state()
        st = film.add_samples(st, jnp.asarray([[0.5, 0.5]]),
                              jnp.asarray([[100.0, 100.0, 100.0]]))
        img = np.asarray(film.to_image(st))
        assert img[0, 0].max() < 5.0

    def test_splat(self):
        film = Film(full_resolution=(3, 3), filter=Filter("box", 0.5, 0.5))
        st = film.init_state()
        st = film.add_splats(st, jnp.asarray([[1.5, 1.5]]),
                             jnp.asarray([[2.0, 0.0, 0.0]]))
        img = np.asarray(film.to_image(st, splat_scale=0.5))
        np.testing.assert_allclose(img[1, 1, 0], 1.0, atol=1e-6)


class TestCamera:
    def _cam(self, res=(64, 64), fov=45.0, **kw):
        c2w = Transform.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
        return PerspectiveCamera.create(c2w, fov=fov, resolution=res, **kw)

    def test_center_ray(self):
        cam = self._cam()
        p_film = jnp.asarray([[32.0, 32.0]])
        p_lens = jnp.asarray([[0.5, 0.5]])
        ray = cam.generate_ray_differential(p_film, p_lens)
        np.testing.assert_allclose(np.asarray(ray.o[0]), [0, 0, -5], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ray.d[0]), [0, 0, 1], atol=1e-5)

    def test_corner_rays_diverge(self):
        cam = self._cam()
        p = jnp.asarray([[0.0, 0.0], [64.0, 64.0]])
        u = jnp.full((2, 2), 0.5)
        ray = cam.generate_ray_differential(p, u)
        d = np.asarray(ray.d)
        assert d[0, 0] != d[1, 0] and (d[:, 2] > 0).all()
        # 45deg fov: corner ray x-angle ~ atan(tan(22.5deg)*sqrt2 ...) > 0
        assert abs(d[0, 0]) > 0.2

    def test_differentials_one_pixel_apart(self):
        cam = self._cam()
        p = jnp.asarray([[32.0, 32.0]])
        u = jnp.full((1, 2), 0.5)
        r = cam.generate_ray_differential(p, u)
        r2 = cam.generate_ray_differential(p + jnp.asarray([1.0, 0.0]), u)
        np.testing.assert_allclose(np.asarray(r.rx_direction), np.asarray(r2.d),
                                   atol=1e-6)

    def test_dof_lens_changes_origin(self):
        cam = self._cam(lens_radius=0.2, focal_distance=5.0)
        p = jnp.asarray([[32.0, 32.0], [32.0, 32.0]])
        u = jnp.asarray([[0.1, 0.2], [0.9, 0.7]])
        ray = cam.generate_ray_differential(p, u)
        o = np.asarray(ray.o)
        assert not np.allclose(o[0], o[1])


class TestEndToEnd:
    def test_normal_integrator_sphere(self):
        geom = sphere_geom()
        c2w = Transform.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0])
        cam = PerspectiveCamera.create(c2w, fov=45.0, resolution=(32, 32))
        film = Film(full_resolution=(32, 32), filter=Filter("box", 0.5, 0.5))
        sampler = SamplerConfig(kind="02sequence", spp=4)
        img = np.asarray(render(RenderContext(geom=geom), normal_int.li,
                                cam, film, sampler))
        assert img.shape == (32, 32, 3)
        assert img[16, 16, 0] > 0.95     # head-on normal
        assert img[1, 1, 0] == 0.0       # background

    def test_ao_integrator_lone_sphere_unoccluded(self):
        geom = sphere_geom()
        c2w = Transform.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0])
        cam = PerspectiveCamera.create(c2w, fov=45.0, resolution=(16, 16))
        film = Film(full_resolution=(16, 16), filter=Filter("box", 0.5, 0.5))
        sampler = SamplerConfig(kind="random", spp=4)
        li = lambda *a, **k: ao_int.li(*a, n_samples=4, **k)
        img = np.asarray(render(RenderContext(geom=geom), li, cam, film, sampler))
        # a lone convex sphere has zero self-occlusion
        assert img[8, 8, 0] > 0.99
