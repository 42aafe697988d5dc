"""Light sampling + integrator correctness: analytic point-light check,
furnace test, Cornell box energy sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import cornell_box, cornell_camera, quad_dict

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.integrators.direct import DirectLightingIntegrator
from rustracer_tpu.integrators.path import PathIntegrator
from rustracer_tpu.integrators.whitted import WhittedIntegrator
from rustracer_tpu.render.camera import PerspectiveCamera
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import RenderContext, render
from rustracer_tpu.render.sampler import SamplerConfig
from rustracer_tpu.scene.lights import (LIGHT_DISTANT, LIGHT_POINT,
                                        make_lights)
from rustracer_tpu.scene.materials import MaterialSet, MatteMaterial
from rustracer_tpu.scene.tables import make_geometry
from rustracer_tpu.scene.textures import ConstantTexture


def matte_set(albedos):
    ms = MaterialSet()
    const = {}
    for i, a in enumerate(albedos):
        key = f"kd{i}"
        const[key] = jnp.asarray(a, jnp.float32)
        ms.add(MatteMaterial(kd=ConstantTexture(key)))
    return ms, {"const": const, "images": []}


def small_film(res):
    return Film(full_resolution=res, filter=Filter("box", 0.5, 0.5))


class TestDirectAnalytic:
    def _scene(self):
        geom = make_geometry(quadrics=quad_dict([((0, 0, 0), 1.0)]))
        lights = make_lights([dict(type=LIGHT_POINT, pos=(0, 0, -4),
                                   emit=(10, 10, 10), prim=-1)])
        ms, tex = matte_set([[0.8, 0.8, 0.8]])
        return RenderContext(geom=geom, lights=lights, textures=tex), ms

    def test_point_light_analytic(self):
        ctx, ms = self._scene()
        cam = PerspectiveCamera.create(
            Transform.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
            fov=45.0, resolution=(32, 32))
        integ = DirectLightingIntegrator(mat_set=ms, strategy="all", max_depth=2)
        img = np.asarray(render(ctx, integ.li, cam, small_film((32, 32)),
                                SamplerConfig(kind="02sequence", spp=4)))
        expected = 0.8 / np.pi * 10.0 / 9.0  # kd/pi * I/d^2, cos=1
        assert abs(img[16, 16, 0] - expected) < 0.02

    def test_shadowed_side_dark(self):
        ctx, ms = self._scene()
        # camera behind the sphere (light on the other side)
        cam = PerspectiveCamera.create(
            Transform.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
            fov=45.0, resolution=(32, 32))
        integ = DirectLightingIntegrator(mat_set=ms, strategy="all", max_depth=2)
        img = np.asarray(render(ctx, integ.li, cam, small_film((32, 32)),
                                SamplerConfig(kind="02sequence", spp=4)))
        assert img[16, 16, 0] < 1e-4

    def test_distant_light(self):
        geom = make_geometry(quadrics=quad_dict([((0, 0, 0), 1.0)]))
        # light shining along +z (w_light points toward -z source)
        w = np.array([0, 0, -1.0], np.float32)
        lights = make_lights([dict(type=LIGHT_DISTANT, pos=tuple(w),
                                   emit=(2, 2, 2), prim=-1)],
                             world_radius=10.0)
        ms, tex = matte_set([[0.5, 0.5, 0.5]])
        ctx = RenderContext(geom=geom, lights=lights, textures=tex)
        cam = PerspectiveCamera.create(
            Transform.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
            fov=45.0, resolution=(32, 32))
        integ = DirectLightingIntegrator(mat_set=ms, strategy="all", max_depth=2)
        img = np.asarray(render(ctx, integ.li, cam, small_film((32, 32)),
                                SamplerConfig(kind="02sequence", spp=4)))
        expected = 0.5 / np.pi * 2.0  # kd/pi * L * cos(0)
        assert abs(img[16, 16, 0] - expected) < 0.02


class TestFurnace:
    def test_furnace_convex_sphere(self):
        """Uniform env L0=1 + albedo-0.5 matte sphere: every surface point
        sees L0 everywhere (convex), so L_out = 0.5 exactly; and escaped
        rays see 1.0."""
        geom = make_geometry(quadrics=quad_dict([((0, 0, 0), 1.0)]))
        env = np.ones((8, 16, 3), np.float32)
        lights = make_lights([], inf_map=env, inf_scale=(1, 1, 1),
                             world_radius=10.0)
        ms, tex = matte_set([[0.5, 0.5, 0.5]])
        ctx = RenderContext(geom=geom, lights=lights, textures=tex)
        cam = PerspectiveCamera.create(
            Transform.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
            fov=45.0, resolution=(24, 24))
        integ = PathIntegrator(mat_set=ms, max_depth=4)
        img = np.asarray(render(ctx, integ.li, cam, small_film((24, 24)),
                                SamplerConfig(kind="02sequence", spp=32)))
        # background pixel = env
        np.testing.assert_allclose(img[1, 1], 1.0, atol=0.02)
        # sphere center pixel = albedo (single bounce suffices for convex)
        assert abs(img[12, 12, 0] - 0.5) < 0.04, img[12, 12, 0]


class TestCornellBox:
    def test_path_tracer_energy(self):
        geom, lights = cornell_box()
        ms, tex = matte_set([
            [0.73, 0.73, 0.73],  # white
            [0.63, 0.065, 0.05],  # red
            [0.14, 0.45, 0.09],  # green
            [0.0, 0.0, 0.0],      # light surface
        ])
        ctx = RenderContext(geom=geom, lights=lights, textures=tex)
        cam = cornell_camera((48, 48))
        integ = PathIntegrator(mat_set=ms, max_depth=5)
        img = np.asarray(render(ctx, integ.li, cam, small_film((48, 48)),
                                SamplerConfig(kind="02sequence", spp=16)))
        assert np.isfinite(img).all()
        assert img.max() > 1.0          # light source visible
        center = img[20:28, 20:28].mean()
        assert 0.05 < center < 5.0      # lit interior
        # left half should be red-tinted vs right half green-tinted
        left = img[24:40, 2:10]
        right = img[24:40, 38:46]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()

    def test_direct_vs_path_first_bounce(self):
        """Path depth-2 ~ direct lighting + emission for a diffuse scene."""
        geom, lights = cornell_box()
        ms, tex = matte_set([[0.5] * 3, [0.5] * 3, [0.5] * 3, [0.0] * 3])
        ctx = RenderContext(geom=geom, lights=lights, textures=tex)
        cam = cornell_camera((32, 32))
        film = small_film((32, 32))
        spp = SamplerConfig(kind="02sequence", spp=32)
        img_d = np.asarray(render(ctx, DirectLightingIntegrator(
            mat_set=ms, strategy="one", max_depth=1).li, cam, film, spp))
        img_p = np.asarray(render(ctx, PathIntegrator(
            mat_set=ms, max_depth=2).li, cam, film, spp))
        # depth-2 path = direct only; midtones should agree within MC noise
        sel = (img_d[..., 0] > 0.01) & (img_d[..., 0] < 1.0)
        diff = np.abs(img_d[..., 0] - img_p[..., 0])[sel]
        assert np.median(diff) < 0.03


class TestPerLightNSamples:
    """UniformSampleAll honors per-light "samples"/"nsamples"
    (diffuse.rs:46-50; integrator/mod.rs:154-172 averages that many
    samples per light)."""

    SCENE = """
LookAt 0 1 -3  0 0.5 0  0 1 0
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Camera "perspective" "float fov" [50]
Sampler "02sequence" "integer pixelsamples" [%d]
Integrator "directlighting" "integer maxdepth" [2]
WorldBegin
  AttributeBegin
    AreaLightSource "diffuse" "rgb L" [8 8 8] %s
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-0.6 2 -0.6  0.6 2 -0.6  0.6 2 0.6  -0.6 2 0.6]
  AttributeEnd
  Material "matte" "rgb Kd" [0.6 0.6 0.6]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-4 0 -4  4 0 -4  4 0 4  -4 0 4]
WorldEnd
"""

    def test_parse_and_average(self):
        from rustracer_tpu.scene.api import parse_scene_string
        api4 = parse_scene_string(self.SCENE % (4, '"integer samples" [4]'))
        integ = api4.scene.integrator
        assert any(n == 4 for n in integ.light_nsamples)
        img4 = np.asarray(api4.scene.render())

        # reference: the plain one-sample estimator at 4x the pixel samples
        api_ref = parse_scene_string(self.SCENE % (16, ""))
        assert api_ref.scene.integrator.light_nsamples == ()
        ref = np.asarray(api_ref.scene.render())

        # both estimate the same integral; 4 light samples x 4 spp should
        # land within a few percent of 1 sample x 16 spp on the lit floor
        assert img4.mean() == pytest.approx(ref.mean(), rel=0.05)
        assert np.abs(img4 - ref).mean() < 0.05 * max(ref.mean(), 1e-6)
