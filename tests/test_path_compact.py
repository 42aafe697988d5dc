"""Inter-bounce half-compaction (integrators/path.py PATH_COMPACT_MIN_B):
when >= half the wavefront dies at bounce 0, the interior scan runs on a
static B/2 alive-first slab. Results must be identical to the full-width
scan (dead lanes' radiance is final; the full-width body only updates
them under alive masks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.integrators import path as P
from rustracer_tpu.render.camera import PerspectiveCamera
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import RenderContext, Renderer, RenderConfig
from rustracer_tpu.render.sampler import SamplerConfig
from rustracer_tpu.scene.api import parse_scene_string

SCENE = """
Film "image" "integer xresolution" [128] "integer yresolution" [128]
LookAt 0 1.2 -4  0 0.4 0  0 1 0
Camera "perspective" "float fov" [55]
Sampler "02sequence" "integer pixelsamples" [1]
Integrator "path" "integer maxdepth" [5]
WorldBegin
LightSource "point" "point from" [3 4 -3] "rgb I" [40 40 40]
AttributeBegin
  Material "plastic" "rgb Kd" [0.5 0.3 0.2] "float roughness" [0.1]
  Shape "sphere" "float radius" [0.7]
AttributeEnd
AttributeBegin
  Material "matte" "rgb Kd" [0.4 0.5 0.6]
  Translate 0 -1.2 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
AttributeEnd
WorldEnd
"""


def _render():
    api = parse_scene_string(SCENE)
    return np.asarray(api.scene.render())


def test_compacted_scan_matches_full_width(monkeypatch):
    # open scene at 128x128@1spp = 2^14 lanes with the threshold patched
    # down: most camera rays miss, so the compact branch is taken (same
    # cond/branch machinery as production, 4x cheaper than 256^2)
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 14)
    img_c = _render()
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 30)   # force full
    img_f = _render()
    # not bitwise: the B/2-shaped program makes different FMA-contraction
    # choices than the B-shaped one (measured max rel diff ~6e-7); the
    # estimator itself is identical
    np.testing.assert_allclose(img_c, img_f, rtol=2e-5, atol=2e-6)
    assert np.isfinite(img_c).all() and img_c.mean() > 1e-3


SPARSE_SCENE = """
Film "image" "integer xresolution" [64] "integer yresolution" [64]
LookAt 0 2.5 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [70]
Sampler "02sequence" "integer pixelsamples" [1]
Integrator "path" "integer maxdepth" [5]
WorldBegin
LightSource "point" "point from" [2 4 -2] "rgb I" [60 60 60]
AttributeBegin
  Material "matte" "rgb Kd" [0.6 0.5 0.4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-0.7 0 -0.7  0.7 0 -0.7  0.7 0 0.7  -0.7 0 0.7]
AttributeEnd
WorldEnd
"""


def test_quarter_tier_matches_full_width(monkeypatch):
    """The B/4 slab tier must execute AND match the full-width scan: a
    small floor quad under a wide-fov camera keeps the camera hit
    fraction below 1/4, so n_alive <= B/4 holds at interior-scan entry
    and the quarter branch is the one that runs (alive counts only decay
    across bounces)."""
    api = parse_scene_string(SPARSE_SCENE)
    sc = api.scene
    # guarantee the quarter branch is the executed one: camera hit
    # fraction must be <= 1/4 of the wavefront
    from rustracer_tpu.scene.tables import scene_intersect
    from rustracer_tpu.render.renderer import Lanes
    res = 64
    xs, ys = np.meshgrid(np.arange(res, dtype=np.int32),
                         np.arange(res, dtype=np.int32))
    pixel_idx = jnp.asarray((ys * res + xs).ravel().astype(np.uint32))
    pixel_xy = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
    sampler = sc.sampler
    p_film, p_lens, _ = sampler.get_camera_sample(
        pixel_xy, pixel_idx, jnp.zeros_like(pixel_idx))
    ray = sc.camera.generate_ray_differential(p_film, p_lens)
    si = scene_intersect(sc.context().geom, ray)
    frac = float(jnp.mean(si.valid.astype(jnp.float32)))
    assert 0.0 < frac <= 0.25, f"scene no longer sparse: hit frac {frac}"

    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 12)
    img_c = np.asarray(sc.render())
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 30)   # force full
    img_f = np.asarray(sc.render())
    np.testing.assert_allclose(img_c, img_f, rtol=2e-5, atol=2e-6)
    assert np.isfinite(img_c).all() and img_c.mean() > 1e-4


class TestPermTakePutVJP:
    """perm_take/perm_put (custom_vjp permutation compact) must match the
    plain gather/scatter in value AND gradient."""

    def test_matches_plain_gather_scatter(self):
        rng = np.random.RandomState(3)
        B, H = 64, 32
        x = jnp.asarray(rng.rand(B, 3).astype(np.float32))
        full = jnp.asarray(rng.rand(B, 3).astype(np.float32))
        alive = jnp.asarray(rng.rand(B) < 0.4)
        order = jnp.argsort(~alive)
        sel = order[:H]
        rank = jnp.argsort(order)

        def f_custom(x, full):
            sub = P.perm_take(x, sel, rank)
            out = P.perm_put(full, sub * 2.0, sel, rank)
            return jnp.sum(out ** 2) + jnp.sum(sub ** 3)

        def f_plain(x, full):
            sub = x[sel]
            out = full.at[sel].set(sub * 2.0)
            return jnp.sum(out ** 2) + jnp.sum(sub ** 3)

        v1, (gx1, gf1) = jax.value_and_grad(f_custom, argnums=(0, 1))(x, full)
        v2, (gx2, gf2) = jax.value_and_grad(f_plain, argnums=(0, 1))(x, full)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_allclose(gx1, gx2, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(gf1, gf2, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_compacted_scan_gradient_matches_full_width(monkeypatch):
    """value_and_grad parity with the compact branch actually executing:
    an open scene (most camera rays miss) at a patched-down threshold."""
    from rustracer_tpu.integrators.path import PathIntegrator
    from rustracer_tpu.render.renderer import Lanes, RenderContext, \
        scrub_radiance
    from rustracer_tpu.render.sampler import DimAllocator, SamplerConfig
    from rustracer_tpu.scene.materials import MaterialSet, MatteMaterial
    from rustracer_tpu.scene.textures import ConstantTexture
    from helpers import TriBuilder
    from rustracer_tpu.scene.tables import make_geometry
    from rustracer_tpu.scene.lights import LIGHT_POINT, make_lights

    res = 64
    # floor quad only: camera at y=2 looking down-forward, ~half the rays
    # escape -> >= B/2 lanes dead after bounce 0
    tb = TriBuilder()
    tb.add_quad([-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2], material=0)
    geom = make_geometry(None, tb.build())
    lights = make_lights([dict(type=LIGHT_POINT, pos=(1, 3, 1),
                               emit=(30, 30, 30), prim=-1)])
    ms = MaterialSet()
    ms.add(MatteMaterial(kd=ConstantTexture("kd")))
    cam = PerspectiveCamera.create(
        Transform.look_at([0, 2.0, -3.5], [0, 0, 0.5], [0, 1, 0]),
        fov=60.0, resolution=(res, res))
    sampler = SamplerConfig(kind="02sequence", spp=1)
    integ = PathIntegrator(mat_set=ms, max_depth=4)

    xs, ys = np.meshgrid(np.arange(res, dtype=np.int32),
                         np.arange(res, dtype=np.int32))
    pixel_idx = jnp.asarray((ys * res + xs).ravel().astype(np.uint32))
    pixel_xy = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))

    def loss(kd):
        ctx = RenderContext(geom=geom, lights=lights,
                            textures={"const": {"kd": kd}, "images": []})
        lanes = Lanes(pixel_idx=pixel_idx,
                      sample_idx=jnp.zeros_like(pixel_idx))
        p_film, p_lens, _ = sampler.get_camera_sample(
            pixel_xy, lanes.pixel_idx, lanes.sample_idx)
        ray = cam.generate_ray_differential(p_film, p_lens)
        L = scrub_radiance(integ.li(ctx, ray, lanes, sampler,
                                    DimAllocator()))
        return jnp.mean(L)

    kd0 = jnp.asarray([0.55, 0.4, 0.3], jnp.float32)
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 256)   # compact ON
    v_c, g_c = jax.value_and_grad(loss)(kd0)
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 30)  # full width
    v_f, g_f = jax.value_and_grad(loss)(kd0)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_f), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_f),
                               rtol=2e-5, atol=1e-7)
    assert float(jnp.abs(jnp.asarray(g_c)).sum()) > 1e-4
