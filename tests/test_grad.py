"""Backward-pass correctness: jax.grad vs central finite differences.

BASELINE.json demands "pixel gradients allclose to finite differences". The
estimator is deterministic given (pixel_idx, sample_idx) — the stateless
(0,2)-sequence sampler gives common random numbers across parameter
perturbations, so central FD converges to the analytic gradient of the
*estimator* (not just the expectation) wherever sampling decisions are
detached from the parameters (no RR at these depths, matte-only lobes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import cornell_box, cornell_camera
from rustracer_tpu.integrators.path import PathIntegrator
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import Lanes, RenderContext, scrub_radiance
from rustracer_tpu.render.sampler import DimAllocator, SamplerConfig
from rustracer_tpu.scene.materials import MaterialSet, MatteMaterial
from rustracer_tpu.scene.textures import ConstantTexture, ImageTexture
from rustracer_tpu.ops.mipmap import build_pyramid

RES = (16, 16)
SPP = 4
MAX_DEPTH = 3  # no Russian roulette below bounce 4 → fully detached sampling


def _setup(image_floor=False, atlas=False):
    geom, lights = cornell_box()
    ms = MaterialSet()
    const = {}
    for i, a in enumerate([[0.73] * 3, [0.63, 0.065, 0.05],
                           [0.14, 0.45, 0.09], [0.0] * 3]):
        const[f"kd{i}"] = jnp.asarray(a, jnp.float32)
    images = []
    if image_floor:
        # 4x4 gray image on material 0 (walls/floor/ceiling); atlas=True
        # routes it through the shared-atlas EWA path (atlas_meta in ctx +
        # eligible default ImageTexture) instead of the per-texture lookup
        img = np.full((4, 4, 3), 0.6, np.float32)
        images.append([jnp.asarray(lv) for lv in build_pyramid(img)])
        ms.add(MatteMaterial(kd=ImageTexture(0, trilinear=not atlas)))
    else:
        ms.add(MatteMaterial(kd=ConstantTexture("kd0")))
    for i in (1, 2, 3):
        ms.add(MatteMaterial(kd=ConstantTexture(f"kd{i}")))
    textures = {"const": const, "images": images}
    if atlas:
        from rustracer_tpu.scene.atlas import build_atlas_meta
        am = build_atlas_meta(images)
        textures["atlas_meta"] = am["atlas_meta"]
        textures["atlas_levels"] = am["atlas_levels"]
    ctx = RenderContext(geom=geom, lights=lights, textures=textures)
    cam = cornell_camera(RES)
    sampler = SamplerConfig(kind="02sequence", spp=SPP)
    integ = PathIntegrator(mat_set=ms, max_depth=MAX_DEPTH)
    return ctx, cam, sampler, integ


def _make_loss(ctx, cam, sampler, integ):
    """loss(ctx) = mean radiance over all pixels x SPP samples."""
    xr, yr = RES
    xs, ys = np.meshgrid(np.arange(xr, dtype=np.int32),
                         np.arange(yr, dtype=np.int32))
    px = jnp.asarray(xs.ravel())
    py = jnp.asarray(ys.ravel())
    pixel_idx = (py.astype(jnp.uint32) * jnp.uint32(xr)
                 + px.astype(jnp.uint32))
    pixel_xy = jnp.stack([px, py], axis=-1).astype(jnp.float32)

    def loss(ctx):
        total = 0.0
        for s in range(SPP):
            lanes = Lanes(pixel_idx=pixel_idx,
                          sample_idx=jnp.full(pixel_idx.shape, s, jnp.uint32))
            p_film, p_lens, _ = sampler.get_camera_sample(
                pixel_xy, lanes.pixel_idx, lanes.sample_idx)
            ray = cam.generate_ray_differential(p_film, p_lens)
            dims = DimAllocator()
            L = scrub_radiance(integ.li(ctx, ray, lanes, sampler, dims))
            total = total + jnp.mean(L)
        return total / SPP

    return jax.jit(loss)


def _fd(loss, ctx, set_param, theta0, eps):
    """Central finite difference d loss / d theta (scalar theta)."""
    lp = float(loss(set_param(ctx, theta0 + eps)))
    lm = float(loss(set_param(ctx, theta0 - eps)))
    return (lp - lm) / (2.0 * eps)


class TestGradVsFiniteDifference:
    def test_matte_kd(self):
        """d loss / d kd0 (white walls) matches FD per channel."""
        ctx, cam, sampler, integ = _setup()
        loss = _make_loss(ctx, cam, sampler, integ)

        def loss_of_kd(kd0):
            const = dict(ctx.textures["const"])
            const["kd0"] = kd0
            return loss(ctx._replace(textures={**ctx.textures,
                                               "const": const}))

        g = jax.grad(loss_of_kd)(ctx.textures["const"]["kd0"])
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.all(g > 0)  # brighter walls → brighter image
        kd0 = np.asarray(ctx.textures["const"]["kd0"])
        for c in range(3):
            eps = 1e-3

            def set_c(ctx_, v, c=c):
                const = dict(ctx_.textures["const"])
                const["kd0"] = jnp.asarray(kd0).at[c].set(v)
                return ctx_._replace(textures={**ctx_.textures,
                                               "const": const})

            fd = _fd(loss, ctx, set_c, float(kd0[c]), eps)
            assert g[c] == pytest.approx(fd, rel=2e-2, abs=1e-5), \
                f"channel {c}: grad {g[c]} vs FD {fd}"

    @pytest.mark.slow
    def test_area_light_emission(self):
        """d loss / d L_emit: radiance is linear in emission, so FD is exact
        up to float noise. Reference capability: new (BASELINE.json bwd)."""
        ctx, cam, sampler, integ = _setup()
        loss = _make_loss(ctx, cam, sampler, integ)
        emit0 = np.asarray(ctx.lights.l_emit)

        def loss_of_emit(l_emit):
            return loss(ctx._replace(lights=ctx.lights._replace(l_emit=l_emit)))

        g = np.asarray(jax.grad(loss_of_emit)(ctx.lights.l_emit))
        assert np.all(np.isfinite(g))
        # perturb light 0's green channel
        eps = 0.05

        def set_v(ctx_, v):
            le = jnp.asarray(emit0).at[0, 1].set(v)
            return ctx_._replace(lights=ctx_.lights._replace(l_emit=le))

        fd = _fd(loss, ctx, set_v, float(emit0[0, 1]), eps)
        assert g[0, 1] == pytest.approx(fd, rel=1e-2, abs=1e-6)
        # linearity: loss(2*emit) - loss(emit) == sum(g * emit)
        l1 = float(loss(ctx))
        l2 = float(loss(ctx._replace(lights=ctx.lights._replace(
            l_emit=jnp.asarray(2.0 * emit0)))))
        assert l2 - l1 == pytest.approx(float((g * emit0).sum()), rel=1e-3)

    @pytest.mark.slow
    def test_imagemap_texel(self):
        """d loss / d (mip level-0 texel) on an image-textured wall."""
        ctx, cam, sampler, integ = _setup(image_floor=True)
        loss = _make_loss(ctx, cam, sampler, integ)
        pyr0 = [np.asarray(lv) for lv in ctx.textures["images"][0]]

        def loss_of_level0(level0):
            images = [[level0] + list(ctx.textures["images"][0][1:])]
            return loss(ctx._replace(textures={**ctx.textures,
                                               "images": images}))

        g = np.asarray(jax.grad(loss_of_level0)(ctx.textures["images"][0][0]))
        assert np.all(np.isfinite(g))
        assert g.sum() > 0
        # FD on the brightest-gradient texel
        flat = np.abs(g).sum(-1)
        ti, tj = np.unravel_index(np.argmax(flat), flat.shape)
        eps = 5e-3

        def set_v(ctx_, v):
            lv0 = jnp.asarray(pyr0[0]).at[ti, tj, 0].set(v)
            images = [[lv0] + [jnp.asarray(l) for l in pyr0[1:]]]
            return ctx_._replace(textures={**ctx_.textures, "images": images})

        fd = _fd(loss, ctx, set_v, float(pyr0[0][ti, tj, 0]), eps)
        assert g[ti, tj, 0] == pytest.approx(fd, rel=2e-2, abs=1e-6)

    @pytest.mark.slow
    def test_atlas_texel(self):
        """d loss / d (mip level-0 texel) THROUGH the shared-atlas EWA
        path (atlas_lookup_ewa + atlas_texels concat), vs central FD —
        round-4 blind spot: the atlas had forward-parity coverage only."""
        ctx, cam, sampler, integ = _setup(image_floor=True, atlas=True)
        # sanity: the material set must actually take the atlas fast path
        S_, slot_tab, regs, _ = integ.mat_set.atlas_prep()
        assert S_ == 1 and regs is not None
        loss = _make_loss(ctx, cam, sampler, integ)
        pyr0 = [np.asarray(lv) for lv in ctx.textures["images"][0]]

        def loss_of_level0(level0):
            images = [[level0] + list(ctx.textures["images"][0][1:])]
            return loss(ctx._replace(textures={**ctx.textures,
                                               "images": images}))

        g = np.asarray(jax.grad(loss_of_level0)(ctx.textures["images"][0][0]))
        assert np.all(np.isfinite(g))
        assert g.sum() > 0
        flat = np.abs(g).sum(-1)
        ti, tj = np.unravel_index(np.argmax(flat), flat.shape)
        eps = 5e-3

        def set_v(ctx_, v):
            lv0 = jnp.asarray(pyr0[0]).at[ti, tj, 0].set(v)
            images = [[lv0] + [jnp.asarray(l) for l in pyr0[1:]]]
            return ctx_._replace(textures={**ctx_.textures, "images": images})

        fd = _fd(loss, ctx, set_v, float(pyr0[0][ti, tj, 0]), eps)
        assert g[ti, tj, 0] == pytest.approx(fd, rel=2e-2, abs=1e-6)

    @pytest.mark.slow
    def test_grad_deterministic(self):
        """Detached stateless sampling ⇒ bitwise-identical gradients across
        evaluations (no hidden RNG state)."""
        ctx, cam, sampler, integ = _setup()
        loss = _make_loss(ctx, cam, sampler, integ)

        def loss_of_kd(kd0):
            const = dict(ctx.textures["const"])
            const["kd0"] = kd0
            return loss(ctx._replace(textures={**ctx.textures,
                                               "const": const}))

        gfn = jax.jit(jax.grad(loss_of_kd))
        g1 = np.asarray(gfn(ctx.textures["const"]["kd0"]))
        g2 = np.asarray(gfn(ctx.textures["const"]["kd0"]))
        np.testing.assert_array_equal(g1, g2)
