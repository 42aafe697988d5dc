"""Catmull-Rom/Fourier interpolation + FourierBSDF tests.

Reference behaviors: rustracer-core/src/interpolation.rs,
rustracer-core/src/bsdf/fourier.rs. The analytic fixture is a synthesized
.bsdf table that encodes f = kd/π (only the k=0 Fourier coefficient), so
every evaluation path has a closed-form expected value.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rustracer_tpu.core import interpolation as I
from rustracer_tpu.ops import fourier as F
from rustracer_tpu.ops import bsdf as B


def ref_catmull_rom_weights(nodes, x):
    """Direct numpy port of interpolation.rs:108-156 (scalar)."""
    size = len(nodes)
    if not (nodes[0] <= x <= nodes[-1]):
        return None, np.zeros(4)
    idx = np.searchsorted(nodes, x, side="right") - 1
    idx = min(max(idx, 0), size - 2)
    w = np.zeros(4)
    x0, x1 = nodes[idx], nodes[idx + 1]
    t = (x - x0) / (x1 - x0)
    t2, t3 = t * t, t ** 3
    w[1] = 2 * t3 - 3 * t2 + 1
    w[2] = -2 * t3 + 3 * t2
    if idx > 0:
        w0 = (t3 - 2 * t2 + t) * (x1 - x0) / (x1 - nodes[idx - 1])
        w[0] = -w0
        w[2] += w0
    else:
        w0 = t3 - 2 * t2 + t
        w[1] -= w0
        w[2] += w0
    if idx + 2 < size:
        w3 = (t3 - t2) * (x1 - x0) / (nodes[idx + 2] - x0)
        w[1] -= w3
        w[3] = w3
    else:
        w3 = t3 - t2
        w[1] -= w3
        w[2] += w3
    return idx - 1, w


class TestCatmullRom:
    def test_weights_match_reference(self):
        nodes = np.array([-1.0, -0.5, 0.1, 0.4, 1.0], np.float32)
        xs = np.array([-1.0, -0.75, -0.2, 0.1, 0.3, 0.9, 1.0], np.float32)
        off, w, valid = I.catmull_rom_weights(jnp.asarray(nodes),
                                             jnp.asarray(xs))
        off, w, valid = map(np.asarray, (off, w, valid))
        assert valid.all()
        for i, x in enumerate(xs):
            o_ref, w_ref = ref_catmull_rom_weights(nodes, float(x))
            assert off[i] == o_ref
            np.testing.assert_allclose(w[i], w_ref, atol=1e-5)

    def test_weights_out_of_bounds(self):
        nodes = jnp.asarray([0.0, 1.0, 2.0])
        _, w, valid = I.catmull_rom_weights(nodes, jnp.asarray([-0.5, 2.5]))
        assert not np.asarray(valid).any()
        np.testing.assert_array_equal(np.asarray(w), 0.0)

    def test_spline_interpolates_nodes(self):
        # weighted sum of values at node x must reproduce the node value
        nodes = np.array([0.0, 0.3, 0.7, 1.0], np.float32)
        vals = np.array([1.0, 4.0, -2.0, 3.0], np.float32)
        off, w, valid = I.catmull_rom_weights(jnp.asarray(nodes),
                                             jnp.asarray(nodes))
        off, w = np.asarray(off), np.asarray(w)
        for i in range(len(nodes)):
            acc = sum(w[i, j] * vals[np.clip(off[i] + j, 0, 3)]
                      for j in range(4))
            np.testing.assert_allclose(acc, vals[i], atol=1e-5)

    def test_integrate_linear(self):
        # ∫0..1 of f(x)=x is 0.5; catmull-rom integrates cubics exactly
        x = np.linspace(0, 1, 8).astype(np.float32)
        cdf, total = I.integrate_catmull_rom_np(x, x)
        np.testing.assert_allclose(total, 0.5, atol=1e-6)
        np.testing.assert_allclose(cdf[-1], 0.5, atol=1e-6)

    def test_invert_roundtrip(self):
        x = np.linspace(0.0, 2.0, 16).astype(np.float32)
        vals = (x ** 2).astype(np.float32)  # monotone
        u = jnp.asarray([0.0, 0.3, 1.7, 3.99, 4.0], jnp.float32)
        out = np.asarray(I.invert_catmull_rom(x, vals, u))
        np.testing.assert_allclose(out, np.sqrt(np.asarray(u)), atol=1e-3)


class TestFourierSeries:
    def test_eval_matches_direct_sum(self):
        rng = np.random.RandomState(0)
        ak = rng.randn(5, 8).astype(np.float32)
        cos_phi = np.cos(rng.uniform(0, np.pi, 5)).astype(np.float32)
        got = np.asarray(I.fourier(jnp.asarray(ak), jnp.asarray(cos_phi)))
        phi = np.arccos(cos_phi)
        want = np.stack([sum(ak[i, k] * np.cos(k * phi[i]) for k in range(8))
                         for i in range(5)])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_sample_constant_is_uniform(self):
        # only a0 ⇒ f constant in phi ⇒ pdf = 1/(2π), phi = u-warped linearly
        ak = jnp.zeros((64, 4)).at[:, 0].set(0.7)
        u = jnp.linspace(0.01, 0.99, 64)
        Y, pdf, phi = I.sample_fourier(ak, u)
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / (2 * np.pi),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(Y), 0.7, atol=1e-4)
        # flip symmetry: u and 1-u give mirrored phi
        np.testing.assert_allclose(np.asarray(phi[:32]),
                                   2 * np.pi - np.asarray(phi[::-1][:32]),
                                   atol=1e-3)

    def test_sample_inverts_cdf(self):
        # f(phi) = 1 + cos(phi): F(phi)/F(pi) = (phi + sin phi)/pi on [0,π]
        ak = jnp.zeros((32, 2))
        ak = ak.at[:, 0].set(1.0).at[:, 1].set(1.0)
        u = jnp.linspace(0.02, 0.48, 32)  # stay on the non-flipped side
        _, _, phi = I.sample_fourier(ak, u)
        phi_np = np.asarray(phi)
        u_back = (phi_np + np.sin(phi_np)) / np.pi * 0.5
        np.testing.assert_allclose(u_back, np.asarray(u), atol=1e-4)


def _lambertian_set(kd=(0.6, 0.4, 0.2), n_mu=24):
    tab = F.make_lambertian_table(kd, n_mu=n_mu)
    return F.make_table_set([tab]), tab


class TestFourierTable:
    def test_bsdf_file_roundtrip(self, tmp_path):
        tab = F.make_lambertian_table((0.5, 0.5, 0.5), n_mu=8)
        p = str(tmp_path / "lambert.bsdf")
        F.write_bsdf_table(p, tab["mu"], tab["a"], tab["a_offset"], tab["m"],
                           tab["cdf"], eta=tab["eta"], n_channels=3)
        back = F.read_bsdf_table(p)
        np.testing.assert_allclose(back["mu"], tab["mu"])
        np.testing.assert_allclose(back["a"], tab["a"])
        np.testing.assert_array_equal(back["m"], tab["m"])
        np.testing.assert_allclose(back["cdf"], tab["cdf"], atol=1e-6)
        assert back["eta"] == pytest.approx(1.0)
        assert back["n_channels"] == 3

    def test_f_matches_lambertian(self):
        ts, _ = _lambertian_set()
        rng = np.random.RandomState(1)
        n = 128
        # wo up, wi down-ish (reflection: wo.z>0, wi.z>0 in shading space
        # means muI = -wi.z < 0, muO > 0 ⇒ opposite signs ⇒ table reflection)
        wo = rng.randn(n, 3)
        wo[:, 2] = np.abs(wo[:, 2]) + 0.2
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rng.randn(n, 3)
        wi[:, 2] = np.abs(wi[:, 2]) + 0.2
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        tid = jnp.zeros(n, jnp.int32)
        f = np.asarray(F.fourier_f(ts, tid, jnp.asarray(wo, jnp.float32),
                                   jnp.asarray(wi, jnp.float32)))
        want = np.asarray([0.6, 0.4, 0.2]) / np.pi
        # catmull-rom interpolation of |mu| has small wiggle; loose tol
        np.testing.assert_allclose(f, np.broadcast_to(want, f.shape),
                                   rtol=0.08, atol=5e-3)

    def test_pdf_integrates_to_one(self):
        ts, _ = _lambertian_set()
        # integrate pdf over the sphere via uniform MC
        rng = np.random.RandomState(2)
        n = 8192
        wi = rng.randn(n, 3)
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        wo = np.tile(np.array([0.3, 0.1, 0.95]), (n, 1))
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        tid = jnp.zeros(n, jnp.int32)
        pdf = np.asarray(F.fourier_pdf(ts, tid,
                                       jnp.asarray(wo, jnp.float32),
                                       jnp.asarray(wi, jnp.float32)))
        integral = pdf.mean() * 4.0 * np.pi
        assert integral == pytest.approx(1.0, rel=0.15)

    def test_sample_f_consistency(self):
        ts, _ = _lambertian_set()
        rng = np.random.RandomState(3)
        n = 256
        wo = np.tile(np.array([0.2, -0.3, 0.93]), (n, 1))
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        u = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)), jnp.float32)
        tid = jnp.zeros(n, jnp.int32)
        wi, f, pdf = F.fourier_sample_f(ts, tid,
                                        jnp.asarray(wo, jnp.float32), u)
        wi, f, pdf = map(np.asarray, (wi, f, pdf))
        ok = pdf > 1e-6
        assert ok.mean() > 0.9
        # sampled f must agree with direct evaluation at the same wi
        f_eval = np.asarray(F.fourier_f(ts, tid,
                                        jnp.asarray(wo, jnp.float32),
                                        jnp.asarray(wi, jnp.float32)))
        np.testing.assert_allclose(f[ok], f_eval[ok], rtol=0.05, atol=1e-3)
        # pdf must agree with the pdf() path
        pdf_eval = np.asarray(F.fourier_pdf(ts, tid,
                                            jnp.asarray(wo, jnp.float32),
                                            jnp.asarray(wi, jnp.float32)))
        np.testing.assert_allclose(pdf[ok], pdf_eval[ok], rtol=0.08,
                                   atol=2e-3)
        # directions normalized, mostly in the reflection hemisphere
        np.testing.assert_allclose(np.linalg.norm(wi[ok], axis=-1), 1.0,
                                   atol=1e-4)


class TestFourierMaterialRender:
    @pytest.mark.slow
    def test_matches_matte_render(self):
        """Cornell box with the lambertian fourier table ≈ matte render."""
        import sys
        from helpers import cornell_box, cornell_camera
        from rustracer_tpu.render.film import Film
        from rustracer_tpu.render.filters import Filter
        from rustracer_tpu.render.renderer import RenderContext, render
        from rustracer_tpu.render.sampler import SamplerConfig
        from rustracer_tpu.scene.materials import (MaterialSet, MatteMaterial,
                                                   FourierMaterial)
        from rustracer_tpu.scene.textures import ConstantTexture
        from rustracer_tpu.integrators.path import PathIntegrator

        kd = (0.73, 0.73, 0.73)
        geom, lights = cornell_box()
        res = (24, 24)
        cam = cornell_camera(res)
        film = Film(full_resolution=res, filter=Filter("box", 0.5, 0.5))
        sampler = SamplerConfig(kind="02sequence", spp=8)

        def render_with(ms, textures):
            ctx = RenderContext(geom=geom, lights=lights, textures=textures)
            integ = PathIntegrator(mat_set=ms, max_depth=2)
            return np.asarray(render(ctx, integ.li, cam, film, sampler))

        # matte reference
        const = {"kd": jnp.asarray(kd, jnp.float32),
                 "z": jnp.asarray([0.0] * 3, jnp.float32)}
        ms_a = MaterialSet()
        for _ in range(3):
            ms_a.add(MatteMaterial(kd=ConstantTexture("kd")))
        ms_a.add(MatteMaterial(kd=ConstantTexture("z")))
        img_a = render_with(ms_a, {"const": const, "images": []})

        # fourier table for the same kd on walls
        ts, _ = _lambertian_set(kd, n_mu=32)
        ms_b = MaterialSet()
        for _ in range(3):
            ms_b.add(FourierMaterial(table_id=0, eta=1.0))
        ms_b.add(MatteMaterial(kd=ConstantTexture("z")))
        img_b = render_with(ms_b, {"const": const, "images": [],
                                   "fourier": ts})

        assert np.isfinite(img_b).all()
        # mean brightness within 10% (different importance sampling ⇒ noise)
        ma, mb = img_a.mean(), img_b.mean()
        assert mb == pytest.approx(ma, rel=0.12)
