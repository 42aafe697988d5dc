"""BSDF lobe engine tests: energy conservation, pdf consistency, Fresnel
identities (reference: quickcheck tests in bsdf/fresnel.rs:419-437 and new
white-furnace style checks)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.core.math import abs_cos_theta, normalize
from rustracer_tpu.ops import bsdf as B
from rustracer_tpu.ops.fresnel import fr_conductor, fr_dielectric
from rustracer_tpu.ops.microfacet import (BECKMANN, TROWBRIDGE,
                                          distribution_d, distribution_pdf,
                                          distribution_sample_wh,
                                          roughness_to_alpha)


def _frame_si(n_lanes):
    """A trivial shading frame == world frame."""
    class SI:
        ss = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n_lanes, 3))
        ts = jnp.broadcast_to(jnp.asarray([0, 1.0, 0]), (n_lanes, 3))
        ns = jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (n_lanes, 3))
        n = ns
    return SI()


def _single_lobe(n, ltype, **kw):
    params = jnp.zeros((n, 1, 16), jnp.float32)
    pa = kw.get("pa")
    if pa is not None:
        params = params.at[..., 0:3].set(jnp.asarray(pa))
    pb = kw.get("pb")
    if pb is not None:
        params = params.at[..., 3:6].set(jnp.asarray(pb))
    pc = kw.get("pc")
    if pc is not None:
        params = params.at[..., 6:9].set(jnp.asarray(pc))
    for i, key in enumerate(["s0", "s1", "s2", "s3", "s4", "s5", "s6"]):
        if key in kw:
            params = params.at[..., 9 + i].set(kw[key])
    return B.LobeStack(
        type=jnp.full((n, 1), ltype, jnp.int32),
        params=params,
        active=jnp.ones((n, 1), bool),
        eta=jnp.full((n,), kw.get("eta", 1.0), jnp.float32),
    )


class TestFresnel:
    def test_dielectric_range(self):
        cos = jnp.linspace(-1.0, 1.0, 101)
        f = fr_dielectric(cos, jnp.float32(1.0), jnp.float32(1.5))
        fv = np.asarray(f)
        assert np.all((fv >= 0.0) & (fv <= 1.0))

    def test_dielectric_normal_incidence(self):
        f = fr_dielectric(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.5))
        # ((n-1)/(n+1))^2 = 0.04
        assert abs(float(f) - 0.04) < 1e-4

    def test_dielectric_grazing_is_one(self):
        f = fr_dielectric(jnp.float32(1e-4), jnp.float32(1.0), jnp.float32(1.5))
        assert float(f) > 0.98

    def test_total_internal_reflection(self):
        # from inside glass at a steep angle -> TIR
        f = fr_dielectric(jnp.float32(-0.2), jnp.float32(1.0), jnp.float32(1.5))
        assert float(f) == 1.0

    def test_conductor_range(self):
        cos = jnp.linspace(0.01, 1.0, 64)
        eta = jnp.broadcast_to(jnp.asarray([0.2, 0.9, 1.4]), (64, 3))
        k = jnp.broadcast_to(jnp.asarray([3.9, 2.4, 2.1]), (64, 3))
        f = np.asarray(fr_conductor(cos, jnp.ones((64, 3)), eta, k))
        assert np.all((f >= 0.0) & (f <= 1.0))


class TestMicrofacet:
    @pytest.mark.parametrize("dist", [BECKMANN, TROWBRIDGE])
    def test_d_normalization(self, dist):
        """∫ D(wh) cosθ dω = 1 over the hemisphere."""
        n = 128
        theta = (np.arange(n) + 0.5) * (np.pi / 2) / n
        phi = (np.arange(n) + 0.5) * 2 * np.pi / n
        tg, pg = np.meshgrid(theta, phi)
        wh = jnp.asarray(np.stack([np.sin(tg) * np.cos(pg),
                                   np.sin(tg) * np.sin(pg),
                                   np.cos(tg)], -1).reshape(-1, 3), jnp.float32)
        alpha = jnp.full(wh.shape[0], 0.3)
        d = np.asarray(distribution_d(jnp.full(wh.shape[0], dist), wh, alpha, alpha))
        ct = np.cos(tg).ravel()
        st = np.sin(tg).ravel()
        integral = np.sum(d * ct * st) * (np.pi / 2 / n) * (2 * np.pi / n)
        assert abs(integral - 1.0) < 0.02, integral

    @pytest.mark.parametrize("dist", [BECKMANN, TROWBRIDGE])
    def test_sample_pdf_consistency(self, dist):
        """E[1/pdf] over sampled wh ≈ measure of the sampled domain... weaker:
        the sampled wh pdf>0 and D>0."""
        rng = np.random.default_rng(3)
        n = 4096
        u = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        wo = jnp.broadcast_to(normalize(jnp.asarray([0.3, -0.2, 0.93])), (n, 3))
        alpha = jnp.full(n, 0.4)
        dist_a = jnp.full(n, dist)
        wh = distribution_sample_wh(dist_a, wo, u, alpha, alpha)
        pdf = np.asarray(distribution_pdf(dist_a, wo, wh, alpha, alpha))
        assert np.all(pdf > 0.0)
        # chi^2-lite: E[D*cos/pdf] should be ~1 for full-dist sampling
        if dist == BECKMANN:
            d = np.asarray(distribution_d(dist_a, wh, alpha, alpha))
            ct = np.abs(np.asarray(wh)[:, 2])
            est = np.mean(d * ct / pdf)
            assert abs(est - 1.0) < 0.05, est


class TestLobeEnergy:
    """White-furnace energy checks: E[f |cos| / pdf] <= albedo (+ MC noise)."""

    def _energy(self, lobes, types, wo_z=0.8, n=8192, seed=0):
        n = lobes.type.shape[0]
        si = _frame_si(n)
        rng = np.random.default_rng(seed)
        wo = jnp.broadcast_to(
            normalize(jnp.asarray([np.sqrt(1 - wo_z ** 2), 0.0, wo_z])), (n, 3))
        u1 = jnp.asarray(rng.random(n, dtype=np.float32))
        u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        wi, f, pdf, flags, ok = B.bsdf_sample_f(lobes, si, wo, u1, u2, types)
        w = np.asarray(jnp.where(ok, np.ones(n), 0.0))
        contrib = np.asarray(f) * np.abs(np.asarray(wi)[:, 2:3]) / \
            np.maximum(np.asarray(pdf)[:, None], 1e-12)
        contrib = np.where(w[:, None] > 0, contrib, 0.0)
        return contrib.mean(0)

    def test_lambertian_energy(self):
        n = 8192
        lobes = _single_lobe(n, B.LAMBERTIAN_REFL, pa=[0.7, 0.5, 0.3])
        e = self._energy(lobes, (B.LAMBERTIAN_REFL,))
        np.testing.assert_allclose(e, [0.7, 0.5, 0.3], atol=0.02)

    def test_oren_nayar_close_to_lambert_at_sigma0(self):
        n = 8192
        lobes = _single_lobe(n, B.OREN_NAYAR, pa=[0.5, 0.5, 0.5], s5=1.0, s6=0.0)
        e = self._energy(lobes, (B.OREN_NAYAR,))
        np.testing.assert_allclose(e, 0.5, atol=0.02)

    def test_specular_reflection_energy(self):
        n = 1024
        lobes = _single_lobe(n, B.SPECULAR_REFL, pa=[1.0, 1.0, 1.0], s4=0.0)
        e = self._energy(lobes, (B.SPECULAR_REFL,))
        np.testing.assert_allclose(e, 1.0, atol=1e-4)

    def test_fresnel_specular_energy_conserved(self):
        # glass with R=T=1: reflected + refracted carries all energy
        n = 16384
        lobes = _single_lobe(n, B.FRESNEL_SPECULAR, pa=[1, 1, 1], pb=[1, 1, 1],
                             s0=1.5, eta=1.5)
        e = self._energy(lobes, (B.FRESNEL_SPECULAR,))
        # radiance scaling e^2 on transmission is not an energy loss (it
        # compresses solid angle); just check finite and near/above ~0.43
        assert np.all(np.isfinite(e))
        assert e.mean() > 0.4

    def test_microfacet_tr_energy_below_one(self):
        n = 16384
        alpha = float(roughness_to_alpha(jnp.float32(0.2)))
        lobes = _single_lobe(n, B.MICROFACET_REFL, pa=[1, 1, 1], s0=1.5,
                             s1=alpha, s2=alpha, s3=TROWBRIDGE, s4=1.0)
        e = self._energy(lobes, (B.MICROFACET_REFL,))
        assert np.all(e < 1.0)
        assert np.all(e > 0.0)

    def test_sample_eval_pdf_agree_nonspecular(self):
        """For sampled directions, eval f and pdf must match sample_f's."""
        n = 4096
        si = _frame_si(n)
        rng = np.random.default_rng(1)
        lobes = _single_lobe(n, B.LAMBERTIAN_REFL, pa=[0.6, 0.6, 0.6])
        wo = jnp.broadcast_to(normalize(jnp.asarray([0.4, 0.1, 0.9])), (n, 3))
        u1 = jnp.asarray(rng.random(n, dtype=np.float32))
        u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        types = (B.LAMBERTIAN_REFL,)
        wi, f, pdf, _, ok = B.bsdf_sample_f(lobes, si, wo, u1, u2, types)
        f2 = B.bsdf_f(lobes, si, wo, wi, types)
        pdf2 = B.bsdf_pdf(lobes, si, wo, wi, types)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-6)

    def test_two_lobe_stack(self):
        """Lambertian + microfacet: energy adds, selection unbiased."""
        n = 16384
        l1 = _single_lobe(n, B.LAMBERTIAN_REFL, pa=[0.3, 0.3, 0.3])
        alpha = 0.1
        l2 = _single_lobe(n, B.MICROFACET_REFL, pa=[0.4, 0.4, 0.4], s0=1.5,
                          s1=alpha, s2=alpha, s3=TROWBRIDGE, s4=1.0)
        lobes = B.LobeStack(
            type=jnp.concatenate([l1.type, l2.type], -1),
            params=jnp.concatenate([l1.params, l2.params], -2),
            active=jnp.concatenate([l1.active, l2.active], -1),
            eta=l1.eta)
        types = (B.LAMBERTIAN_REFL, B.MICROFACET_REFL)
        e = self._energy(lobes, types)
        assert np.all(e > 0.3)    # at least the diffuse part
        assert np.all(e < 0.75)   # bounded by sum of albedos

    def test_lambertian_trans_opposite_hemisphere(self):
        n = 1024
        si = _frame_si(n)
        lobes = _single_lobe(n, B.LAMBERTIAN_TRANS, pa=[0.8, 0.8, 0.8])
        rng = np.random.default_rng(2)
        wo = jnp.broadcast_to(normalize(jnp.asarray([0.2, 0.0, 0.98])), (n, 3))
        u1 = jnp.asarray(rng.random(n, dtype=np.float32))
        u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        wi, f, pdf, _, ok = B.bsdf_sample_f(lobes, si, wo, u1, u2,
                                            (B.LAMBERTIAN_TRANS,))
        z = np.asarray(wi)[:, 2]
        assert np.all(z[np.asarray(ok)] < 0.0)


class TestDisneyLobes:
    def test_disney_diffuse_energy(self):
        n = 8192
        lobes = _single_lobe(n, B.DISNEY_DIFFUSE, pa=[0.8, 0.4, 0.2])
        si = _frame_si(n)
        rng = np.random.default_rng(0)
        wo = jnp.broadcast_to(normalize(jnp.asarray([0.1, 0.1, 0.99])), (n, 3))
        u1 = jnp.asarray(rng.random(n, dtype=np.float32))
        u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        wi, f, pdf, _, ok = B.bsdf_sample_f(lobes, si, wo, u1, u2,
                                            (B.DISNEY_DIFFUSE,))
        contrib = np.asarray(f) * np.abs(np.asarray(wi)[:, 2:3]) / \
            np.maximum(np.asarray(pdf)[:, None], 1e-12)
        e = contrib.mean(0)
        # Disney diffuse ~ albedo * (1-F/2)^2 <= albedo
        assert np.all(e < np.array([0.8, 0.4, 0.2]) + 0.02)
        assert np.all(e > np.array([0.8, 0.4, 0.2]) * 0.6)

    def test_clearcoat_positive(self):
        n = 4096
        lobes = _single_lobe(n, B.DISNEY_CLEARCOAT, pa=[1.0, 1.0, 1.0], s6=0.05)
        si = _frame_si(n)
        rng = np.random.default_rng(0)
        wo = jnp.broadcast_to(normalize(jnp.asarray([0.3, 0.0, 0.95])), (n, 3))
        u1 = jnp.asarray(rng.random(n, dtype=np.float32))
        u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
        wi, f, pdf, _, ok = B.bsdf_sample_f(lobes, si, wo, u1, u2,
                                            (B.DISNEY_CLEARCOAT,))
        okm = np.asarray(ok)
        assert okm.mean() > 0.5
        assert np.all(np.asarray(f)[okm] >= 0.0)
