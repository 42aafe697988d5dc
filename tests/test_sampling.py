"""Sampling / low-discrepancy / distribution tests (reference
sampling/distribution1d.rs tests + new (0,2)-sequence property tests)."""
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.core import sampling as s
from rustracer_tpu.core.lowdiscrepancy import sample02, van_der_corput, sobol_dim2
from rustracer_tpu.core.rng import hash_float, hash_u32
from rustracer_tpu.render.sampler import SamplerConfig


class TestWarps:
    def test_cosine_hemisphere(self):
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.random((4096, 2), dtype=np.float32))
        w = s.cosine_sample_hemisphere(u)
        assert np.all(np.asarray(w[..., 2]) >= 0.0)
        np.testing.assert_allclose(np.asarray(jnp.sum(w * w, -1)), 1.0, atol=1e-4)
        # mean cos_theta for cosine-weighted = 2/3
        assert abs(float(jnp.mean(w[..., 2])) - 2.0 / 3.0) < 0.02

    def test_uniform_sphere(self):
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.random((8192, 2), dtype=np.float32))
        w = s.uniform_sample_sphere(u)
        np.testing.assert_allclose(np.asarray(jnp.sum(w * w, -1)), 1.0, atol=1e-4)
        assert abs(float(jnp.mean(w[..., 2]))) < 0.05

    def test_concentric_disk_in_unit_disk(self):
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.random((4096, 2), dtype=np.float32))
        d = s.concentric_sample_disk(u)
        r2 = np.asarray(jnp.sum(d * d, -1))
        assert np.all(r2 <= 1.0 + 1e-5)
        # center-ish mean
        assert np.abs(np.asarray(jnp.mean(d, 0))).max() < 0.05

    def test_triangle_barycentric(self):
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.random((1024, 2), dtype=np.float32))
        b = s.uniform_sample_triangle(u)
        bs = np.asarray(b)
        assert np.all(bs >= 0.0) and np.all(bs.sum(-1) <= 1.0 + 1e-5)

    def test_power_heuristic(self):
        w = s.power_heuristic(jnp.float32(1), jnp.float32(0.5),
                              jnp.float32(1), jnp.float32(0.5))
        assert abs(float(w) - 0.5) < 1e-6
        w0 = s.power_heuristic(jnp.float32(1), jnp.float32(0.0),
                               jnp.float32(1), jnp.float32(0.0))
        assert float(w0) == 0.0


class TestLowDiscrepancy:
    def test_van_der_corput_first_points(self):
        idx = jnp.arange(8, dtype=jnp.uint32)
        x = np.asarray(van_der_corput(idx))
        np.testing.assert_allclose(
            x, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-7)

    def test_02_sequence_first_points(self):
        idx = jnp.arange(4, dtype=jnp.uint32)
        p = np.asarray(sample02(idx))
        np.testing.assert_allclose(
            p, [[0.0, 0.0], [0.5, 0.5], [0.25, 0.75], [0.75, 0.25]], atol=1e-7)

    def test_elementary_interval_stratification(self):
        # any 2^k consecutive aligned block of a (0,2)-sequence must put
        # exactly one point in each elementary interval of area 2^-k
        n = 64
        p = np.asarray(sample02(jnp.arange(n, dtype=jnp.uint32)))
        for (a, b) in [(0, 6), (1, 5), (2, 4), (3, 3), (6, 0)]:
            nx, ny = 1 << a, 1 << b
            cells = set()
            for x, y in p:
                cells.add((int(x * nx), int(y * ny)))
            assert len(cells) == n, f"stratification broken for {nx}x{ny}"

    def test_scramble_preserves_stratification(self):
        n = 16
        p = np.asarray(sample02(jnp.arange(n, dtype=jnp.uint32),
                                (jnp.uint32(0xDEADBEEF), jnp.uint32(0x12345678))))
        cells = set()
        for x, y in p:
            cells.add((int(x * 4), int(y * 4)))
        assert len(cells) == n

    def test_in_range(self):
        p = np.asarray(sample02(jnp.arange(1024, dtype=jnp.uint32),
                                (jnp.uint32(7), jnp.uint32(9))))
        assert np.all(p >= 0.0) and np.all(p < 1.0)


class TestHash:
    def test_deterministic(self):
        a = np.asarray(hash_u32(jnp.uint32(1), jnp.uint32(2)))
        b = np.asarray(hash_u32(jnp.uint32(1), jnp.uint32(2)))
        assert a == b

    def test_uniformity(self):
        x = np.asarray(hash_float(jnp.arange(65536, dtype=jnp.uint32), jnp.uint32(3)))
        assert 0.49 < x.mean() < 0.51
        hist, _ = np.histogram(x, bins=16, range=(0, 1))
        assert hist.min() > 3500  # ~4096 each


class TestDistribution1D:
    def test_uniform(self):
        d = s.Distribution1D.create(jnp.ones(4))
        x, pdf, off = d.sample_continuous(jnp.asarray([0.1, 0.6, 0.99]))
        np.testing.assert_allclose(np.asarray(x), [0.1, 0.6, 0.99], atol=1e-5)
        np.testing.assert_allclose(np.asarray(pdf), 1.0, atol=1e-6)

    def test_skewed(self):
        # func [1, 3]: second half 3x more likely
        d = s.Distribution1D.create(jnp.asarray([1.0, 3.0]))
        x, pdf, off = d.sample_continuous(jnp.asarray([0.125, 0.25, 0.625]))
        np.testing.assert_allclose(np.asarray(x), [0.25, 0.5, 0.75], atol=1e-5)
        np.testing.assert_allclose(np.asarray(pdf), [0.5, 1.5, 1.5], atol=1e-5)

    def test_discrete(self):
        d = s.Distribution1D.create(jnp.asarray([1.0, 1.0, 2.0]))
        off, pdf, _ = d.sample_discrete(jnp.asarray([0.1, 0.4, 0.9]))
        np.testing.assert_array_equal(np.asarray(off), [0, 1, 2])
        np.testing.assert_allclose(np.asarray(pdf), [0.25, 0.25, 0.5], atol=1e-6)

    def test_zero_function(self):
        d = s.Distribution1D.create(jnp.zeros(4))
        x, pdf, _ = d.sample_continuous(jnp.asarray([0.5]))
        assert np.isfinite(np.asarray(x)).all()
        assert float(pdf[0]) == 0.0

    def test_batched(self):
        funcs = jnp.asarray([[1.0, 1.0], [1.0, 3.0]])
        d = s.Distribution1D.create(funcs)
        x, pdf, _ = d.sample_continuous(jnp.asarray([0.5, 0.25]))
        np.testing.assert_allclose(np.asarray(x), [0.5, 0.5], atol=1e-5)


class TestDistribution2D:
    def test_sampling_statistics(self):
        f = jnp.asarray([[1.0, 0.0], [1.0, 2.0]])
        d = s.Distribution2D.create(f)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.random((8192, 2), dtype=np.float32))
        p, pdf = d.sample_continuous(u)
        ps = np.asarray(p)
        # cell (x<.5, y<.5) has weight 1/4, (x>.5,y>.5) 2/4, (x<.5,y>.5) 1/4
        frac_q00 = np.mean((ps[:, 0] < 0.5) & (ps[:, 1] < 0.5))
        frac_q11 = np.mean((ps[:, 0] >= 0.5) & (ps[:, 1] >= 0.5))
        assert abs(frac_q00 - 0.25) < 0.02
        assert abs(frac_q11 - 0.5) < 0.02
        # pdf at sampled points integrates: E[1/pdf * f] ~ ... check pdf values
        pdfs = np.asarray(d.pdf(p))
        assert np.all(pdfs > 0.0)

    def test_pdf_normalization(self):
        rng = np.random.default_rng(5)
        f = jnp.asarray(rng.random((8, 16), dtype=np.float32))
        d = s.Distribution2D.create(f)
        # integral of pdf over [0,1)^2 should be 1
        xs = (np.arange(16) + 0.5) / 16
        ys = (np.arange(8) + 0.5) / 8
        gx, gy = np.meshgrid(xs, ys)
        pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32))
        integral = float(jnp.mean(d.pdf(pts)))
        assert abs(integral - 1.0) < 1e-3


class TestSamplerConfig:
    def test_spp_rounds_to_pow2(self):
        assert SamplerConfig(kind="02sequence", spp=5).spp == 8
        assert SamplerConfig(kind="random", spp=5).spp == 5

    def test_distinct_dims_uncorrelated(self):
        cfg = SamplerConfig(kind="02sequence", spp=16)
        pix = jnp.zeros(16, jnp.uint32)
        sidx = jnp.arange(16, dtype=jnp.uint32)
        a = np.asarray(cfg.get_2d(pix, sidx, 2))
        b = np.asarray(cfg.get_2d(pix, sidx, 3))
        assert not np.allclose(a, b)
        c = np.asarray(cfg.get_1d(pix, sidx, 1))
        assert not np.allclose(a[:, 0], c)
