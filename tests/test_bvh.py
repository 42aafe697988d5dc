"""BVH build + traversal: equivalence with brute-force intersection
(the property test pattern from reference tests/shapes.rs, SURVEY §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.accel.bvh import build_bvh, build_bvh_arrays, triangle_bounds
from rustracer_tpu.accel.traverse import (bvh_intersect_p_triangles,
                                          bvh_intersect_triangles)
from rustracer_tpu.core.ray import make_ray
from rustracer_tpu.scene.tables import (intersect_triangles_brute,
                                        make_geometry, scene_intersect,
                                        scene_intersect_p)


def random_soup(n_tris, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    v = np.stack([base, base + e1, base + e2], 1).reshape(-1, 3)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return dict(
        tv_p=v, tv_n=np.zeros_like(v),
        tv_uv=np.zeros((len(v), 2), np.float32), tv_s=np.zeros_like(v),
        t_idx=idx,
        t_material=np.zeros(n_tris, np.int32),
        t_arealight=np.full(n_tris, -1, np.int32),
        t_reverse=np.zeros(n_tris, bool),
        t_has_n=np.zeros(n_tris, bool),
        t_has_uv=np.zeros(n_tris, bool),
        t_alpha_tex=np.full(n_tris, -1, np.int32),
    )


def random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return make_ray(jnp.asarray(o), jnp.asarray(d))


class TestBuild:
    @pytest.mark.parametrize("split", ["sah", "middle"])
    def test_structure_valid(self, split):
        tris = random_soup(500, seed=2)
        lo, hi = triangle_bounds(tris["tv_p"], tris["t_idx"])
        nodes_lo, nodes_hi, meta, prims = build_bvh(lo, hi, split, 4)
        # every primitive appears exactly once
        assert sorted(prims.tolist()) == list(range(500))
        # leaf sizes bounded
        leaf = meta[:, 1] > 0
        assert meta[leaf, 1].max() <= 4
        # node bounds contain children / prims
        for i in np.where(leaf)[0][:50]:
            off, cnt, _ = meta[i]
            for p in prims[off:off + cnt]:
                assert np.all(lo[p] >= nodes_lo[i] - 1e-4)
                assert np.all(hi[p] <= nodes_hi[i] + 1e-4)

    def test_root_bounds(self):
        tris = random_soup(100, seed=3)
        lo, hi = triangle_bounds(tris["tv_p"], tris["t_idx"])
        nodes_lo, nodes_hi, meta, prims = build_bvh(lo, hi, "sah", 4)
        np.testing.assert_allclose(nodes_lo[0], lo.min(0), atol=1e-5)
        np.testing.assert_allclose(nodes_hi[0], hi.max(0), atol=1e-5)


class TestTraversal:
    @pytest.mark.parametrize("split", ["sah", "middle"])
    def test_matches_brute_force(self, split):
        tris = random_soup(400, seed=4)
        bvh = build_bvh_arrays(None, tris, split_method=split)
        geom_bvh = make_geometry(tris=tris, bvh=bvh)
        geom_brute = make_geometry(tris=tris)
        rays = random_rays(2048, seed=5)
        h1, t1, id1 = bvh_intersect_triangles(geom_bvh, rays)
        h2, t2, id2 = intersect_triangles_brute(geom_brute, rays)
        h1, h2 = np.asarray(h1), np.asarray(h2)
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_allclose(np.asarray(t1)[h1], np.asarray(t2)[h2],
                                   rtol=1e-5)
        # ids can differ only on exact ties; ts match ⇒ same surface
        frac_same = (np.asarray(id1)[h1] == np.asarray(id2)[h1]).mean()
        assert frac_same > 0.999

    def test_shadow_matches(self):
        tris = random_soup(300, seed=6)
        bvh = build_bvh_arrays(None, tris)
        geom_bvh = make_geometry(tris=tris, bvh=bvh)
        geom_brute = make_geometry(tris=tris)
        rays = random_rays(2048, seed=7)
        s1 = np.asarray(bvh_intersect_p_triangles(geom_bvh, rays))
        s2 = np.asarray(scene_intersect_p(geom_brute, rays))
        np.testing.assert_array_equal(s1, s2)

    def test_t_max_respected(self):
        tris = random_soup(200, seed=8)
        bvh = build_bvh_arrays(None, tris)
        geom = make_geometry(tris=tris, bvh=bvh)
        rays_far = random_rays(512, seed=9)
        h_far, t_far, _ = bvh_intersect_triangles(geom, rays_far)
        # clamp t_max below each hit; those rays must now miss
        t_clamp = jnp.where(h_far, t_far * 0.5, rays_far.t_max)
        rays_near = rays_far._replace(t_max=t_clamp)
        h_near, _, _ = bvh_intersect_triangles(geom, rays_near)
        assert not np.any(np.asarray(h_near) & np.asarray(h_far))

    def test_mixed_quadrics_and_bvh(self):
        from helpers import quad_dict
        tris = random_soup(100, seed=10, spread=3.0)
        bvh = build_bvh_arrays(None, tris)
        geom = make_geometry(quadrics=quad_dict([((0, 0, -20.0), 1.0)]),
                             tris=tris, bvh=bvh)
        # ray that hits only the sphere (far from the soup)
        ray = make_ray(jnp.asarray([[0.0, 0.0, -30.0]]),
                       jnp.asarray([[0.0, 0.0, 1.0]]))
        si = scene_intersect(geom, ray)
        assert bool(si.valid[0])
        np.testing.assert_allclose(float(si.t[0]), 9.0, atol=1e-3)
        assert int(si.prim_id[0]) == 0  # the quadric

    def test_single_triangle_bvh(self):
        tris = random_soup(1, seed=11)
        bvh = build_bvh_arrays(None, tris)
        geom_bvh = make_geometry(tris=tris, bvh=bvh)
        geom_brt = make_geometry(tris=tris)
        rays = random_rays(256, seed=12)
        h1, _, _ = bvh_intersect_triangles(geom_bvh, rays)
        h2, _, _ = intersect_triangles_brute(geom_brt, rays)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
