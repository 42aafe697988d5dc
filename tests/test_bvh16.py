"""16-wide BVH (accel/wide.py + accel/traverse16.py): equivalence with
brute force — the same property gate as the binary kernel (test_bvh.py),
covering closest hit, any hit, t_max clipping, and tiny/degenerate trees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.accel.traverse16 import (bvh16_intersect_p_triangles,
                                            bvh16_intersect_triangles)
from rustracer_tpu.accel.wide import build_wide_arrays
from rustracer_tpu.core.ray import make_ray
from rustracer_tpu.scene.tables import (intersect_triangles_brute,
                                        make_geometry, scene_intersect)

from test_bvh import random_rays, random_soup


def wide_geom(tris):
    wide = build_wide_arrays(tris)
    return make_geometry(tris=tris, bvh=wide)


@pytest.mark.parametrize("n_tris", [3, 17, 400])
def test_matches_brute_force(n_tris):
    tris = random_soup(n_tris, seed=11)
    geom_w = wide_geom(tris)
    assert geom_w.has_bvh16
    geom_brute = make_geometry(tris=tris)
    rays = random_rays(2048, seed=12)
    h1, t1, id1 = bvh16_intersect_triangles(geom_w, rays)
    h2, t2, id2 = intersect_triangles_brute(geom_brute, rays)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(np.asarray(t1)[h1], np.asarray(t2)[h2],
                               rtol=1e-5)
    frac_same = (np.asarray(id1)[h1] == np.asarray(id2)[h1]).mean()
    assert frac_same > 0.999


def test_any_hit_matches():
    tris = random_soup(300, seed=13)
    geom_w = wide_geom(tris)
    geom_brute = make_geometry(tris=tris)
    rays = random_rays(2048, seed=14)
    s1 = np.asarray(bvh16_intersect_p_triangles(geom_w, rays))
    h2, _, _ = intersect_triangles_brute(geom_brute, rays)
    np.testing.assert_array_equal(s1, np.asarray(h2))


def test_t_max_respected():
    tris = random_soup(200, seed=15)
    geom_w = wide_geom(tris)
    geom_brute = make_geometry(tris=tris)
    rng = np.random.default_rng(16)
    o = rng.uniform(-6, 6, (1024, 3)).astype(np.float32)
    d = rng.normal(0, 1, (1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, 1024).astype(np.float32))
    ray = make_ray(jnp.asarray(o), jnp.asarray(d))._replace(t_max=t_max)
    h1, t1, _ = bvh16_intersect_triangles(geom_w, ray)
    h2, t2, _ = intersect_triangles_brute(geom_brute, ray)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert (np.asarray(t1)[np.asarray(h1)]
            <= np.asarray(t_max)[np.asarray(h1)] + 1e-4).all()


def test_dead_lanes_start_done():
    tris = random_soup(50, seed=17)
    geom_w = wide_geom(tris)
    rays = random_rays(256, seed=18)
    ray = rays._replace(t_max=jnp.zeros(256, jnp.float32))
    h, t, _ = bvh16_intersect_triangles(geom_w, ray)
    assert not np.asarray(h).any()


def test_scene_intersect_routes_through_wide():
    """make_geometry with bvh16 arrays routes scene_intersect through the
    wide kernel and reproduces brute-force hits end to end."""
    tris = random_soup(120, seed=19)
    geom_w = wide_geom(tris)
    geom_b = make_geometry(tris=tris)
    rays = random_rays(512, seed=20)
    si_w = scene_intersect(geom_w, rays)
    si_b = scene_intersect(geom_b, rays)
    np.testing.assert_array_equal(np.asarray(si_w.valid),
                                  np.asarray(si_b.valid))
    m = np.asarray(si_w.valid)
    np.testing.assert_allclose(np.asarray(si_w.t)[m],
                               np.asarray(si_b.t)[m], rtol=1e-5)


class TestRegeneration:
    """Ray-regeneration driver (traverse16._traverse16_regen): wavefronts at
    or above REGEN_MIN_B route through the active-window/backlog driver and
    must reproduce the plain driver's results exactly (each ray's walk is
    deterministic and scheduling-independent)."""

    def _big_rays(self, n, seed, dead_frac=0.0):
        rng = np.random.default_rng(seed)
        o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_max = np.full(n, np.inf, np.float32)
        if dead_frac:
            t_max[rng.uniform(size=n) < dead_frac] = 0.0
        return make_ray(jnp.asarray(o), jnp.asarray(d))._replace(
            t_max=jnp.asarray(t_max))

    def test_matches_plain_driver(self):
        from rustracer_tpu.accel import traverse16 as t16
        tris = random_soup(400, seed=21)
        geom = wide_geom(tris)
        n = t16.REGEN_MIN_B
        rays = self._big_rays(n, seed=22, dead_frac=0.1)
        h1, t1, id1 = bvh16_intersect_triangles(geom, rays)   # regen (n >= MIN_B)
        h2, t2, id2 = t16._traverse16(
            geom, jax.tree.map(lambda x: x[: n // 2], rays), any_hit=False)[:3]
        ha, ta, ida = (np.asarray(h1)[: n // 2], np.asarray(t1)[: n // 2],
                       np.asarray(id1)[: n // 2])
        np.testing.assert_array_equal(ha, np.asarray(h2))
        np.testing.assert_array_equal(ta, np.asarray(t2))
        np.testing.assert_array_equal(ida, np.asarray(id2))

    def test_any_hit_and_instancing(self):
        from rustracer_tpu.accel import traverse16 as t16
        from rustracer_tpu.accel.traverse16 import (
            bvh16_intersect_triangles_inst)
        from test_instancing import _instanced_setup
        geom, _, _ = _instanced_setup(seed=24)
        n = t16.REGEN_MIN_B
        rays = self._big_rays(n, seed=23)
        h1, t1, id1, i1 = bvh16_intersect_triangles_inst(geom, rays)
        sub = jax.tree.map(lambda x: x[: n // 2], rays)
        h2, t2, id2, i2 = t16._traverse16(geom, sub, any_hit=False)[:4]
        m = n // 2
        np.testing.assert_array_equal(np.asarray(h1)[:m], np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(t1)[:m], np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(id1)[:m], np.asarray(id2))
        np.testing.assert_array_equal(np.asarray(i1)[:m], np.asarray(i2))
        p1 = bvh16_intersect_p_triangles(geom, rays)
        p2 = t16._traverse16(geom, sub, any_hit=True)[0]
        np.testing.assert_array_equal(np.asarray(p1)[:m], np.asarray(p2))


def test_observed_counts_api():
    """bvh16_intersect_counts: observed rows/tests are positive for live
    wavefronts, zero for dead ones, and triangle tests never exceed
    8 x rows (a leaf record holds at most 8 triangles)."""
    from rustracer_tpu.accel.traverse16 import bvh16_intersect_counts
    tris = random_soup(300, seed=31)
    geom = wide_geom(tris)
    rays = random_rays(2048, seed=32)
    h, t, tid, inst, cnt = bvh16_intersect_counts(geom, rays)
    rows, tests = int(np.asarray(cnt)[0]), int(np.asarray(cnt)[1])
    assert rows > 0 and tests > 0
    assert tests <= 8 * rows
    # at least one row per ray that hit anything
    assert rows >= int(np.asarray(h).sum())
    dead = rays._replace(t_max=jnp.zeros(2048, jnp.float32))
    _, _, _, _, cnt0 = bvh16_intersect_counts(geom, dead)
    assert int(np.asarray(cnt0).sum()) == 0
