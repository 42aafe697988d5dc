"""Shared-geometry instancing (accel/wide.py build_wide_scene +
accel/traverse16.py instance records): parity against manually-replicated
geometry, memory sharing, and end-to-end parser semantics
(reference primitive.rs:89-118 TransformedPrimitive, api.rs:1019-1090)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rustracer_tpu.accel.wide import build_wide_scene
from rustracer_tpu.accel.traverse16 import (bvh16_intersect_p_triangles,
                                            bvh16_intersect_triangles_inst)
from rustracer_tpu.core.ray import make_ray
from rustracer_tpu.scene.tables import (intersect_triangles_brute,
                                        make_geometry, scene_intersect)

from test_bvh import random_rays, random_soup


def _rot_scale_trans(rng, allow_flip=False):
    """Random affine o2w: rotation * diag(scale) + translation."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    s = rng.uniform(0.4, 1.6, 3)
    if allow_flip and rng.random() < 0.5:
        s[0] = -s[0]
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = R @ np.diag(s)
    m[:3, 3] = rng.uniform(-4, 4, 3)
    return m.astype(np.float32)


def _mk_tris(tv_p, t_idx):
    n = len(t_idx)
    return dict(
        tv_p=np.asarray(tv_p, np.float32),
        tv_n=np.zeros_like(np.asarray(tv_p, np.float32)),
        tv_uv=np.zeros((len(tv_p), 2), np.float32),
        tv_s=np.zeros((len(tv_p), 3), np.float32),
        t_idx=np.asarray(t_idx, np.int32),
        t_material=np.zeros(n, np.int32),
        t_arealight=np.full(n, -1, np.int32),
        t_reverse=np.zeros(n, bool),
        t_has_n=np.zeros(n, bool),
        t_has_uv=np.zeros(n, bool),
        t_alpha_tex=np.full(n, -1, np.int32),
    )


def _instanced_setup(n_obj_tris=60, n_static=25, n_inst=7, seed=3,
                     allow_flip=False):
    """Build (instanced geom, manually-replicated brute geom, instance
    transforms). The object soup is defined in a local frame; instances
    place it with random affine transforms."""
    rng = np.random.default_rng(seed)
    static = random_soup(n_static, seed=seed + 1)
    obj = random_soup(n_obj_tris, seed=seed + 2)
    obj_p = np.asarray(obj["tv_p"]) * 0.3          # keep objects compact

    xforms = [_rot_scale_trans(rng, allow_flip) for _ in range(n_inst)]

    # instanced build: global table = static rows then object rows
    sv = np.asarray(static["tv_p"])
    si = np.asarray(static["t_idx"])
    gv = np.concatenate([sv, obj_p])
    gi = np.concatenate([si, np.asarray(obj["t_idx"]) + len(sv)])
    tris = _mk_tris(gv, gi)
    objects = [(len(si), len(gi))]
    instances = [dict(obj=0, o2w=m, w2o=np.linalg.inv(m),
                      flip=bool(np.linalg.det(m[:3, :3]) < 0))
                 for m in xforms]
    wide = build_wide_scene(tris, objects, instances)
    geom = make_geometry(tris=tris, bvh=wide)

    # reference build: every instance's triangles replicated in world space
    vs, fs = [sv], [si]
    off = len(sv)
    for m in xforms:
        w = obj_p @ m[:3, :3].T + m[:3, 3]
        vs.append(w.astype(np.float32))
        fs.append(np.asarray(obj["t_idx"]) + off)
        off += len(obj_p)
    ref = make_geometry(tris=_mk_tris(np.concatenate(vs),
                                      np.concatenate(fs)))
    return geom, ref, instances


@pytest.mark.parametrize("allow_flip", [False, True])
def test_closest_hit_matches_replicated(allow_flip):
    geom, ref, _ = _instanced_setup(allow_flip=allow_flip)
    assert geom.has_instances and geom.has_bvh16
    rays = random_rays(2048, seed=5)
    h1, t1, tid1, inst1 = bvh16_intersect_triangles_inst(geom, rays)
    h2, t2, _ = intersect_triangles_brute(ref, rays)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(np.asarray(t1)[h1], np.asarray(t2)[h1],
                               rtol=2e-4, atol=1e-5)
    # instanced hits report their instance; static hits report -1
    n_static_tris = 25
    inst1 = np.asarray(inst1)
    tid1 = np.asarray(tid1)
    assert (inst1[h1 & (tid1 >= n_static_tris)] >= 0).all()
    assert (inst1[h1 & (tid1 < n_static_tris)] == -1).all()


def test_any_hit_matches_replicated():
    geom, ref, _ = _instanced_setup(seed=9)
    rays = random_rays(2048, seed=10)
    s1 = np.asarray(bvh16_intersect_p_triangles(geom, rays))
    h2, _, _ = intersect_triangles_brute(ref, rays)
    np.testing.assert_array_equal(s1, np.asarray(h2))


def test_scene_intersect_interaction():
    """Full interaction on instanced hits: world position on the surface,
    geometric normal agrees with the replicated-geometry normal."""
    geom, ref, _ = _instanced_setup(seed=12)
    rays = random_rays(1024, seed=13)
    si = scene_intersect(geom, rays)
    sr = scene_intersect(ref, rays)
    v1 = np.asarray(si.valid)
    np.testing.assert_array_equal(v1, np.asarray(sr.valid))
    np.testing.assert_allclose(np.asarray(si.p)[v1], np.asarray(sr.p)[v1],
                               rtol=2e-4, atol=2e-4)
    dotn = np.abs(np.sum(np.asarray(si.n)[v1] * np.asarray(sr.n)[v1], -1))
    assert (dotn > 0.999).all()


def test_memory_is_shared():
    """1000 instances of one mesh cost O(1 mesh + 1000 transforms): the
    record table must NOT scale with instance count times mesh size."""
    small = _instanced_setup(n_obj_tris=200, n_static=0, n_inst=2,
                             seed=20)[0]
    big = _instanced_setup(n_obj_tris=200, n_static=0, n_inst=1000,
                           seed=20)[0]
    rows_small = small.bvh16_table.shape[0]
    rows_big = big.bvh16_table.shape[0]
    # growth from +998 instances must be ~2 rows per instance (1 instance
    # record + its share of 8 octant copies of the instance micro-tree),
    # nowhere near 998 x the ~90-row BLAS
    assert rows_big - rows_small < 3 * 998, (rows_small, rows_big)
    assert big.inst_o2w.shape[0] == 1000
    # triangle tables unchanged
    assert big.t_idx.shape == small.t_idx.shape


def test_single_instance():
    geom, ref, _ = _instanced_setup(n_inst=1, seed=30)
    assert geom.has_instances
    rays = random_rays(512, seed=31)
    h1, t1, _, _ = bvh16_intersect_triangles_inst(geom, rays)
    h2, t2, _ = intersect_triangles_brute(ref, rays)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_no_static_geometry():
    geom, ref, _ = _instanced_setup(n_static=0, n_inst=5, seed=40)
    rays = random_rays(1024, seed=41)
    h1, t1, _, _ = bvh16_intersect_triangles_inst(geom, rays)
    h2, t2, _ = intersect_triangles_brute(ref, rays)
    h1 = np.asarray(h1)
    np.testing.assert_array_equal(h1, np.asarray(h2))
    np.testing.assert_allclose(np.asarray(t1)[h1], np.asarray(t2)[h1],
                               rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end through the PBRT parser (api.rs:1019-1090 directive semantics)
# ---------------------------------------------------------------------------

_QUAD_MESH = """
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-0.5 -0.5 0  0.5 -0.5 0  0.5 0.5 0  -0.5 0.5 0]
"""

_SCENE_HEAD = """
Film "image" "integer xresolution" [48] "integer yresolution" [48]
Sampler "02sequence" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [55]
WorldBegin
LightSource "point" "rgb I" [30 30 30] "point from" [0 3 -3]
Material "matte" "rgb Kd" [0.7 0.6 0.5]
"""


def _render(text):
    from rustracer_tpu.scene.api import parse_scene_string
    api = parse_scene_string(text)
    return np.asarray(api.scene.render()), api


@pytest.mark.slow
def test_parser_instancing_matches_explicit():
    """N ObjectInstances render identically to N explicit copies."""
    placements = ["Translate -1 0 0", "Translate 1 0.3 0.5",
                  "Rotate 40 0 1 0\nTranslate 0 -0.8 0"]
    inst = (_SCENE_HEAD
            + 'ObjectBegin "card"\n' + _QUAD_MESH + 'ObjectEnd\n'
            + "".join(f'TransformBegin\n{p}\nObjectInstance "card"\n'
                      f'TransformEnd\n' for p in placements)
            + "WorldEnd\n")
    expl = (_SCENE_HEAD
            + "".join(f'AttributeBegin\n{p}\n{_QUAD_MESH}\nAttributeEnd\n'
                      for p in placements)
            + "WorldEnd\n")
    img_i, api_i = _render(inst)
    img_e, _ = _render(expl)
    geom = api_i.scene.geom
    assert geom.has_instances
    assert geom.inst_o2w.shape[0] >= 3
    # one shared 4-vert card, not three copies
    assert geom.t_idx.shape[0] == 2
    np.testing.assert_allclose(img_i, img_e, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_parser_instance_unknown_name_ignored():
    from rustracer_tpu.scene.api import parse_scene_string
    text = _SCENE_HEAD + 'ObjectInstance "nope"\n' + _QUAD_MESH + "WorldEnd\n"
    api = parse_scene_string(text)
    img = np.asarray(api.scene.render())
    assert np.isfinite(img).all()
