"""SceneBundle: the frozen, renderable scene produced by world_end.

Reference: api.rs:977-1017 (world_end builds camera → integrator → sampler →
scene and invokes renderer::render). Here world_end freezes flat tables and
returns a bundle; rendering is an explicit call (the CLI mirrors the
reference's immediate render-on-WorldEnd).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..render.camera import PerspectiveCamera
from ..render.film import Film
from ..render.filters import make_filter
from ..render.renderer import RenderConfig, RenderContext, render
from ..render.sampler import SamplerConfig
from .lights import LIGHT_AREA, make_lights
from .tables import make_geometry

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SceneBundle:
    geom: object
    lights: object
    material_set: object
    textures: dict
    camera: PerspectiveCamera
    film: Film
    sampler: SamplerConfig
    integrator: object
    integrator_name: str
    filename: str
    light_grid: object = None

    def context(self) -> RenderContext:
        return RenderContext(geom=self.geom, lights=self.lights,
                             textures=self.textures,
                             light_grid=self.light_grid)

    def render(self, progress=False, max_lanes=1 << 16, checkpoint=None,
               checkpoint_every=8):
        cfg = RenderConfig(max_lanes=max_lanes, report_progress=progress)
        from ..render.renderer import Renderer
        # use the aux-returning li when available so per-render stats
        # (path length, zero-radiance %) are counted (stats/mod.rs parity)
        li = getattr(self.integrator, "li_aux", None) or self.integrator.li
        r = Renderer(li, self.camera, self.film, self.sampler, cfg)
        tests = getattr(self.integrator, "tests_per_lane", None)
        if tests:
            r._tests_per_lane = tests()
        if checkpoint:
            return r.render_checkpointed(self.context(), checkpoint,
                                         every_spp=checkpoint_every)
        return r.render(self.context())


def _bake_alpha(tex, textures):
    """Bake a float alpha texture to an (H, W) grid for the geometry-side
    alpha atlas. ImageTexture bakes at its native level-0 resolution; other
    texture nodes are sampled on a 64x64 uv grid. The intersection kernels
    bilerp this grid — a pure-data redesign of the reference's per-hit
    Texture::evaluate alpha test (mesh.rs:355-367)."""
    from ..core.interaction import Interaction
    from .textures import ImageTexture, ConstantTexture
    from types import SimpleNamespace
    import jax.numpy as jnp
    if isinstance(tex, ConstantTexture):
        v = float(np.asarray(textures["const"][tex.key]).reshape(-1)[0])
        return np.full((2, 2), v, np.float32)
    if isinstance(tex, ImageTexture):
        lv0 = np.asarray(textures["images"][tex.image_id][0])
        res_v, res_u = lv0.shape[:2]
    else:
        res_v = res_u = 64
    us = (np.arange(res_u, dtype=np.float32) + 0.5) / res_u
    vs = (np.arange(res_v, dtype=np.float32) + 0.5) / res_v
    uu, vv = np.meshgrid(us, vs)
    n = uu.size
    uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1))
    z = jnp.zeros(n, jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    si = Interaction(valid=jnp.ones(n, bool), t=z, p=z3, p_error=z3, wo=z3,
                     n=z3, uv=uv, dpdu=z3, dpdv=z3, ns=z3, ss=z3, ts=z3,
                     material=jnp.zeros(n, jnp.int32),
                     arealight=jnp.zeros(n, jnp.int32),
                     prim_id=jnp.zeros(n, jnp.int32),
                     dudx=z, dvdx=z, dudy=z, dvdy=z, dpdx=z3, dpdy=z3)
    ctx = SimpleNamespace(textures=textures)
    val = np.asarray(tex.evaluate(si, ctx), np.float32).reshape(-1)[:n]
    return val.reshape(res_v, res_u)


def _emit_geometry(api):
    """Records → numpy SoA arrays + per-prim area-light row assignment."""
    ro = api.render_options
    light_rows = list(ro.lights)
    textures_pytree = api.textures.pytree()
    alpha_maps = []
    alpha_ids = {}

    def alpha_id(tex):
        if tex is None:
            return -1
        key = id(tex)
        if key not in alpha_ids:
            alpha_maps.append(_bake_alpha(tex, textures_pytree))
            alpha_ids[key] = len(alpha_maps) - 1
        return alpha_ids[key]

    nq = len(ro.quadrics)
    quad = None
    q_al = []
    if nq:
        quad = dict(
            q_type=np.array([r.qtype for r in ro.quadrics], np.int32),
            q_o2w=np.stack([r.o2w.m for r in ro.quadrics]),
            q_w2o=np.stack([r.o2w.m_inv for r in ro.quadrics]),
            q_params=np.stack([r.params for r in ro.quadrics]),
            q_material=np.array([r.material for r in ro.quadrics], np.int32),
            q_reverse=np.array([r.reverse for r in ro.quadrics], bool),
        )
    n_quad_slots = max(nq, 1)  # dummy pad occupies slot 0 when empty

    # quadric area lights
    for i, r in enumerate(ro.quadrics):
        if r.arealight_spec is not None:
            emit, two, nsamp = r.arealight_spec
            light_rows.append(dict(type=LIGHT_AREA, pos=(0, 0, 0), emit=emit,
                                   prim=i, twosided=two, nsamples=nsamp))
            q_al.append(len(light_rows) - 1)
        else:
            q_al.append(-1)
    if quad is not None:
        quad["q_arealight"] = np.array(q_al, np.int32)

    # meshes: transform to world & concatenate (mesh.rs:30-60 world
    # pre-xform). Instanced objects (primitive.rs:89-118) are baked ONCE in
    # instance space (their creation CTM applied) after the static meshes;
    # their rows stay object-space and are entered through instance records
    # in the wide BVH.
    vs, ns_, uvs, ss_, idxs = [], [], [], [], []
    t_mat, t_al, t_rev, t_has_n, t_has_uv = [], [], [], [], []
    t_alpha, t_shadow_alpha = [], []
    v_off = 0

    def emit_mesh(rec, arealights=True):
        nonlocal v_off, t_mat, t_al, t_rev, t_has_n, t_has_uv, \
            t_alpha, t_shadow_alpha
        p = rec.o2w.apply_point(rec.p)
        nv = p.shape[0]
        vs.append(p.astype(np.float32))
        if rec.n is not None and len(rec.n):
            ns_.append(rec.o2w.apply_normal(rec.n).astype(np.float32))
            has_n = True
        else:
            ns_.append(np.zeros((nv, 3), np.float32))
            has_n = False
        if rec.uv is not None and len(rec.uv):
            uvs.append(np.asarray(rec.uv, np.float32))
            has_uv = True
        else:
            uvs.append(np.zeros((nv, 2), np.float32))
            has_uv = False
        if rec.s is not None and len(rec.s):
            ss_.append(rec.o2w.apply_vector(rec.s).astype(np.float32))
        else:
            ss_.append(np.zeros((nv, 3), np.float32))
        tris = np.asarray(rec.indices, np.int32) + v_off
        idxs.append(tris)
        nt = tris.shape[0]
        t_mat += [rec.material] * nt
        t_rev += [rec.reverse] * nt
        t_has_n += [has_n] * nt
        t_has_uv += [has_uv] * nt
        t_alpha += [alpha_id(rec.alpha_tex)] * nt
        t_shadow_alpha += [alpha_id(rec.shadow_alpha_tex)] * nt
        if arealights and rec.arealight_spec is not None:
            emit, two, nsamp = rec.arealight_spec
            # one DiffuseAreaLight per triangle (api.rs:934-946 semantics)
            base_tri = sum(len(x) for x in idxs[:-1])
            for k in range(nt):
                light_rows.append(dict(
                    type=LIGHT_AREA, pos=(0, 0, 0), emit=emit,
                    prim=n_quad_slots + base_tri + k, twosided=two,
                    nsamples=nsamp))
                t_al.append(len(light_rows) - 1)
        else:
            t_al += [-1] * nt
        v_off += nv

    for rec in ro.meshes:
        emit_mesh(rec)

    inst = None
    if ro.instance_list:
        n_static_verts = v_off
        obj_ranges = []
        for obj_recs in ro.instance_objects:
            tri_lo = sum(len(x) for x in idxs)
            for rec in obj_recs:
                emit_mesh(rec, arealights=False)
            obj_ranges.append((tri_lo, sum(len(x) for x in idxs)))
        instances = [dict(obj=oid, o2w=T.m, w2o=T.m_inv,
                          flip=bool(T.swaps_handedness()))
                     for oid, T in ro.instance_list]
        inst = dict(objects=obj_ranges, instances=instances,
                    n_static_verts=n_static_verts)

    tris = None
    if idxs:
        tris = dict(
            tv_p=np.concatenate(vs), tv_n=np.concatenate(ns_),
            tv_uv=np.concatenate(uvs), tv_s=np.concatenate(ss_),
            t_idx=np.concatenate(idxs),
            t_material=np.array(t_mat, np.int32),
            t_arealight=np.array(t_al, np.int32),
            t_reverse=np.array(t_rev, bool),
            t_has_n=np.array(t_has_n, bool),
            t_has_uv=np.array(t_has_uv, bool),
            t_alpha_tex=np.array(t_alpha, np.int32),
            t_shadow_alpha_tex=np.array(t_shadow_alpha, np.int32),
        )

    alpha = None
    if alpha_maps:
        flats = [m.ravel() for m in alpha_maps]
        offs = np.concatenate([[0], np.cumsum([f.size for f in flats])[:-1]])
        atlas = np.concatenate(flats).astype(np.float32)
        meta = np.array([[o, m.shape[1], m.shape[0]]
                         for o, m in zip(offs, alpha_maps)], np.int32)
        if atlas.size <= 1:  # has_alpha is a static shape check (> 1)
            atlas = np.concatenate([atlas, np.zeros(1, np.float32)])
        alpha = dict(alpha_atlas=atlas, alpha_meta=meta)
    return quad, tris, light_rows, alpha, inst


def _world_bounds(quad, tris, inst=None):
    los, his = [], []
    if tris is not None and len(tris["tv_p"]):
        if inst is None:
            los.append(tris["tv_p"].min(0))
            his.append(tris["tv_p"].max(0))
        else:
            # instanced rows are object-space: bound the static verts plus
            # each instance's transformed object AABB
            from ..accel.wide import _xform_aabb
            nsv = inst["n_static_verts"]
            if nsv:
                los.append(tris["tv_p"][:nsv].min(0))
                his.append(tris["tv_p"][:nsv].max(0))
            t_idx = tris["t_idx"]
            for r in inst["instances"]:
                alo, ahi = inst["objects"][r["obj"]]
                vids = t_idx[alo:ahi].ravel()
                ov = tris["tv_p"][vids.min():vids.max() + 1]
                lo, hi = _xform_aabb(np.asarray(r["o2w"], np.float32),
                                     ov.min(0), ov.max(0))
                los.append(lo)
                his.append(hi)
    if quad is not None:
        from ..ops.quadrics import quadric_world_bounds_np
        lo, hi = quadric_world_bounds_np(quad["q_type"], quad["q_o2w"],
                                         quad["q_params"])
        los.append(lo.min(0))
        his.append(hi.max(0))
    if not los:
        z = np.zeros(3, np.float32)
        return z, np.float32(1.0), z, np.ones(3, np.float32)
    lo = np.min(np.stack(los), 0)
    hi = np.max(np.stack(his), 0)
    center = 0.5 * (lo + hi)
    radius = float(np.linalg.norm(hi - center)) or 1.0
    return center, radius, lo, hi


def build_bundle(api) -> SceneBundle:
    ro = api.render_options
    quad, tris, light_rows, alpha, inst = _emit_geometry(api)

    # BVH over everything (accelerator "bvh"; api.rs:263-276)
    bvh = None
    split = ro.accelerator_params.find_one_string("splitmethod", "sah")
    n_prims = (len(ro.quadrics) if quad else 0) + \
        (len(tris["t_idx"]) if tris else 0)
    if inst is not None:
        # instanced scenes ALWAYS build the two-level wide BVH (the only
        # kernel that understands instance records)
        from ..accel.wide import build_wide_scene
        from ..utils.stats import time_phase
        with time_phase("scene/BVH build"):
            bvh = build_wide_scene(tris, inst["objects"], inst["instances"],
                                   split_method=split)
    elif n_prims > 8:
        try:
            from ..accel.bvh import build_bvh_arrays
            from ..utils.stats import time_phase
            maxprims = ro.accelerator_params.find_one_int("maxnodeprims", 4)
            with time_phase("scene/BVH build"):
                bvh = build_bvh_arrays(quad, tris, split_method=split,
                                       max_prims=maxprims)
        except ImportError:
            log.warning("BVH module unavailable; brute-force intersection")

    geom = make_geometry(quadrics=quad, tris=tris, bvh=bvh, alpha=alpha)
    center, radius, world_lo, world_hi = _world_bounds(quad, tris, inst)

    infinite = []
    for inf in ro.infinite_lights:
        if inf["mapname"]:
            from ..render.imageio import read_image
            inf_map = read_image(inf["mapname"])
        else:
            inf_map = np.ones((4, 8, 3), np.float32)
        infinite.append(dict(map=inf_map, l2w=inf["l2w"],
                             scale=inf["scale"]))
    lights = make_lights(light_rows, world_center=center, world_radius=radius,
                         infinite=infinite, geom=geom)

    # film / filter / camera / sampler (api.rs:181-260 factories)
    filt = make_filter(ro.filter_name, ro.filter_params)
    fp = ro.film_params
    xres = fp.find_one_int("xresolution", 1280)
    yres = fp.find_one_int("yresolution", 720)
    crop = fp.find_float("cropwindow")
    if crop is not None and len(crop) == 4:
        # PBRT order [x0 x1 y0 y1] → Film (x0, y0, x1, y1)
        crop = (float(crop[0]), float(crop[2]), float(crop[1]), float(crop[3]))
    else:
        crop = (0.0, 0.0, 1.0, 1.0)
    # quirk parity: scene-provided filenames get an "rt-" prefix
    # (reference film.rs:118-123)
    fname = fp.find_one_string("filename", "")
    fname = ("rt-" + fname) if fname else "image.png"
    film = Film(full_resolution=(xres, yres),
                crop_window=crop,
                filter=filt, filename=fname,
                scale=fp.find_one_float("scale", 1.0),
                max_sample_luminance=fp.find_one_float("maxsampleluminance",
                                                       float("inf")),
                diagonal=fp.find_one_float("diagonal", 35.0) * 0.001)

    cp = ro.camera_params
    if ro.camera_name not in ("perspective",):
        log.warning("camera %r unsupported (reference has perspective only); "
                    "using perspective", ro.camera_name)
    sw = cp.find_float("screenwindow")
    screen = None
    if sw is not None and len(sw) == 4:
        screen = (float(sw[0]), float(sw[1]), float(sw[2]), float(sw[3]))
    camera = PerspectiveCamera.create(
        ro.camera_to_world,
        fov=cp.find_one_float("fov", 90.0),
        lens_radius=cp.find_one_float("lensradius", 0.0),
        focal_distance=cp.find_one_float("focaldistance", 1e6),
        resolution=(xres, yres), screen_window=screen,
        shutter_open=cp.find_one_float("shutteropen", 0.0),
        shutter_close=cp.find_one_float("shutterclose", 1.0))

    sp = ro.sampler_params
    sname = ro.sampler_name
    if sname in ("02sequence", "lowdiscrepancy", "zerotwosequence"):
        sampler = SamplerConfig(kind="02sequence",
                                spp=sp.find_one_int("pixelsamples", 16))
    elif sname == "random":
        sampler = SamplerConfig(kind="random",
                                spp=sp.find_one_int("pixelsamples", 4))
    else:
        log.warning("sampler %r unsupported; using 02sequence "
                    "(reference api.rs:205-215 supports only 02sequence)", sname)
        sampler = SamplerConfig(kind="02sequence",
                                spp=sp.find_one_int("pixelsamples", 16))
    if api.opts.get("quick_render"):
        # PbrtOptions.quick_render (reference lib.rs:97-101, declared but
        # unconsumed there; classic pbrt --quick semantics): spp / 4
        sampler = dataclasses.replace(sampler, spp=max(1, sampler.spp // 4))

    ip = ro.integrator_params
    iname = ro.integrator_name
    ms = api.material_set
    light_grid = None
    if iname == "path":
        from ..integrators.path import PathIntegrator
        integ = PathIntegrator(mat_set=ms,
                               max_depth=ip.find_one_int("maxdepth", 5),
                               rr_threshold=ip.find_one_float("rrthreshold", 1.0))
        # light-sampling strategy (path.rs:52,86-94): "spatial" default;
        # uniform when asked for or when there's only one light
        strategy = ip.find_one_string("lightsamplestrategy", "spatial")
        if strategy != "uniform" and lights.n_lights > 1:
            from .lightdistrib import build_spatial_grid
            from ..utils.stats import time_phase
            with time_phase("scene/spatial light distribution"):
                light_grid = build_spatial_grid(lights, geom, world_lo,
                                                world_hi)
    elif iname == "directlighting":
        from ..integrators.direct import DirectLightingIntegrator
        strat = ip.find_one_string("strategy", "all")
        # per-light static sample counts, aligned with the FINAL light-table
        # row order (make_lights appends infinite-light rows after `rows`)
        nsamp = tuple(r.get("nsamples", 1) for r in light_rows) + \
            tuple(inf.get("nsamples", 1) for inf in ro.infinite_lights)
        integ = DirectLightingIntegrator(
            mat_set=ms, strategy="one" if strat == "one" else "all",
            max_depth=ip.find_one_int("maxdepth", 5),
            light_nsamples=nsamp if any(n > 1 for n in nsamp) else ())
    elif iname == "whitted":
        from ..integrators.whitted import WhittedIntegrator
        integ = WhittedIntegrator(mat_set=ms,
                                  max_depth=ip.find_one_int("maxdepth", 5))
    elif iname in ("ao", "ambientocclusion"):
        from ..integrators.ao import AOIntegrator
        integ = AOIntegrator(mat_set=ms,
                             n_samples=ip.find_one_int("nsamples", 16))
    elif iname == "normal":
        from ..integrators.normal import NormalIntegrator
        integ = NormalIntegrator(mat_set=ms)
    else:
        log.warning("integrator %r unknown; using path", iname)
        from ..integrators.path import PathIntegrator
        integ = PathIntegrator(mat_set=ms, max_depth=5)

    textures = api.textures.pytree()
    if textures.get("images"):
        # shared mip atlas metadata (scene/atlas.py): static offsets for
        # the per-parameter-slot lookup fast path in MaterialSet.shade
        from .atlas import build_atlas_meta
        am = build_atlas_meta(textures["images"])
        if am is not None:
            textures["atlas_meta"] = am["atlas_meta"]
            textures["atlas_levels"] = am["atlas_levels"]
    _report_build_stats(geom, lights, ms, film, textures, tris, bvh,
                        n_quadrics=len(ro.quadrics))
    return SceneBundle(
        geom=geom, lights=lights, material_set=ms,
        textures=textures, camera=camera, film=film,
        sampler=sampler, integrator=integ, integrator_name=iname,
        filename=film.filename, light_grid=light_grid)


def _report_build_stats(geom, lights, ms, film, textures, tris, bvh,
                        n_quadrics=0):
    """Scene-build counters, matching the reference's registered stats:
    bvh/mod.rs:19-27 (node counts, prims/leaf, tree bytes), mesh.rs:21-23
    (mesh memory), film.rs:19 (film memory), mipmap.rs:17-19 (mip memory),
    scene.rs + api.rs counts."""
    from ..utils import stats as S
    n_tris = int(geom.n_triangles) if tris is not None else 0
    S.counter_add("Scene/Triangles", n_tris)
    S.counter_add("Scene/Quadric shapes", n_quadrics)
    S.counter_add("Scene/Lights", int(lights.n_lights))
    S.counter_add("Scene/Materials", len(ms.materials))
    if tris is not None:
        mesh_bytes = sum(np.asarray(tris[k]).nbytes for k in
                         ("tv_p", "tv_n", "tv_uv", "tv_s", "t_idx"))
        S.memory_add("Memory/Triangle meshes", mesh_bytes)
    if bvh is not None and "bvh_meta" in bvh:
        meta = np.asarray(bvh["bvh_meta"])
        is_leaf = meta[:, 1] > 0
        n_leaf = int(is_leaf.sum())
        S.counter_add("BVH/Interior nodes", int((~is_leaf).sum()))
        S.counter_add("BVH/Leaf nodes", n_leaf)
        S.ratio_report("BVH/Primitives per leaf node",
                       int(meta[is_leaf, 1].sum()), n_leaf)
        S.memory_add("Memory/BVH tree",
                     sum(np.asarray(v).nbytes for v in bvh.values()))
    xr, yr = film.full_resolution
    S.memory_add("Memory/Film pixels", xr * yr * 4 * 4)
    for pyr in textures.get("images", []):
        S.memory_add("Memory/Texture MIP maps",
                     sum(np.asarray(lv).nbytes for lv in pyr))
