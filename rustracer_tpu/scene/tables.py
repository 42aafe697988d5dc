"""Flat tensor scene representation and the closest-hit / any-hit kernels.

The reference builds a trait-object graph (Shape → GeometricPrimitive → BVH,
rustracer-core/src/{primitive.rs,scene.rs}); here the whole scene is a pytree
of flat SoA arrays — quadric tables, triangle buffers, a flattened BVH — and
intersection is a batched two-phase wavefront kernel: (1) find the closest
(t, prim) per lane, (2) rebuild the full SurfaceInteraction for winners only.

Global primitive ids: [0, Q) are quadrics, [Q, Q+T) are triangles.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.interaction import Interaction, make_shading_frame
from ..core.math import INFINITY, cross, dot, face_forward, normalize
from ..core.ray import Ray
from ..core.transform import xform_normal, xform_point, xform_vector
from ..ops.quadrics import quadric_hit_t, quadric_intersect
from ..ops.triangle import (triangle_intersect, triangle_partial_derivs,
                            triangle_point_error)


class GeometryTables(NamedTuple):
    # quadrics (padded to >= 1 with a never-hit dummy)
    q_type: jnp.ndarray       # (Q,) int32: 0 sphere / 1 cylinder / 2 disk
    q_o2w: jnp.ndarray        # (Q, 4, 4)
    q_w2o: jnp.ndarray        # (Q, 4, 4)
    q_params: jnp.ndarray     # (Q, 4)
    q_material: jnp.ndarray   # (Q,) int32 (-1 none)
    q_arealight: jnp.ndarray  # (Q,) int32 (-1 none)
    q_reverse: jnp.ndarray    # (Q,) bool: reverse_orientation ^ swaps_handedness
    # triangle mesh soup (world space, padded to >= 1 dummy tri)
    tv_p: jnp.ndarray         # (V, 3)
    tv_n: jnp.ndarray         # (V, 3) zeros if absent
    tv_uv: jnp.ndarray        # (V, 2)
    tv_s: jnp.ndarray         # (V, 3) shading tangents, zeros if absent
    t_idx: jnp.ndarray        # (T, 3) int32
    t_material: jnp.ndarray   # (T,) int32
    t_arealight: jnp.ndarray  # (T,) int32
    t_reverse: jnp.ndarray    # (T,) bool
    t_has_n: jnp.ndarray      # (T,) bool
    t_has_uv: jnp.ndarray     # (T,) bool
    t_alpha_tex: jnp.ndarray  # (T,) int32 float-texture id for alpha mask (-1 none)
    # flattened BVH over ALL primitives (see accel/bvh.py); length-1 = disabled
    bvh_lo: jnp.ndarray       # (N, 3) node AABB min
    bvh_hi: jnp.ndarray       # (N, 3) node AABB max
    bvh_meta: jnp.ndarray     # (N, 3) int32: [prim_offset_or_second_child, n_prims, axis]
    bvh_prims: jnp.ndarray    # (P,) int32 ordered global prim ids
    bvh_nodes_packed: jnp.ndarray  # (N, 8): lo(3) hi(3) child mp (bitcast)
    bvh_leaf_packed: jnp.ndarray   # (L, 40): 4 x [p0 p1 p2 tid] baked tris
    bvh_threaded: jnp.ndarray      # (8N, 8): per-octant stackless links

    @property
    def n_quadrics(self):
        return self.q_type.shape[0]

    @property
    def n_triangles(self):
        return self.t_idx.shape[0]

    @property
    def has_bvh(self):
        return self.bvh_meta.shape[0] > 1


def _dummy_quadric():
    return dict(
        q_type=np.zeros(1, np.int32),
        q_o2w=np.eye(4, dtype=np.float32)[None],
        q_w2o=np.eye(4, dtype=np.float32)[None],
        q_params=np.array([[0.0, 1.0, 2.0, 2.0 * np.pi]], np.float32),
        q_material=np.full(1, -1, np.int32),
        q_arealight=np.full(1, -1, np.int32),
        q_reverse=np.zeros(1, bool),
    )


def _dummy_tris():
    return dict(
        tv_p=np.zeros((3, 3), np.float32),
        tv_n=np.zeros((3, 3), np.float32),
        tv_uv=np.zeros((3, 2), np.float32),
        tv_s=np.zeros((3, 3), np.float32),
        t_idx=np.zeros((1, 3), np.int32),
        t_material=np.full(1, -1, np.int32),
        t_arealight=np.full(1, -1, np.int32),
        t_reverse=np.zeros(1, bool),
        t_has_n=np.zeros(1, bool),
        t_has_uv=np.zeros(1, bool),
        t_alpha_tex=np.full(1, -1, np.int32),
    )


def make_geometry(quadrics: Optional[dict] = None, tris: Optional[dict] = None,
                  bvh: Optional[dict] = None) -> GeometryTables:
    """Assemble (host-side, numpy in) → GeometryTables (jnp out)."""
    q = quadrics if quadrics and len(quadrics.get("q_type", [])) else _dummy_quadric()
    t = tris if tris and len(tris.get("t_idx", [])) else _dummy_tris()
    if bvh is None:
        bvh = dict(bvh_lo=np.zeros((1, 3), np.float32),
                   bvh_hi=np.zeros((1, 3), np.float32),
                   bvh_meta=np.zeros((1, 3), np.int32),
                   bvh_prims=np.zeros(1, np.int32))
    bvh.setdefault("bvh_nodes_packed", np.zeros((1, 8), np.float32))
    bvh.setdefault("bvh_leaf_packed", np.zeros((1, 40), np.float32))
    bvh.setdefault("bvh_threaded", np.zeros((1, 8), np.float32))
    merged = {}
    merged.update(q)
    merged.update(t)
    merged.update(bvh)
    return GeometryTables(**{k: jnp.asarray(v) for k, v in merged.items()})


# ---------------------------------------------------------------------------
# Phase 1: closest-hit search → (hit, t, prim_id)
# ---------------------------------------------------------------------------

def _quadric_object_ray(tables, ray, qid=None):
    """Transform world rays to object space. qid None = broadcast over all Q."""
    if qid is None:
        w2o = tables.q_w2o                            # (Q, 4, 4)
        o = xform_point(w2o, ray.o[..., None, :])     # (..., Q, 3)
        d = xform_vector(w2o, ray.d[..., None, :])
    else:
        w2o = tables.q_w2o[qid]                       # (..., 4, 4)
        o = xform_point(w2o, ray.o)
        d = xform_vector(w2o, ray.d)
    return o, d


def intersect_quadrics_all(tables: GeometryTables, ray: Ray):
    """Brute-force closest hit over all quadrics: returns (hit, t, qid).

    Implemented as a fori_loop over quadrics with elementwise best-tracking
    instead of a (B, Q) broadcast + argmin: the XLA TPU fusion pass crashes
    (SIGILL/SIGSEGV in TpuPriorityFusionQueue) or degenerates to minutes-long
    compiles when a cross-Q reduce is fused into the intersection producers.
    Quadric counts are small, so the sequential loop costs little.
    """
    nq = tables.n_quadrics
    ox, oy, oz = ray.o[..., 0], ray.o[..., 1], ray.o[..., 2]
    dx, dy, dz = ray.d[..., 0], ray.d[..., 1], ray.d[..., 2]

    def body(i, carry):
        # component-form transform + hit-t only: keeps the loop body dense
        # on the VPU (a (B, 3) intermediate maps the size-3 axis onto the
        # 128-lane dim at ~2% utilization)
        t_best, qid = carry
        m = tables.q_w2o[i]
        oc = (m[0, 0] * ox + m[0, 1] * oy + m[0, 2] * oz + m[0, 3],
              m[1, 0] * ox + m[1, 1] * oy + m[1, 2] * oz + m[1, 3],
              m[2, 0] * ox + m[2, 1] * oy + m[2, 2] * oz + m[2, 3])
        dc = (m[0, 0] * dx + m[0, 1] * dy + m[0, 2] * dz,
              m[1, 0] * dx + m[1, 1] * dy + m[1, 2] * dz,
              m[2, 0] * dx + m[2, 1] * dy + m[2, 2] * dz)
        t, hit = quadric_hit_t(tables.q_type[i], oc, dc, t_best,
                               tables.q_params[i])
        better = hit & (t < t_best)
        return (jnp.where(better, t, t_best),
                jnp.where(better, i, qid))

    t0 = ray.t_max
    qid0 = jnp.full(ray.t_max.shape, -1, jnp.int32)
    if nq <= 2:
        t_best, qid = (t0, qid0)
        for i in range(nq):
            t_best, qid = body(i, (t_best, qid))
    else:
        t_best, qid = jax.lax.fori_loop(0, nq, body, (t0, qid0))
    hit = qid >= 0
    return hit, jnp.where(hit, t_best, INFINITY), jnp.maximum(qid, 0)


def intersect_triangles_brute(tables: GeometryTables, ray: Ray):
    """Brute-force closest hit over all triangles: (hit, t, tid).

    fori_loop over triangles (same TPU-compiler rationale as the quadric
    loop); only used for tiny scenes — meshes go through the BVH."""
    nt = tables.n_triangles

    def body(i, carry):
        t_best, tid = carry
        idx = tables.t_idx[i]
        th = triangle_intersect(ray.o, ray.d, t_best, tables.tv_p[idx[0]],
                                tables.tv_p[idx[1]], tables.tv_p[idx[2]])
        better = th.hit & (th.t < t_best)
        return (jnp.where(better, th.t, t_best),
                jnp.where(better, i, tid))

    t0 = ray.t_max
    tid0 = jnp.full(ray.t_max.shape, -1, jnp.int32)
    if nt <= 2:
        t_best, tid = (t0, tid0)
        for i in range(nt):
            t_best, tid = body(i, (t_best, tid))
    else:
        t_best, tid = jax.lax.fori_loop(0, nt, body, (t0, tid0))
    hit = tid >= 0
    return hit, jnp.where(hit, t_best, INFINITY), jnp.maximum(tid, 0)


def scene_intersect(tables: GeometryTables, ray: Ray) -> Interaction:
    """Closest-hit over the whole scene → full SurfaceInteraction batch.

    Triangles go through the BVH when present (accel/traverse.py); quadric
    counts are tiny and stay brute-force either way."""
    nq = tables.n_quadrics
    qhit, qt, qid = intersect_quadrics_all(tables, ray)
    if tables.has_bvh:
        from ..accel.traverse import bvh_intersect_triangles
        # tighten t_max with the quadric hit before traversal
        ray_t = ray._replace(t_max=jnp.where(qhit, qt, ray.t_max))
        thit, tt, tid = bvh_intersect_triangles(tables, ray_t)
    else:
        thit, tt, tid = intersect_triangles_brute(tables, ray)
    use_tri = thit & (~qhit | (tt < qt))
    hit = qhit | thit
    t = jnp.where(use_tri, tt, qt)
    prim = jnp.where(use_tri, tid + nq, qid)
    return build_interaction(tables, ray, hit, t, prim)


def scene_intersect_p(tables: GeometryTables, ray: Ray):
    """Any-hit (shadow) test: returns (...) bool occluded."""
    qhit, _, _ = intersect_quadrics_all(tables, ray)
    if tables.has_bvh:
        from ..accel.traverse import bvh_intersect_p_triangles
        thit = bvh_intersect_p_triangles(tables, ray._replace(
            t_max=jnp.where(qhit, jnp.zeros_like(ray.t_max), ray.t_max)))
        return qhit | thit
    thit, _, _ = intersect_triangles_brute(tables, ray)
    return qhit | thit


# ---------------------------------------------------------------------------
# Phase 2: rebuild the winning hit's SurfaceInteraction
# ---------------------------------------------------------------------------

def build_interaction(tables: GeometryTables, ray: Ray, hit, t, prim) -> Interaction:
    nq = tables.n_quadrics
    is_tri = prim >= nq
    qid = jnp.clip(jnp.where(is_tri, 0, prim), 0, nq - 1)
    tid = jnp.clip(jnp.where(is_tri, prim - nq, 0), 0, tables.n_triangles - 1)

    # --- quadric branch (single gathered quadric per lane) ---
    o_obj, d_obj = _quadric_object_ray(tables, ray, qid)
    q_params = tables.q_params[qid]
    q_type = tables.q_type[qid]
    qh = quadric_intersect(q_type, o_obj, d_obj,
                           jnp.where(hit, t * 1.0001 + 1e-4, ray.t_max),
                           q_params)
    o2w = tables.q_o2w[qid]
    w2o = tables.q_w2o[qid]
    q_p = xform_point(o2w, qh.p)
    # conservative world-space error: |M| * err + gamma3 * (|M||p| + |trans|)
    from ..core.math import gamma
    from ..core.transform import apply_mat3
    absM = jnp.abs(o2w)
    e1 = jnp.stack(apply_mat3(absM, qh.p_error[..., 0], qh.p_error[..., 1],
                              qh.p_error[..., 2]), axis=-1)
    ap = jnp.abs(qh.p)
    e2 = jnp.stack(apply_mat3(absM, ap[..., 0], ap[..., 1], ap[..., 2]),
                   axis=-1)
    q_perr = e1 + gamma(3) * (e2 + jnp.abs(o2w[..., :3, 3]))
    q_dpdu = xform_vector(o2w, qh.dpdu)
    q_dpdv = xform_vector(o2w, qh.dpdv)
    q_n = normalize(cross(q_dpdu, q_dpdv))
    q_rev = tables.q_reverse[qid]
    q_n = jnp.where(q_rev[..., None], -q_n, q_n)
    q_uv = qh.uv
    q_mat = tables.q_material[qid]
    q_al = tables.q_arealight[qid]

    # --- triangle branch ---
    idx = tables.t_idx[tid]
    p0 = tables.tv_p[idx[..., 0]]
    p1 = tables.tv_p[idx[..., 1]]
    p2 = tables.tv_p[idx[..., 2]]
    th = triangle_intersect(ray.o, ray.d, jnp.where(hit, t * 1.0001 + 1e-4, ray.t_max),
                            p0, p1, p2)
    has_uv = tables.t_has_uv[tid]
    uv_default = jnp.stack([
        jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t)], -1),
        jnp.stack([jnp.ones_like(t), jnp.zeros_like(t)], -1),
        jnp.stack([jnp.ones_like(t), jnp.ones_like(t)], -1)], axis=-2)  # (..., 3, 2)
    uv0 = jnp.where(has_uv[..., None], tables.tv_uv[idx[..., 0]], uv_default[..., 0, :])
    uv1 = jnp.where(has_uv[..., None], tables.tv_uv[idx[..., 1]], uv_default[..., 1, :])
    uv2 = jnp.where(has_uv[..., None], tables.tv_uv[idx[..., 2]], uv_default[..., 2, :])
    t_p, t_perr = triangle_point_error(th.b0, th.b1, th.b2, p0, p1, p2)
    t_uv = th.b0[..., None] * uv0 + th.b1[..., None] * uv1 + th.b2[..., None] * uv2
    t_dpdu, t_dpdv = triangle_partial_derivs(p0, p1, p2, uv0, uv1, uv2)
    t_ng = normalize(cross(p0 - p2, p1 - p2))
    t_rev = tables.t_reverse[tid]
    t_ng = jnp.where(t_rev[..., None], -t_ng, t_ng)
    # shading normal from vertex normals
    has_n = tables.t_has_n[tid]
    n_interp = normalize(th.b0[..., None] * tables.tv_n[idx[..., 0]]
                         + th.b1[..., None] * tables.tv_n[idx[..., 1]]
                         + th.b2[..., None] * tables.tv_n[idx[..., 2]])
    n_interp = jnp.where(t_rev[..., None], -n_interp, n_interp)
    t_ns = jnp.where(has_n[..., None], n_interp, t_ng)
    # keep geometric normal on the same side as shading normal (mesh.rs)
    t_ng = jnp.where(has_n[..., None], face_forward(t_ng, t_ns), t_ng)
    t_mat = tables.t_material[tid]
    t_al = tables.t_arealight[tid]

    # --- select ---
    w = lambda a, b: jnp.where(is_tri[..., None], a, b)
    ws = lambda a, b: jnp.where(is_tri, a, b)
    p = w(t_p, q_p)
    p_error = w(t_perr, q_perr)
    n = w(t_ng, q_n)
    uv = w(t_uv, q_uv)
    dpdu = w(t_dpdu, q_dpdu)
    dpdv = w(t_dpdv, q_dpdv)
    ns = w(t_ns, q_n)
    material = ws(t_mat, q_mat)
    arealight = ws(t_al, q_al)
    ss, ts = make_shading_frame(ns, dpdu)
    zero3 = jnp.zeros_like(p)
    zero = jnp.zeros_like(t)
    neg1 = jnp.full(t.shape, -1, jnp.int32)
    return Interaction(
        valid=hit, t=t, p=p, p_error=p_error, wo=normalize(-ray.d),
        n=n, uv=uv, dpdu=dpdu, dpdv=dpdv, ns=ns, ss=ss, ts=ts,
        material=jnp.where(hit, material, neg1),
        arealight=jnp.where(hit, arealight, neg1),
        prim_id=jnp.where(hit, prim, neg1),
        dudx=zero, dvdx=zero, dudy=zero, dvdy=zero, dpdx=zero3, dpdy=zero3,
    )
