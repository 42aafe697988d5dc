"""Shared integrator machinery: visibility, MIS direct lighting.

Reference: rustracer-core/src/integrator/mod.rs:145-318
(uniform_sample_all_light / one_light, estimate_direct with the power
heuristic, VisibilityTester). All batched over lanes with validity masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import INFINITY, absdot, dot, length, normalize, offset_ray_origin
from ..core.ray import Ray
from ..core.sampling import power_heuristic
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..scene import lights as L
from ..scene.tables import scene_intersect, scene_intersect_p


def unoccluded(geom, si, ls: L.LightSample, mask=None):
    """VisibilityTester (light/mod.rs:42-56): shadow ray from si to the
    sampled light point (or direction probe for distant/infinite). Lanes
    with mask=False trace a zero-length ray (they can't stretch the
    lockstep BVH loop)."""
    o = offset_ray_origin(si.p, si.p_error, si.n, ls.wi)
    p_t = jnp.where(ls.at_infinity[..., None], ls.p_target,
                    offset_ray_origin(ls.p_target, ls.err_target, ls.n_target,
                                      o - ls.p_target))
    d = p_t - o
    dist = length(d)
    t_max = jnp.where(ls.at_infinity, INFINITY, 1.0 - 1e-3)
    if mask is not None:
        t_max = jnp.where(mask, t_max, 0.0)
    ray = Ray(o=o, d=jnp.where(ls.at_infinity[..., None], ls.wi, d),
              t_max=t_max)
    return ~scene_intersect_p(geom, ray)


def estimate_direct(ctx, mat_set, si, lobes, lid, u_light, u_scatter_lobe,
                    u_scatter, handle_media=False, specular=False):
    """MIS light-sample + BSDF-sample direct lighting
    (integrator/mod.rs:222-318). Returns (B, 3) radiance (un-beta'd)."""
    types = mat_set.types_present()
    flags = B.ALL if specular else (B.ALL & ~B.SPECULAR)
    geom = ctx.geom
    lt = ctx.lights
    zero = jnp.zeros(si.t.shape + (3,), jnp.float32)

    # --- light sampling strategy ---
    ls = L.sample_li(lt, geom, lid, si, u_light)
    f = B.bsdf_f(lobes, si, si.wo, ls.wi, types, flags) * \
        absdot(ls.wi, si.ns)[..., None]
    scattering_pdf = B.bsdf_pdf(lobes, si, si.wo, ls.wi, types, flags)
    contrib_possible = (ls.pdf > 0.0) & ~is_black(ls.li) & ~is_black(f) & si.valid
    vis = unoccluded(geom, si, ls, mask=contrib_possible) & contrib_possible
    li = jnp.where(vis[..., None], ls.li, 0.0)
    weight = jnp.where(ls.is_delta, 1.0,
                       power_heuristic(1.0, ls.pdf, 1.0, scattering_pdf))
    # double-where on the pdf divisor: a non-finite masked-out pdf would
    # otherwise poison gradients of f (0-cotangent * nan-forward = nan)
    pdf_safe = jnp.where(contrib_possible, jnp.maximum(ls.pdf, 1e-12), 1.0)
    ld = jnp.where(contrib_possible[..., None],
                   f * li * (weight / pdf_safe)[..., None], zero)

    # --- BSDF sampling strategy (skip for delta lights) ---
    if lt.all_delta:
        # every light is a delta light: the BSDF side contributes nothing
        # and its scene_intersect can be skipped entirely (static)
        return ld
    wi_b, f_b, pdf_b, sampled_flags, ok_b = B.bsdf_sample_f(
        lobes, si, si.wo, u_scatter_lobe, u_scatter, types, flags)
    f_b = f_b * absdot(wi_b, si.ns)[..., None]
    sampled_specular = (sampled_flags & B.SPECULAR) != 0
    do_bsdf = ok_b & ~ls.is_delta & ~is_black(f_b) & (pdf_b > 0.0) & si.valid
    light_pdf = L.pdf_li(lt, geom, lid, si, wi_b)
    w_b = jnp.where(sampled_specular, 1.0,
                    power_heuristic(1.0, pdf_b, 1.0, light_pdf))
    do_bsdf = do_bsdf & (sampled_specular | (light_pdf > 0.0))
    # trace the BSDF ray (dead lanes zero-length); did we hit THIS light?
    ray_b = si.spawn_ray(wi_b)
    ray_b = ray_b._replace(t_max=jnp.where(do_bsdf, ray_b.t_max, 0.0))
    si_b = scene_intersect(geom, ray_b)
    hit_this_light = si_b.valid & (si_b.arealight == lid)
    le_surf = L.arealight_le(lt, si_b.arealight, si_b.n, -wi_b)
    le_surf = jnp.where(hit_this_light[..., None], le_surf, 0.0)
    is_inf_row = lt.l_type[lid] == L.LIGHT_INFINITE
    le_escape = jnp.where((~si_b.valid & is_inf_row)[..., None],
                          L.infinite_le_one(lt, lid, wi_b), 0.0)
    li_b = le_surf + le_escape
    pdf_b_safe = jnp.where(do_bsdf, jnp.maximum(pdf_b, 1e-12), 1.0)
    ld = ld + jnp.where(do_bsdf[..., None],
                        f_b * li_b * (w_b / pdf_b_safe)[..., None], zero)
    return ld


def estimate_direct_light_side(ctx, mat_set, si, lobes, lid, u_light,
                               sel_pmf):
    """Light-sampling half of MIS NEE for the merged wavefront path
    formulation: the BSDF-side sample is NOT traced here — the path's own
    bounce ray doubles as it (emission hits are MIS-weighted in the bounce
    loop). `sel_pmf` (B,) is the light-selection probability; unlike
    estimate_direct (integrator/mod.rs:222-318, which leaves selection to
    the caller) it is folded into the light pdf so the two MIS halves use
    the SAME strategy density pmf·pdf_li. f and the scattering pdf use
    flags=ALL to match bsdf_sample_f's bounce sampling (specular lobes
    evaluate to zero density)."""
    types = mat_set.types_present()
    geom = ctx.geom
    lt = ctx.lights
    zero = jnp.zeros(si.t.shape + (3,), jnp.float32)

    ls = L.sample_li(lt, geom, lid, si, u_light)
    light_pdf = ls.pdf * sel_pmf
    f = B.bsdf_f(lobes, si, si.wo, ls.wi, types, B.ALL) * \
        absdot(ls.wi, si.ns)[..., None]
    scattering_pdf = B.bsdf_pdf(lobes, si, si.wo, ls.wi, types, B.ALL)
    contrib_possible = (light_pdf > 0.0) & ~is_black(ls.li) & ~is_black(f) \
        & si.valid
    vis = unoccluded(geom, si, ls, mask=contrib_possible) & contrib_possible
    li = jnp.where(vis[..., None], ls.li, 0.0)
    weight = jnp.where(ls.is_delta, 1.0,
                       power_heuristic(1.0, light_pdf, 1.0, scattering_pdf))
    pdf_safe = jnp.where(contrib_possible, jnp.maximum(light_pdf, 1e-12), 1.0)
    ld = jnp.where(contrib_possible[..., None],
                   f * li * (weight / pdf_safe)[..., None], zero)
    # second value: shadow probes actually submitted (reference
    # scene.rs:16-20 counts intersect_p calls; masked lanes trace a
    # zero-length ray and are dead inside the traversal)
    return ld, jnp.sum(contrib_possible.astype(jnp.int32))


def specular_diff_ray(ray: Ray, si, wi, eta, transmit: bool) -> Ray:
    """Spawn a specular continuation ray, propagating ray differentials
    (reference integrator/mod.rs:49-142). Reflection:
      rx_dir = wi − dwodx + 2(wo·ns·dndx + dDNdx·ns)
    Transmission uses PBRT's μ form. NOTE: the reference computes dmudx but
    then uses dDNdx in the direction update (integrator/mod.rs:133-136, the
    `_dmudx` binding is dead) — a port bug vs PBRT-v3; we use the correct
    dmudx term."""
    r = si.spawn_ray(wi)
    if not ray.has_differentials:
        return r
    ns = si.ns
    wo = si.wo
    dndx = si.dndu * si.dudx[..., None] + si.dndv * si.dvdx[..., None]
    dndy = si.dndu * si.dudy[..., None] + si.dndv * si.dvdy[..., None]
    dwodx = -ray.rx_direction - wo
    dwody = -ray.ry_direction - wo
    ddndx = dot(dwodx, ns) + dot(wo, dndx)
    ddndy = dot(dwody, ns) + dot(wo, dndy)
    if not transmit:
        won = dot(wo, ns)[..., None]
        rx_d = wi - dwodx + 2.0 * (won * dndx + ddndx[..., None] * ns)
        ry_d = wi - dwody + 2.0 * (won * dndy + ddndy[..., None] * ns)
    else:
        e = jnp.where(dot(wo, ns) < 0.0, 1.0 / jnp.maximum(eta, 1e-8), eta)
        w = -wo
        wn = dot(w, ns)
        win = dot(wi, ns)
        mu = e * wn - win
        dmu = (e - (e * e * wn) / jnp.where(jnp.abs(win) > 1e-8, win, 1.0))
        dmudx = dmu * ddndx
        dmudy = dmu * ddndy
        rx_d = wi + e[..., None] * dwodx - (mu[..., None] * dndx
                                            + dmudx[..., None] * ns)
        ry_d = wi + e[..., None] * dwody - (mu[..., None] * dndy
                                            + dmudy[..., None] * ns)
    return r._replace(rx_origin=si.p + si.dpdx, ry_origin=si.p + si.dpdy,
                      rx_direction=rx_d, ry_direction=ry_d)


class _OffsetDims:
    """Dimension allocator with a TRACED base: inside the scanned
    specular-tree loop each node derives unique sampler dimensions from a
    per-node base carried on the stack (the stateless hash sampler accepts
    traced dims)."""

    def __init__(self, base1, base2):
        self.base1, self.base2 = base1, base2
        self.k1 = 0
        self.k2 = 0

    def next_1d(self):
        d = self.base1 + self.k1
        self.k1 += 1
        return d

    def next_2d(self):
        d = self.base2 + self.k2
        self.k2 += 1
        return d


def _trace_specular_stack(ctx, mat_set, ray, lanes, sampler, dims, max_depth,
                          direct_fn, types):
    """Stack-of-wavefronts specular tree: one traced node body + a DFS
    while_loop instead of 2^depth statically-inlined wavefronts.

    Replaces the static unroll for transmissive scenes at high maxdepth —
    a glass-heavy scene at maxdepth 5 otherwise compiles 32 traversal
    trees (the round-3 compile cliff). Runtime visits the same nodes but
    SKIPS fully-dead subtrees (the unroll cannot), and compile time is one
    node body. Stack entries carry (ray+differentials, throughput, live,
    depth, sampler-dim bases); per-node dim bases are computed from static
    per-node consumption x traced subtree size, so every tree node draws
    unique, deterministic sampler dimensions exactly like the unrolled
    form (different dim VALUES, same statistical contract).
    Reference: integrator/mod.rs:49-142 recursive specular_reflection/
    specular_transmission."""
    from ..core.interaction import compute_differentials
    lt = ctx.lights
    bs = ray.t_max.shape
    STACK_N = max_depth + 2

    def node(ray_e, live, b1, b2):
        si = scene_intersect(ctx.geom, ray_e)
        si = compute_differentials(si, ray_e)
        le_esc = L.infinite_le(lt, ray_e.d)
        Lloc = jnp.where((live & ~si.valid)[..., None], le_esc, 0.0)
        alive = live & si.valid & (si.material >= 0)
        le = L.arealight_le(lt, si.arealight, si.n, si.wo)
        Lloc = Lloc + jnp.where(alive[..., None], le, 0.0)
        si_s, lobes = mat_set.shade(si, ctx)
        lobes = lobes._replace(active=lobes.active & alive[..., None])
        od = _OffsetDims(b1, b2)
        Lloc = Lloc + jnp.where(alive[..., None],
                                direct_fn(si_s, lobes, od), 0.0)
        return Lloc, si_s, lobes, alive, od.k1, od.k2

    stack0 = (
        jax.tree.map(lambda a: jnp.zeros((STACK_N,) + a.shape, a.dtype), ray),
        jnp.zeros((STACK_N,) + bs + (3,), jnp.float32),   # throughput
        jnp.zeros((STACK_N,) + bs, bool),                 # live
        jnp.zeros((STACK_N,), jnp.int32),                 # depth
        jnp.zeros((STACK_N,), jnp.int32),                 # dim base (1d)
        jnp.zeros((STACK_N,), jnp.int32),                 # dim base (2d)
    )
    # per-node static dim consumption, captured when while_loop traces the
    # body's python exactly once (used to advance the caller's allocator)
    node_dims = [0, 0]

    def write(stack, sp, ray_e, wgt, live, depth, b1, b2):
        sr, sw, sl, sd, s1, s2 = stack
        upd = lambda A, v: jax.lax.dynamic_update_index_in_dim(A, v, sp, 0)
        return (jax.tree.map(upd, sr, ray_e), upd(sw, wgt), upd(sl, live),
                upd(sd, depth), upd(s1, b1), upd(s2, b2))

    def read(stack, sp):
        sr, sw, sl, sd, s1, s2 = stack
        rd = lambda A: jax.lax.dynamic_index_in_dim(A, sp, 0, keepdims=False)
        return (jax.tree.map(rd, sr), rd(sw), rd(sl), rd(sd), rd(s1), rd(s2))

    def body(carry):
        sp, stack, Lacc, nexec = carry
        sp1 = sp - 1
        ray_e, wgt, live, depth, b1, b2 = read(stack, sp1)
        Lloc, si_s, lobes, alive, c1, c2 = node(ray_e, live, b1, b2)
        node_dims[0], node_dims[1] = c1, c2
        Lacc = Lacc + wgt * Lloc
        nexec = nexec + 1
        sp = sp1

        depth_ok = depth + 1 < max_depth
        rem = jnp.maximum(max_depth - depth - 1, 0)
        sub_nodes = jnp.left_shift(jnp.int32(1), rem) - 1   # child subtree

        wiA, wgtA, okA = B.specular_reflect_branch(lobes, si_s, si_s.wo,
                                                   types)
        liveA = alive & okA & jnp.any(wgtA > 0.0, axis=-1) & depth_ok
        rA = specular_diff_ray(ray_e, si_s, wiA, lobes.eta, transmit=False)
        rA = rA._replace(t_max=jnp.where(liveA, rA.t_max, 0.0))
        doA = jnp.any(liveA)
        stack = write(stack, sp, rA, wgt * wgtA, liveA, depth + 1,
                      b1 + c1, b2 + c2)
        sp = sp + doA.astype(jnp.int32)

        wiB, wgtB, okB = B.specular_transmit_branch(lobes, si_s, si_s.wo,
                                                    types)
        liveB = alive & okB & jnp.any(wgtB > 0.0, axis=-1) & depth_ok
        rB = specular_diff_ray(ray_e, si_s, wiB, lobes.eta, transmit=True)
        rB = rB._replace(t_max=jnp.where(liveB, rB.t_max, 0.0))
        doB = jnp.any(liveB)
        stack = write(stack, sp, rB, wgt * wgtB, liveB, depth + 1,
                      b1 + c1 + c1 * sub_nodes, b2 + c2 + c2 * sub_nodes)
        sp = sp + doB.astype(jnp.int32)
        return (sp, stack, Lacc, nexec)

    from ..utils import stats as S
    live0 = ray.t_max > 0.0
    stack0 = write(stack0, jnp.int32(0), ray,
                   jnp.ones(bs + (3,), jnp.float32), live0,
                   jnp.int32(0), jnp.int32(dims.d1), jnp.int32(dims.d2))
    pre_tape = S.device_tape_drain()
    _, _, Lacc, nexec = jax.lax.while_loop(
        lambda c: c[0] > 0, body,
        (jnp.int32(1), stack0, jnp.zeros(bs + (3,), jnp.float32),
         jnp.int32(0)))
    # tape scope: the node body traced once; its static python counts
    # (texture lookups etc.) are scaled by the executed node count
    body_tape = S.device_tape_drain()
    if pre_tape is not None:
        for k, v in pre_tape.items():
            S.device_count(k, v)
        for k, v in body_tape.items():
            if isinstance(v, (int, float)):
                S.device_count(k, v * nexec)
    # advance the caller's allocator past this tree's worst-case traced
    # consumption (per-node count x full-tree node count), so dims a caller
    # allocates afterwards can never collide with the tree's per-node dims
    n_tree = (1 << max_depth) - 1
    dims.d1 += node_dims[0] * n_tree
    dims.d2 += node_dims[1] * n_tree
    return Lacc


def trace_specular_tree(ctx, mat_set, ray, lanes, sampler, dims, max_depth,
                        direct_fn):
    """Shared Whitted/direct-lighting driver: emitted + direct lighting per
    depth, then DETERMINISTIC specular reflect+transmit branching — the
    wavefront equivalent of the reference's recursive specular_reflection/
    specular_transmission (whitted.rs:87-97, directlighting.rs via
    integrator/mod.rs:49-142). Each branch statically unrolls, so the tree
    has 2^depth wavefronts when transmissive specular materials are present
    and a single chain otherwise (pruned via types_present)."""
    from ..core.interaction import compute_differentials
    types = mat_set.types_present()
    lt = ctx.lights
    has_refl = any(t in types for t in (B.SPECULAR_REFL, B.FRESNEL_SPECULAR))
    has_trans = any(t in types for t in (B.SPECULAR_TRANS,
                                         B.FRESNEL_SPECULAR))
    if has_refl and has_trans and max_depth >= 4:
        # true 2^depth branching: bound compile time with the DFS stack
        # driver (one traced node body); reflect-only chains stay unrolled
        # (linear, cheap to compile, keeps dim allocation untouched)
        return _trace_specular_stack(ctx, mat_set, ray, lanes, sampler, dims,
                                     max_depth, direct_fn, types)

    def trace(ray, depth, live):
        bs = ray.t_max.shape
        si = scene_intersect(ctx.geom, ray)
        si = compute_differentials(si, ray)
        le_esc = L.infinite_le(lt, ray.d)
        Lrad = jnp.where((live & ~si.valid)[..., None], le_esc, 0.0)
        alive = live & si.valid & (si.material >= 0)
        le = L.arealight_le(lt, si.arealight, si.n, si.wo)
        Lrad = Lrad + jnp.where(alive[..., None], le, 0.0)

        si_s, lobes = mat_set.shade(si, ctx)
        lobes = lobes._replace(active=lobes.active & alive[..., None])
        Lrad = Lrad + jnp.where(alive[..., None],
                                direct_fn(si_s, lobes, dims), 0.0)

        if depth + 1 < max_depth:
            if has_refl:
                wi, wgt, ok = B.specular_reflect_branch(lobes, si_s, si_s.wo,
                                                        types)
                live_r = alive & ok & jnp.any(wgt > 0.0, axis=-1)
                r = specular_diff_ray(ray, si_s, wi, lobes.eta,
                                      transmit=False)
                r = r._replace(t_max=jnp.where(live_r, r.t_max, 0.0))
                sub = trace(r, depth + 1, live_r)
                # wgt already equals f·|cosθ|/pdf for the deterministic
                # single-lobe specular sample (R·Fresnel)
                Lrad = Lrad + jnp.where(live_r[..., None], wgt * sub, 0.0)
            if has_trans:
                wi, wgt, ok = B.specular_transmit_branch(lobes, si_s,
                                                         si_s.wo, types)
                live_t = alive & ok & jnp.any(wgt > 0.0, axis=-1)
                r = specular_diff_ray(ray, si_s, wi, lobes.eta,
                                      transmit=True)
                r = r._replace(t_max=jnp.where(live_t, r.t_max, 0.0))
                sub = trace(r, depth + 1, live_t)
                Lrad = Lrad + jnp.where(live_t[..., None], wgt * sub, 0.0)
        return Lrad

    bs = ray.t_max.shape
    return trace(ray, 0, jnp.ones(bs, bool))


def uniform_sample_one_light(ctx, mat_set, si, lobes, sampler, lanes, dims):
    """Pick one light uniformly (integrator/mod.rs:186-220)."""
    lt = ctx.lights
    n = lt.n_lights
    u_sel = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx, dims.next_1d())
    lid = jnp.minimum((u_sel * n).astype(jnp.int32), n - 1)
    u_light = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
    u_sc_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx, dims.next_1d())
    u_sc = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
    ld = estimate_direct(ctx, mat_set, si, lobes, lid, u_light, u_sc_lobe, u_sc)
    return ld * float(n)


def spatial_sample_one_light(ctx, mat_set, si, lobes, sampler, lanes, dims):
    """Pick one light from the per-voxel spatial distribution
    (lightdistrib.rs:59-204 via the precomputed dense grid in
    scene/lightdistrib.py); weight by the selection PMF."""
    from ..scene import lightdistrib as LD
    u_sel = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx, dims.next_1d())
    lid, pmf = LD.sample_light(ctx.light_grid, si.p, u_sel)
    u_light = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
    u_sc_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx, dims.next_1d())
    u_sc = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx, dims.next_2d())
    ld = estimate_direct(ctx, mat_set, si, lobes, lid, u_light, u_sc_lobe, u_sc)
    return ld / jnp.maximum(pmf, 1e-12)[..., None]


def sample_one_light(ctx, mat_set, si, lobes, sampler, lanes, dims):
    """Strategy dispatch (path.rs:86-94): spatial when the context carries a
    precomputed grid, uniform otherwise. Consumes the same sampler dimension
    count either way so sequences stay aligned across strategies."""
    if getattr(ctx, "light_grid", None) is not None:
        return spatial_sample_one_light(ctx, mat_set, si, lobes, sampler,
                                        lanes, dims)
    return uniform_sample_one_light(ctx, mat_set, si, lobes, sampler, lanes,
                                    dims)


def uniform_sample_all_lights(ctx, mat_set, si, lobes, sampler, lanes, dims,
                              nsamples=None):
    """Loop all lights (integrator/mod.rs:145-184): each light takes its
    static per-light sample count (diffuse.rs:46-50 "samples"; default 1)
    and contributes the AVERAGE of those samples (mod.rs:154-172); the sum
    runs over lights. `nsamples` is a static tuple aligned with the light
    table rows (None → one sample per light)."""
    lt = ctx.lights
    n = lt.n_lights
    total = jnp.zeros(si.t.shape + (3,), jnp.float32)
    for i in range(n):
        ns = 1
        if nsamples is not None and i < len(nsamples):
            ns = max(1, int(nsamples[i]))
        lid = jnp.full(si.t.shape, i, jnp.int32)
        acc = jnp.zeros(si.t.shape + (3,), jnp.float32)
        for _ in range(ns):
            u_light = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                     dims.next_2d())
            u_sc_lobe = sampler.get_1d(lanes.pixel_idx, lanes.sample_idx,
                                       dims.next_1d())
            u_sc = sampler.get_2d(lanes.pixel_idx, lanes.sample_idx,
                                  dims.next_2d())
            acc = acc + estimate_direct(ctx, mat_set, si, lobes, lid,
                                        u_light, u_sc_lobe, u_sc)
        total = total + acc / float(ns)
    return total
