"""EXPERIMENT: 32-wide/256-float BVH rows vs the production 16-wide/128.

docs/PERF.md fact 4: dependent row-gather rate at W=256 is ~80% of W=128
with 2x the payload, so a 32-ary tree (32 child AABBs+links per interior
row, 16 triangles per leaf row) needs ~1.4-1.6x fewer rows/ray at a modest
rate cost — IF the doubled per-row VPU work doesn't eat the win. This tool
answers that with a self-contained 32-wide packer + traversal (regen
driver, non-instanced) measured head-to-head against the production kernel
on the dragon mesh. Results decide whether the layout is adopted.

Usage: python tools/exp_wide32.py [log2_batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.accel import wide as W16
from rustracer_tpu.accel.bvh import triangle_bounds
from rustracer_tpu.core.math import INFINITY
from rustracer_tpu.ops.triangle import triangle_intersect_c
from bench_traverse import camera_like_rays
from sweep_regen import dragon_geom

WIDTH = 32
LEAF_K = 16
REC = 256
# layout: interior [0]=tag [1..33)=links [33..225)=boxes(6x32)
#         leaf     [0]=tag [1..17)=tids [17..161)=verts(9x16)


def pack32(tris):
    lo, hi = triangle_bounds(np.asarray(tris["tv_p"]),
                             np.asarray(tris["t_idx"]))
    nl, nh, meta, prims = W16._build_binary(lo, hi, "sah", LEAF_K)
    old = (W16.WIDTH, W16.LEAF_K)
    W16.WIDTH = WIDTH
    W16.LEAF_K = LEAF_K
    try:
        wc, wl, wmap, depth = W16.collapse_wide(nl, nh, meta)
    finally:
        W16.WIDTH, W16.LEAF_K = old
    tv_p = np.asarray(tris["tv_p"], np.float32)
    t_idx = np.asarray(tris["t_idx"])

    leaf_rows, leaves = {}, []
    for kids, lfs in zip(wc, wl):
        for b, lf in zip(kids, lfs):
            if lf and b not in leaf_rows:
                leaf_rows[b] = len(leaves)
                leaves.append(b)
    Ni, Nl = len(wc), len(leaves)
    leaf_base = 8 * Ni
    table = np.zeros((leaf_base + max(Nl, 1), REC), np.float32)

    # leaves
    tids = np.full((Nl, LEAF_K), -1, np.int32)
    for j, b in enumerate(leaves):
        off, cnt = int(meta[b, 0]), int(meta[b, 1])
        assert cnt <= LEAF_K
        tids[j, :cnt] = prims[off:off + cnt]
    if Nl:
        rec = table[leaf_base:leaf_base + Nl]
        ntri = (tids >= 0).sum(1).astype(np.int32)
        rec[:, 0] = (-ntri).view(np.float32)
        rec[:, 1:1 + LEAF_K] = tids.view(np.float32)
        safe = np.maximum(tids, 0)
        verts = tv_p[t_idx[safe]].astype(np.float32)
        verts[tids < 0] = 0.0
        for v in range(3):
            for c in range(3):
                blk = 1 + LEAF_K + (v * 3 + c) * LEAF_K
                rec[:, blk:blk + LEAF_K] = verts[:, :, v, c]

    # interiors, 8 octant copies
    INF = np.float32(np.inf)
    for wid, (kids, lfs) in enumerate(zip(wc, wl)):
        k = len(kids)
        klo, khi = nl[kids], nh[kids]
        cent = 0.5 * (klo + khi)
        links = np.empty(k, np.int32)
        interior = np.empty(k, bool)
        for j, (b, lf) in enumerate(zip(kids, lfs)):
            links[j] = leaf_base + leaf_rows[b] if lf else wmap[b]
            interior[j] = not lf
        for o in range(8):
            key = cent @ W16._SIGNS[o]
            perm = np.argsort(key, kind="stable")
            rec = table[o * Ni + wid]
            rec[0] = np.int32(k).view(np.float32)
            lk = links[perm]
            it = interior[perm]
            lk_off = np.where(it, lk + o * Ni, lk).astype(np.int32)
            lnk = np.full(WIDTH, -1, np.int32)
            lnk[:k] = lk_off
            rec[1:1 + WIDTH] = lnk.view(np.float32)
            box = np.empty((6, WIDTH), np.float32)
            box[0:3, :] = INF
            box[3:6, :] = -INF
            box[0:3, :k] = klo[perm].T
            box[3:6, :k] = khi[perm].T
            rec[1 + WIDTH:1 + 7 * WIDTH] = box.reshape(-1)
    roots = np.arange(8, dtype=np.int32) * Ni
    return jnp.asarray(table), jnp.asarray(roots), depth, Ni, Nl


FULL32 = -1  # all 32 bits set (int32)
A_ = 1 << 13
S_ = 8
F_ = 4
MAXS = 64


def _inv(c):
    safe = jnp.where(jnp.abs(c) < 1e-20,
                     jnp.where(c < 0, -1e-20, 1e-20), c)
    return 1.0 / safe


def make_body32(table, D):
    R = table.shape[0]

    def body(s):
        row, vmask, sp, t_best, prim, done, stack_row, stack_mask, rayc = s
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rayc
        active = ~done
        rec = table[jnp.clip(row, 0, R - 1)]
        recT = rec.T
        tag = jax.lax.bitcast_convert_type(recT[0], jnp.int32)
        is_leaf = tag < 0
        is_int = ~is_leaf

        r1 = lambda v: v[None, :]
        Wd = WIDTH
        base = 1 + Wd
        lo_x = recT[base + 0 * Wd: base + 1 * Wd]
        lo_y = recT[base + 1 * Wd: base + 2 * Wd]
        lo_z = recT[base + 2 * Wd: base + 3 * Wd]
        hi_x = recT[base + 3 * Wd: base + 4 * Wd]
        hi_y = recT[base + 4 * Wd: base + 5 * Wd]
        hi_z = recT[base + 5 * Wd: base + 6 * Wd]
        t0x = (lo_x - r1(ox)) * r1(ix)
        t1x = (hi_x - r1(ox)) * r1(ix)
        t0y = (lo_y - r1(oy)) * r1(iy)
        t1y = (hi_y - r1(oy)) * r1(iy)
        t0z = (lo_z - r1(oz)) * r1(iz)
        t1z = (hi_z - r1(oz)) * r1(iz)
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z)) * 1.00000024
        links = jax.lax.bitcast_convert_type(recT[1:1 + Wd], jnp.int32)
        box_hit = (t_near <= t_far) & (t_far > 0.0) & \
            (t_near < r1(t_best)) & (links >= 0)
        bits = jnp.sum(
            jnp.where(box_hit,
                      jnp.int32(1) << jnp.arange(Wd, dtype=jnp.int32)[:, None],
                      0), axis=0).astype(jnp.int32)
        m = bits & vmask

        tid = jax.lax.bitcast_convert_type(recT[1:1 + LEAF_K], jnp.int32)
        vb = 1 + LEAF_K
        blk = lambda j: recT[vb + j * LEAF_K: vb + (j + 1) * LEAF_K]
        th = triangle_intersect_c(
            (r1(ox), r1(oy), r1(oz)), (r1(dx), r1(dy), r1(dz)),
            r1(t_best), (blk(0), blk(1), blk(2)),
            (blk(3), blk(4), blk(5)), (blk(6), blk(7), blk(8)))
        tri_ok = (is_leaf & active)[None, :] & (tid >= 0) & th.hit
        t_cand = jnp.where(tri_ok, th.t, INFINITY)
        j_min = jnp.argmin(t_cand, axis=0)
        eqk = j_min[None, :] == jnp.arange(LEAF_K, dtype=jnp.int32)[:, None]
        tid_sel = jnp.sum(jnp.where(eqk, tid, 0), axis=0)
        ok_sel = jnp.any(eqk & tri_ok, axis=0)
        t_min = jnp.sum(jnp.where(eqk, t_cand, 0.0), axis=0)
        best_tid = jnp.where(ok_sel, tid_sel, -1)
        upd = is_leaf & active & (best_tid >= 0) & (t_min < t_best)
        t_best = jnp.where(upd, t_min, t_best)
        prim = jnp.where(upd, best_tid, prim)

        descend = active & is_int & (m != 0)
        low = m & -m
        slot = jax.lax.population_count(low - 1)
        eqw = slot[None, :] == jnp.arange(Wd, dtype=jnp.int32)[:, None]
        link = jnp.sum(jnp.where(eqw, links, 0), axis=0)
        rest = m & ~low
        push = descend & (rest != 0)
        for d in range(D):
            at = push & (sp == d)
            stack_row = tuple(jnp.where(at, row, sr) if d == e else sr
                              for e, sr in enumerate(stack_row))
            stack_mask = tuple(jnp.where(at, rest, sm) if d == e else sm
                               for e, sm in enumerate(stack_mask))
        sp = sp + push.astype(jnp.int32)
        need_pop = active & ~descend
        sp_top = sp - 1
        eq_d = sp_top[None, :] == jnp.arange(D, dtype=jnp.int32)[:, None]
        prow = jnp.sum(jnp.where(eq_d, jnp.stack(stack_row), 0), axis=0)
        pmask = jnp.sum(jnp.where(eq_d, jnp.stack(stack_mask), 0), axis=0)
        can_pop = need_pop & (sp > 0)
        done = done | (need_pop & (sp == 0))
        row = jnp.where(can_pop, prow, jnp.where(descend, link, row))
        vmask = jnp.where(can_pop, pmask,
                          jnp.where(descend, FULL32, vmask))
        sp = sp - can_pop.astype(jnp.int32)
        return (row, vmask, sp, t_best, prim, done, stack_row, stack_mask,
                rayc)

    return body


def traverse32(table, roots, D, ray):
    B = ray.t_max.shape[0]
    A = min(A_, B // 4)
    body = make_body32(table, D)
    box_, boy_, boz_ = ray.o[..., 0], ray.o[..., 1], ray.o[..., 2]
    bdx, bdy, bdz = ray.d[..., 0], ray.d[..., 1], ray.d[..., 2]
    bt = ray.t_max
    zero_A = jnp.zeros((A,), jnp.int32)
    alive0 = bt > 0.0
    n_q = jnp.sum(alive0.astype(jnp.int32))
    slotq = jnp.where(alive0, jnp.cumsum(alive0.astype(jnp.int32)) - 1, B)
    queue = jnp.zeros((B,), jnp.int32).at[slotq].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")

    def load(q):
        valid = q < n_q
        j = queue[jnp.clip(q, 0, B - 1)]
        ox, oy, oz = box_[j], boy_[j], boz_[j]
        dx, dy, dz = bdx[j], bdy[j], bdz[j]
        rayc = (ox, oy, oz, dx, dy, dz, _inv(dx), _inv(dy), _inv(dz))
        octant = ((dx < 0).astype(jnp.int32)
                  | ((dy < 0).astype(jnp.int32) << 1)
                  | ((dz < 0).astype(jnp.int32) << 2))
        t_max = bt[j]
        st = (roots[octant], jnp.full((A,), FULL32, jnp.int32), zero_A,
              t_max, jnp.full((A,), -1, jnp.int32),
              ~valid | (t_max <= 0.0),
              tuple(zero_A for _ in range(D)),
              tuple(zero_A for _ in range(D)), rayc)
        return st, jnp.where(valid, j, -1)

    def retire(s, rid, out_t, out_prim):
        sel = s[5] & (rid >= 0)
        tgt = jnp.where(sel, rid, B)
        out_t = out_t.at[tgt].set(
            jnp.where(s[4] >= 0, s[3], INFINITY), mode="drop")
        out_prim = out_prim.at[tgt].set(s[4], mode="drop")
        return out_t, out_prim

    def outer(carry):
        s, rid, qhead, out_t, out_prim = carry

        def c2(sk):
            s_, k = sk
            nd = jnp.sum(s_[5].astype(jnp.int32))
            return (k < MAXS) & ((k < S_) | (nd * F_ < A))

        s, _ = jax.lax.while_loop(c2, lambda sk: (body(sk[0]), sk[1] + 1),
                                  (s, jnp.int32(0)))
        out_t, out_prim = retire(s, rid, out_t, out_prim)
        done = s[5]
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        qnew = qhead + rank
        take = done & (qnew < n_q)
        new_s, new_rid = load(qnew)
        s = jax.tree.map(lambda n, o: jnp.where(take, n, o), new_s, s)
        rid = jnp.where(take, new_rid, jnp.where(done, -1, rid))
        qhead = qhead + jnp.sum(take.astype(jnp.int32))
        return (s, rid, qhead, out_t, out_prim)

    st0, rid0 = load(jnp.arange(A, dtype=jnp.int32))
    init = (st0, rid0, jnp.int32(A), jnp.full((B,), INFINITY),
            jnp.full((B,), -1, jnp.int32))
    s, rid, _, out_t, out_prim = jax.lax.while_loop(
        lambda c: (c[2] < n_q) | jnp.any(~c[0][5]), outer, init)
    out_t, out_prim = retire(s, rid, out_t, out_prim)
    hit = out_prim >= 0
    return hit, jnp.where(hit, out_t, INFINITY), jnp.maximum(out_prim, 0)


def main():
    lb = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    B = 1 << lb
    geom = dragon_geom()
    rays = camera_like_rays(B)

    t0 = time.perf_counter()
    from rustracer_tpu.utils.meshgen import bumpy_sphere
    verts, normals, faces = bumpy_sphere(subdivisions=7)
    tris = dict(tv_p=verts, t_idx=faces.astype(np.int32))
    table32, roots32, depth32, ni, nl = pack32(tris)
    print(f"32-wide build {time.perf_counter()-t0:.1f}s: {ni} interiors x8 "
          f"+ {nl} leaves = {table32.shape[0]} rows x{REC} "
          f"({table32.shape[0]*REC*4/2**20:.0f} MB), depth {depth32}",
          flush=True)
    print(f"16-wide table: {geom.bvh16_table.shape[0]} rows x128 "
          f"({geom.bvh16_table.shape[0]*512/2**20:.0f} MB), depth "
          f"{int(geom.bvh16_depth_pad.shape[0])}", flush=True)

    def timed(f, reps=4):
        r = jax.jit(lambda ry: jnp.sum(jnp.where(f(ry)[0], f(ry)[1], 0.0)))
        # (double call CSE'd? no: wrap properly)
        def once(ry):
            h, t, pid = f(ry)
            return jnp.sum(jnp.where(h, t, 0.0)) + jnp.sum(pid)
        r = jax.jit(once)
        out0 = np.asarray(r(rays))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(r(rays))
            ts.append(time.perf_counter() - t0)
        return min(ts), out0

    from rustracer_tpu.accel.traverse16 import bvh16_intersect_triangles
    dt16, chk16 = timed(lambda ry: bvh16_intersect_triangles(geom, ry))
    print(f"16-wide: {dt16*1e3:7.1f} ms  {B/dt16/1e6:5.2f} Mray/s "
          f"(checksum {chk16:.1f})", flush=True)
    dt32, chk32 = timed(lambda ry: traverse32(table32, roots32, depth32, ry))
    print(f"32-wide: {dt32*1e3:7.1f} ms  {B/dt32/1e6:5.2f} Mray/s "
          f"(checksum {chk32:.1f})", flush=True)
    # correctness: same hits/t
    h16, t16, p16 = jax.jit(
        lambda ry: bvh16_intersect_triangles(geom, ry))(rays)
    h32, t32, p32 = jax.jit(
        lambda ry: traverse32(table32, roots32, depth32, ry))(rays)
    h16, h32 = np.asarray(h16), np.asarray(h32)
    same_h = (h16 == h32).mean()
    same_t = np.allclose(np.asarray(t16)[h16 & h32],
                         np.asarray(t32)[h16 & h32], rtol=1e-5)
    print(f"parity: hit agreement {same_h:.6f}, t allclose {same_t}",
          flush=True)


if __name__ == "__main__":
    main()
