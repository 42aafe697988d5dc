"""Device-side BVH traversal: masked lockstep wavefront kernel.

Reference: rustracer-core/src/bvh/mod.rs:366-501 — iterative traversal with
a fixed 64-deep stack, precomputed inv_dir/dir_is_neg slab tests, near-child
ordering by split axis, and the separate early-out shadow variant.

Here every ray lane carries its own (node, stack, stack-ptr) state inside a
single `lax.while_loop`; each iteration processes one BVH node per lane
(AABB slab test; interior → push far child / descend near; leaf → test up to
4 baked triangles with the watertight kernel). Lanes that finish idle until
the whole wavefront converges — the classic GPU-style lockstep traversal.

TPU-specific design (all measured on v5e):
- Per-lane math is component-form (B,) scalars — (B, 3) intermediates put
  the size-3 axis on the 128-lane dim at ~2% utilization.
- Incoherent gathers are latency-bound per gather *op*, not per byte: the
  node is one packed 32-byte record and the leaf one 160-byte record
  (accel/bvh.py), so each loop step issues exactly two gathers instead of
  ~50 scalar ones (~20x on an 80k-tri mesh).
- The per-lane stack is (STACK_DEPTH, B) updated through one-hot masks:
  dense VPU selects instead of per-lane scatters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import INFINITY
from ..ops.triangle import triangle_intersect_c

STACK_DEPTH = 64


class _TravState(NamedTuple):
    node: jnp.ndarray      # (B,) int32 current node
    sp: jnp.ndarray        # (B,) int32 stack pointer
    stack: jnp.ndarray     # (STACK_DEPTH, B) int32
    t_best: jnp.ndarray    # (B,)
    prim: jnp.ndarray      # (B,) int32 best triangle id (-1 none)
    done: jnp.ndarray      # (B,) bool


def _traverse(tables, ray, any_hit: bool):
    geom = tables
    bs = ray.t_max.shape
    ox, oy, oz = ray.o[..., 0], ray.o[..., 1], ray.o[..., 2]

    def inv(c):
        safe = jnp.where(jnp.abs(c) < 1e-20,
                         jnp.where(c < 0, -1e-20, 1e-20), c)
        return 1.0 / safe

    dx, dy, dz = ray.d[..., 0], ray.d[..., 1], ray.d[..., 2]
    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    oc = (ox, oy, oz)
    dc = (dx, dy, dz)

    nodes = geom.bvh_nodes_packed        # (N, 8)
    leaves = geom.bvh_leaf_packed        # (L, 40)
    n_leaves = leaves.shape[0]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (STACK_DEPTH,) + bs, 0)

    init = _TravState(
        node=jnp.zeros(bs, jnp.int32),
        sp=jnp.zeros(bs, jnp.int32),
        stack=jnp.zeros((STACK_DEPTH,) + bs, jnp.int32),
        t_best=ray.t_max,
        prim=jnp.full(bs, -1, jnp.int32),
        done=jnp.zeros(bs, bool),
    )

    def cond(s):
        return jnp.any(~s.done)

    def body(s):
        rec = nodes[s.node]                                   # (B, 8) gather
        lo_x, lo_y, lo_z = rec[..., 0], rec[..., 1], rec[..., 2]
        hi_x, hi_y, hi_z = rec[..., 3], rec[..., 4], rec[..., 5]
        child = jax.lax.bitcast_convert_type(rec[..., 6], jnp.int32)
        mp = jax.lax.bitcast_convert_type(rec[..., 7], jnp.int32)
        n_prims = mp >> 2
        axis = mp & 3
        is_leaf = n_prims > 0
        active = ~s.done

        # robust slab test (bvh/mod.rs intersect_p_fast), component form
        t0x = (lo_x - ox) * ix
        t1x = (hi_x - ox) * ix
        t0y = (lo_y - oy) * iy
        t1y = (hi_y - oy) * iy
        t0z = (lo_z - oz) * iz
        t1z = (hi_z - oz) * iz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z)) * 1.00000024
        box_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < s.t_best) & \
            active

        # --- leaf: one packed gather, then 4 baked triangle tests ---
        t_best = s.t_best
        prim = s.prim
        leaf_active = box_hit & is_leaf
        leaf_row = leaves[jnp.clip(jnp.where(is_leaf, child, 0), 0,
                                   n_leaves - 1)]              # (B, 40)
        for k in range(4):
            b = k * 10
            tid = jax.lax.bitcast_convert_type(leaf_row[..., b + 9],
                                               jnp.int32)
            p0c = (leaf_row[..., b + 0], leaf_row[..., b + 1],
                   leaf_row[..., b + 2])
            p1c = (leaf_row[..., b + 3], leaf_row[..., b + 4],
                   leaf_row[..., b + 5])
            p2c = (leaf_row[..., b + 6], leaf_row[..., b + 7],
                   leaf_row[..., b + 8])
            th = triangle_intersect_c(oc, dc, t_best, p0c, p1c, p2c)
            better = leaf_active & (tid >= 0) & th.hit
            t_best = jnp.where(better, th.t, t_best)
            prim = jnp.where(better, tid, prim)

        # --- interior: descend near child, push far ---
        interior_hit = box_hit & ~is_leaf
        d_axis = jnp.where(axis == 0, dx, jnp.where(axis == 1, dy, dz))
        dir_neg = d_axis < 0.0
        child1 = s.node + 1
        child2 = child
        near = jnp.where(dir_neg, child2, child1)
        far = jnp.where(dir_neg, child1, child2)

        # push far via one-hot select over the (STACK_DEPTH, B) stack
        push = interior_hit & (s.sp < STACK_DEPTH)
        at_sp = lane_iota == s.sp[None]
        stack = jnp.where(at_sp & push[None], far[None], s.stack)
        sp = jnp.where(push, s.sp + 1, s.sp)

        # next node: interior-hit lanes descend; others pop (one-hot gather)
        need_pop = active & ~interior_hit
        can_pop = sp > 0
        sp_after = jnp.where(need_pop & can_pop, sp - 1, sp)
        popped = jnp.sum(jnp.where(lane_iota == sp_after[None], stack, 0),
                         axis=0)
        node = jnp.where(interior_hit, near,
                         jnp.where(need_pop & can_pop, popped, s.node))
        done = s.done | (need_pop & ~can_pop)
        if any_hit:
            done = done | (prim >= 0)
        return _TravState(node=node, sp=sp_after, stack=stack,
                          t_best=t_best, prim=prim, done=done)

    final = jax.lax.while_loop(cond, body, init)
    hit = final.prim >= 0
    return hit, jnp.where(hit, final.t_best, INFINITY), final.prim


def bvh_intersect_triangles(tables, ray):
    """Closest hit over the triangle BVH: (hit, t, tri_id)."""
    return _traverse(tables, ray, any_hit=False)


def bvh_intersect_p_triangles(tables, ray):
    hit, _, _ = _traverse(tables, ray, any_hit=True)
    return hit
