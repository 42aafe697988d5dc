"""Device-side BVH traversal: masked lockstep wavefront kernel.

Reference: rustracer-core/src/bvh/mod.rs:366-501 — iterative traversal with
a fixed 64-deep stack, precomputed inv_dir/dir_is_neg slab tests, near-child
ordering by split axis, and the separate early-out shadow variant.

Here every ray lane carries its own (node, stack, stack-ptr) state inside a
single `lax.while_loop`; each iteration processes one BVH node per lane
(AABB slab test; interior → push far child / descend near; leaf → test up to
max-leaf triangles with the watertight kernel). Lanes that finish idle until
the whole wavefront converges — the classic GPU-style lockstep traversal,
which XLA maps onto the VPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import INFINITY
from ..ops.triangle import triangle_intersect

STACK_DEPTH = 64


class _TravState(NamedTuple):
    node: jnp.ndarray      # (B,) int32 current node
    sp: jnp.ndarray        # (B,) int32 stack pointer
    stack: jnp.ndarray     # (B, STACK_DEPTH) int32
    t_best: jnp.ndarray    # (B,)
    prim: jnp.ndarray      # (B,) int32 best triangle id (-1 none)
    done: jnp.ndarray      # (B,) bool


def _slab_test(lo, hi, o, inv_d, t_best):
    """Robust AABB slab test (bvh/mod.rs intersect_p_fast / bounds.rs:127)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.max(tn, axis=-1)
    t_far = jnp.min(tf, axis=-1) * 1.00000024  # conservative (gamma(3)-ish)
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)


def _traverse(tables, ray, any_hit: bool):
    geom = tables
    o, d, t_max = ray.o, ray.d, ray.t_max
    bs = t_max.shape
    safe_d = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / safe_d

    meta = geom.bvh_meta
    max_leaf = 4  # static cap; build keeps leaves <= max_prims (degenerate
    # splits can exceed it — build_bvh_arrays re-leafs those, see bvh.py)

    init = _TravState(
        node=jnp.zeros(bs, jnp.int32),
        sp=jnp.zeros(bs, jnp.int32),
        stack=jnp.zeros(bs + (STACK_DEPTH,), jnp.int32),
        t_best=t_max,
        prim=jnp.full(bs, -1, jnp.int32),
        done=jnp.zeros(bs, bool),
    )

    def cond(s):
        return jnp.any(~s.done)

    def body(s):
        node_lo = geom.bvh_lo[s.node]
        node_hi = geom.bvh_hi[s.node]
        m = meta[s.node]                       # (B, 3)
        n_prims = m[..., 1]
        is_leaf = n_prims > 0
        active = ~s.done

        box_hit = _slab_test(node_lo, node_hi, o, inv_d, s.t_best) & active

        # --- leaf: test triangles ---
        t_best = s.t_best
        prim = s.prim
        leaf_active = box_hit & is_leaf
        for k in range(max_leaf):
            in_range = leaf_active & (k < n_prims)
            tid = geom.bvh_prims[jnp.clip(m[..., 0] + k, 0,
                                          geom.bvh_prims.shape[0] - 1)]
            idx = geom.t_idx[tid]
            p0 = geom.tv_p[idx[..., 0]]
            p1 = geom.tv_p[idx[..., 1]]
            p2 = geom.tv_p[idx[..., 2]]
            th = triangle_intersect(o, d, t_best, p0, p1, p2)
            better = in_range & th.hit
            t_best = jnp.where(better, th.t, t_best)
            prim = jnp.where(better, tid, prim)

        # --- interior: descend near child, push far ---
        interior_hit = box_hit & ~is_leaf
        axis = m[..., 2]
        dir_neg = jnp.take_along_axis(d, axis[..., None], axis=-1)[..., 0] < 0.0
        child1 = s.node + 1
        child2 = m[..., 0]
        near = jnp.where(dir_neg, child2, child1)
        far = jnp.where(dir_neg, child1, child2)
        # push far
        sp_ok = s.sp < STACK_DEPTH
        push = interior_hit & sp_ok
        stack = s.stack.at[jnp.arange(s.stack.shape[0]),
                           jnp.clip(s.sp, 0, STACK_DEPTH - 1)].set(
            jnp.where(push, far, s.stack[jnp.arange(s.stack.shape[0]),
                                         jnp.clip(s.sp, 0, STACK_DEPTH - 1)]))
        sp = jnp.where(push, s.sp + 1, s.sp)

        # next node: interior-hit lanes descend; others pop
        need_pop = active & ~interior_hit
        can_pop = sp > 0
        sp_after = jnp.where(need_pop & can_pop, sp - 1, sp)
        popped = stack[jnp.arange(stack.shape[0]),
                       jnp.clip(sp_after, 0, STACK_DEPTH - 1)]
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
