"""Decompose the regen traversal step cost on hardware (round-5 lever #1).

Times K fixed body steps (fori_loop, A-lane window) with sections ablated
via _make_body(ablate=...), differencing two K values to cancel dispatch +
init cost. Also times the loop machinery itself (empty body; while vs fori
cond styles) to see whether per-iteration sync, VPU work, or the gather
dominates a step.

Usage: python tools/exp_stepcost.py [log2_A]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rustracer_tpu.accel import traverse16 as t16
from bench_traverse import camera_like_rays
from sweep_regen import dragon_geom

K_LO, K_HI = 64, 320


def make_state(geom, A, D):
    ray = camera_like_rays(1 << 18)
    sel = slice(0, A)
    ox, oy, oz = (ray.o[sel, i] for i in range(3))
    dx, dy, dz = (ray.d[sel, i] for i in range(3))
    rayc = (ox, oy, oz, dx, dy, dz,
            t16._inv_dir(dx), t16._inv_dir(dy), t16._inv_dir(dz))
    octant = ((dx < 0).astype(jnp.int32)
              | ((dy < 0).astype(jnp.int32) << 1)
              | ((dz < 0).astype(jnp.int32) << 2))
    zero = jnp.zeros((A,), jnp.int32)
    return (geom.bvh16_roots[octant],
            jnp.full((A,), t16.FULL_MASK, jnp.int32),
            zero,
            ray.t_max[sel],
            jnp.full((A,), -1, jnp.int32),
            jnp.zeros((A,), bool),
            tuple(zero for _ in range(D)),
            tuple(zero for _ in range(D)),
            rayc,
            (zero, zero))


def time_variant(geom, A, D, name, body_fn, loop="fori"):
    st0 = make_state(geom, A, D)

    def run_k(k):
        def f(st):
            if loop == "fori":
                st = jax.lax.fori_loop(0, k, lambda i, s: body_fn(s), st)
            elif loop == "while_count":
                st, _ = jax.lax.while_loop(
                    lambda sk: sk[1] < k,
                    lambda sk: (body_fn(sk[0]), sk[1] + 1),
                    (st, jnp.int32(0)))
            elif loop == "while_adaptive":
                # mimics the production step_cond: counts done lanes each
                # iteration but never triggers early (forced k steps)
                st, _ = jax.lax.while_loop(
                    lambda sk: (sk[1] < k) &
                               (jnp.sum(sk[0][5].astype(jnp.int32)) >= -1),
                    lambda sk: (body_fn(sk[0]), sk[1] + 1),
                    (st, jnp.int32(0)))
            return (jnp.sum(st[3]) + jnp.sum(st[4]) + jnp.sum(st[0])
                    + jnp.sum(st[-1][0]) + jnp.sum(st[-1][1]))
        return jax.jit(f)

    f_lo, f_hi = run_k(K_LO), run_k(K_HI)
    float(f_lo(st0)); float(f_hi(st0))          # compile + warm
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(f_lo(st0)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_hi(st0)); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (K_HI - K_LO))
    print(f"{name:28s}: {best*1e6:8.1f} us/step  "
          f"({A/best/1e6:7.1f} M lane-steps/s)", flush=True)
    return best


def main():
    lA = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    A = 1 << lA
    geom = dragon_geom()
    D = geom.bvh16_depth_pad.shape[0]
    print(f"A=2^{lA}, D={D}, table rows={geom.bvh16_table.shape[0]}",
          flush=True)

    def body_for(ablate):
        return t16._make_body(geom, False, D, False, frozenset(ablate))

    full = body_for([])
    results = {}
    results["full/fori"] = time_variant(geom, A, D, "full body (fori)", full)
    results["full/while"] = time_variant(
        geom, A, D, "full body (while count)", full, loop="while_count")
    results["full/adaptive"] = time_variant(
        geom, A, D, "full body (while adaptive)", full, loop="while_adaptive")
    for ab in [["leaf"], ["interior"], ["gather"], ["stack"],
               ["leaf", "interior"], ["leaf", "interior", "stack"]]:
        nm = "-" + "-".join(ab)
        results[nm] = time_variant(geom, A, D, f"ablate {nm}", body_for(ab))
    empty = lambda s: tuple(
        [s[0] + 1] + list(s[1:-1]) + [(s[-1][0] + 1, s[-1][1])])
    results["empty"] = time_variant(geom, A, D, "empty body", empty)

    base = results["full/fori"]
    print("\nshare of full step (fori):")
    for k, v in results.items():
        if k.startswith("-"):
            print(f"  {k:24s} saves {100*(base-v)/base:5.1f}%")
    print(f"  empty-loop overhead      {100*results['empty']/base:5.1f}%")


if __name__ == "__main__":
    main()
