"""Traversal scaling: 327k-tri vs 1.31M-tri hero mesh (round-5 item 5).

Reports closest-hit Mray/s, observed rows/ray and tri-tests/ray, and the
padded stack depth D for subdiv-7 (327k) and subdiv-8 (1.31M) meshes.
Usage: python tools/exp_scale1m.py
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


def main():
    B = 1 << 18
    rays = camera_like_rays(B)
    for sub in (7, 8):
        t0 = time.perf_counter()
        geom = dragon_geom(sub)
        t_build = time.perf_counter() - t0
        D = geom.bvh16_depth_pad.shape[0]
        R = geom.bvh16_table.shape[0]
        n_tri = geom.t_idx.shape[0]
        print(f"sub={sub}: {n_tri} tris, {R} rows, stack depth D={D}, "
              f"build {t_build:.1f}s", flush=True)

        def once(o, d, t):
            from rustracer_tpu.core.ray import Ray
            h, tt, pid, _, cnt = t16.bvh16_intersect_counts(
                geom, Ray(o=o, d=d, t_max=t))
            return (jnp.sum(jnp.where(h, tt, 0.0)) + jnp.sum(pid),
                    jnp.sum(h.astype(jnp.int32)), cnt)
        f = jax.jit(once)
        out = f(rays.o, rays.d, rays.t_max)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(rays.o, rays.d, rays.t_max)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        n_hit = int(out[1])
        rows, tritests = (int(x) for x in np.asarray(out[2]))
        print(f"  closest hit: {B/dt/1e6:6.2f} Mray/s   "
              f"hit frac {n_hit/B:.3f}   rows/ray {rows/B:.2f}   "
              f"tri-tests/ray {tritests/B:.2f}", flush=True)


if __name__ == "__main__":
    main()
