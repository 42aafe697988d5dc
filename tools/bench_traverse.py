"""Microbenchmark: BVH closest-hit traversal throughput on a dragon-class mesh.

Usage: python tools/bench_traverse.py [n_subdiv] [batch]
Reports rays/s for closest-hit and any-hit over a bumpy-sphere mesh, plus the
while_loop trip count (measured by instrumented run) to quantify lockstep stall.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.utils.meshgen import bumpy_sphere
from rustracer_tpu.accel.bvh import build_bvh_arrays
from rustracer_tpu.scene.tables import make_geometry
from rustracer_tpu.core.ray import Ray


def main():
    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    verts, normals, faces = bumpy_sphere(subdivisions=sub)
    print(f"mesh: {len(faces)} tris, {len(verts)} verts", file=sys.stderr)

    tris = dict(
        tv_p=verts, tv_n=normals,
        tv_uv=np.zeros((len(verts), 2), np.float32),
        tv_s=np.zeros((len(verts), 3), np.float32),
        t_idx=faces.astype(np.int32),
        t_material=np.zeros(len(faces), np.int32),
        t_arealight=np.full(len(faces), -1, np.int32),
        t_reverse=np.zeros(len(faces), bool),
        t_has_n=np.ones(len(faces), bool),
        t_has_uv=np.zeros(len(faces), bool),
        t_alpha_tex=np.full(len(faces), -1, np.int32),
    )
    t0 = time.perf_counter()
    bvh = build_bvh_arrays(None, tris)
    print(f"bvh build: {time.perf_counter()-t0:.2f}s, "
          f"{bvh['bvh_meta'].shape[0]} nodes", file=sys.stderr)
    geom = make_geometry(None, tris, bvh)

    # camera-like rays: from z=+3 looking at origin, jittered grid
    rng = np.random.default_rng(0)
    side = int(np.sqrt(batch))
    u = (np.arange(side) + 0.5) / side
    uu, vv = np.meshgrid(u, u)
    o = np.zeros((side * side, 3), np.float32)
    o[:, 2] = 3.0
    d = np.stack([(uu.ravel() - 0.5) * 1.2, (vv.ravel() - 0.5) * 1.2,
                  -np.ones(side * side)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
              t_max=jnp.full(side * side, 1e30, jnp.float32))

    from rustracer_tpu.accel.traverse import (bvh_intersect_triangles,
                                              bvh_intersect_p_triangles)

    # geom must be an ARGUMENT, not a closure constant: gathers from
    # closed-over jit constants inside loops hit a ~1000x slower XLA path
    f_closest = jax.jit(bvh_intersect_triangles)
    f_any = jax.jit(bvh_intersect_p_triangles)

    for name, f in [("closest", f_closest), ("any", f_any)]:
        out = jax.block_until_ready(f(geom, ray))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(geom, ray))
            times.append(time.perf_counter() - t0)
        best = min(times)
        n = side * side
        print(f"{name}-hit: {best*1e3:.1f} ms, {n/best/1e6:.3f} Mray/s")
    hit = np.asarray(out[0]) if isinstance(out, tuple) else np.asarray(out)
    print(f"hit fraction: {hit.mean():.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
