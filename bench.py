"""Headline benchmark: path-traced Cornell box, rays/s on one chip.

Config 2 from BASELINE.md: Cornell box + diffuse area light, path integrator
with NEE+MIS, 256x256 @ 16spp, max_depth 5. The metric is *camera rays per
second* (W*H*spp / wall_s, steady-state, post-compile) — the same quantity the
reference prints per run ("Camera rays traced", rustracer-core/src/renderer.rs:17).

The reference publishes no numbers (BASELINE.md); the baseline divisor is the
self-defined 1.0 Mray/s figure recorded in BASELINE.md for a single-CPU
PBRT-class tracer, so vs_baseline = value / 1e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

RES = (256, 256)
SPP = 16
MAX_DEPTH = 5
BASELINE_RAYS_PER_S = 1.0e6


def build():
    import jax.numpy as jnp
    from helpers import cornell_box, cornell_camera
    from rustracer_tpu.render.film import Film
    from rustracer_tpu.render.filters import Filter
    from rustracer_tpu.render.renderer import RenderContext
    from rustracer_tpu.render.sampler import SamplerConfig
    from rustracer_tpu.scene.materials import MaterialSet, MatteMaterial
    from rustracer_tpu.scene.textures import ConstantTexture
    from rustracer_tpu.integrators.path import PathIntegrator

    geom, lights = cornell_box()
    ms = MaterialSet()
    const = {}
    for i, a in enumerate([[0.73] * 3, [0.63, 0.065, 0.05],
                           [0.14, 0.45, 0.09], [0.0] * 3]):
        const[f"kd{i}"] = jnp.asarray(a, jnp.float32)
        ms.add(MatteMaterial(kd=ConstantTexture(f"kd{i}")))
    ctx = RenderContext(geom=geom, lights=lights,
                        textures={"const": const, "images": []})
    cam = cornell_camera(RES)
    film = Film(full_resolution=RES, filter=Filter("box", 0.5, 0.5))
    sampler = SamplerConfig(kind="02sequence", spp=SPP)
    integ = PathIntegrator(mat_set=ms, max_depth=MAX_DEPTH)
    return ctx, cam, film, sampler, integ


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np
    from rustracer_tpu.render.renderer import Renderer, RenderConfig

    ctx, cam, film, sampler, integ = build()
    cfg = RenderConfig(max_lanes=RES[0] * RES[1])
    r = Renderer(integ.li, cam, film, sampler, cfg)

    # warmup / compile
    img = r.render(ctx)
    np.asarray(img)
    assert np.isfinite(np.asarray(img)).all(), "non-finite radiance in bench"

    n_runs = 5
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        img = r.render(ctx)
        np.asarray(img)  # block
        times.append(time.perf_counter() - t0)
    best = min(times)
    camera_rays = RES[0] * RES[1] * SPP
    value = camera_rays / best
    print(json.dumps({
        "metric": "camera_rays_per_s_cornell_256_16spp_path",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
