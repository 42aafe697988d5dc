"""Flagship gallery renders on the TPU, reusing bench.py's cached
configurations (dragon 1024^2 @ 64 spp, bathroom 1080p @ 16 spp): the
compiled render steps are already in /tmp/jax_cache, so this is minutes
of pure rendering. Writes renders/rt-dragon-1024.png and
renders/rt-bathroom-1080p.png.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def save(img, name):
    from rustracer_tpu.core.spectrum import srgb_encode
    png = np.asarray(srgb_encode(jnp.asarray(np.asarray(img))))
    out = os.path.join(REPO, "renders", name)
    Image.fromarray((np.clip(png, 0, 1) * 255).astype(np.uint8)).save(out)
    print(f"wrote {out}", flush=True)


def main():
    os.makedirs(os.path.join(REPO, "renders"), exist_ok=True)
    from bench import build_bathroom, build_dragon
    from rustracer_tpu.render.renderer import RenderConfig, Renderer

    t0 = time.time()
    ctx, cam, film, sampler, integ, _ = build_dragon()
    r = Renderer(integ.li, cam, film, sampler,
                 RenderConfig(max_lanes=1 << 18, collect_stats=False))
    fs = r.render_state(ctx)                      # full 64 spp
    save(film.to_image(fs), "rt-dragon-1024.png")
    print(f"dragon {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    bctx, bcam, bfilm, bsamp, binteg = build_bathroom()
    r2 = Renderer(binteg.li, bcam, bfilm, bsamp,
                  RenderConfig(max_lanes=1 << 18, collect_stats=False))
    fs2 = r2.render_state(bctx)                   # full 16 spp
    save(bfilm.to_image(fs2), "rt-bathroom-1080p.png")
    print(f"bathroom {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
