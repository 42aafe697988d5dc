"""Generate the bathroom scene's texture set (deterministic, no RNG seeds
beyond fixed ones). ~16 distinct images — tile, wood, marble, plaster,
stripes, rug, art — written with the repo's own EXR encoder into
scenes/textures/bath_*.exr. The point of this scene (BASELINE config 5 /
reference renders/README.md gallery class) is MANY DISTINCT imagemap
materials in one interior, exercising the shared-atlas dispatch
(scene/atlas.py).

Regenerate with `python tools/gen_bathroom_assets.py`.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "scenes", "textures")


def _grid(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return xx / w, yy / h


def tile(w=64, h=64, n=8, base=(0.85, 0.87, 0.9), line=(0.45, 0.5, 0.55)):
    u, v = _grid(w, h)
    gx = np.minimum((u * n) % 1.0, 1 - (u * n) % 1.0)
    gy = np.minimum((v * n) % 1.0, 1 - (v * n) % 1.0)
    m = (np.minimum(gx, gy) < 0.035)[..., None]
    img = np.where(m, np.asarray(line, np.float32),
                   np.asarray(base, np.float32) *
                   (0.92 + 0.08 * np.sin(u * 37 + v * 53)[..., None]))
    return img.astype(np.float32)


def wood(w=64, h=64, hue=(0.45, 0.27, 0.12), rings=9.0, seed=1):
    u, v = _grid(w, h)
    rs = np.random.RandomState(seed)
    wobble = 0.15 * np.sin(2 * np.pi * (3 * v + rs.rand())) \
        + 0.08 * np.sin(2 * np.pi * (7 * u + rs.rand()))
    g = 0.5 + 0.5 * np.sin(2 * np.pi * rings * (u + wobble))
    base = np.asarray(hue, np.float32)
    img = base[None, None] * (0.6 + 0.5 * g[..., None])
    return img.astype(np.float32)


def marble(w=64, h=64, seed=3, tint=(0.9, 0.9, 0.92)):
    u, v = _grid(w, h)
    rs = np.random.RandomState(seed)
    s = np.zeros((h, w))
    for k in range(4):
        fx, fy, ph = rs.uniform(2, 9), rs.uniform(2, 9), rs.rand() * 6.28
        s += np.sin(2 * np.pi * (fx * u + fy * v) + ph) / (k + 1)
    vein = np.abs(np.sin(2 * np.pi * (u * 2 + 0.4 * s)))
    g = 0.55 + 0.45 * vein ** 3
    return (np.asarray(tint, np.float32)[None, None]
            * g[..., None]).astype(np.float32)


def plaster(w=32, h=32, seed=5, tint=(0.82, 0.8, 0.74)):
    rs = np.random.RandomState(seed)
    n = rs.rand(h, w)
    n = 0.5 * n + 0.25 * np.roll(n, 1, 0) + 0.25 * np.roll(n, 1, 1)
    return (np.asarray(tint, np.float32)[None, None]
            * (0.85 + 0.3 * n[..., None])).astype(np.float32)


def stripes(w=64, h=64, n=10, a=(0.9, 0.4, 0.35), b=(0.95, 0.93, 0.9),
            horiz=False):
    u, v = _grid(w, h)
    t = v if horiz else u
    m = ((t * n).astype(int) % 2 == 0)[..., None]
    return np.where(m, np.asarray(a, np.float32),
                    np.asarray(b, np.float32)).astype(np.float32)


def rug(w=64, h=64, seed=9):
    u, v = _grid(w, h)
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    bands = (np.sin(2 * np.pi * 6 * r) > 0)[..., None]
    inner = np.asarray((0.55, 0.15, 0.18), np.float32)
    outer = np.asarray((0.2, 0.22, 0.45), np.float32)
    img = np.where(bands, inner, outer) * (0.8 + 0.2 * np.sin(u * 40)[..., None])
    return img.astype(np.float32)


def art(w=48, h=48, seed=11):
    rs = np.random.RandomState(seed)
    u, v = _grid(w, h)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):
        cx, cy, rr = rs.rand(), rs.rand(), rs.uniform(0.1, 0.3)
        col = rs.rand(3) * 0.9 + 0.1
        m = ((u - cx) ** 2 + (v - cy) ** 2 < rr * rr)[..., None]
        img = np.where(m, col.astype(np.float32), img)
    img += 0.08
    return np.clip(img, 0, 1).astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    from rustracer_tpu.render.imageio import write_image
    images = {
        "bath_floor_tile": tile(n=10, base=(0.75, 0.78, 0.8)),
        "bath_wall_tile": tile(n=6, base=(0.82, 0.88, 0.92),
                               line=(0.5, 0.62, 0.7)),
        "bath_wall_tile2": tile(n=12, base=(0.9, 0.85, 0.75),
                                line=(0.6, 0.5, 0.4)),
        "bath_plaster": plaster(),
        "bath_plaster2": plaster(seed=6, tint=(0.75, 0.78, 0.82)),
        "bath_wood_oak": wood(hue=(0.45, 0.27, 0.12), rings=9, seed=1),
        "bath_wood_walnut": wood(hue=(0.3, 0.17, 0.09), rings=13, seed=2),
        "bath_wood_floor": wood(hue=(0.5, 0.33, 0.17), rings=20, seed=7),
        "bath_marble": marble(),
        "bath_marble_dark": marble(seed=4, tint=(0.35, 0.37, 0.4)),
        "bath_towel_red": stripes(n=8),
        "bath_towel_blue": stripes(n=12, a=(0.25, 0.4, 0.7),
                                   b=(0.85, 0.9, 0.95), horiz=True),
        "bath_curtain": stripes(n=16, a=(0.75, 0.85, 0.8),
                                b=(0.92, 0.95, 0.93)),
        "bath_rug": rug(),
        "bath_art1": art(seed=11),
        "bath_art2": art(seed=12),
        "bath_art3": art(seed=13),
        "bath_wallpaper": stripes(n=24, a=(0.8, 0.78, 0.66),
                                  b=(0.86, 0.84, 0.74)),
    }
    for name, img in images.items():
        path = os.path.join(OUT, f"{name}.exr")
        write_image(path, img)
        print(f"wrote {path} {img.shape}")


if __name__ == "__main__":
    main()
