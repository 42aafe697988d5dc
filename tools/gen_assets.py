"""Generate deterministic binary test assets.

scenes/textures/sky.exr — a small procedural HDR sky (gradient + sun disc)
written with the repo's own EXR encoder (render/imageio.py), read back by
the infinite-area-light path in scenes/envmap-dof.pbrt.

scenes/textures/grid.png — a UV-test grid (colored quadrants + fine lines)
written with the repo's own PNG encoder, read back by the imagemap texture
in scenes/testball-textured.pbrt; the fine lines under a grazing camera
exercise the anisotropic EWA filter (ops/mipmap.py lookup_ewa).

Regenerate with `python tools/gen_assets.py`; outputs are bit-stable (no RNG).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sky_image(w=64, h=32):
    """Latitude-longitude HDR sky: blue-to-horizon gradient + warm sun."""
    v = (np.arange(h) + 0.5) / h          # 0 = zenith
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    theta = vv * np.pi
    phi = uu * 2 * np.pi
    up = np.cos(theta)                    # 1 at zenith, -1 at nadir
    # sky gradient: deep blue up, pale at horizon, dark grey below
    t = np.clip(up, 0, 1)
    sky = (np.stack([0.35 + 0.35 * (1 - t), 0.45 + 0.3 * (1 - t),
                     0.9 - 0.15 * (1 - t)], -1) * (up > 0)[..., None])
    ground = np.stack([0.12 + 0 * up, 0.1 + 0 * up, 0.08 + 0 * up], -1) \
        * (up <= 0)[..., None]
    # sun: small bright disc at 45 deg elevation
    sun_dir = np.array([np.sin(np.pi / 4) * np.cos(1.0),
                        np.cos(np.pi / 4),
                        np.sin(np.pi / 4) * np.sin(1.0)])
    d = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta),
                  np.sin(theta) * np.sin(phi)], -1)
    cosang = d @ sun_dir
    sun = np.clip((cosang - 0.997) / 0.003, 0, 1)[..., None] \
        * np.array([60.0, 50.0, 35.0])
    return (sky + ground + sun).astype(np.float32)


def grid_image(n=128):
    """sRGB UV-test grid: 4 colored quadrant tints + dark grid lines every 16
    texels (thin features that alias hard without anisotropic filtering)."""
    y, x = np.mgrid[0:n, 0:n]
    u, v = x / n, y / n
    quad = (u >= 0.5).astype(np.float32) + 2 * (v >= 0.5).astype(np.float32)
    tints = np.array([[0.85, 0.45, 0.35], [0.4, 0.7, 0.35],
                      [0.35, 0.5, 0.85], [0.8, 0.75, 0.4]], np.float32)
    img = tints[quad.astype(np.int32)]
    line = ((x % 16 < 2) | (y % 16 < 2))[..., None]
    return np.where(line, np.float32(0.08), img).astype(np.float32)


def main():
    from rustracer_tpu.render.imageio import write_image
    outdir = os.path.join(REPO, "scenes", "textures")
    os.makedirs(outdir, exist_ok=True)
    img = sky_image()
    path = os.path.join(outdir, "sky.exr")
    write_image(path, img)
    print(f"{path}: {img.shape} mean={img.mean():.3f} max={img.max():.1f}")
    img = grid_image()
    path = os.path.join(outdir, "grid.png")
    write_image(path, img)
    print(f"{path}: {img.shape} mean={img.mean():.3f}")


if __name__ == "__main__":
    main()
