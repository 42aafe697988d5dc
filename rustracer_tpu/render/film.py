"""Film: differentiable sample accumulation into the image tensor.

Reference: rustracer-core/src/film.rs. The reference accumulates per-thread
FilmTiles merged under a mutex; here the film is a functional state
(rgb, weight, splat tensors) and `add_samples` is one batched scatter-add —
differentiable and shardable (per-shard partial films psum-reduced).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.spectrum import luminance
from .filters import Filter


class FilmState(NamedTuple):
    rgb: jnp.ndarray    # (H, W, 3) filter-weighted radiance sum
    wsum: jnp.ndarray   # (H, W) filter weight sum
    splat: jnp.ndarray  # (H, W, 3) unweighted splats (reference Pixel.splat_xyz)


@dataclasses.dataclass(frozen=True)
class Film:
    full_resolution: Tuple[int, int] = (1280, 720)   # (x, y) (reference film.rs:124)
    crop_window: Tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0)
    filter: Filter = dataclasses.field(default_factory=Filter)
    filename: str = "out.png"
    scale: float = 1.0
    max_sample_luminance: float = float("inf")
    diagonal: float = 0.035

    @property
    def cropped_pixel_bounds(self):
        """(x0, y0, x1, y1) integer pixel bounds (reference film.rs:70-83)."""
        xr, yr = self.full_resolution
        cx0, cy0, cx1, cy1 = self.crop_window
        x0 = int(np.ceil(xr * cx0))
        x1 = max(x0 + 1, int(np.ceil(xr * cx1)))
        y0 = int(np.ceil(yr * cy0))
        y1 = max(y0 + 1, int(np.ceil(yr * cy1)))
        return (x0, y0, x1, y1)

    @property
    def cropped_resolution(self):
        x0, y0, x1, y1 = self.cropped_pixel_bounds
        return (x1 - x0, y1 - y0)

    def get_sample_bounds(self):
        """Pixel sample bounds expanded by filter radius (film.rs:249-257)."""
        x0, y0, x1, y1 = self.cropped_pixel_bounds
        rx, ry = self.filter.radius
        return (int(np.floor(x0 + 0.5 - rx)), int(np.floor(y0 + 0.5 - ry)),
                int(np.ceil(x1 - 0.5 + rx)), int(np.ceil(y1 - 0.5 + ry)))

    def init_state(self) -> FilmState:
        w, h = self.cropped_resolution
        return FilmState(
            rgb=jnp.zeros((h, w, 3), jnp.float32),
            wsum=jnp.zeros((h, w), jnp.float32),
            splat=jnp.zeros((h, w, 3), jnp.float32),
        )

    def add_samples(self, state: FilmState, p_film, radiance, sample_weight=1.0,
                    valid=None) -> FilmState:
        """Splat a batch of samples through the reconstruction filter.

        p_film: (B, 2) raster-space sample positions (x, y)
        radiance: (B, 3) linear RGB
        valid: optional (B,) mask (NaN scrubbing is the caller's job,
        reference renderer.rs:115-126).
        """
        x0, y0, _, _ = self.cropped_pixel_bounds
        h, w = state.wsum.shape
        rx, ry = self.filter.radius
        nx = int(np.ceil(2.0 * rx))
        ny = int(np.ceil(2.0 * ry))
        nx, ny = max(nx, 1), max(ny, 1)

        # clamp overly bright samples (film.rs:303-307)
        lum = luminance(radiance)
        if np.isfinite(self.max_sample_luminance):
            scale = jnp.where(lum > self.max_sample_luminance,
                              self.max_sample_luminance / jnp.maximum(lum, 1e-20), 1.0)
            radiance = radiance * scale[..., None]

        pd = p_film - 0.5
        p_lo_x = jnp.ceil(pd[..., 0] - rx).astype(jnp.int32)
        p_lo_y = jnp.ceil(pd[..., 1] - ry).astype(jnp.int32)

        rgb, wsum = state.rgb, state.wsum
        if valid is None:
            valid = jnp.ones(p_film.shape[:-1], bool)
        for j in range(ny):
            for i in range(nx):
                px = p_lo_x + i
                py = p_lo_y + j
                fw = self.filter.evaluate(px.astype(jnp.float32) + 0.5 - p_film[..., 0],
                                          py.astype(jnp.float32) + 0.5 - p_film[..., 1])
                ix = px - x0
                iy = py - y0
                ok = valid & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (fw > 0.0)
                fw = jnp.where(ok, fw * sample_weight, 0.0)
                ixc = jnp.clip(ix, 0, w - 1)
                iyc = jnp.clip(iy, 0, h - 1)
                rgb = rgb.at[iyc, ixc].add(fw[..., None] * radiance)
                wsum = wsum.at[iyc, ixc].add(fw)
        return FilmState(rgb=rgb, wsum=wsum, splat=state.splat)

    def add_splats(self, state: FilmState, p_film, v, splat_weight=1.0) -> FilmState:
        """Unfiltered splats (reference film.rs add_splat)."""
        x0, y0, _, _ = self.cropped_pixel_bounds
        h, w = state.wsum.shape
        ix = jnp.floor(p_film[..., 0]).astype(jnp.int32) - x0
        iy = jnp.floor(p_film[..., 1]).astype(jnp.int32) - y0
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        wgt = jnp.where(ok, splat_weight, 0.0)
        splat = state.splat.at[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)].add(
            wgt[..., None] * v)
        return state._replace(splat=splat)

    def to_image(self, state: FilmState, splat_scale=1.0):
        """Weight-normalize and merge splats → (H, W, 3) linear RGB
        (reference film.rs:196-247 write_image math, minus the file I/O)."""
        safe_w = jnp.where(state.wsum > 0.0, state.wsum, 1.0)
        img = jnp.where((state.wsum > 0.0)[..., None], state.rgb / safe_w[..., None], 0.0)
        img = jnp.maximum(img, 0.0)
        img = img + splat_scale * state.splat
        return img * self.scale
