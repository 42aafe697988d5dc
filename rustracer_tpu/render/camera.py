"""Perspective camera with thin-lens depth of field and ray differentials.

Reference: rustracer-core/src/camera.rs (PerspectiveCamera is the only camera
in the reference). Matrices are precomputed host-side; ray generation is a
pure batched function over film/lens samples.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.ray import Ray
from ..core.sampling import concentric_sample_disk
from ..core.transform import Transform, xform_point, xform_vector


@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    camera_to_world: np.ndarray      # (4, 4)
    raster_to_camera: np.ndarray     # (4, 4)
    lens_radius: float = 0.0
    focal_distance: float = 1e6
    shutter_open: float = 0.0
    shutter_close: float = 1.0

    @staticmethod
    def create(cam2world: Transform, fov=90.0, lens_radius=0.0,
               focal_distance=1e6, resolution=(640, 480), screen_window=None,
               shutter_open=0.0, shutter_close=1.0):
        """Build the raster↔screen↔camera chain (reference camera.rs:38-61)."""
        xr, yr = resolution
        aspect = xr / yr
        if screen_window is None:
            if aspect > 1.0:
                screen = (-aspect, aspect, -1.0, 1.0)
            else:
                screen = (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)
        else:
            screen = screen_window
        x0, x1, y0, y1 = screen
        cam_to_screen = Transform.perspective(fov, 1e-2, 1000.0)
        screen_to_raster = (Transform.scale(xr, yr, 1.0)
                            * Transform.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
                            * Transform.translate(-x0, -y1, 0.0))
        raster_to_camera = cam_to_screen.inverse() * screen_to_raster.inverse()
        return PerspectiveCamera(
            camera_to_world=cam2world.m,
            raster_to_camera=raster_to_camera.m,
            lens_radius=float(lens_radius),
            focal_distance=float(focal_distance),
            shutter_open=float(shutter_open),
            shutter_close=float(shutter_close),
        )

    def _ray_camera_space(self, p_film, p_lens_u):
        """Camera-space (o, d) for film points (reference camera.rs:110-146)."""
        r2c = jnp.asarray(self.raster_to_camera)
        p_raster = jnp.concatenate([p_film, jnp.zeros_like(p_film[..., :1])], axis=-1)
        p_camera = xform_point(r2c, p_raster)
        d = normalize(p_camera)
        o = jnp.zeros_like(d)
        if self.lens_radius > 0.0:
            p_lens = self.lens_radius * concentric_sample_disk(p_lens_u)
            ft = self.focal_distance / d[..., 2]
            p_focus = d * ft[..., None]
            o = jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], axis=-1)
            d = normalize(p_focus - o)
        return o, d

    def generate_ray_differential(self, p_film, p_lens_u):
        """p_film: (B, 2) raster coords; p_lens_u: (B, 2) in [0,1)^2 → Ray batch
        with x/y differentials (reference camera.rs:150-202)."""
        c2w = jnp.asarray(self.camera_to_world)
        o, d = self._ray_camera_space(p_film, p_lens_u)
        ox, dx = self._ray_camera_space(p_film + jnp.asarray([1.0, 0.0]), p_lens_u)
        oy, dy = self._ray_camera_space(p_film + jnp.asarray([0.0, 1.0]), p_lens_u)
        t_max = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(
            o=xform_point(c2w, o), d=normalize(xform_vector(c2w, d)), t_max=t_max,
            rx_origin=xform_point(c2w, ox),
            rx_direction=normalize(xform_vector(c2w, dx)),
            ry_origin=xform_point(c2w, oy),
            ry_direction=normalize(xform_vector(c2w, dy)),
        )

    def generate_ray(self, p_film, p_lens_u):
        c2w = jnp.asarray(self.camera_to_world)
        o, d = self._ray_camera_space(p_film, p_lens_u)
        t_max = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(o=xform_point(c2w, o), d=normalize(xform_vector(c2w, d)),
                   t_max=t_max)
