"""Wavefront renderer: the execution engine.

Reference: rustracer-core/src/renderer.rs — there, image tiles are pulled
from a locked queue by N threads; here a tile is a flat SoA lane batch
(pixels x one sample index) pushed through one jitted step function:
  camera sample → ray gen → integrator Li → NaN scrub → film scatter-add.
The per-(tile, sample) step compiles once and is replayed over chunks; the
same step is the unit that `parallel/` shards over device meshes.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import PerspectiveCamera
from .film import Film, FilmState
from .sampler import DimAllocator, SamplerConfig


class Lanes(NamedTuple):
    pixel_idx: jnp.ndarray   # (B,) uint32 linear pixel index (global, for RNG)
    sample_idx: jnp.ndarray  # (B,) uint32


class RenderContext(NamedTuple):
    """Dynamic (pytree) part of the scene passed through jit."""
    geom: Any
    lights: Any = None
    materials: Any = None       # material parameter pytree
    textures: Any = None        # texture data pytree
    light_grid: Any = None      # SpatialLightGrid (lightdistrib.py) or None


@dataclasses.dataclass
class RenderConfig:
    max_lanes: int = 1 << 16    # pixels per tile batch
    splat_scale: float = 1.0
    report_progress: bool = False
    collect_stats: bool = True  # per-render counters (stats/mod.rs parity)


def scrub_radiance(L, valid=None):
    """Zero NaN / negative / infinite radiance (reference renderer.rs:115-126)."""
    bad = ~jnp.all(jnp.isfinite(L), axis=-1) | jnp.any(L < 0.0, axis=-1)
    L = jnp.where(bad[..., None], 0.0, L)
    if valid is not None:
        L = jnp.where(valid[..., None], L, 0.0)
    return L


def make_step(li_fn: Callable, camera: PerspectiveCamera, film: Film,
              sampler: SamplerConfig):
    """Build the jitted per-(tile, sample) render step."""

    def step(ctx: RenderContext, film_state: FilmState, px, py, sample_idx):
        xr, _ = film.full_resolution
        pixel_idx = (py.astype(jnp.uint32) * jnp.uint32(xr)
                     + px.astype(jnp.uint32))
        lanes = Lanes(pixel_idx=pixel_idx,
                      sample_idx=jnp.broadcast_to(sample_idx, pixel_idx.shape)
                      .astype(jnp.uint32))
        pixel_xy = jnp.stack([px, py], axis=-1).astype(jnp.float32)
        p_film, p_lens, _time = sampler.get_camera_sample(
            pixel_xy, lanes.pixel_idx, lanes.sample_idx)
        ray = camera.generate_ray_differential(p_film, p_lens)
        ray = ray.scaled_differentials(1.0 / np.sqrt(max(1, sampler.spp)))
        dims = DimAllocator()
        L = li_fn(ctx, ray, lanes, sampler, dims)
        L = scrub_radiance(L)
        return film.add_samples(film_state, p_film, L)

    return jax.jit(step, donate_argnums=(1,))


class Renderer:
    """Holds the jitted per-tile step so repeat renders reuse the compile.

    The reference re-renders by re-running main(); here the executable is the
    expensive artifact — build once, replay for every render/checkpoint.
    """

    def __init__(self, li_fn, camera: PerspectiveCamera, film: Film,
                 sampler: SamplerConfig,
                 config: Optional[RenderConfig] = None):
        self.li_fn = li_fn
        self.camera = camera
        self.film = film
        self.sampler = sampler
        self.config = config or RenderConfig()

        def masked_step(ctx, fs, px, py, s, v):
            xr, _ = film.full_resolution
            pixel_idx = (py.astype(jnp.uint32) * jnp.uint32(xr)
                         + px.astype(jnp.uint32))
            lanes = Lanes(pixel_idx=pixel_idx,
                          sample_idx=jnp.broadcast_to(s, pixel_idx.shape)
                          .astype(jnp.uint32))
            pixel_xy = jnp.stack([px, py], axis=-1).astype(jnp.float32)
            p_film, p_lens, _t = sampler.get_camera_sample(
                pixel_xy, lanes.pixel_idx, lanes.sample_idx)
            ray = camera.generate_ray_differential(p_film, p_lens)
            ray = ray.scaled_differentials(1.0 / np.sqrt(max(1, sampler.spp)))
            dims = DimAllocator()
            from ..utils import stats as S
            if self.config.collect_stats:
                S.device_tape_begin()
            out = li_fn(ctx, ray, lanes, sampler, dims)
            tape = S.device_tape_end() if self.config.collect_stats else {}
            L, path_len = out if isinstance(out, tuple) else (out, None)
            L = scrub_radiance(L)
            fs = film.add_samples(fs, p_film, L, valid=v)
            if not self.config.collect_stats:
                return fs, jnp.zeros(6, jnp.int32)
            # per-step counters (fetched once per render, not per step):
            # [camera rays, zero-radiance paths, plen sum, plen count,
            #  plen min, plen max] — reference renderer.rs:17, path.rs:18-19
            zero = v & ~jnp.any(L > 0.0, axis=-1)
            if path_len is None:
                plen = jnp.zeros(3, jnp.int32)  # sum, min, max (count 0)
                pcnt = jnp.int32(0)
            else:
                pl = path_len.astype(jnp.int32)
                big = jnp.int32(1 << 30)
                plen = jnp.stack([
                    jnp.sum(jnp.where(v, pl, 0)),
                    jnp.min(jnp.where(v, pl, big)),
                    jnp.max(jnp.where(v, pl, -1))])
                pcnt = jnp.sum(v.astype(jnp.int32))
            svec = jnp.stack([jnp.sum(v.astype(jnp.int32)),
                              jnp.sum(zero.astype(jnp.int32)),
                              plen[0], pcnt, plen[1], plen[2]])
            # observed device counters collected on the tape during trace
            # (traversal rows/tests, texture lookups) ride along per step
            names = sorted(tape)
            self._device_counter_names = names
            if names:
                svec = jnp.concatenate(
                    [svec, jnp.stack([jnp.asarray(tape[k], jnp.int32)
                                      .reshape(()) for k in names])])
            return fs, svec

        self._step = jax.jit(masked_step, donate_argnums=(1,))

        # precompute the padded tile decomposition (static per renderer)
        x0, y0, x1, y1 = film.get_sample_bounds()
        gx, gy = np.meshgrid(np.arange(x0, x1, dtype=np.int32),
                             np.arange(y0, y1, dtype=np.int32))
        px_all, py_all = gx.ravel(), gy.ravel()
        n = px_all.size
        tile = min(self.config.max_lanes, n)
        n_tiles = -(-n // tile)
        pad = n_tiles * tile - n
        valid = np.ones(n, bool)
        if pad:
            px_all = np.concatenate([px_all, np.full(pad, x0, np.int32)])
            py_all = np.concatenate([py_all, np.full(pad, y0, np.int32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        self._tiles = [
            (jnp.asarray(px_all[ti * tile:(ti + 1) * tile]),
             jnp.asarray(py_all[ti * tile:(ti + 1) * tile]),
             jnp.asarray(valid[ti * tile:(ti + 1) * tile]))
            for ti in range(n_tiles)]

    def render_state(self, ctx: RenderContext, film_state=None,
                     sample_start: int = 0, sample_stop: Optional[int] = None):
        """Accumulate samples [sample_start, sample_stop) into film state."""
        if film_state is None:
            film_state = self.film.init_state()
        stop = self.sampler.spp if sample_stop is None else sample_stop
        n_tiles = len(self._tiles)
        t_start = time.time()
        svecs = []
        from ..utils import stats as S
        first = not getattr(self, "_compiled", False)
        compile_secs = 0.0
        for ti, (px, py, v) in enumerate(self._tiles):
            for s in range(sample_start, stop):
                if first:
                    # first step call = jit trace + XLA compile (+ 1 step)
                    t0 = time.time()
                    film_state, svec = self._step(ctx, film_state, px,
                                                  py, jnp.uint32(s), v)
                    jax.block_until_ready(svec)
                    compile_secs = time.time() - t0
                    S._phases["render/compile (first step)"] = \
                        S._phases.get("render/compile (first step)", 0.0) \
                        + compile_secs
                    self._compiled = True
                    first = False
                else:
                    film_state, svec = self._step(ctx, film_state, px, py,
                                                  jnp.uint32(s), v)
                svecs.append(svec)
            if self.config.report_progress:
                done = (ti + 1) / n_tiles
                el = time.time() - t_start
                print(f"  tile {ti + 1}/{n_tiles} ({100 * done:.0f}%) "
                      f"elapsed {el:.1f}s eta {el / done - el:.1f}s",
                      flush=True)
        if self.config.collect_stats and svecs:
            jax.block_until_ready(film_state)
            S._phases["render/steady"] = S._phases.get("render/steady", 0.0) \
                + (time.time() - t_start) - compile_secs
            self._report_stats(np.asarray(jnp.stack(svecs)))
        return film_state

    def _report_stats(self, sv):
        """Aggregate per-step counter vectors into the global stats registry
        (reference counters: renderer.rs:17, scene.rs:9-20, path.rs:18-19)."""
        from ..utils import stats as S
        cam_rays = int(sv[:, 0].sum())
        S.counter_add("Integrator/Camera rays traced", cam_rays)
        S.percent_report("Integrator/Zero-radiance paths",
                         int(sv[:, 1].sum()), cam_rays)
        pcnt = int(sv[:, 3].sum())
        if pcnt:
            S.distribution_report("Integrator/Path length",
                                  int(sv[:, 2].sum()), pcnt)
            # fold exact min/max over steps into the distribution range
            S._distributions["Integrator/Path length"] = (
                int(sv[:, 2].sum()), pcnt,
                int(sv[:, 4].min()), int(sv[:, 5].max()))
        tests = getattr(self, "_tests_per_lane", None)
        if tests:
            # static per-lane dispatch bounds (path.py tests_per_lane) —
            # kept as a separate row next to the observed counts below
            S.counter_add(
                "Intersections/Regular traversals (dispatched bound)",
                cam_rays * tests.get("regular", 0))
            S.counter_add(
                "Intersections/Shadow traversals (dispatched bound)",
                cam_rays * tests.get("shadow", 0))
        for j, name in enumerate(getattr(self, "_device_counter_names", [])):
            S.counter_add(name, int(sv[:, 6 + j].sum()))

    def render(self, ctx: RenderContext):
        """Full render → (H, W, 3) linear RGB image array."""
        film_state = self.render_state(ctx)
        return self.film.to_image(film_state,
                                  splat_scale=self.config.splat_scale)

    def render_checkpointed(self, ctx: RenderContext, ckpt_path: str,
                            every_spp: int = 8):
        """Render with periodic film checkpoints (render/checkpoint.py):
        resumes from ckpt_path if present, snapshots every `every_spp`
        samples, and removes the checkpoint on successful completion."""
        from .checkpoint import maybe_resume, save_film_checkpoint
        film_state, done = maybe_resume(ckpt_path, self.film)
        if done:
            print(f"resuming from {ckpt_path} at {done} spp", flush=True)
        spp = self.sampler.spp
        while done < spp:
            stop = min(done + max(1, every_spp), spp)
            film_state = self.render_state(ctx, film_state,
                                           sample_start=done,
                                           sample_stop=stop)
            done = stop
            if done < spp:
                save_film_checkpoint(ckpt_path, film_state, done)
        img = self.film.to_image(film_state,
                                 splat_scale=self.config.splat_scale)
        if os.path.exists(ckpt_path):
            os.remove(ckpt_path)
        return img


def render(ctx: RenderContext, li_fn, camera: PerspectiveCamera, film: Film,
           sampler: SamplerConfig, config: Optional[RenderConfig] = None):
    """One-shot render → (H, W, 3) linear RGB image array."""
    return Renderer(li_fn, camera, film, sampler, config).render(ctx)
