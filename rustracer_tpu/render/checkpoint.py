"""Film checkpoint / resume.

The reference has none (SURVEY §5.4: film exists only in memory until
write_image, film.rs:196) — long renders lose everything on a crash. Here the
film accumulator (FilmState: rgb / wsum / splat tensors) is snapshotted to an
.npz after every chunk of samples, atomically, together with the number of
samples already accumulated; a resume picks up at that sample index. The
(0,2)-sequence sampler is deterministic per (pixel, sample_idx), so a
resumed render is bit-identical to a checkpointed-but-uninterrupted one.

Ordering caveat: `render_checkpointed` iterates (sample-chunk, tile) while a
plain `render` iterates (tile, sample), so a pixel whose filter footprint
receives contributions from MORE THAN ONE tile accumulates them in a
different float order between the two paths. Bit-identity vs a *plain*
render therefore additionally requires that no filter footprint crosses a
tile boundary — true for the default box filter (radius 0.5) or whenever
the image fits one tile (`RenderConfig.max_lanes >= W*H` lanes). With wider
filters and multiple tiles the resumed result is still deterministic and
equal up to float-summation reordering (~1 ulp per boundary pixel).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .film import FilmState

FORMAT_VERSION = 1


def save_film_checkpoint(path: str, state: FilmState, samples_done: int,
                         resolution=None) -> None:
    """Atomic snapshot of the film accumulator after `samples_done` spp."""
    tmp = path + f".tmp{os.getpid()}"
    np.savez(
        tmp,
        version=np.int64(FORMAT_VERSION),
        samples_done=np.int64(samples_done),
        resolution=np.asarray(resolution if resolution is not None else
                              (state.rgb.shape[1], state.rgb.shape[0]),
                              np.int64),
        rgb=np.asarray(state.rgb),
        wsum=np.asarray(state.wsum),
        splat=np.asarray(state.splat))
    # np.savez appends .npz to the temp name
    os.replace(tmp + ".npz", path)


def load_film_checkpoint(path: str) -> Tuple[FilmState, int]:
    """→ (FilmState, samples_done). Raises on version/shape mismatch."""
    import jax.numpy as jnp
    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path}: version {int(z['version'])} != "
                f"{FORMAT_VERSION}")
        state = FilmState(rgb=jnp.asarray(z["rgb"]),
                          wsum=jnp.asarray(z["wsum"]),
                          splat=jnp.asarray(z["splat"]))
        return state, int(z["samples_done"])


def maybe_resume(path: Optional[str], film) -> Tuple[Optional[FilmState], int]:
    """Load a checkpoint if it exists and matches the film's shape;
    → (state or None, samples_done)."""
    if not path or not os.path.exists(path):
        return None, 0
    state, done = load_film_checkpoint(path)
    want = film.init_state()
    if state.rgb.shape != want.rgb.shape:
        raise ValueError(
            f"checkpoint {path}: film shape {state.rgb.shape} does not match "
            f"scene film {want.rgb.shape}")
    return state, done
