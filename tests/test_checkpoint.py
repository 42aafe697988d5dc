"""Film checkpoint/resume (render/checkpoint.py).

New capability vs the reference (which keeps the film only in memory,
film.rs:196; SURVEY §5.4). The (0,2)-sequence sampler is deterministic per
(pixel, sample), so resume must be BIT-identical to an uninterrupted render.
"""
import numpy as np

from helpers import cornell_box, cornell_camera
from rustracer_tpu.render.checkpoint import (load_film_checkpoint,
                                             save_film_checkpoint)
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import (RenderConfig, RenderContext,
                                           Renderer)
from rustracer_tpu.render.sampler import SamplerConfig
from rustracer_tpu.integrators import normal as normal_int


def _setup(spp=8):
    geom, lights = cornell_box()
    ctx = RenderContext(geom=geom, lights=lights)
    cam = cornell_camera(res=(16, 16))
    film = Film(full_resolution=(16, 16), filter=Filter("box", 0.5, 0.5))
    samp = SamplerConfig(kind="02sequence", spp=spp)
    r = Renderer(normal_int.li, cam, film, samp, RenderConfig(max_lanes=256))
    return ctx, r


def test_save_load_roundtrip(tmp_path):
    ctx, r = _setup()
    state = r.render_state(ctx, sample_stop=2)
    p = str(tmp_path / "film.ckpt")
    save_film_checkpoint(p, state, 2)
    loaded, done = load_film_checkpoint(p)
    assert done == 2
    for a, b in zip(state, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_bit_identical(tmp_path):
    ctx, r = _setup(spp=6)
    want = np.asarray(r.render(ctx))

    # simulate a crash after 3 of 6 spp: checkpoint, then resume
    p = str(tmp_path / "film.ckpt")
    state = r.render_state(ctx, sample_stop=3)
    save_film_checkpoint(p, state, 3)
    got = np.asarray(r.render_checkpointed(ctx, p, every_spp=2))
    np.testing.assert_array_equal(got, want)
    # checkpoint removed after successful completion
    import os
    assert not os.path.exists(p)


def test_checkpointed_fresh_run_matches(tmp_path):
    ctx, r = _setup(spp=5)
    want = np.asarray(r.render(ctx))
    got = np.asarray(r.render_checkpointed(
        ctx, str(tmp_path / "f.ckpt"), every_spp=2))
    np.testing.assert_array_equal(got, want)
