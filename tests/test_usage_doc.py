"""docs/USAGE.md must not drift from the API: exercise each snippet's
calls (tiny shapes; the heavyweight paths are covered by their own
suites — this file pins NAMES and signatures)."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_cli_entry(tmp_path):
    """USAGE §1: the console entry point renders and writes the output."""
    from rustracer_tpu.utils.cli import main
    scene = tmp_path / "s.pbrt"
    scene.write_text("""
Film "image" "integer xresolution" [16] "integer yresolution" [12]
Camera "perspective" "float fov" [45]
Sampler "02sequence" "integer pixelsamples" [1]
Integrator "directlighting" "integer maxdepth" [2]
WorldBegin
LightSource "point" "rgb I" [8 8 8] "point from" [1 2 -2]
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "sphere" "float radius" [0.6]
WorldEnd
""")
    out = tmp_path / "out.png"
    rc = main([str(scene), "-o", str(out), "--cpu"])
    assert rc == 0 and out.exists()


def test_parse_and_write(tmp_path):
    """USAGE §2: parse_scene_string → render → write_image(filename)."""
    from rustracer_tpu.scene.api import parse_scene_string
    from rustracer_tpu.render.imageio import write_image
    api = parse_scene_string("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective" "float fov" [45]
Sampler "02sequence" "integer pixelsamples" [1]
Integrator "normal"
WorldBegin
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "sphere" "float radius" [1]
WorldEnd
""")
    img = np.asarray(api.scene.render())
    assert img.shape == (8, 8, 3)
    assert isinstance(api.scene.filename, str)
    write_image(str(tmp_path / "u.png"), img)
    assert (tmp_path / "u.png").exists()


def test_diff_and_mesh_symbols():
    """USAGE §4/§5: the documented differentiable + sharded API exists."""
    from rustracer_tpu.parallel.mesh import (make_device_mesh,
                                             render_sharded,
                                             make_sharded_train_step)
    assert callable(render_sharded) and callable(make_sharded_train_step)
    if len(jax.devices()) >= 8:
        mesh = make_device_mesh(data=4, sample=2)
        assert dict(mesh.shape) == {"data": 4, "sample": 2}


def test_checkpoint_roundtrip(tmp_path):
    """USAGE §6: save/load film checkpoint signature."""
    from rustracer_tpu.render.checkpoint import (save_film_checkpoint,
                                                 load_film_checkpoint)
    from rustracer_tpu.render.film import FilmState
    st = FilmState(rgb=jnp.ones((4, 4, 3)), wsum=jnp.ones((4, 4)),
                   splat=jnp.zeros((4, 4, 3)))
    p = str(tmp_path / "ck.npz")
    save_film_checkpoint(p, st, samples_done=3)
    st2, done = load_film_checkpoint(p)
    assert done == 3
    np.testing.assert_array_equal(np.asarray(st.rgb), np.asarray(st2.rgb))


def test_stats_api(capsys):
    """USAGE §7: init_stats/time_phase/print_phases/print_stats."""
    from rustracer_tpu.utils.stats import (init_stats, time_phase,
                                           print_phases, print_stats)
    init_stats()
    with time_phase("usage-doc/phase"):
        pass
    print_phases()
    print_stats()
    outerr = capsys.readouterr()
    assert "usage-doc/phase" in outerr.out + outerr.err
