"""Inter-bounce half-compaction (integrators/path.py PATH_COMPACT_MIN_B):
when >= half the wavefront dies at bounce 0, the interior scan runs on a
static B/2 alive-first slab. Results must be identical to the full-width
scan (dead lanes' radiance is final; the full-width body only updates
them under alive masks)."""
import jax
import jax.numpy as jnp
import numpy as np

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.integrators import path as P
from rustracer_tpu.render.camera import PerspectiveCamera
from rustracer_tpu.render.film import Film
from rustracer_tpu.render.filters import Filter
from rustracer_tpu.render.renderer import RenderContext, Renderer, RenderConfig
from rustracer_tpu.render.sampler import SamplerConfig
from rustracer_tpu.scene.api import parse_scene_string

SCENE = """
Film "image" "integer xresolution" [256] "integer yresolution" [256]
LookAt 0 1.2 -4  0 0.4 0  0 1 0
Camera "perspective" "float fov" [55]
Sampler "02sequence" "integer pixelsamples" [1]
Integrator "path" "integer maxdepth" [5]
WorldBegin
LightSource "point" "point from" [3 4 -3] "rgb I" [40 40 40]
AttributeBegin
  Material "plastic" "rgb Kd" [0.5 0.3 0.2] "float roughness" [0.1]
  Shape "sphere" "float radius" [0.7]
AttributeEnd
AttributeBegin
  Material "matte" "rgb Kd" [0.4 0.5 0.6]
  Translate 0 -1.2 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
AttributeEnd
WorldEnd
"""


def _render():
    api = parse_scene_string(SCENE)
    return np.asarray(api.scene.render())


def test_compacted_scan_matches_full_width(monkeypatch):
    # open scene at 256x256@1spp = exactly 2^16 lanes: most camera rays
    # miss, so the compact branch is taken
    img_c = _render()
    monkeypatch.setattr(P, "PATH_COMPACT_MIN_B", 1 << 30)   # force full
    img_f = _render()
    # not bitwise: the B/2-shaped program makes different FMA-contraction
    # choices than the B-shaped one (measured max rel diff ~6e-7); the
    # estimator itself is identical
    np.testing.assert_allclose(img_c, img_f, rtol=2e-5, atol=2e-6)
    assert np.isfinite(img_c).all() and img_c.mean() > 1e-3
