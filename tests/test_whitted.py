"""Deterministic two-branch Whitted + specular ray differentials.

Reference: whitted.rs:41-99 evaluates BOTH specular reflection and
transmission every depth (via integrator/mod.rs:49-142, which also
propagates ray differentials through specular bounces). Round-1 shipped a
stochastic single-branch estimator; these tests gate the deterministic
rewrite (integrators/common.py::trace_specular_tree).
"""
import numpy as np
import pytest

from rustracer_tpu.scene.api import parse_scene_string


def _render(scene):
    api = parse_scene_string(scene)
    return np.asarray(api.scene.render())


HEADER = """
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Camera "perspective" "float fov" [45]
Sampler "02sequence" "integer pixelsamples" [1]
"""


class TestDeterministicWhitted:
    def test_matte_matches_directlighting(self):
        """With only delta lights and matte surfaces, Whitted's per-light
        estimator equals DirectLighting's estimate_direct exactly (the MIS
        BSDF side is skipped for delta lights)."""
        body = """
WorldBegin
  LightSource "point" "rgb I" [12 12 12] "point from" [1 2 -2]
  Material "matte" "rgb Kd" [0.7 0.4 0.3]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-3 -1 0  3 -1 0  3 -1 6  -3 -1 6]
  Shape "sphere" "float radius" [0.6]
WorldEnd
"""
        scene_w = ('LookAt 0 0.5 -3  0 0 0  0 1 0\n' + HEADER
                   + 'Integrator "whitted" "integer maxdepth" [3]\n' + body)
        scene_d = ('LookAt 0 0.5 -3  0 0 0  0 1 0\n' + HEADER
                   + 'Integrator "directlighting" "integer maxdepth" [3]\n'
                   + body)
        img_w = _render(scene_w)
        img_d = _render(scene_d)
        np.testing.assert_allclose(img_w, img_d, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_glass_pane_transmits_deterministically(self):
        """Normal-incidence glass pane in front of an emissive wall: the
        center sees ~(1-F)^2 ≈ 0.92 of the wall radiance (two dielectric
        interfaces at eta 1.5), with the η² radiance scale cancelling on
        entry/exit. The stochastic single-branch estimator only matches in
        expectation; the deterministic tree must match at 1 spp."""
        scene = ('LookAt 0 0 -3  0 0 0  0 1 0\n' + HEADER
                 + 'Integrator "whitted" "integer maxdepth" [4]\n' + """
WorldBegin
  AttributeBegin
    AreaLightSource "diffuse" "rgb L" [1 1 1] "bool twosided" "true"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-5 -5 4  5 -5 4  5 5 4  -5 5 4]
  AttributeEnd
  Material "glass"
  # pane: outward normals (front faces the camera at -z, back faces +z)
  Shape "trianglemesh" "integer indices" [0 2 1 0 3 2]
    "point P" [-2 -2 0  2 -2 0  2 2 0  -2 2 0]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-2 -2 0.2  2 -2 0.2  2 2 0.2  -2 2 0.2]
WorldEnd
""")
        img = _render(scene)
        h, w, _ = img.shape
        center = img[h // 2 - 2: h // 2 + 2, w // 2 - 2: w // 2 + 2]
        # F(0°, eta 1.5) = 0.04 → two interfaces ≈ 0.9216 (+ tiny internal
        # reflection chains)
        assert center.mean() == pytest.approx(0.92, abs=0.04)
        # determinism at 1 spp
        img2 = _render(scene)
        np.testing.assert_array_equal(img, img2)

    def test_mirror_chain_carries_light(self):
        """Two facing mirrors bounce the view onto a lit matte wall: depth
        must allow the 2-mirror chain to pick the wall color up."""
        scene = ('LookAt 0 0 -2  0 0 0  0 1 0\n' + HEADER
                 + 'Integrator "whitted" "integer maxdepth" [4]\n' + """
WorldBegin
  LightSource "point" "rgb I" [30 30 30] "point from" [0 0 9]
  Material "mirror"
  # mirror 1: in front of the camera, tilted 45° (normal between -z and +y)
  AttributeBegin
    Translate 0 0 1
    Rotate 45 1 0 0
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  AttributeEnd
  # mirror 2: above, tilted to redirect the upward ray toward +z
  AttributeBegin
    Translate 0 2 1
    Rotate 225 1 0 0
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  AttributeEnd
  Material "matte" "rgb Kd" [0.2 0.8 0.2]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-3 -1 10  3 -1 10  3 5 10  -3 5 10]
WorldEnd
""")
        img = _render(scene)
        # center of view goes mirror→mirror→green wall: green dominates
        h, w, _ = img.shape
        c = img[h // 2, w // 2]
        assert c[1] > 0.01 and c[1] > 3.0 * c[0]


class TestSpecularDifferentials:
    def test_checker_filtered_in_mirror(self):
        """A fine checker seen THROUGH a mirror must be area-filtered (the
        closed-form checkerboard AA needs du/dv, which only exist past the
        mirror if differentials propagate through the specular bounce —
        integrator/mod.rs:49-142). Point sampling would give extreme
        tex1/tex2 values; the filtered result sits near the 0.5 mix."""
        scene = ('LookAt 0 0 -2  0 0 0  0 1 0\n'
                 + HEADER.replace("[24]", "[16]")
                 + 'Integrator "whitted" "integer maxdepth" [3]\n' + """
WorldBegin
  # tilted so shadow rays from the far plane miss the small mirror
  LightSource "distant" "rgb L" [3 3 3] "point from" [0.7 0.2 1] "point to" [0 0 0]
  Material "mirror"
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-1 -1 2  1 -1 2  1 1 2  -1 1 2]
  Texture "checks" "spectrum" "checkerboard"
    "float uscale" [4000] "float vscale" [4000]
    "rgb tex1" [0 0 0] "rgb tex2" [0.8 0.8 0.8]
  Material "matte" "texture Kd" "checks"
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-200 -200 -400  200 -200 -400  200 200 -400  -200 200 -400]
    "float uv" [0 0  1 0  1 1  0 1]
WorldEnd
""")
        img = _render(scene)
        h, w, _ = img.shape
        c = img[h // 2 - 3: h // 2 + 3, w // 2 - 3: w // 2 + 3, 0]
        # filtered checker ≈ mean of tex1/tex2 under the distant light;
        # point sampling gives a bimodal mix of ~0 and ~max values
        lit = c[c > 1e-4]
        assert lit.size > 0
        spread = lit.std() / max(lit.mean(), 1e-6)
        assert spread < 0.25, f"checker not filtered: spread={spread}"
