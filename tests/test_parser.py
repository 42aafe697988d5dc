"""PBRT front-end tests: lexer, parser, ParamSet, Api state machine.

Mirrors reference tests (pbrt/lexer.rs:265-338, pbrt/parser.rs:297-360,
the inline scene at pbrt/mod.rs:46-86) plus scene-table assembly checks.
"""
import numpy as np
import pytest

from rustracer_tpu.scene.api import ApiError, RealApi, parse_scene_string
from rustracer_tpu.scene.lexer import tokenize
from rustracer_tpu.scene.lights import LIGHT_AREA, LIGHT_DISTANT, LIGHT_POINT
from rustracer_tpu.scene.paramset import ParamSet
from rustracer_tpu.scene.parser import ParseError, _Stream, _parse_params, parse


class TestLexer:
    def test_directives_and_numbers(self):
        toks = tokenize('Translate 1 -2.5 3e2')
        assert [t.kind for t in toks] == ["word", "number", "number", "number"]
        assert toks[0].value == "Translate"
        assert toks[2].value == -2.5
        assert toks[3].value == 300.0

    def test_strings_and_brackets(self):
        toks = tokenize('Camera "perspective" "float fov" [50]')
        kinds = [t.kind for t in toks]
        assert kinds == ["word", "string", "string", "lbrack", "number", "rbrack"]
        assert toks[1].value == "perspective"

    def test_comments_stripped(self):
        toks = tokenize('# a comment\nWorldBegin # trailing\nWorldEnd')
        assert [t.value for t in toks] == ["WorldBegin", "WorldEnd"]

    def test_line_numbers(self):
        toks = tokenize('WorldBegin\n\nWorldEnd')
        assert toks[0].line == 1
        assert toks[1].line == 3

    def test_lex_error(self):
        with pytest.raises(SyntaxError):
            tokenize("Translate @ 1 2")


class TestParamSet:
    def _ps(self, text):
        toks = tokenize(text)
        return _parse_params(_Stream(toks))

    def test_typed_params(self):
        ps = self._ps('"float fov" [30] "integer n" [4] "string name" "x" '
                      '"bool flag" ["true"] "rgb Kd" [0.1 0.2 0.3]')
        assert ps.find_one_float("fov", 0) == 30.0
        assert ps.find_one_int("n", 0) == 4
        assert ps.find_one_string("name", "") == "x"
        assert ps.find_one_bool("flag", False) is True
        np.testing.assert_allclose(ps.find_one_spectrum("Kd", (0, 0, 0)),
                                   [0.1, 0.2, 0.3])

    def test_defaults(self):
        ps = ParamSet()
        assert ps.find_one_float("missing", 2.5) == 2.5
        assert ps.find_one_spectrum("m", (1, 0, 0))[0] == 1.0

    def test_wrong_type_gives_default(self):
        ps = self._ps('"float x" [1.0]')
        assert ps.find_one_int("x", 7) == 7

    def test_arrays(self):
        ps = self._ps('"point P" [0 0 0  1 0 0  0 1 0] "integer indices" [0 1 2]')
        assert ps.find_point3("P").shape == (3, 3)
        np.testing.assert_array_equal(ps.find_int("indices"), [0, 1, 2])

    def test_blackbody(self):
        ps = self._ps('"blackbody L" [6500 1]')
        rgb = ps.find_one_spectrum("L", (0, 0, 0))
        assert rgb.shape == (3,)
        assert rgb.max() > 0  # warm white

    def test_unbracketed_single_value(self):
        ps = self._ps('"float fov" 45')
        assert ps.find_one_float("fov", 0) == 45.0


class TestApiStateMachine:
    def test_options_directive_in_world_fails(self):
        api = RealApi()
        api.init()
        api.world_begin()
        with pytest.raises(ApiError):
            api.film("image", ParamSet())

    def test_world_directive_in_options_fails(self):
        api = RealApi()
        api.init()
        with pytest.raises(ApiError):
            api.shape("sphere", ParamSet())

    def test_attribute_stack_restores(self):
        api = RealApi()
        api.init()
        api.world_begin()
        api.material("matte", ParamSet())
        api.attribute_begin()
        api.material("mirror", ParamSet())
        api.translate(5, 0, 0)
        api.attribute_end()
        assert api.graphics.material == "matte"
        assert api.cur_transform.is_identity()

    def test_transform_stack(self):
        api = RealApi()
        api.init()
        api.world_begin()
        api.transform_begin()
        api.translate(1, 2, 3)
        api.transform_end()
        assert api.cur_transform.is_identity()

    def test_named_coordinate_system(self):
        api = RealApi()
        api.init()
        api.translate(1, 0, 0)
        api.coordinate_system("shifted")
        api.identity()
        api.coord_sys_transform("shifted")
        assert api.cur_transform.m[0, 3] == 1.0


class TestFullSceneParse:
    SCENE = """
LookAt 0 0 5 0 0 0 0 1 0
Camera "perspective" "float fov" [50]
Sampler "02sequence" "integer pixelsamples" [8]
Film "image" "integer xresolution" [80] "integer yresolution" [60]
    "string filename" "test-whitted.png"
Integrator "whitted"
WorldBegin
  LightSource "distant" "point from" [0 1 5] "point to" [0 0 0]
  AttributeBegin
    Material "plastic" "rgb Kd" [1.0 0.0 0.0] "rgb Ks" [1.0 1.0 1.0]
    Shape "sphere"
  AttributeEnd
  AttributeBegin
    Rotate -90 1 0 0
    Material "matte" "rgb Kd" [1.0 1.0 1.0]
    Shape "disk" "float radius" [20] "float height" [-1]
  AttributeEnd
  AttributeBegin
    AreaLightSource "diffuse" "rgb L" [2.0 2.0 2.0]
    Rotate 90 1 0 0
    Shape "disk" "float height" [-2] "float radius" [0.5]
  AttributeEnd
WorldEnd
"""

    def test_reference_inline_scene(self):
        """The scene from reference pbrt/mod.rs:49-83."""
        api = parse_scene_string(self.SCENE)
        b = api.scene
        assert b is not None
        assert b.geom.n_quadrics == 3          # sphere + 2 disks
        assert b.film.full_resolution == (80, 60)
        assert b.film.filename == "rt-test-whitted.png"  # rt- prefix quirk
        assert b.sampler.spp == 8
        assert b.integrator_name == "whitted"
        # lights: 1 distant + 1 area (disk)
        lt = np.asarray(b.lights.l_type)
        assert (lt == LIGHT_DISTANT).sum() == 1
        assert (lt == LIGHT_AREA).sum() == 1
        # the area light points at quadric prim 2
        area_row = int(np.where(lt == LIGHT_AREA)[0][0])
        assert int(np.asarray(b.lights.l_prim)[area_row]) == 2
        assert int(np.asarray(b.geom.q_arealight)[2]) == area_row
        # materials: plastic + 2 matte
        assert len(b.material_set.materials) == 3

    def test_render_parsed_scene(self):
        api = parse_scene_string(self.SCENE.replace("[80]", "[32]")
                                 .replace("[60]", "[24]"))
        img = np.asarray(api.scene.render())
        assert img.shape == (24, 32, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.05   # something lit

    def test_trianglemesh_parse(self):
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [0 0 0  1 0 0  1 1 0  0 1 0]
    "float uv" [0 0 1 0 1 1 0 1]
WorldEnd
"""
        api = parse_scene_string(scene)
        assert api.scene.geom.n_triangles == 2

    def test_texture_and_named_material(self):
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  Texture "checks" "spectrum" "checkerboard"
    "float uscale" [8] "float vscale" [8]
    "rgb tex1" [.1 .1 .1] "rgb tex2" [.8 .8 .8]
  MakeNamedMaterial "checkmat" "string type" "matte" "texture Kd" "checks"
  NamedMaterial "checkmat"
  Shape "sphere"
WorldEnd
"""
        api = parse_scene_string(scene)
        assert len(api.material_set.materials) == 1
        from rustracer_tpu.scene.textures import CheckerboardTexture
        m = api.material_set.materials[0]
        assert isinstance(m.kd, CheckerboardTexture)

    def test_object_instancing(self):
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  ObjectBegin "tree"
    Shape "sphere" "float radius" [0.5]
  ObjectEnd
  ObjectInstance "tree"
  Translate 2 0 0
  ObjectInstance "tree"
WorldEnd
"""
        api = parse_scene_string(scene)
        assert api.scene.geom.n_quadrics == 2
        o2w = np.asarray(api.scene.geom.q_o2w)
        assert o2w[0, 0, 3] == 0.0
        assert o2w[1, 0, 3] == 2.0

    def test_reverse_orientation(self):
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  ReverseOrientation
  Shape "sphere"
WorldEnd
"""
        api = parse_scene_string(scene)
        assert bool(np.asarray(api.scene.geom.q_reverse)[0])

    def test_unknown_material_falls_back_to_matte(self):
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  Material "bogus"
  Shape "sphere"
WorldEnd
"""
        api = parse_scene_string(scene)
        from rustracer_tpu.scene.materials import MatteMaterial
        assert isinstance(api.material_set.materials[0], MatteMaterial)

    def test_unimplemented_shape_raises(self):
        scene = """
Camera "perspective"
WorldBegin
  Shape "cone"
WorldEnd
"""
        with pytest.raises(NotImplementedError):
            parse_scene_string(scene)

    def test_unknown_directive_raises(self):
        with pytest.raises(ParseError):
            parse_scene_string("Bogus 1 2 3")

    def test_quick_render_quarters_spp(self):
        """PbrtOptions.quick_render (reference lib.rs:97-101): spp / 4."""
        scene = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "02sequence" "integer pixelsamples" [16]
Camera "perspective"
WorldBegin
  Shape "sphere"
WorldEnd
"""
        api = parse_scene_string(scene, options={"quick_render": True})
        assert api.scene.sampler.spp == 4
        api = parse_scene_string(scene)
        assert api.scene.sampler.spp == 16
