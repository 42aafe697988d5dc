"""Shared mip atlas (scene/atlas.py): the per-parameter-slot lookup path
must reproduce the per-texture lookup path, and the lookup count must be
independent of how many imagemap materials the scene holds."""
import numpy as np
import pytest

from rustracer_tpu.scene.api import parse_scene_string
from rustracer_tpu.utils import stats as S


def _scene(n_mats=3):
    import os
    import tempfile
    from rustracer_tpu.render.imageio import write_image
    d = tempfile.mkdtemp()
    mats = []
    for i in range(n_mats):
        yy, xx = np.mgrid[0:32, 0:32]
        img = np.stack([0.2 + 0.6 * ((xx // (2 + i) + yy // 4) % 2),
                        0.1 + 0.05 * i + 0 * xx,
                        0.7 - 0.1 * i + 0 * yy], -1).astype(np.float32)
        path = os.path.join(d, f"t{i}.exr")
        write_image(path, img)
        mats.append(f'''
AttributeBegin
  Texture "tex{i}" "spectrum" "imagemap" "string filename" ["{path}"]
    "float uscale" [{4 + i}] "float vscale" [4]
  Material "matte" "texture Kd" ["tex{i}"]
  Translate {i * 2 - n_mats + 1} 0 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-0.9 -0.9 0  0.9 -0.9 0  0.9 0.9 0  -0.9 0.9 0]
    "float uv" [0 0 1 0 1 1 0 1]
AttributeEnd''')
    return f'''
Film "image" "integer xresolution" [64] "integer yresolution" [48]
LookAt 0 0 -6  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Sampler "02sequence" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "point from" [0 2 -4] "rgb I" [40 40 40]
{''.join(mats)}
WorldEnd
'''


def test_atlas_matches_per_texture_path():
    api = parse_scene_string(_scene())
    sc = api.scene
    assert "atlas_meta" in sc.textures
    img_atlas = np.asarray(sc.render())

    # disable the atlas fast path: identical render through the old
    # per-texture lookups
    sc2 = parse_scene_string(_scene()).scene
    sc2.textures.pop("atlas_meta")
    sc2.textures.pop("atlas_levels")
    img_plain = np.asarray(sc2.render())
    np.testing.assert_allclose(img_atlas, img_plain, atol=2e-5)


def test_atlas_slot_assignment():
    api = parse_scene_string(_scene(4))
    ms = api.scene.material_set
    S_, slot_tab, regs, per_mat = ms.atlas_prep()
    assert S_ == 1                       # matte: one imagemap param (Kd)
    # 4 distinct registrations, one per material holding an imagemap
    used = slot_tab[slot_tab >= 0]
    assert len(set(used.tolist())) == 4
    assert regs["reg_map"].shape[1] == 4
