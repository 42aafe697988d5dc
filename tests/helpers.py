"""Shared scene-construction helpers for tests."""
import numpy as np
import jax.numpy as jnp

from rustracer_tpu.core.transform import Transform
from rustracer_tpu.scene.tables import make_geometry
from rustracer_tpu.scene.lights import make_lights, LIGHT_AREA, LIGHT_POINT

TWO_PI = 2.0 * np.pi


def quad_dict(spheres, materials=None, arealights=None):
    """spheres: list of (center, radius)."""
    n = len(spheres)
    o2ws = [Transform.translate(*c) for c, _ in spheres]
    return dict(
        q_type=np.zeros(n, np.int32),
        q_o2w=np.stack([t.m for t in o2ws]),
        q_w2o=np.stack([t.m_inv for t in o2ws]),
        q_params=np.array([[r, -r, r, TWO_PI] for _, r in spheres], np.float32),
        q_material=np.asarray(materials if materials is not None else [0] * n,
                              np.int32),
        q_arealight=np.asarray(arealights if arealights is not None else [-1] * n,
                               np.int32),
        q_reverse=np.zeros(n, bool),
    )


class TriBuilder:
    def __init__(self):
        self.v = []
        self.uv = []
        self.idx = []
        self.mat = []
        self.al = []

    def add_quad(self, p00, p10, p11, p01, material=0, arealight=-1):
        """Two triangles for the quad p00-p10-p11-p01 (CCW)."""
        base = len(self.v)
        self.v += [p00, p10, p11, p01]
        self.uv += [(0, 0), (1, 0), (1, 1), (0, 1)]
        self.idx += [(base, base + 1, base + 2), (base, base + 2, base + 3)]
        self.mat += [material, material]
        self.al += [arealight, arealight]
        return len(self.idx) - 2  # first tri index

    def build(self):
        n = len(self.idx)
        v = np.asarray(self.v, np.float32)
        return dict(
            tv_p=v,
            tv_n=np.zeros_like(v),
            tv_uv=np.asarray(self.uv, np.float32),
            tv_s=np.zeros_like(v),
            t_idx=np.asarray(self.idx, np.int32),
            t_material=np.asarray(self.mat, np.int32),
            t_arealight=np.asarray(self.al, np.int32),
            t_reverse=np.zeros(n, bool),
            t_has_n=np.zeros(n, bool),
            t_has_uv=np.ones(n, bool),
            t_alpha_tex=np.full(n, -1, np.int32),
        )


def cornell_box(light_emit=(15.0, 15.0, 15.0)):
    """Classic Cornell box in [0,1]^3, camera looking down +z.

    Returns (geom, lights, material assignment):
      mat 0 = white, 1 = red (left), 2 = green (right), 3 = light's matte
    """
    tb = TriBuilder()
    # area light ids: the 2 ceiling-light triangles are lights 0 and 1
    # floor (y=0)
    tb.add_quad((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1), material=0)
    # ceiling (y=1)
    tb.add_quad((0, 1, 1), (1, 1, 1), (1, 1, 0), (0, 1, 0), material=0)
    # back wall (z=1)
    tb.add_quad((0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1), material=0)
    # left wall (x=0) red
    tb.add_quad((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0), material=1)
    # right wall (x=1) green
    tb.add_quad((1, 0, 1), (1, 0, 0), (1, 1, 0), (1, 1, 1), material=2)
    # ceiling light: small quad slightly below ceiling, facing down
    # wound so cross(p0-p2, p1-p2) points down (-y) into the box
    first = tb.add_quad((0.35, 0.999, 0.35), (0.65, 0.999, 0.35),
                        (0.65, 0.999, 0.65), (0.35, 0.999, 0.65),
                        material=3, arealight=-2)  # placeholder
    tris = tb.build()
    # fix arealight ids: tri `first` -> light 0, first+1 -> light 1
    tris["t_arealight"][first] = 0
    tris["t_arealight"][first + 1] = 1
    geom = make_geometry(tris=tris)
    nq = 1  # dummy quadric pad
    rows = [dict(type=LIGHT_AREA, pos=(0, 0, 0), emit=light_emit,
                 prim=nq + first, twosided=False),
            dict(type=LIGHT_AREA, pos=(0, 0, 0), emit=light_emit,
                 prim=nq + first + 1, twosided=False)]
    lights = make_lights(rows, world_center=(0.5, 0.5, 0.5), world_radius=1.0,
                         geom=geom)
    return geom, lights


def cornell_camera(res=(64, 64)):
    from rustracer_tpu.render.camera import PerspectiveCamera
    c2w = Transform.look_at([0.5, 0.5, -1.4], [0.5, 0.5, 0.5], [0, 1, 0])
    return PerspectiveCamera.create(c2w, fov=40.0, resolution=res)


def cornell_imagemap_materials(seed_base=10, imagemap_walls=(1, 2)):
    """Cornell material set + textures dict with the given wall material
    ids served as ATLAS imagemaps (8x8 noisy pyramids) and the rest as
    constant mattes. Shared by the shard_map parity tests and the
    multichip gate so both exercise the identical atlas construction.
    Returns (material_set, textures_dict)."""
    from rustracer_tpu.ops.mipmap import build_pyramid
    from rustracer_tpu.scene.atlas import build_atlas_meta
    from rustracer_tpu.scene.materials import MaterialSet, MatteMaterial
    from rustracer_tpu.scene.textures import ConstantTexture, ImageTexture

    ms = MaterialSet()
    const = {}
    images = []
    for i, a in enumerate([[0.73] * 3, [0.63, 0.065, 0.05],
                           [0.14, 0.45, 0.09], [0.0] * 3]):
        const[f"kd{i}"] = jnp.asarray(a, jnp.float32)
        if i in imagemap_walls:
            rng = np.random.RandomState(seed_base + i)
            img = (np.asarray(a, np.float32)[None, None]
                   * (0.6 + 0.4 * rng.rand(8, 8, 3))).astype(np.float32)
            images.append([jnp.asarray(lv) for lv in build_pyramid(img)])
            ms.add(MatteMaterial(kd=ImageTexture(len(images) - 1)))
        else:
            ms.add(MatteMaterial(kd=ConstantTexture(f"kd{i}")))
    textures = {"const": const, "images": images}
    am = build_atlas_meta(images)
    textures["atlas_meta"] = am["atlas_meta"]
    textures["atlas_levels"] = am["atlas_levels"]
    return ms, textures
