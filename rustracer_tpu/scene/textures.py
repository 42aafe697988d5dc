"""Texture graph: static Python node DAG evaluating to batched jnp values.

Reference: rustracer-core/src/texture/ (Texture<T> trait + Constant, Scale,
Mix, UV, Checkerboard, Fbm, ImageTexture; texture/mod.rs:23-105 mappings).
Node structure is static per scene (retraced under jit); the *parameters*
(constant values, image texels) live in the dynamic `ctx.textures` pytree:
  ctx.textures = {"const": {key: jnp value}, "images": [pyramid, ...]}
so pixel gradients flow into texture parameters.

Float textures return (B,); spectrum textures (B, 3).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.math import dot
from ..core.noise import fbm, noise3, turbulence
from ..ops.mipmap import (WRAP_BLACK, WRAP_CLAMP, WRAP_REPEAT, lookup_ewa,
                          lookup_ewa_exact, lookup_trilinear)


# --- mappings (texture/mod.rs TextureMapping2D/3D) ---

class UVMapping2D:
    def __init__(self, su=1.0, sv=1.0, du=0.0, dv=0.0):
        self.su, self.sv, self.du, self.dv = su, sv, du, dv

    def map(self, si):
        st = jnp.stack([si.uv[..., 0] * self.su + self.du,
                        si.uv[..., 1] * self.sv + self.dv], axis=-1)
        dst0 = jnp.stack([si.dudx * self.su, si.dvdx * self.sv], axis=-1)
        dst1 = jnp.stack([si.dudy * self.su, si.dvdy * self.sv], axis=-1)
        return st, dst0, dst1


class PlanarMapping2D:
    def __init__(self, vs=(1, 0, 0), vt=(0, 1, 0), ds=0.0, dt=0.0):
        self.vs = np.asarray(vs, np.float32)
        self.vt = np.asarray(vt, np.float32)
        self.ds, self.dt = ds, dt

    def map(self, si):
        vs = jnp.asarray(self.vs)
        vt = jnp.asarray(self.vt)
        st = jnp.stack([self.ds + dot(si.p, vs), self.dt + dot(si.p, vt)], axis=-1)
        dst0 = jnp.stack([dot(si.dpdx, vs), dot(si.dpdx, vt)], axis=-1)
        dst1 = jnp.stack([dot(si.dpdy, vs), dot(si.dpdy, vt)], axis=-1)
        return st, dst0, dst1


class IdentityMapping3D:
    def __init__(self, world_to_texture=None):
        self.w2t = None if world_to_texture is None else \
            np.asarray(world_to_texture, np.float32)

    def map(self, si):
        if self.w2t is None:
            return si.p, si.dpdx, si.dpdy
        from ..core.transform import xform_point, xform_vector
        m = jnp.asarray(self.w2t)
        return xform_point(m, si.p), xform_vector(m, si.dpdx), \
            xform_vector(m, si.dpdy)


# --- texture nodes ---

class Texture:
    is_spectrum = True

    def evaluate(self, si, ctx):
        raise NotImplementedError


class ConstantTexture(Texture):
    """Value lives in ctx.textures['const'][key] — differentiable."""

    def __init__(self, key, is_spectrum=True):
        self.key = key
        self.is_spectrum = is_spectrum

    def evaluate(self, si, ctx):
        v = ctx.textures["const"][self.key]
        shape = si.t.shape + ((3,) if self.is_spectrum else ())
        return jnp.broadcast_to(v, shape)


class ScaleTexture(Texture):
    def __init__(self, tex1, tex2):
        self.tex1, self.tex2 = tex1, tex2
        self.is_spectrum = tex1.is_spectrum or tex2.is_spectrum

    def evaluate(self, si, ctx):
        a = self.tex1.evaluate(si, ctx)
        b = self.tex2.evaluate(si, ctx)
        if a.ndim < b.ndim:
            a = a[..., None]
        if b.ndim < a.ndim:
            b = b[..., None]
        return a * b


class MixTexture(Texture):
    def __init__(self, tex1, tex2, amount):
        self.tex1, self.tex2, self.amount = tex1, tex2, amount
        self.is_spectrum = tex1.is_spectrum

    def evaluate(self, si, ctx):
        t1 = self.tex1.evaluate(si, ctx)
        t2 = self.tex2.evaluate(si, ctx)
        amt = self.amount.evaluate(si, ctx)
        if t1.ndim > amt.ndim:
            amt = amt[..., None]
        return (1.0 - amt) * t1 + amt * t2


class UVTexture(Texture):
    def __init__(self, mapping=None):
        self.mapping = mapping or UVMapping2D()

    def evaluate(self, si, ctx):
        st, _, _ = self.mapping.map(si)
        return jnp.stack([st[..., 0] - jnp.floor(st[..., 0]),
                          st[..., 1] - jnp.floor(st[..., 1]),
                          jnp.zeros_like(st[..., 0])], axis=-1)


class CheckerboardTexture(Texture):
    """2D checkerboard (texture/checkerboard.rs), point-sampled ("none" AA;
    the ClosedForm option averages via the footprint — approximated by
    supersampling the corners of the footprint)."""

    def __init__(self, tex1, tex2, mapping=None, aa="closedform"):
        self.tex1, self.tex2 = tex1, tex2
        self.mapping = mapping or UVMapping2D()
        self.aa = aa
        self.is_spectrum = tex1.is_spectrum

    def evaluate(self, si, ctx):
        st, dst0, dst1 = self.mapping.map(si)
        t1 = self.tex1.evaluate(si, ctx)
        t2 = self.tex2.evaluate(si, ctx)

        def point_val(stp):
            parity = (jnp.floor(stp[..., 0]) + jnp.floor(stp[..., 1])) % 2.0
            sel = parity == 0.0
            if t1.ndim > sel.ndim:
                return jnp.where(sel[..., None], t1, t2)
            return jnp.where(sel, t1, t2)

        if self.aa == "none":
            return point_val(st)
        # closed-form box filter (checkerboard.rs ClosedForm): fraction of the
        # axis-aligned footprint covered by odd checks, per PBRT's bump-int
        ds = jnp.maximum(jnp.abs(dst0[..., 0]), jnp.abs(dst1[..., 0]))
        dt = jnp.maximum(jnp.abs(dst0[..., 1]), jnp.abs(dst1[..., 1]))
        s0, s1 = st[..., 0] - ds, st[..., 0] + ds
        t0, t1v = st[..., 1] - dt, st[..., 1] + dt
        inside = (jnp.floor(s0) == jnp.floor(s1)) & (jnp.floor(t0) == jnp.floor(t1v))
        bumpint = lambda x: jnp.floor(x / 2.0) + 2.0 * jnp.maximum(
            x / 2.0 - jnp.floor(x / 2.0) - 0.5, 0.0)
        sint = (bumpint(s1) - bumpint(s0)) / jnp.maximum(2.0 * ds, 1e-8)
        tint = (bumpint(t1v) - bumpint(t0)) / jnp.maximum(2.0 * dt, 1e-8)
        area2 = sint + tint - 2.0 * sint * tint  # fraction of tex2 (odd checks)
        area2 = jnp.where(ds * dt > 1.0, 0.5, area2)
        pv = point_val(st)
        if t1.ndim > area2.ndim:
            area2 = area2[..., None]
            inside = inside[..., None]
        filtered = (1.0 - area2) * t1 + area2 * t2
        return jnp.where(inside, pv, filtered)


class FbmTexture(Texture):
    def __init__(self, octaves=8, roughness=0.5, mapping=None, is_spectrum=False):
        self.octaves = int(octaves)
        self.roughness = float(roughness)
        self.mapping = mapping or IdentityMapping3D()
        self.is_spectrum = is_spectrum

    def evaluate(self, si, ctx):
        p, dpdx, dpdy = self.mapping.map(si)
        v = fbm(p, dpdx, dpdy, self.roughness, self.octaves)
        if self.is_spectrum:
            return jnp.stack([v, v, v], axis=-1)
        return v


class WrinkledTexture(Texture):
    def __init__(self, octaves=8, roughness=0.5, mapping=None, is_spectrum=False):
        self.octaves = int(octaves)
        self.roughness = float(roughness)
        self.mapping = mapping or IdentityMapping3D()
        self.is_spectrum = is_spectrum

    def evaluate(self, si, ctx):
        p, dpdx, dpdy = self.mapping.map(si)
        v = turbulence(p, dpdx, dpdy, self.roughness, self.octaves)
        if self.is_spectrum:
            return jnp.stack([v, v, v], axis=-1)
        return v


class WindyTexture(Texture):
    def __init__(self, mapping=None, is_spectrum=False):
        self.mapping = mapping or IdentityMapping3D()
        self.is_spectrum = is_spectrum

    def evaluate(self, si, ctx):
        p, dpdx, dpdy = self.mapping.map(si)
        wind = fbm(0.1 * p, 0.1 * dpdx, 0.1 * dpdy, 0.5, 3)
        wave = fbm(p, dpdx, dpdy, 0.5, 6)
        v = jnp.abs(wind) * wave
        if self.is_spectrum:
            return jnp.stack([v, v, v], axis=-1)
        return v


class MarbleTexture(Texture):
    is_spectrum = True

    def __init__(self, octaves=8, roughness=0.5, scale=1.0, variation=0.2,
                 mapping=None):
        self.octaves = int(octaves)
        self.roughness = float(roughness)
        self.scale = float(scale)
        self.variation = float(variation)
        self.mapping = mapping or IdentityMapping3D()

    def evaluate(self, si, ctx):
        p, dpdx, dpdy = self.mapping.map(si)
        p = p * self.scale
        marble = p[..., 1] + self.variation * fbm(
            p, dpdx * self.scale, dpdy * self.scale, self.roughness, self.octaves)
        t = 0.5 + 0.5 * jnp.sin(marble)
        # simple two-tone marble spline (PBRT uses a 9-point spline; two-tone
        # with mid-band keeps the look and stays cheap)
        c0 = jnp.asarray([0.58, 0.58, 0.6])
        c1 = jnp.asarray([0.88, 0.85, 0.82])
        return c0 + t[..., None] * (c1 - c0)


class ImageTexture(Texture):
    """Mip-mapped image texture (texture/imagemap.rs). The pyramid lives in
    ctx.textures['images'][image_id] (a list of level arrays)."""

    def __init__(self, image_id, mapping=None, trilinear=False, max_aniso=8.0,
                 wrap=WRAP_REPEAT, scale=1.0, is_spectrum=True):
        self.image_id = image_id
        self.mapping = mapping or UVMapping2D()
        self.trilinear = trilinear
        self.max_aniso = max_aniso
        self.wrap = wrap
        self.scale = scale
        self.is_spectrum = is_spectrum

    def evaluate(self, si, ctx):
        # shared-atlas fast path: MaterialSet.shade pre-computed this
        # texture's value for the current wavefront (scene/atlas.py); the
        # uv identity check rejects shifted evaluations (bump offsets)
        cache = ctx.textures.get("_atlas_cache") \
            if isinstance(ctx.textures, dict) else None
        if cache is not None and cache[0] is si.uv:
            v = cache[1].get(id(self))
            if v is not None:
                return v if self.is_spectrum else v[..., 0]
        pyramid = ctx.textures["images"][self.image_id]
        st, dst0, dst1 = self.mapping.map(si)
        if self.trilinear:
            width = 2.0 * jnp.maximum(
                jnp.max(jnp.abs(dst0), axis=-1), jnp.max(jnp.abs(dst1), axis=-1))
            v = lookup_trilinear(pyramid, st, width, self.wrap)
        elif self.max_aniso > 8.0:
            # high-anisotropy request: the 8-tap approximation diverges past
            # ~8:1, switch to the masked true-EWA texel loop
            v = lookup_ewa_exact(pyramid, st, dst0, dst1, self.max_aniso,
                                 self.wrap)
        else:
            v = lookup_ewa(pyramid, st, dst0, dst1, self.max_aniso, self.wrap)
        v = v * self.scale
        if self.is_spectrum:
            if v.shape[-1] == 1:
                v = jnp.repeat(v, 3, axis=-1)
            return v
        return v[..., 0]
