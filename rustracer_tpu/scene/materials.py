"""Materials: texture-driven shaders that fill the batched lobe stack.

Reference: rustracer-core/src/material/ (trait Material::
compute_scattering_functions, mod.rs:40-48, and the 11 concrete materials).
Each material is a static Python object holding texture nodes; `lobe_rows`
evaluates textures for every lane and emits (type, params, active) lobe rows.
`MaterialSet.shade` dispatches over the scene's materials with lane masks —
the switch-free batched shader replacing per-hit arena BxDF allocation.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.interaction import Interaction, make_shading_frame
from ..core.math import cross, dot, normalize
from ..core.spectrum import is_black
from ..ops import bsdf as B
from ..ops.microfacet import BECKMANN, TROWBRIDGE, roughness_to_alpha


def _rows_to_arrays(rows, batch_shape):
    """rows: list of dicts(type=(B,), params=(B,16), active=(B,))."""
    n = len(rows)
    t = jnp.stack([r["type"] for r in rows], axis=-1) if n else \
        jnp.zeros(batch_shape + (0,), jnp.int32)
    p = jnp.stack([r["params"] for r in rows], axis=-2) if n else \
        jnp.zeros(batch_shape + (0, 16), jnp.float32)
    a = jnp.stack([r["active"] for r in rows], axis=-1) if n else \
        jnp.zeros(batch_shape + (0,), bool)
    return t, p, a


def _mk_params(batch_shape, pa=None, pb=None, pc=None, s0=None, s1=None,
               s2=None, s3=None, s4=None, s5=None, s6=None):
    p = jnp.zeros(batch_shape + (16,), jnp.float32)
    def bc(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.float32), batch_shape)
    if pa is not None:
        p = p.at[..., 0:3].set(jnp.broadcast_to(pa, batch_shape + (3,)))
    if pb is not None:
        p = p.at[..., 3:6].set(jnp.broadcast_to(pb, batch_shape + (3,)))
    if pc is not None:
        p = p.at[..., 6:9].set(jnp.broadcast_to(pc, batch_shape + (3,)))
    for i, s in enumerate([s0, s1, s2, s3, s4, s5, s6]):
        if s is not None:
            p = p.at[..., 9 + i].set(bc(s))
    return p


class Material:
    """Base. Subclasses define lobe_rows() and lobe type inventory."""
    bump_tex = None

    def lobe_rows(self, si, ctx) -> List[dict]:
        raise NotImplementedError

    def lobe_types(self) -> set:
        raise NotImplementedError

    def eta_value(self, si, ctx):
        return jnp.ones_like(si.t)

    def apply_bump(self, si: Interaction, ctx) -> Interaction:
        """Finite-difference bump mapping (material/mod.rs:50-92)."""
        if self.bump_tex is None:
            return si
        d = self.bump_tex
        du = 0.5 * (jnp.abs(si.dudx) + jnp.abs(si.dudy))
        du = jnp.where(du == 0.0, 0.0005, du)
        dv = 0.5 * (jnp.abs(si.dvdx) + jnp.abs(si.dvdy))
        dv = jnp.where(dv == 0.0, 0.0005, dv)

        def shifted(si, dp, duv):
            return si._replace(p=si.p + dp, uv=si.uv + duv)

        si_u = shifted(si, du[..., None] * si.dpdu,
                       jnp.stack([du, jnp.zeros_like(du)], -1))
        si_v = shifted(si, dv[..., None] * si.dpdv,
                       jnp.stack([jnp.zeros_like(dv), dv], -1))
        disp = d.evaluate(si, ctx)
        disp_u = d.evaluate(si_u, ctx)
        disp_v = d.evaluate(si_v, ctx)
        dddu = (disp_u - disp) / du
        dddv = (disp_v - disp) / dv
        dpdu = si.dpdu + dddu[..., None] * si.ns
        dpdv = si.dpdv + dddv[..., None] * si.ns
        ns = normalize(cross(dpdu, dpdv))
        # keep orientation consistent with the geometric normal
        ns = jnp.where(dot(ns, si.n)[..., None] < 0.0, -ns, ns)
        ss, ts = make_shading_frame(ns, dpdu)
        return si._replace(ns=ns, ss=ss, ts=ts)


class MatteMaterial(Material):
    """material/matte.rs:36-63 — Lambertian or Oren-Nayar by sigma."""

    def __init__(self, kd, sigma=None, bump=None):
        self.kd = kd
        self.sigma = sigma
        self.bump_tex = bump

    def lobe_types(self):
        return {B.LAMBERTIAN_REFL, B.OREN_NAYAR} if self.sigma is not None \
            else {B.LAMBERTIAN_REFL}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kd = jnp.clip(self.kd.evaluate(si, ctx), 0.0, None)
        if self.sigma is None:
            return [dict(type=jnp.full(bs, B.LAMBERTIAN_REFL, jnp.int32),
                         params=_mk_params(bs, pa=kd),
                         active=~is_black(kd))]
        sigma = jnp.clip(self.sigma.evaluate(si, ctx), 0.0, 90.0)
        sig_rad = jnp.deg2rad(sigma)
        s2 = sig_rad * sig_rad
        A = 1.0 - s2 / (2.0 * (s2 + 0.33))
        Bc = 0.45 * s2 / (s2 + 0.09)
        ltype = jnp.where(sigma == 0.0, B.LAMBERTIAN_REFL, B.OREN_NAYAR
                          ).astype(jnp.int32)
        return [dict(type=ltype, params=_mk_params(bs, pa=kd, s5=A, s6=Bc),
                     active=~is_black(kd))]


class PlasticMaterial(Material):
    """material/plastic.rs — Lambertian + TR microfacet (eta 1.5)."""

    def __init__(self, kd, ks, roughness, remap_roughness=True, bump=None):
        self.kd, self.ks, self.roughness = kd, ks, roughness
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.LAMBERTIAN_REFL, B.MICROFACET_REFL}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kd = jnp.clip(self.kd.evaluate(si, ctx), 0.0, None)
        ks = jnp.clip(self.ks.evaluate(si, ctx), 0.0, None)
        rough = self.roughness.evaluate(si, ctx)
        alpha = roughness_to_alpha(rough) if self.remap else rough
        return [
            dict(type=jnp.full(bs, B.LAMBERTIAN_REFL, jnp.int32),
                 params=_mk_params(bs, pa=kd), active=~is_black(kd)),
            dict(type=jnp.full(bs, B.MICROFACET_REFL, jnp.int32),
                 params=_mk_params(bs, pa=ks, s0=1.5, s1=alpha, s2=alpha,
                                   s3=TROWBRIDGE, s4=1.0),
                 active=~is_black(ks)),
        ]


class MirrorMaterial(Material):
    """material/mirror.rs — perfect specular reflection, no-op fresnel."""

    def __init__(self, kr, bump=None):
        self.kr = kr
        self.bump_tex = bump

    def lobe_types(self):
        return {B.SPECULAR_REFL}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kr = jnp.clip(self.kr.evaluate(si, ctx), 0.0, None)
        return [dict(type=jnp.full(bs, B.SPECULAR_REFL, jnp.int32),
                     params=_mk_params(bs, pa=kr, s4=0.0),
                     active=~is_black(kr))]


class GlassMaterial(Material):
    """material/glass.rs — specular or microfacet reflect+transmit."""

    def __init__(self, kr, kt, index, urough=None, vrough=None,
                 remap_roughness=True, bump=None):
        self.kr, self.kt, self.index = kr, kt, index
        self.urough, self.vrough = urough, vrough
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.FRESNEL_SPECULAR, B.MICROFACET_REFL, B.MICROFACET_TRANS}

    def eta_value(self, si, ctx):
        return jnp.broadcast_to(self.index.evaluate(si, ctx), si.t.shape)

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kr = jnp.clip(self.kr.evaluate(si, ctx), 0.0, None)
        kt = jnp.clip(self.kt.evaluate(si, ctx), 0.0, None)
        eta = self.index.evaluate(si, ctx)
        if self.urough is None:
            urough = jnp.zeros(bs)
            vrough = jnp.zeros(bs)
        else:
            urough = self.urough.evaluate(si, ctx)
            vrough = self.vrough.evaluate(si, ctx)
        smooth = (urough == 0.0) & (vrough == 0.0)
        ax = roughness_to_alpha(urough) if self.remap else urough
        ay = roughness_to_alpha(vrough) if self.remap else vrough
        row1_type = jnp.where(smooth, B.FRESNEL_SPECULAR, B.MICROFACET_REFL
                              ).astype(jnp.int32)
        rows = [
            dict(type=row1_type,
                 params=_mk_params(bs, pa=kr, pb=kt, s0=eta, s1=ax, s2=ay,
                                   s3=TROWBRIDGE, s4=1.0),
                 active=~(is_black(kr) & is_black(kt))),
            dict(type=jnp.full(bs, B.MICROFACET_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=kt, s0=eta, s1=ax, s2=ay,
                                   s3=TROWBRIDGE),
                 active=(~smooth) & ~is_black(kt)),
        ]
        return rows


class MetalMaterial(Material):
    """material/metal.rs — conductor microfacet."""

    def __init__(self, eta, k, roughness, urough=None, vrough=None,
                 remap_roughness=True, bump=None):
        self.eta, self.k = eta, k          # spectrum textures
        self.roughness = roughness
        self.urough, self.vrough = urough, vrough
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.MICROFACET_REFL}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        eta = self.eta.evaluate(si, ctx)
        k = self.k.evaluate(si, ctx)
        ur = (self.urough or self.roughness).evaluate(si, ctx)
        vr = (self.vrough or self.roughness).evaluate(si, ctx)
        ax = roughness_to_alpha(ur) if self.remap else ur
        ay = roughness_to_alpha(vr) if self.remap else vr
        one = jnp.ones(bs + (3,), jnp.float32)
        return [dict(type=jnp.full(bs, B.MICROFACET_REFL, jnp.int32),
                     params=_mk_params(bs, pa=one, pb=eta, pc=k, s1=ax, s2=ay,
                                       s3=TROWBRIDGE, s4=2.0),
                     active=jnp.ones(bs, bool))]


class SubstrateMaterial(Material):
    """material/substrate.rs — Ashikhmin-Shirley FresnelBlend."""

    def __init__(self, kd, ks, urough, vrough, remap_roughness=True, bump=None):
        self.kd, self.ks = kd, ks
        self.urough, self.vrough = urough, vrough
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.FRESNEL_BLEND}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kd = jnp.clip(self.kd.evaluate(si, ctx), 0.0, None)
        ks = jnp.clip(self.ks.evaluate(si, ctx), 0.0, None)
        ur = self.urough.evaluate(si, ctx)
        vr = self.vrough.evaluate(si, ctx)
        ax = roughness_to_alpha(ur) if self.remap else ur
        ay = roughness_to_alpha(vr) if self.remap else vr
        return [dict(type=jnp.full(bs, B.FRESNEL_BLEND, jnp.int32),
                     params=_mk_params(bs, pa=kd, pb=ks, s1=ax, s2=ay,
                                       s3=TROWBRIDGE),
                     active=~(is_black(kd) & is_black(ks)))]


class TranslucentMaterial(Material):
    """material/translucent.rs — diffuse+glossy reflect/transmit split."""

    def __init__(self, kd, ks, roughness, reflect, transmit,
                 remap_roughness=True, bump=None):
        self.kd, self.ks, self.roughness = kd, ks, roughness
        self.reflect, self.transmit = reflect, transmit
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.LAMBERTIAN_REFL, B.LAMBERTIAN_TRANS,
                B.MICROFACET_REFL, B.MICROFACET_TRANS}

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kd = jnp.clip(self.kd.evaluate(si, ctx), 0.0, None)
        ks = jnp.clip(self.ks.evaluate(si, ctx), 0.0, None)
        r = jnp.clip(self.reflect.evaluate(si, ctx), 0.0, None)
        t = jnp.clip(self.transmit.evaluate(si, ctx), 0.0, None)
        rough = self.roughness.evaluate(si, ctx)
        alpha = roughness_to_alpha(rough) if self.remap else rough
        return [
            dict(type=jnp.full(bs, B.LAMBERTIAN_REFL, jnp.int32),
                 params=_mk_params(bs, pa=kd * r), active=~is_black(kd * r)),
            dict(type=jnp.full(bs, B.LAMBERTIAN_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=kd * t), active=~is_black(kd * t)),
            dict(type=jnp.full(bs, B.MICROFACET_REFL, jnp.int32),
                 params=_mk_params(bs, pa=ks * r, s0=1.5, s1=alpha, s2=alpha,
                                   s3=TROWBRIDGE, s4=1.0),
                 active=~is_black(ks * r)),
            dict(type=jnp.full(bs, B.MICROFACET_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=ks * t, s0=1.5, s1=alpha, s2=alpha,
                                   s3=TROWBRIDGE),
                 active=~is_black(ks * t)),
        ]


class UberMaterial(Material):
    """material/uber.rs — Kd/Ks/Kr/Kt/opacity kitchen sink."""

    def __init__(self, kd, ks, kr, kt, roughness, urough=None, vrough=None,
                 opacity=None, eta=None, remap_roughness=True, bump=None):
        self.kd, self.ks, self.kr, self.kt = kd, ks, kr, kt
        self.roughness = roughness
        self.urough, self.vrough = urough, vrough
        self.opacity = opacity
        self.eta = eta
        self.remap = remap_roughness
        self.bump_tex = bump

    def lobe_types(self):
        return {B.SPECULAR_TRANS, B.LAMBERTIAN_REFL, B.MICROFACET_REFL,
                B.SPECULAR_REFL}

    def eta_value(self, si, ctx):
        if self.eta is None:
            return jnp.full(si.t.shape, 1.5)
        return jnp.broadcast_to(self.eta.evaluate(si, ctx), si.t.shape)

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        kd = jnp.clip(self.kd.evaluate(si, ctx), 0.0, None)
        ks = jnp.clip(self.ks.evaluate(si, ctx), 0.0, None)
        kr = jnp.clip(self.kr.evaluate(si, ctx), 0.0, None)
        kt = jnp.clip(self.kt.evaluate(si, ctx), 0.0, None)
        op = jnp.clip(self.opacity.evaluate(si, ctx), 0.0, 1.0) \
            if self.opacity is not None else jnp.ones(bs + (3,))
        eta = self.eta_value(si, ctx)
        ur = (self.urough or self.roughness).evaluate(si, ctx)
        vr = (self.vrough or self.roughness).evaluate(si, ctx)
        ax = roughness_to_alpha(ur) if self.remap else ur
        ay = roughness_to_alpha(vr) if self.remap else vr
        one_m_op = 1.0 - op
        return [
            # opacity pass-through (eta=1 specular transmission)
            dict(type=jnp.full(bs, B.SPECULAR_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=one_m_op, s0=1.0),
                 active=~is_black(one_m_op)),
            dict(type=jnp.full(bs, B.LAMBERTIAN_REFL, jnp.int32),
                 params=_mk_params(bs, pa=op * kd), active=~is_black(op * kd)),
            dict(type=jnp.full(bs, B.MICROFACET_REFL, jnp.int32),
                 params=_mk_params(bs, pa=op * ks, s0=eta, s1=ax, s2=ay,
                                   s3=TROWBRIDGE, s4=1.0),
                 active=~is_black(op * ks)),
            dict(type=jnp.full(bs, B.SPECULAR_REFL, jnp.int32),
                 params=_mk_params(bs, pa=op * kr, s0=eta, s4=1.0),
                 active=~is_black(op * kr)),
            dict(type=jnp.full(bs, B.SPECULAR_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=op * kt, s0=eta),
                 active=~is_black(op * kt)),
        ]


class DisneyMaterial(Material):
    """material/disney.rs:22-538 (no SSS/BSSRDF, matching the reference)."""

    def __init__(self, color, metallic, eta, roughness, specular_tint,
                 anisotropic, sheen, sheen_tint, clearcoat, clearcoat_gloss,
                 spec_trans, flatness=None, diff_trans=None, thin=False,
                 bump=None):
        self.color, self.metallic, self.eta = color, metallic, eta
        self.roughness = roughness
        self.specular_tint, self.anisotropic = specular_tint, anisotropic
        self.sheen, self.sheen_tint = sheen, sheen_tint
        self.clearcoat, self.clearcoat_gloss = clearcoat, clearcoat_gloss
        self.spec_trans = spec_trans
        self.flatness, self.diff_trans = flatness, diff_trans
        self.thin = thin
        self.bump_tex = bump

    def lobe_types(self):
        t = {B.DISNEY_DIFFUSE, B.DISNEY_RETRO, B.DISNEY_SHEEN,
             B.MICROFACET_REFL, B.DISNEY_CLEARCOAT, B.MICROFACET_TRANS}
        if self.thin:
            t |= {B.DISNEY_FAKE_SS, B.LAMBERTIAN_TRANS}
        return t

    def eta_value(self, si, ctx):
        return jnp.broadcast_to(self.eta.evaluate(si, ctx), si.t.shape)

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        c = jnp.clip(self.color.evaluate(si, ctx), 0.0, None)
        metallic = self.metallic.evaluate(si, ctx)
        eta = self.eta.evaluate(si, ctx)
        strans = self.spec_trans.evaluate(si, ctx)
        rough = self.roughness.evaluate(si, ctx)
        dt = self.diff_trans.evaluate(si, ctx) / 2.0 \
            if self.diff_trans is not None else jnp.zeros(bs)
        diff_weight = (1.0 - metallic) * (1.0 - strans)
        lum = jnp.sum(c * jnp.asarray([0.212671, 0.715160, 0.072169]), -1)
        ctint = jnp.where(lum[..., None] > 0.0,
                          c / jnp.maximum(lum[..., None], 1e-8), 1.0)
        sheen_w = self.sheen.evaluate(si, ctx)
        stint = self.sheen_tint.evaluate(si, ctx)
        csheen = (1.0 - stint)[..., None] + stint[..., None] * ctint
        if self.thin:
            flat = self.flatness.evaluate(si, ctx) \
                if self.flatness is not None else jnp.zeros(bs)
            diff_scale = diff_weight * (1.0 - flat) * (1.0 - dt)
            ss_scale = diff_weight * flat * (1.0 - dt)
        else:
            flat = jnp.zeros(bs)
            diff_scale = diff_weight
            ss_scale = jnp.zeros(bs)
        # microfacet distribution
        aniso = self.anisotropic.evaluate(si, ctx)
        aspect = jnp.sqrt(jnp.maximum(1.0 - 0.9 * aniso, 1e-4))
        ax = jnp.maximum(1e-3, rough * rough / aspect)
        ay = jnp.maximum(1e-3, rough * rough * aspect)
        # cspec0 for DisneyFresnel
        spec_tint = self.specular_tint.evaluate(si, ctx)
        r0_eta = ((eta - 1.0) / (eta + 1.0)) ** 2
        cspec0 = (1.0 - metallic[..., None]) * r0_eta[..., None] * \
            ((1.0 - spec_tint)[..., None] + spec_tint[..., None] * ctint) + \
            metallic[..., None] * c
        cc = self.clearcoat.evaluate(si, ctx)
        gloss = self.clearcoat_gloss.evaluate(si, ctx)
        gloss = (1.0 - gloss) * 0.1 + gloss * 0.001
        one3 = jnp.ones(bs + (3,), jnp.float32)
        rows = [
            dict(type=jnp.full(bs, B.DISNEY_DIFFUSE, jnp.int32),
                 params=_mk_params(bs, pa=diff_scale[..., None] * c),
                 active=diff_weight > 0.0),
            dict(type=jnp.full(bs, B.DISNEY_RETRO, jnp.int32),
                 params=_mk_params(bs, pa=diff_scale[..., None] * c, s5=rough),
                 active=diff_weight > 0.0),
            dict(type=jnp.full(bs, B.DISNEY_SHEEN, jnp.int32),
                 params=_mk_params(bs, pa=(diff_weight * sheen_w)[..., None] * csheen),
                 active=(diff_weight * sheen_w) > 0.0),
            dict(type=jnp.full(bs, B.MICROFACET_REFL, jnp.int32),
                 params=_mk_params(bs, pa=one3, pc=cspec0, s0=eta, s1=ax,
                                   s2=ay, s3=TROWBRIDGE, s4=3.0, s5=metallic),
                 active=jnp.ones(bs, bool)),
            dict(type=jnp.full(bs, B.DISNEY_CLEARCOAT, jnp.int32),
                 params=_mk_params(bs, pa=jnp.stack([cc, cc, cc], -1), s6=gloss),
                 active=cc > 0.0),
            dict(type=jnp.full(bs, B.MICROFACET_TRANS, jnp.int32),
                 params=_mk_params(bs, pa=strans[..., None] * jnp.sqrt(jnp.maximum(c, 0.0)),
                                   s0=eta, s1=ax, s2=ay, s3=TROWBRIDGE),
                 active=strans > 0.0),
        ]
        if self.thin:
            rows.append(dict(
                type=jnp.full(bs, B.DISNEY_FAKE_SS, jnp.int32),
                params=_mk_params(bs, pa=ss_scale[..., None] * c, s5=rough),
                active=ss_scale > 0.0))
            rows.append(dict(
                type=jnp.full(bs, B.LAMBERTIAN_TRANS, jnp.int32),
                params=_mk_params(bs, pa=dt[..., None] * c),
                active=dt > 0.0))
        return rows


class FourierMaterial(Material):
    """material/fourier.rs — measured layered BSDF from a .bsdf table.

    The table itself travels in ctx.textures["fourier"] (a FourierTableSet);
    params slot 15 carries this material's table id.
    """

    def __init__(self, table_id: int, eta: float = 1.0, bump=None):
        self.table_id = int(table_id)
        self.eta = float(eta)
        self.bump_tex = bump

    def lobe_types(self):
        return {B.FOURIER}

    def eta_value(self, si, ctx):
        return jnp.full(si.t.shape, self.eta, jnp.float32)

    def lobe_rows(self, si, ctx):
        bs = si.t.shape
        return [dict(type=jnp.full(bs, B.FOURIER, jnp.int32),
                     params=_mk_params(bs, s0=self.eta,
                                       s6=float(self.table_id)),
                     active=jnp.ones(bs, bool))]


class MixMaterial(Material):
    """material/mixmat.rs — scaled blend of two materials' lobe stacks."""

    def __init__(self, m1: Material, m2: Material, amount):
        self.m1, self.m2, self.amount = m1, m2, amount

    def lobe_types(self):
        return self.m1.lobe_types() | self.m2.lobe_types()

    def eta_value(self, si, ctx):
        return self.m1.eta_value(si, ctx)

    def lobe_rows(self, si, ctx):
        amt = jnp.clip(self.amount.evaluate(si, ctx), 0.0, 1.0)
        rows1 = self.m1.lobe_rows(si, ctx)
        rows2 = self.m2.lobe_rows(si, ctx)

        def scale(rows, w):
            out = []
            for r in rows:
                p = r["params"]
                p = p.at[..., 0:3].set(p[..., 0:3] * w)
                p = p.at[..., 3:6].set(p[..., 3:6] * w)
                out.append(dict(type=r["type"], params=p,
                                active=r["active"] & jnp.any(w > 0.0, -1)))
            return out

        return scale(rows1, amt) + scale(rows2, 1.0 - amt)


def _dummy_si(bs=(1,)):
    """Minimal Interaction batch for structural/uniform material evaluation."""
    z = jnp.zeros(bs, jnp.float32)
    z3 = jnp.zeros(bs + (3,), jnp.float32)
    zhat = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), bs + (3,))
    return Interaction(
        valid=jnp.ones(bs, bool), t=z, p=z3, p_error=z3, wo=zhat, n=zhat,
        uv=jnp.zeros(bs + (2,), jnp.float32), dpdu=z3, dpdv=z3, ns=zhat,
        ss=z3, ts=z3, material=jnp.zeros(bs, jnp.int32),
        arealight=jnp.zeros(bs, jnp.int32), prim_id=jnp.zeros(bs, jnp.int32),
        dudx=z, dvdx=z, dudy=z, dvdy=z, dpdx=z3, dpdy=z3)


class _PermissiveConsts(dict):
    """const-texture dict that yields a SCALAR zero for unknown keys
    (structural row counting only — never used for real shading). A scalar
    broadcasts to both the float-texture shape (bs,) and the spectrum
    shape (bs, 3); the old (3,) default broke broadcasting for every
    float texture (sigma/roughness/...), silently sending ALL materials
    to the conservative 8-row fallback — the lobe stack then ran 8 wide
    on scenes whose true maximum is 1-3 rows."""

    def __missing__(self, key):
        return jnp.zeros((), jnp.float32)


class _PermissiveConsts3(dict):
    """Fallback dummy for materials that require a trailing channel axis
    on a const value (spectral array reads)."""

    def __missing__(self, key):
        return jnp.zeros(3, jnp.float32)


class _PermissiveImages(list):
    def __getitem__(self, i):
        return [jnp.zeros((1, 1, 3), jnp.float32)]


class _DummyCtx:
    textures = {"const": _PermissiveConsts(), "images": _PermissiveImages()}


class _DummyCtx3:
    textures = {"const": _PermissiveConsts3(), "images": _PermissiveImages()}


def _is_uniform(m: Material) -> bool:
    """True when every texture the material evaluates is a ConstantTexture
    and there is no bump map — its lobe rows are identical across lanes, so
    shade() can build them once and gather by material id."""
    from .textures import ConstantTexture, Texture
    if m.bump_tex is not None:
        return False
    for v in vars(m).values():
        if isinstance(v, Material):
            if not _is_uniform(v):
                return False
        elif isinstance(v, Texture) and not isinstance(v, ConstantTexture):
            return False
    return True


class MaterialSet:
    """Static registry: material id → Material; shade() = batched dispatch.

    Dispatch strategy (replaces the reference's per-hit virtual call,
    interaction.rs:192-203): materials whose parameters are lane-invariant
    (constant textures, no bump) are evaluated ONCE per trace into a
    (n_materials, M, …) parameter table and gathered by material id —
    O(types present), not O(n_materials × lanes). Only textured/bumped
    materials pay a full-lane masked evaluation."""

    def __init__(self, materials: Optional[List[Material]] = None):
        self.materials: List[Material] = materials or []

    def add(self, m: Material) -> int:
        self.materials.append(m)
        return len(self.materials) - 1

    @property
    def max_lobes(self):
        n = 1
        for m in self.materials:
            n = max(n, self._n_rows(m))
        return n

    @staticmethod
    def _n_rows(m: Material) -> int:
        """Structural row count: evaluate lobe_rows on a dummy lane (row
        count depends only on material structure, never on texture data)."""
        for ctx in (_DummyCtx(), _DummyCtx3()):
            try:
                return max(1, len(m.lobe_rows(_dummy_si(), ctx)))
            except Exception:
                continue
        if isinstance(m, MixMaterial):
            return MaterialSet._n_rows(m.m1) + MaterialSet._n_rows(m.m2)
        return 8  # conservative fallback

    def types_present(self) -> Tuple[int, ...]:
        s = set()
        for m in self.materials:
            s |= m.lobe_types()
        return tuple(sorted(s)) or (B.LAMBERTIAN_REFL,)

    def atlas_prep(self):
        """Imagemap slot assignment for the shared-atlas fast path
        (scene/atlas.py): per material, its directly-held eligible
        ImageTexture params in attribute order become slots; one EWA
        lookup per SLOT serves every material. → (S, slot_tab (n_mat, S)
        int32 registration ids, registration tables, per-material texture
        lists). Cached (static per scene)."""
        cached = getattr(self, "_atlas_info", None)
        if cached is not None:
            return cached
        from .atlas import build_registrations
        from .textures import ImageTexture, UVMapping2D

        def eligible(t):
            # max_aniso must EQUAL the atlas's hardcoded 8.0 (atlas.py
            # atlas_lookup_ewa): admitting e.g. maxanisotropy 2 would
            # silently filter differently through the atlas than through
            # the per-texture lookup_ewa path
            return (isinstance(t, ImageTexture)
                    and isinstance(t.mapping, UVMapping2D)
                    and not t.trilinear and t.max_aniso == 8.0
                    and isinstance(t.scale, (int, float)))

        per_mat = [[t for t in vars(m).values() if eligible(t)]
                   for m in self.materials]
        S = max((len(t) for t in per_mat), default=0)
        if S == 0:
            self._atlas_info = (0, None, None, per_mat)
            return self._atlas_info
        regs, reg_of = [], {}
        slot_tab = np.full((len(self.materials), S), -1, np.int32)
        for mid, texs in enumerate(per_mat):
            for s, t in enumerate(texs):
                if id(t) not in reg_of:
                    reg_of[id(t)] = len(regs)
                    regs.append(t)
                slot_tab[mid, s] = reg_of[id(t)]
        self._atlas_info = (S, slot_tab, build_registrations(regs), per_mat)
        return self._atlas_info

    def _pad_rows(self, rows, bs, M):
        t_i, p_i, a_i = _rows_to_arrays(rows, bs)
        k = t_i.shape[-1]
        if k < M:
            t_i = jnp.concatenate([t_i, jnp.zeros(bs + (M - k,), jnp.int32)], -1)
            p_i = jnp.concatenate([p_i, jnp.zeros(bs + (M - k, 16))], -2)
            a_i = jnp.concatenate([a_i, jnp.zeros(bs + (M - k,), bool)], -1)
        return t_i, p_i, a_i

    def shade(self, si: Interaction, ctx):
        """→ (si with per-material bump applied, LobeStack)."""
        bs = si.t.shape
        M = self.max_lobes
        uniform = [mid for mid, m in enumerate(self.materials)
                   if _is_uniform(m)]
        textured = [mid for mid in range(len(self.materials))
                    if mid not in set(uniform)]

        lt = jnp.zeros(bs + (M,), jnp.int32)
        lp = jnp.zeros(bs + (M, 16), jnp.float32)
        la = jnp.zeros(bs + (M,), bool)
        eta = jnp.ones(bs, jnp.float32)
        ns, ss, ts = si.ns, si.ss, si.ts

        if uniform:
            # one-lane eval per uniform material → (n_mat, M[, 16]) tables
            one = _dummy_si((1,))
            tab_t, tab_p, tab_a, tab_e = [], [], [], []
            for mid, mat in enumerate(self.materials):
                if mid in set(uniform):
                    t1, p1, a1 = self._pad_rows(mat.lobe_rows(one, ctx),
                                                (1,), M)
                    e1 = jnp.broadcast_to(mat.eta_value(one, ctx), (1,))
                else:
                    t1 = jnp.zeros((1, M), jnp.int32)
                    p1 = jnp.zeros((1, M, 16), jnp.float32)
                    a1 = jnp.zeros((1, M), bool)
                    e1 = jnp.ones((1,), jnp.float32)
                tab_t.append(t1[0])
                tab_p.append(p1[0])
                tab_a.append(a1[0])
                tab_e.append(e1[0])
            tab_t = jnp.stack(tab_t)
            tab_p = jnp.stack(tab_p)
            tab_a = jnp.stack(tab_a)
            tab_e = jnp.stack(tab_e)
            mid_c = jnp.clip(si.material, 0, len(self.materials) - 1)
            lt = tab_t[mid_c]
            lp = tab_p[mid_c]
            la = tab_a[mid_c]
            eta = tab_e[mid_c]

        # shared-atlas fast path: ONE EWA lookup per imagemap parameter
        # slot for the whole wavefront, served to every textured material
        # through a per-material trace-time cache (scene/atlas.py)
        atlas_cache = None
        per_mat_tex = None
        if textured and isinstance(ctx.textures, dict) \
                and "atlas_meta" in ctx.textures:
            S_, slot_tab, regs, per_mat_tex = self.atlas_prep()
            if S_:
                from .atlas import (all_repeat, atlas_lookup_ewa,
                                    atlas_quad_texels, atlas_texels)
                # all-REPEAT scenes (the PBRT default wrap) use the baked
                # 2x2 quad rows: 16 gathers per EWA lookup instead of 64
                use_quad = all_repeat(regs)
                texels = (atlas_quad_texels(ctx.textures["images"])
                          if use_quad else
                          atlas_texels(ctx.textures["images"]))
                midc = jnp.clip(si.material, 0, len(self.materials) - 1)
                slot_j = jnp.asarray(slot_tab)
                atlas_cache = [
                    atlas_lookup_ewa(texels, ctx.textures["atlas_meta"],
                                     ctx.textures["atlas_levels"], regs,
                                     slot_j[midc, s], si, quad=use_quad)
                    for s in range(S_)]

        # try/finally: an exception mid-loop must not leak the tracer-bearing
        # _atlas_cache entry into the shared scene dict (it would poison
        # every subsequent trace with confusing leaked-tracer errors)
        try:
            for mid in textured:
                mat = self.materials[mid]
                sel = si.material == mid
                if atlas_cache is not None:
                    ctx.textures["_atlas_cache"] = (
                        si.uv, {id(t): atlas_cache[s]
                                for s, t in enumerate(per_mat_tex[mid])})
                si_b = mat.apply_bump(si, ctx)
                t_i, p_i, a_i = self._pad_rows(mat.lobe_rows(si_b, ctx), bs, M)
                lt = jnp.where(sel[..., None], t_i, lt)
                lp = jnp.where(sel[..., None, None], p_i, lp)
                la = jnp.where(sel[..., None], a_i, la)
                eta = jnp.where(sel, mat.eta_value(si_b, ctx), eta)
                ns = jnp.where(sel[..., None], si_b.ns, ns)
                ss = jnp.where(sel[..., None], si_b.ss, ss)
                ts = jnp.where(sel[..., None], si_b.ts, ts)
        finally:
            if atlas_cache is not None:
                ctx.textures.pop("_atlas_cache", None)
        # lanes with no material (misses / lights-only prims): inactive
        la = la & (si.material >= 0)[..., None] & si.valid[..., None]
        si = si._replace(ns=ns, ss=ss, ts=ts)
        fourier = None
        if isinstance(ctx.textures, dict):
            fourier = ctx.textures.get("fourier")
        return si, B.LobeStack(type=lt, params=lp, active=la, eta=eta,
                               fourier=fourier)
