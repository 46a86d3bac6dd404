"""Surface property assembly: material table + textures -> SurfaceProperties.

Port of GetSurfaceProperties (PathTracer.lib.hlsl:318-381) and the per-property
texture getters (Material.hlsli:98-262), vectorized over hits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gltf_renderer_tpu.ops.bsdf import MINIMUM_ROUGHNESS, SurfaceProperties
from gltf_renderer_tpu.ops.texture import sample_texture
from gltf_renderer_tpu.scene import types as T
from gltf_renderer_tpu.utils.math import dot, normalize, reflect, saturate
from gltf_renderer_tpu.scene.types import (
    ALPHA_MODE_BLEND,
    ALPHA_MODE_MASK,
)


def slot_sample(materials, textures, mat_id, slot, uv0, uv1):
    """Sample one material texture slot for a batch of hits. Returns (rgba, present)."""
    tid = materials.tex_index[mat_id, slot]
    uvset = materials.tex_uvset[mat_id, slot]
    rot = materials.tex_rotation[mat_id, slot]
    off = materials.tex_offset[mat_id, slot]
    scl = materials.tex_scale[mat_id, slot]
    uv = jnp.where((uvset == 1)[..., None], uv1, uv0)
    rgba = sample_texture(textures, tid, uv, rot, off, scl)
    return rgba, tid >= 0


def get_base_color(materials, textures, mat_id, uv0, uv1, vertex_color):
    """Material.hlsli GetBaseColor:98-106."""
    base = materials.base_color_factor[mat_id] * vertex_color
    rgba, _ = slot_sample(materials, textures, mat_id, T.TEX_ALBEDO, uv0, uv1)
    return base * rgba


def get_alpha(materials, mat_id, base_color):
    """Material.hlsli GetAlpha:108-117."""
    mode = materials.alpha_mode[mat_id]
    cutoff = materials.alpha_cutoff[mat_id]
    a = base_color[..., 3]
    return jnp.where(
        mode == ALPHA_MODE_BLEND,
        a,
        jnp.where(mode == ALPHA_MODE_MASK, jnp.where(a < cutoff, 0.0, 1.0), 1.0),
    )


def _perturb_normal(sample_rgb, present, scale, base_normal, t2w_t, t2w_b, t2w_n):
    nm = sample_rgb * 2.0 - 1.0
    nm = jnp.concatenate([nm[..., 0:2] * scale[..., None], nm[..., 2:3]], -1)
    n = nm[..., 0:1] * t2w_t + nm[..., 1:2] * t2w_b + nm[..., 2:3] * t2w_n
    n = normalize(n)
    return jnp.where(present[..., None], n, base_normal)


def normal_adaptation(ng, ns, v):
    """Iray local shading-normal adaptation (PathTracer.lib.hlsl:304-316)."""
    r = reflect(-v, ns)
    r_dot_ng = dot(r, ng)
    adapted = normalize(v + normalize(r - r_dot_ng * ng))
    return jnp.where(r_dot_ng < 0.0, adapted, ns)


class SurfaceExtras(NamedTuple):
    emissive: jnp.ndarray   # (R, 3)
    occlusion: jnp.ndarray  # (R,)
    base_color: jnp.ndarray  # (R, 4)
    flags: jnp.ndarray      # (R,) material flags
    alpha_mode: jnp.ndarray  # (R,)
    alpha_cutoff: jnp.ndarray  # (R,)


def get_surface_properties(
    materials,
    textures,
    mat_id,
    uv0,
    uv1,
    vertex_color,
    normal,            # (R, 3) interpolated shading-basis normal (world)
    tangent,           # (R, 4) world tangent + winding
    bitangent,         # (R, 3)
    geometric_normal,  # (R, 3)
    view,              # (R, 3) unit, toward camera
    use_geometric_normals: bool = False,
    shading_normal_adaptation: bool = True,
):
    """Returns (SurfaceProperties, SurfaceExtras)."""
    base_color = get_base_color(materials, textures, mat_id, uv0, uv1, vertex_color)
    albedo = base_color[..., :3]
    alpha = get_alpha(materials, mat_id, base_color)

    # Shading normal (Material.hlsli GetShadingNormal:119-128).
    nrm_s, nrm_p = slot_sample(materials, textures, mat_id, T.TEX_NORMAL, uv0, uv1)
    shading_normal = _perturb_normal(
        nrm_s[..., :3], nrm_p, materials.normal_scale[mat_id], normal,
        tangent[..., :3], bitangent, normal,
    )
    if shading_normal_adaptation:
        shading_normal = normal_adaptation(geometric_normal, shading_normal, view)

    # Metalness / roughness.
    mr_s, mr_p = slot_sample(materials, textures, mat_id, T.TEX_METALLIC_ROUGHNESS, uv0, uv1)
    metalness = materials.metalness_factor[mat_id] * mr_s[..., 2]
    roughness = materials.roughness_factor[mat_id] * mr_s[..., 1]
    rough2 = jnp.maximum(roughness * roughness, MINIMUM_ROUGHNESS)

    # Occlusion (Material.hlsli:142-150).
    occ_s, occ_p = slot_sample(materials, textures, mat_id, T.TEX_OCCLUSION, uv0, uv1)
    occlusion = jnp.where(
        occ_p, 1.0 + materials.occlusion_factor[mat_id] * (occ_s[..., 0] - 1.0), 1.0
    )

    # Emissive.
    em_s, _ = slot_sample(materials, textures, mat_id, T.TEX_EMISSIVE, uv0, uv1)
    emissive = materials.emissive_factor[mat_id] * em_s[..., :3]

    ior = materials.ior[mat_id]

    sp_s, _ = slot_sample(materials, textures, mat_id, T.TEX_SPECULAR, uv0, uv1)
    specular_factor = materials.specular_factor[mat_id] * sp_s[..., 3]
    spc_s, _ = slot_sample(materials, textures, mat_id, T.TEX_SPECULAR_COLOR, uv0, uv1)
    specular_color = materials.specular_color_factor[mat_id] * spc_s[..., :3]

    cc_s, _ = slot_sample(materials, textures, mat_id, T.TEX_CLEARCOAT, uv0, uv1)
    clearcoat = materials.clearcoat_factor[mat_id] * cc_s[..., 0]
    ccr_s, _ = slot_sample(materials, textures, mat_id, T.TEX_CLEARCOAT_ROUGHNESS, uv0, uv1)
    clearcoat_roughness = materials.clearcoat_roughness_factor[mat_id] * ccr_s[..., 1]
    ccn_s, ccn_p = slot_sample(materials, textures, mat_id, T.TEX_CLEARCOAT_NORMAL, uv0, uv1)
    clearcoat_normal = _perturb_normal(
        ccn_s[..., :3], ccn_p, materials.clearcoat_normal_scale[mat_id], normal,
        tangent[..., :3], bitangent, normal,
    )
    if shading_normal_adaptation:
        clearcoat_normal = normal_adaptation(geometric_normal, clearcoat_normal, view)

    # Anisotropy (Material.hlsli:245-262).
    an_s, an_p = slot_sample(materials, textures, mat_id, T.TEX_ANISOTROPY, uv0, uv1)
    an_tex = jnp.where(
        an_p[..., None],
        jnp.concatenate([an_s[..., 0:2] * 2.0 - 1.0, an_s[..., 2:3]], -1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 1.0]), an_s[..., :3].shape),
    )
    a_rot = materials.anisotropy_rotation[mat_id]
    ca, sa = jnp.cos(a_rot), jnp.sin(a_rot)
    adx = ca * an_tex[..., 0] - sa * an_tex[..., 1]
    ady = sa * an_tex[..., 0] + ca * an_tex[..., 1]
    a_dir = normalize(jnp.stack([adx, ady], -1))
    a_strength = materials.anisotropy_strength[mat_id] * an_tex[..., 2]

    # Shading tangent frame (Material.hlsli:264-280).
    shading_bitangent = normalize(jnp.cross(shading_normal, tangent[..., :3]))
    shading_tangent = normalize(jnp.cross(shading_bitangent, shading_normal))
    shading_bitangent = shading_bitangent * tangent[..., 3:4]

    anis_tangent = normalize(
        a_dir[..., 0:1] * shading_tangent + a_dir[..., 1:2] * shading_bitangent
    )
    anis_bitangent = normalize(jnp.cross(anis_tangent, shading_normal))
    rough2_t = jnp.maximum(
        rough2 + (1.0 - rough2) * a_strength * a_strength, MINIMUM_ROUGHNESS
    )

    shc_s, _ = slot_sample(materials, textures, mat_id, T.TEX_SHEEN_COLOR, uv0, uv1)
    sheen_color = materials.sheen_color_factor[mat_id] * shc_s[..., :3]
    shr_s, _ = slot_sample(materials, textures, mat_id, T.TEX_SHEEN_ROUGHNESS, uv0, uv1)
    sheen_roughness = materials.sheen_roughness_factor[mat_id] * shr_s[..., 3]
    sheen_rough2 = jnp.maximum(sheen_roughness * sheen_roughness, MINIMUM_ROUGHNESS)

    tr_s, _ = slot_sample(materials, textures, mat_id, T.TEX_TRANSMISSION, uv0, uv1)
    transmissive = materials.transmission_factor[mat_id] * tr_s[..., 0]

    th_s, _ = slot_sample(materials, textures, mat_id, T.TEX_THICKNESS, uv0, uv1)
    thickness = materials.thickness_factor[mat_id] * th_s[..., 1]

    if use_geometric_normals:
        shading_normal = geometric_normal
        clearcoat_normal = geometric_normal

    sp = SurfaceProperties(
        albedo=albedo,
        alpha=alpha[..., None],
        metalness=metalness[..., None],
        roughness_squared=jnp.stack([rough2_t, rough2], -1),
        shading_normal=shading_normal,
        anisotropy_tangent=anis_tangent,
        anisotropy_bitangent=anis_bitangent,
        ior=ior[..., None],
        specular_color=specular_color,
        specular_factor=specular_factor[..., None],
        clearcoat=clearcoat[..., None],
        clearcoat_roughness=jnp.maximum(clearcoat_roughness, MINIMUM_ROUGHNESS)[..., None],
        clearcoat_normal=clearcoat_normal,
        sheen_color=sheen_color,
        sheen_roughness_squared=sheen_rough2[..., None],
        transmissive=transmissive[..., None],
        thickness=thickness[..., None],
        attenuation_distance=materials.attenuation_distance[mat_id][..., None],
        attenuation_color=materials.attenuation_color[mat_id],
    )
    extras = SurfaceExtras(
        emissive=emissive,
        occlusion=occlusion,
        base_color=base_color,
        flags=materials.flags[mat_id],
        alpha_mode=materials.alpha_mode[mat_id],
        alpha_cutoff=materials.alpha_cutoff[mat_id],
    )
    return sp, extras
