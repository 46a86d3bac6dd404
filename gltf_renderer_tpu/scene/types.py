"""Scene data model: host-side (numpy) and device-side (jnp pytree) types.

TPU-native redesign of the reference's scene layer (Gltf.h:16-233, Mesh.h,
Renderer.h:53-171): instead of D3D12 placed buffers + bindless descriptors, the
scene is a struct-of-arrays pytree. "Descriptors" become integer indices into
concatenated pools; the 16-texture bindless material (Material.hlsli:23-66)
becomes a (M, N_TEX_SLOTS) index table into one texture atlas.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple, Optional

import numpy as np

# Texture slots — order mirrors Material.hlsli:35-65.
TEX_NORMAL = 0
TEX_ALBEDO = 1
TEX_METALLIC_ROUGHNESS = 2
TEX_OCCLUSION = 3
TEX_EMISSIVE = 4
TEX_SPECULAR = 5
TEX_SPECULAR_COLOR = 6
TEX_CLEARCOAT = 7
TEX_CLEARCOAT_ROUGHNESS = 8
TEX_CLEARCOAT_NORMAL = 9
TEX_ANISOTROPY = 10
TEX_SHEEN_COLOR = 11
TEX_SHEEN_ROUGHNESS = 12
TEX_TRANSMISSION = 13
TEX_THICKNESS = 14
N_TEX_SLOTS = 15

# Material flags (Material.hlsli:3-6 + Gltf.h:88-92).
MATERIAL_FLAG_DOUBLE_SIDED = 1 << 0
MATERIAL_FLAG_UNLIT = 1 << 1

# Alpha modes (Material.hlsli:8-12).
ALPHA_MODE_OPAQUE = 0
ALPHA_MODE_MASK = 1
ALPHA_MODE_BLEND = 2

# Light types (Lights.hlsli:3-7).
LIGHT_TYPE_POINT = 0
LIGHT_TYPE_SPOT = 1
LIGHT_TYPE_DIRECTIONAL = 2

# Wrap modes (glTF sampler -> resolved at load).
WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2

# Animation paths / interpolation.
PATH_TRANSLATION = 0
PATH_ROTATION = 1
PATH_SCALE = 2
PATH_WEIGHTS = 3
INTERP_STEP = 0
INTERP_LINEAR = 1
INTERP_CUBICSPLINE = 2


class MaterialTable(NamedTuple):
    """SoA mirror of GpuMaterial (Renderer.h:88-171). Index 0 = default material
    (Gltf.cpp:470-474): glTF material i lives at row i+1."""

    flags: Any                 # (M,) int32
    alpha_mode: Any            # (M,) int32
    base_color_factor: Any     # (M, 4) f32
    metalness_factor: Any      # (M,) f32
    roughness_factor: Any      # (M,) f32
    occlusion_factor: Any      # (M,) f32
    emissive_factor: Any       # (M, 3) f32 (pre-multiplied by emissive_strength)
    alpha_cutoff: Any          # (M,) f32 (0 unless MASK — Renderer.h:146)
    ior: Any                   # (M,) f32
    normal_scale: Any          # (M,) f32
    specular_factor: Any       # (M,) f32
    specular_color_factor: Any  # (M, 3) f32
    clearcoat_factor: Any      # (M,) f32
    clearcoat_roughness_factor: Any  # (M,) f32
    clearcoat_normal_scale: Any  # (M,) f32
    anisotropy_strength: Any   # (M,) f32
    anisotropy_rotation: Any   # (M,) f32
    sheen_color_factor: Any    # (M, 3) f32
    sheen_roughness_factor: Any  # (M,) f32
    transmission_factor: Any   # (M,) f32
    thickness_factor: Any      # (M,) f32
    attenuation_distance: Any  # (M,) f32
    attenuation_color: Any     # (M, 3) f32
    # Texture addresses (Material.hlsli TextureAddress:14-21), slot-indexed.
    tex_index: Any             # (M, N_TEX_SLOTS) int32, -1 = absent
    tex_uvset: Any             # (M, N_TEX_SLOTS) int32
    tex_rotation: Any          # (M, N_TEX_SLOTS) f32
    tex_offset: Any            # (M, N_TEX_SLOTS, 2) f32
    tex_scale: Any             # (M, N_TEX_SLOTS, 2) f32


class TextureTable(NamedTuple):
    """One shared u8 RGBA atlas + per-texture addressing metadata.

    The TPU replacement for bindless SRVs (DescriptorAllocator.h): a texture id
    is a row here; sampling gathers 4 texels from `atlas` with per-texture wrap
    and optional sRGB decode (hardware sRGB formats in Gltf.cpp:1048-1078).
    """

    atlas: Any      # (AH, AW, 4) uint8
    x: Any          # (T,) int32 rect origin
    y: Any          # (T,) int32
    width: Any      # (T,) int32
    height: Any     # (T,) int32
    wrap_s: Any     # (T,) int32 (WRAP_*)
    wrap_t: Any     # (T,) int32
    nearest: Any    # (T,) int32 (1 = point filter)
    srgb: Any       # (T,) int32 (decode to linear after fetch, before filter)


class GeometryPools(NamedTuple):
    """Concatenated per-vertex pools (mirrors the sub-allocated mesh buffer,
    Mesh.cpp:113-167) + triangle topology, in object space."""

    positions: Any      # (V, 3) f32
    normals: Any        # (V, 3) f32 — post 10:10:10:2 quantization (parity)
    tangents: Any       # (V, 4) f32 — decoded (includes reference half-turn quirk)
    uv0: Any            # (V, 2) f32
    uv1: Any            # (V, 2) f32
    color: Any          # (V, 4) f32 (u16-normalized at load, Mesh.h formats)
    joints: Any         # (V, 4) int32
    weights: Any        # (V, 4) f32 (u16-quantized to match Skin.cs unpack)
    # Triangles, pool-global vertex ids.
    tri_vertex: Any     # (T, 3) int32
    tri_prim: Any       # (T,) int32 — primitive id per triangle
    # Morph target deltas, concatenated (see Primitive.morph_offset).
    morph_pos: Any      # (VM, 3) f32
    morph_normal: Any   # (VM, 3) f32
    morph_tangent: Any  # (VM, 3) f32


class PrimitiveTable(NamedTuple):
    """Per-primitive metadata (Gltf.h Primitive + Mesh flags)."""

    vertex_offset: Any  # (P,) int32
    vertex_count: Any   # (P,) int32
    tri_offset: Any     # (P,) int32
    tri_count: Any      # (P,) int32
    material: Any       # (P,) int32
    has_tangent_space: Any  # (P,) int32
    has_uv0: Any        # (P,) int32
    has_uv1: Any        # (P,) int32
    has_color: Any      # (P,) int32
    has_joints: Any     # (P,) int32
    morph_offset: Any   # (P,) int32 — start into morph pools (per target block)
    morph_count: Any    # (P,) int32 — number of morph targets


class LightParams(NamedTuple):
    """Static punctual light params (Gltf.cpp:856-882); world position and
    direction are gathered per frame from node transforms (Renderer.cpp:459-492)."""

    type: Any        # (L,) int32
    color: Any       # (L, 3) f32
    intensity: Any   # (L,) f32
    cutoff: Any      # (L,) f32 (range; 0 = unbounded)
    inner_angle: Any  # (L,) f32
    outer_angle: Any  # (L,) f32


class GpuLights(NamedTuple):
    """Per-frame gathered light table (GpuLight, Renderer.h:53-68)."""

    type: Any        # (L,) int32
    position: Any    # (L, 3) f32
    direction: Any   # (L, 3) f32
    color: Any       # (L, 3) f32
    intensity: Any   # (L,) f32
    cutoff: Any      # (L,) f32
    inner_angle: Any  # (L,) f32
    outer_angle: Any  # (L,) f32


class InstancePlan(NamedTuple):
    """Static flattening plan: scene traversal unrolled to gather maps.

    Replaces the per-frame TLAS instance list (Pathtracer.cpp:185-257): world
    geometry = gather(object pools, vertex_map) transformed by
    node_transforms[vertex_node]. Built once per (scene, visibility) at load.
    """

    vertex_map: Any     # (VW,) int32 — object-pool vertex per world vertex
    vertex_node: Any    # (VW,) int32 — node id (for transform gather)
    vertex_skinned: Any  # (VW,) int32 — 1 if from a skinned/morphed (dynamic) mesh
    tri_vertex: Any     # (TW, 3) int32 — into world pools
    tri_material: Any   # (TW,) int32
    tri_prim: Any       # (TW,) int32 — source primitive id
    tri_double_sided: Any  # (TW,) int32
    tri_alpha_mode: Any    # (TW,) int32
    instance_node: Any  # (I,) int32
    instance_prim: Any  # (I,) int32


@dataclasses.dataclass
class Node:
    """Host scene-graph node (Gltf.h Node)."""

    name: str = ""
    parent: int = -1
    children: List[int] = dataclasses.field(default_factory=list)
    translation: np.ndarray = None  # (3,)
    rotation: np.ndarray = None     # (4,) xyzw
    scale: np.ndarray = None        # (3,)
    mesh: int = -1       # mesh id (group of primitives)
    skin: int = -1
    camera: int = -1
    light: int = -1
    weights: Optional[np.ndarray] = None  # morph weights override


@dataclasses.dataclass
class Skin:
    joints: np.ndarray            # (J,) node ids
    inverse_bind: np.ndarray      # (J, 4, 4)
    skeleton: int = -1


@dataclasses.dataclass
class AnimationChannel:
    node: int
    path: int            # PATH_*
    interpolation: int   # INTERP_*
    times: np.ndarray    # (K,)
    values: np.ndarray   # (K, D) or (3K, D) for cubic spline


@dataclasses.dataclass
class Animation:
    name: str
    channels: List[AnimationChannel]

    @property
    def duration(self) -> float:
        return max((float(c.times[-1]) for c in self.channels if len(c.times)), default=0.0)


@dataclasses.dataclass
class CameraDef:
    type: str = "perspective"   # or "orthographic"
    yfov: float = 1.0
    aspect: float = 0.0         # 0 = use viewport
    znear: float = 0.1
    zfar: float = 0.0           # 0 = infinite (Camera.h:87-91 uses far=1e5)
    xmag: float = 1.0
    ymag: float = 1.0


@dataclasses.dataclass
class MeshDef:
    """glTF mesh = list of primitive ids + default morph weights."""

    primitives: List[int]
    weights: Optional[np.ndarray] = None


@dataclasses.dataclass
class Scene:
    """Host-side loaded scene. Arrays are numpy; `device_arrays()` returns the
    jit-visible pytree subset."""

    pools: GeometryPools
    primitives: PrimitiveTable
    materials: MaterialTable
    textures: TextureTable
    light_params: LightParams
    light_nodes: np.ndarray          # (L,) node id per light instance
    nodes: List[Node] = dataclasses.field(default_factory=list)
    scenes: List[List[int]] = dataclasses.field(default_factory=list)
    default_scene: int = 0
    meshes: List[MeshDef] = dataclasses.field(default_factory=list)
    skins: List[Skin] = dataclasses.field(default_factory=list)
    animations: List[Animation] = dataclasses.field(default_factory=list)
    cameras: List[CameraDef] = dataclasses.field(default_factory=list)
    topo_order: np.ndarray = None    # (N,) node ids, parents before children
    name: str = ""

    def num_nodes(self) -> int:
        return len(self.nodes)
