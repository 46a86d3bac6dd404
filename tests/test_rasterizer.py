import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gltf_renderer_tpu.env import environment as E
from gltf_renderer_tpu.render import pathtracer as pt
from gltf_renderer_tpu.render import rasterizer
from gltf_renderer_tpu.render import settings as S
from gltf_renderer_tpu.scene import flatten
from gltf_renderer_tpu.scene.gltf import load_gltf
from gltf_renderer_tpu.camera import Camera, look_at
from tests.scenes import write_box_gltf
from tests.test_env import _test_equirect


def _setup(path, env=True):
    scene = load_gltf(path)
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    pools = jax.tree.map(jnp.asarray, scene.pools)
    world = flatten.build_world_geometry(
        pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)), tri_flags
    )
    lights = flatten.gather_lights(scene, tf)
    envmaps = E.build_environment(_test_equirect(), cube_size=32) if env else None
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
        env=envmaps,
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([2.0, -2.0, 1.5], [0, 0, 0])
    return ptscene, meta, cam


def _render(ptscene, meta, cam, res=32):
    rs = S.RenderSettings(backend="rasterizer", width=res, height=res)
    params = S.PathTracerParams()
    return np.asarray(
        rasterizer.render(
            ptscene, meta, rs, params, jnp.asarray(cam.clip_to_world()),
            jnp.asarray(cam.position()), (res, res), jnp.uint32(0),
        )
    )


def test_raster_opaque_ibl(tmp_path):
    path = write_box_gltf(str(tmp_path / "box.gltf"), base_color=(0.8, 0.1, 0.1, 1.0))
    ptscene, meta, cam = _setup(path)
    img = _render(ptscene, meta, cam)
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    c = img[16, 16]
    assert c[0] > 0.01 and c[0] > c[2]  # lit red box
    # Background equals env radiance.
    corner_dir = None  # sanity: just finite + nonzero
    assert img[0, 0].max() > 0.01


def test_raster_matches_pt_structurally(tmp_path):
    """Raster and PT must agree on silhouette (same visibility)."""
    path = write_box_gltf(str(tmp_path / "box.gltf"))
    ptscene, meta, cam = _setup(path, env=False)
    img_r = _render(ptscene, meta, cam)
    settings = S.PathTracerSettings(
        max_bounces=0, environment_map=False, debug_output=S.DEBUG_HIT_KIND
    )
    params = S.PathTracerParams()
    img_p = np.asarray(
        pt.trace(ptscene, meta, settings, params, jnp.asarray(cam.clip_to_world()),
                 (32, 32), jnp.uint32(0))
    )
    # PT has 0.5px jitter; compare coverage counts loosely.
    cover_r = (img_r.sum(-1) != img_r[0, 0].sum()).sum()
    cover_p = (img_p.sum(-1) > 0).sum()
    assert abs(int(cover_r) - int(cover_p)) < 30


def test_raster_alpha_blend(tmp_path):
    """A blended box in front of an opaque one composites by base alpha."""
    import json

    path = str(tmp_path / "blend.gltf")
    write_box_gltf(path, base_color=(0.0, 0.8, 0.0, 0.5), double_box=True)
    doc = json.load(open(path))
    doc["materials"][0]["alphaMode"] = "BLEND"
    # Second box opaque red behind the first.
    doc["materials"].append(
        {"pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.0, 0.0, 1.0],
                                  "metallicFactor": 0.0, "roughnessFactor": 0.6}}
    )
    doc["meshes"].append(dict(doc["meshes"][0]))
    doc["meshes"][1] = {
        "primitives": [dict(doc["meshes"][0]["primitives"][0], material=1)]
    }
    doc["nodes"][1]["mesh"] = 1
    doc["nodes"][1]["translation"] = [0.0, 0.0, -1.5]  # directly behind in glTF -z
    json.dump(doc, open(path, "w"))

    scene = load_gltf(path)
    ptscene, meta, cam = _setup(path)
    assert meta.has_blend
    cam.world_to_view = look_at([0.0, -3.0, 0.0], [0, 0, 0])
    img = _render(ptscene, meta, cam)
    assert np.all(np.isfinite(img))
    c = img[16, 16]
    # Both green (front, blended) and red (back) contribute.
    assert c[1] > 0.005 and c[0] > 0.005, c


def test_raster_motion_vectors(tmp_path):
    """Camera translation produces nonzero motion vectors on the box."""
    import jax.numpy as jnp
    from gltf_renderer_tpu.render.settings import RenderSettings, PathTracerParams

    path = write_box_gltf(str(tmp_path / "box.gltf"))
    ptscene, meta, cam = _setup(path, env=False)
    prev_w2c = jnp.asarray(cam.world_to_clip())
    cam2 = Camera(y_fov=cam.y_fov, aspect_ratio=1.0, z_near=0.01)
    cam2.world_to_view = look_at([2.2, -1.9, 1.5], [0, 0, 0])
    res = 32
    lit, mv = rasterizer.render(
        ptscene, meta, RenderSettings(), PathTracerParams(),
        jnp.asarray(cam2.clip_to_world()), jnp.asarray(cam2.position()),
        (res, res), jnp.uint32(0), prev_world_to_clip=prev_w2c, with_motion=True,
    )
    mv = np.asarray(mv)
    assert mv.shape == (res, res, 2)
    assert np.abs(mv[16, 16]).max() > 0.1  # box pixel moved
    assert np.abs(mv[0, 0]).max() == 0.0   # background = 0


def test_transmission_kernels_reference_semantics():
    """Kernel 0 == 2x2 box mean (the shader's single linear tap at the 2x
    ratio); kernel 2 == the CoD 13-tap with the reference's copy-paste
    quirk — validated against a direct per-tap bilinear reference."""
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(16, 24, 3).astype(np.float32))

    m0 = rasterizer.build_transmission_mips(img, n_mips=2, kernel=0)[1]
    box = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2])
    np.testing.assert_allclose(np.asarray(m0), np.asarray(box), atol=1e-6)

    # Direct tap reference (clamped 2x2 box per tap, matching the conv's
    # edge padding): shader tap list VERBATIM incl. the duplicated (x,-y)
    # and missing (-x,-y) taps.
    m2 = np.asarray(rasterizer.build_transmission_mips(img, n_mips=2, kernel=2)[1])
    src = np.asarray(jnp.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge"))

    def tap(oy, ox, r, c):  # 2x2 box at integer shift (pre-pad coords)
        y = 2 * r + oy + 2
        x = 2 * c + ox + 2
        return 0.25 * (src[y, x] + src[y + 1, x] + src[y, x + 1] + src[y + 1, x + 1])

    taps = [((0, 0), 0.5),
            ((1, 1), 0.5), ((-1, 1), 0.5), ((1, -1), 0.5), ((-1, 1), 0.5),
            ((0, 2), 0.25), ((0, -2), 0.25), ((2, 0), 0.25), ((-2, 0), 0.25),
            ((2, 2), 0.125), ((-2, 2), 0.125), ((2, -2), 0.125), ((-2, 2), 0.125)]
    want = np.zeros_like(m2)
    for r in range(m2.shape[0]):
        for c in range(m2.shape[1]):
            acc = np.zeros(3, np.float32)
            for (oy, ox), w in taps:
                acc += w * tap(oy, ox, r, c)
            want[r, c] = acc / 4.0
    np.testing.assert_allclose(m2, want, atol=1e-5)


def test_raster_backface_tbn_forward_ps_convention(tmp_path):
    """Forward.ps flips ONLY the normals on backfaces (bitangent from the
    pre-flip normal); the PT flips normal+tangent+w. On a backface hit the
    two conventions differ by exactly a tangent/bitangent sign."""
    path = write_box_gltf(str(tmp_path / "box.gltf"))
    ptscene, meta, cam = _setup(path, env=False)
    world = ptscene.world
    tri = jnp.asarray([0], jnp.int32)
    u = jnp.asarray([0.3], jnp.float32)
    v = jnp.asarray([0.3], jnp.float32)
    # Front-face reference direction: along -geometric_normal.
    a0 = pt.fetch_hit_attributes(world, tri, u, v,
                                 -jnp.ones((1, 3)) * 0.0 + jnp.asarray([[0.0, 0.0, -1.0]]))
    gn = np.asarray(a0.geometric_normal)[0]
    back_dir = jnp.asarray(gn[None, :])  # along +n => backfacing
    a_pt = pt.fetch_hit_attributes(world, tri, u, v, back_dir)
    a_rs = pt.fetch_hit_attributes(world, tri, u, v, back_dir, raster_flip=True)
    np.testing.assert_allclose(np.asarray(a_rs.normal), np.asarray(a_pt.normal), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a_rs.tangent[..., :3]), -np.asarray(a_pt.tangent[..., :3]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a_rs.bitangent), -np.asarray(a_pt.bitangent), atol=1e-6)
