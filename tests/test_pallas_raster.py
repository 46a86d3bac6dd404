"""Tile-binned Pallas rasterizer vs ray-cast visibility (ground truth)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gltf_renderer_tpu.ops import bvh as bvh_ops
from gltf_renderer_tpu.ops import pallas_raster as pr
from gltf_renderer_tpu.render import pathtracer as pt
from gltf_renderer_tpu.render import settings as S
from gltf_renderer_tpu.scene import flatten
from gltf_renderer_tpu.scene.gltf import load_gltf
from gltf_renderer_tpu.camera import Camera, look_at
from tests.scenes import write_box_gltf


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r") / "box.gltf")
    write_box_gltf(path)
    scene = load_gltf(path)
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    pools = jax.tree.map(jnp.asarray, scene.pools)
    world = flatten.build_world_geometry(
        pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)), tri_flags
    )
    lights = flatten.gather_lights(scene, tf)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=2.0, z_near=0.05)
    cam.world_to_view = look_at([2.0, -2.0, 1.5], [0, 0, 0])
    return world, ptscene, meta, cam


def _raycast_vis(ptscene, meta, cam, w, h):
    py, px = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(px.reshape(-1))
    py = jnp.asarray(py.reshape(-1))
    zero_jitter = jnp.zeros((px.shape[0], 2), jnp.float32)
    o, dr = pt.generate_camera_rays(px, py, (w, h), jnp.asarray(cam.clip_to_world()), zero_jitter)
    rl = jnp.sqrt((dr**2).sum(-1))
    d = dr / rl[:, None]
    hit = pt.closest_hit(
        ptscene, meta, o, d, jnp.zeros(px.shape[0]), rl, cull_sign=1
    )
    return (
        np.asarray(hit.tri).reshape(h, w),
        np.asarray(hit.u).reshape(h, w),
        np.asarray(hit.v).reshape(h, w),
    )


def test_rasterizer_matches_raycast(setup):
    world, ptscene, meta, cam = setup
    w, h = 256, 128
    z, tri, u, v = pr.rasterize(
        world.position, world.tri_vertex, jnp.asarray(cam.world_to_clip()), w, h,
        double_sided=world.tri_double_sided, interpret=True,
    )
    tri = np.asarray(tri)
    rc_tri, rc_u, rc_v = _raycast_vis(ptscene, meta, cam, w, h)

    cover_r = tri >= 0
    cover_c = rc_tri >= 0
    # Coverage agrees except along edges (different fill rules / fp).
    disagree = (cover_r != cover_c).sum()
    assert disagree < 0.01 * w * h, disagree
    both = cover_r & cover_c
    # Same triangle chosen on interior pixels (edge pixels may differ).
    same_tri = (tri[both] == rc_tri[both]).mean()
    assert same_tri > 0.98, same_tri
    # Barycentrics agree where the same triangle was hit.
    m = both & (tri == rc_tri)
    du = np.abs(np.asarray(u)[m] - rc_u[m])
    dv = np.abs(np.asarray(v)[m] - rc_v[m])
    assert np.percentile(du, 99) < 1e-2
    assert np.percentile(dv, 99) < 1e-2
    # Depth is reversed-Z in (0, 1] on covered pixels.
    zc = np.asarray(z)[both]
    assert zc.min() > 0.0 and zc.max() <= 1.0


def test_rasterizer_depth_order(setup):
    """Two boxes: the nearer one must win the z-test."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "two.gltf")
        write_box_gltf(path, double_box=True)  # second box at +x
        scene = load_gltf(path)
        tf = flatten.compute_global_transforms(scene)
        plan = flatten.build_instance_plan(scene)
        tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
        pools = jax.tree.map(jnp.asarray, scene.pools)
        world = flatten.build_world_geometry(
            pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)),
            tri_flags,
        )
        cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.05)
        # Look along +x so box 2 (at world x=+1.5) is behind box 1.
        cam.world_to_view = look_at([-3.0, 0.0, 0.0], [1.0, 0.0, 0.0])
        w = h = 128
        z, tri, u, v = pr.rasterize(
            world.position, world.tri_vertex, jnp.asarray(cam.world_to_clip()), w, h,
            interpret=True,
        )
        tri = np.asarray(tri)
        centre_tri = tri[64, 64]
        assert centre_tri >= 0
        # Box 1 triangles are ids 0..11 (first instance).
        assert centre_tri < 12, centre_tri


def test_raster_backend_tiled_visibility(setup):
    """Full raster backend with the tiled visibility path matches raycast."""
    from gltf_renderer_tpu.render import rasterizer as rz
    from gltf_renderer_tpu.render import settings as S2
    import gltf_renderer_tpu.ops.pallas_raster as prmod
    import functools

    world, ptscene, meta, cam = setup
    # Force interpret mode for the kernel on CPU.
    orig = prmod.rasterize
    prmod.rasterize = functools.partial(orig, interpret=True)
    try:
        kwargs = dict(
            render_settings=S2.RenderSettings(), params=S2.PathTracerParams(),
            clip_to_world=jnp.asarray(cam.clip_to_world()),
            camera_pos=jnp.asarray(cam.position()),
            resolution=(64, 32), frame=jnp.uint32(0),
        )
        img_rc = np.asarray(rz.render(ptscene, meta, visibility="raycast", **kwargs))
        img_tl = np.asarray(rz.render(ptscene, meta, visibility="tiled", **kwargs))
    finally:
        prmod.rasterize = orig
    # Identical shading given identical visibility; only edge pixels differ.
    diff = np.abs(img_rc - img_tl).max(-1)
    assert (diff > 1e-3).mean() < 0.02, (diff > 1e-3).mean()


def test_near_plane_clipping(setup):
    """A camera INSIDE the scene: triangles crossing w=0 must be clipped, not
    dropped — coverage must match the ray cast, and the clipped pieces'
    barycentrics must address the ORIGINAL triangle (u/v agreement)."""
    world, ptscene, meta, cam = setup
    w, h = 256, 128
    cam2 = Camera(y_fov=np.pi / 3, aspect_ratio=2.0, z_near=0.05)
    # Just outside one face looking through the box: the front face spans
    # the near plane.
    cam2.world_to_view = look_at([0.45, 0.0, 0.0], [-1.0, 0.0, 0.0])
    ref_tri, ref_u, ref_v = _raycast_vis(ptscene, meta, cam2, w, h)
    world_to_clip = jnp.asarray(cam2.world_to_clip())
    z, tri, u, v = pr.rasterize(
        ptscene.world.position, ptscene.world.tri_vertex, world_to_clip, w, h,
        double_sided=ptscene.world.tri_double_sided, interpret=True,
    )
    tri = np.asarray(tri)
    cov_ref = ref_tri >= 0
    cov_ras = tri >= 0
    # The ray cast sees geometry through the whole frustum; the rasterizer
    # must cover (nearly) all of it — before clipping this was ~0%.
    both = cov_ref & cov_ras
    assert both.sum() >= 0.98 * cov_ref.sum()
    same = both & (tri == ref_tri)
    assert same.sum() >= 0.97 * both.sum()
    np.testing.assert_allclose(np.asarray(u)[same], ref_u[same], atol=2e-2)
    np.testing.assert_allclose(np.asarray(v)[same], ref_v[same], atol=2e-2)


def test_device_binning_matches_host(setup):
    """rasterize_device (in-graph binning + in-graph near clip) must produce
    the same visibility buffer as the host-binned rasterize, including with
    the camera cutting geometry at the near plane."""
    world, ptscene, meta, cam = setup
    w, h = 256, 128
    cams = [cam]
    cam2 = Camera(y_fov=np.pi / 3, aspect_ratio=2.0, z_near=0.05)
    cam2.world_to_view = look_at([0.45, 0.0, 0.0], [-1.0, 0.0, 0.0])
    cams.append(cam2)
    for c in cams:
        w2c = jnp.asarray(c.world_to_clip())
        zh, th, uh, vh = pr.rasterize(
            world.position, world.tri_vertex, w2c, w, h,
            double_sided=world.tri_double_sided, interpret=True,
        )
        zd, td, ud, vd = pr.rasterize_device(
            world.position, world.tri_vertex, w2c, w, h,
            double_sided=world.tri_double_sided, interpret=True,
        )
        th, td = np.asarray(th), np.asarray(td)
        # Identical triangle selection except at most a sliver of edge pixels
        # (near-clip piece fans may split edges differently).
        assert (th == td).mean() > 0.995, (th == td).mean()
        m = (th == td) & (th >= 0)
        np.testing.assert_allclose(np.asarray(zh)[m], np.asarray(zd)[m], atol=1e-5)
        np.testing.assert_allclose(np.asarray(uh)[m], np.asarray(ud)[m], atol=1e-4)
        np.testing.assert_allclose(np.asarray(vh)[m], np.asarray(vd)[m], atol=1e-4)


def test_raster_render_masked_tiled(tmp_path):
    """visibility="tiled" on a scene WITH alpha-masked materials: rejected
    texels are re-traced by the retry loop; the image must match the raycast
    backend."""
    from gltf_renderer_tpu.scene.procedural import write_foliage_gltf
    from gltf_renderer_tpu.render import rasterizer as rz

    path = write_foliage_gltf(str(tmp_path / "f.gltf"))
    scene = load_gltf(path)
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    pools = jax.tree.map(jnp.asarray, scene.pools)
    world = flatten.build_world_geometry(
        pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)), tri_flags
    )
    lights = flatten.gather_lights(scene, tf)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
    )
    assert meta.has_masked
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=2.0, z_near=0.05)
    cam.world_to_view = look_at([1.5, -1.5, 1.0], [0, 0, 0.3])
    rset = S.RenderSettings()
    params = S.PathTracerParams()
    kw = dict(
        render_settings=rset, params=params,
        clip_to_world=jnp.asarray(cam.clip_to_world()),
        camera_pos=jnp.asarray(cam.position()), resolution=(128, 64),
        frame=jnp.uint32(0),
    )
    img_rc = np.asarray(rz.render(ptscene, meta, visibility="raycast", **kw))
    img_td = np.asarray(rz.render(ptscene, meta, visibility="tiled", **kw))
    # Identical modulo sub-pixel rasterization edge rules.
    diff = np.abs(img_rc - img_td).mean()
    assert diff < 0.02, diff


def test_vmem_list_path_matches_smem(setup):
    """A pair_cap above the SMEM cap flips the kernel to the VMEM list path
    ((N/8, 8) rows + 8-way select) — identical output, NO truncation (the
    old behavior silently dropped pairs past 114688 on dense scenes)."""
    world, ptscene, meta, cam = setup
    w, h = 256, 128
    w2c = jnp.asarray(cam.world_to_clip())
    zs, ts, us, vs = pr.rasterize_device(
        world.position, world.tri_vertex, w2c, w, h,
        double_sided=world.tri_double_sided, interpret=True,
    )
    zv, tv_, uv, vv = pr.rasterize_device(
        world.position, world.tri_vertex, w2c, w, h,
        double_sided=world.tri_double_sided, interpret=True,
        pair_cap=131072,  # > list_cap 114688 -> VMEM list
    )
    np.testing.assert_array_equal(np.asarray(ts), np.asarray(tv_))
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(us), np.asarray(uv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vv), atol=1e-6)
