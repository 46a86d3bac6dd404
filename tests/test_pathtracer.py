from dataclasses import replace as dataclasses_replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gltf_renderer_tpu.render import pathtracer as pt
from gltf_renderer_tpu.render import settings as S
from gltf_renderer_tpu.scene import flatten
from gltf_renderer_tpu.scene.gltf import load_gltf
from gltf_renderer_tpu.camera import Camera, look_at
from tests.scenes import write_box_gltf


def _load_world(path):
    scene = load_gltf(path)
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    pools = jax.tree.map(jnp.asarray, scene.pools)
    world = flatten.build_world_geometry(
        pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)), tri_flags
    )
    lights = flatten.gather_lights(scene, tf)
    return scene, world, lights


@pytest.fixture(scope="module")
def box_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scenes") / "box.gltf")
    write_box_gltf(path)
    scene, world, lights = _load_world(path)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -2.5, 1.2], [0.0, 0.0, 0.0])
    return ptscene, meta, cam


def _render(ptscene, meta, cam, settings, params=None, res=64, seed=0):
    params = params or S.PathTracerParams(environment_color=(0.1, 0.1, 0.1))
    c2w = jnp.asarray(cam.clip_to_world())
    return np.asarray(
        pt.trace(ptscene, meta, settings, params, c2w, (res, res), jnp.uint32(seed))
    )


def test_pt_box_direct_light(box_setup):
    ptscene, meta, cam = box_setup
    settings = S.PathTracerSettings(
        max_bounces=1, min_bounces=1, environment_map=False, environment_mis=False
    )
    img = _render(ptscene, meta, cam, settings)
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    # Center pixel: lit red box.
    c = img[32, 32]
    assert c[0] > c[1] * 1.5, c  # red dominant
    assert c[0] > 0.005
    # Corner: miss -> constant env color * intensity.
    np.testing.assert_allclose(img[0, 0], [0.1, 0.1, 0.1], atol=1e-5)


def test_pt_deterministic(box_setup):
    ptscene, meta, cam = box_setup
    settings = S.PathTracerSettings(max_bounces=1, environment_map=False)
    a = _render(ptscene, meta, cam, settings, seed=7)
    b = _render(ptscene, meta, cam, settings, seed=7)
    np.testing.assert_array_equal(a, b)
    c = _render(ptscene, meta, cam, settings, seed=8)
    assert not np.array_equal(a, c)


def test_pt_debug_outputs(box_setup):
    """All 28 debug output channels (PathTracer.lib.hlsl:43-72) render
    finite, non-empty images."""
    ptscene, meta, cam = box_setup
    # Channels legitimately all-zero for the box scene (no uv1 set, metalness
    # 0, clearcoat 0, transmission 0).
    may_be_black = {S.DEBUG_TEXCOORD_1, S.DEBUG_METALNESS, S.DEBUG_CLEARCOAT,
                    S.DEBUG_TRANSMISSIVE, S.DEBUG_SPECULAR}
    for dbg in range(1, 28):
        settings = S.PathTracerSettings(
            max_bounces=1, environment_map=False, debug_output=dbg
        )
        img = _render(ptscene, meta, cam, settings, res=16)
        assert np.all(np.isfinite(img)), dbg
        if dbg not in may_be_black:
            assert img.max() > 0, dbg  # something visible


def test_pt_spp_batched_dispatch(box_setup):
    """trace_chunked(spp=k) == mean of the k per-seed renders (the sample-
    axis seed schedule), and ray stats sum over samples — the fixed-cost
    amortization path must not change the estimator."""
    ptscene, meta, cam = box_setup
    settings = S.PathTracerSettings(max_bounces=2, min_bounces=1)
    params = S.PathTracerParams(environment_color=(0.3, 0.3, 0.3))
    c2w = jnp.asarray(cam.clip_to_world())
    res = (32, 32)

    seeds = [7, (7 + 0x9E3779B9) & 0xFFFFFFFF]
    singles = []
    rays_single = 0.0
    for s in seeds:
        img, st = pt.trace_chunked(
            ptscene, meta, settings, params, c2w, res, jnp.uint32(s),
            with_stats=True,
        )
        singles.append(np.asarray(img))
        rays_single += float(st[0])

    batched, st_b = pt.trace_chunked(
        ptscene, meta, settings, params, c2w, res, jnp.uint32(7),
        with_stats=True, spp=2,
    )
    np.testing.assert_allclose(np.asarray(batched), np.mean(singles, 0), atol=2e-5)
    assert abs(float(st_b[0]) - rays_single) < 1e-3


def test_pt_spp_chunk_boundary(box_setup):
    """spp path with a chunk smaller than the pixel stream: padding +
    per-chunk sample tiling must still reproduce the mean estimator."""
    ptscene, meta, cam = box_setup
    settings = S.PathTracerSettings(max_bounces=1, min_bounces=1,
                                    environment_map=False)
    params = S.PathTracerParams(environment_color=(0.1, 0.1, 0.1))
    c2w = jnp.asarray(cam.clip_to_world())
    res = (48, 48)  # tile-order stream = 4 padded 32x32 blocks = 4096 px

    singles = []
    for s in [3, (3 + 0x9E3779B9) & 0xFFFFFFFF]:
        singles.append(np.asarray(pt.trace_chunked(
            ptscene, meta, settings, params, c2w, res, jnp.uint32(s),
            chunk=2048,
        )))
    batched = pt.trace_chunked(
        ptscene, meta, settings, params, c2w, res, jnp.uint32(3),
        chunk=2048, spp=2,
    )
    np.testing.assert_allclose(np.asarray(batched), np.mean(singles, 0), atol=2e-5)


def test_proxy_occlusion_matches_brute_force():
    """_proxy_occlusion's MXU bilinear formulation == numpy Moller-Trumbore
    (hits only where MT clearly hits; margin misses allowed, false hits not)."""
    rs = np.random.RandomState(11)
    k, r = 16, 512
    v0 = rs.uniform(-2, 2, (k, 3)).astype(np.float32)
    e1 = rs.uniform(-1.5, 1.5, (k, 3)).astype(np.float32)
    e2 = rs.uniform(-1.5, 1.5, (k, 3)).astype(np.float32)
    o = rs.uniform(-3, 3, (r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_min = np.zeros(r, np.float32)
    t_max = np.full(r, 10.0, np.float32)

    # numpy MT reference
    n = np.cross(e1, e2)
    hit_ref = np.zeros((r, k), bool)
    t_ref = np.full((r, k), np.inf, np.float32)
    for j in range(k):
        pv = np.cross(d, e2[j])
        det = (e1[j] * pv).sum(-1)
        tv = o - v0[j]
        u = (tv * pv).sum(-1)
        qv = np.cross(tv, e1[j])
        v = (d * qv).sum(-1)
        t = (e2[j] * qv).sum(-1)
        s = np.sign(det)
        ad = np.abs(det)
        ok = (ad > 1e-20) & (u * s >= 0) & (v * s >= 0) & ((u + v) * s <= ad)
        tt = np.where(ok & (ad > 0), t / np.where(ad > 0, det, 1.0), np.inf)
        ok &= (tt > t_min) & (tt < t_max)
        hit_ref[:, j] = ok
        t_ref[:, j] = np.where(ok, tt, np.inf)

    # Build a minimal scene carrying just the fields _proxy_occlusion reads.
    class _W:
        tri_vertex = jnp.arange(3 * k, dtype=jnp.int32).reshape(k, 3)
        position = jnp.asarray(
            np.stack([v0, v0 + e1, v0 + e2], 1).reshape(3 * k, 3)
        )

    class _Sc:
        world = _W()
        occluder_idx = jnp.arange(k, dtype=jnp.int32)

    occ, tcap = pt._proxy_occlusion(
        _Sc(), jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), want_tcap=True,
    )
    occ_f = np.asarray(occ)
    assert occ_f.dtype == np.float32  # 0/1 float mask (pred-layout rule)
    assert set(np.unique(occ_f)) <= {0.0, 1.0}
    occ = occ_f.astype(bool)
    tcap = np.asarray(tcap)
    # No-hit lanes carry the large-finite NO_TCAP fill (minimum() no-op).
    assert np.all(tcap[~occ] == pt.NO_TCAP)
    ref_any = hit_ref.any(-1)
    # No false hits ever; margin may drop boundary-grazing true hits only.
    assert not np.any(occ & ~ref_any)
    agree = occ == ref_any
    assert agree.mean() > 0.98, agree.mean()
    # Cap safety contract: the cap is an UPPER bound on the distance of a
    # REAL hit (so capping bounce t_max at it can never hide the true
    # closest): never below the true closest, and within tolerance of SOME
    # true hit (the closest the margin didn't reject).
    both = occ & ref_any
    assert np.all(tcap[both] >= t_ref.min(-1)[both] - 1e-5)
    near_some = np.min(
        np.abs(t_ref[both] - tcap[both][:, None]), axis=-1
    )
    scale = np.maximum(np.abs(tcap[both]), 1.0)
    assert np.all(near_some <= 1e-3 * scale), near_some.max()


@pytest.mark.parametrize("offset", [0.0, 2000.0, 100000.0])
def test_proxy_occlusion_no_false_hits_far_from_origin(offset):
    """The conservative guarantee must hold at ANY world scale: rays built
    to GRAZE triangle edges, with the whole scene translated far from the
    origin (feature magnitudes ~|o|, the regime where a |det|-relative
    margin mis-classified 885/8192 rays — round-4 review finding). Every
    'certainly occluded' verdict must be a float64-confirmed hit."""
    rs = np.random.RandomState(17)
    k, r = 16, 8192
    shift = np.asarray([offset, offset * 0.5, -offset * 0.25], np.float64)
    v0 = rs.uniform(-2, 2, (k, 3)) + shift
    e1 = rs.uniform(-1.5, 1.5, (k, 3))
    e2 = rs.uniform(-1.5, 1.5, (k, 3))
    # Rays aimed exactly at points ON (and just outside) triangle edges.
    tri = rs.randint(0, k, r)
    lam = rs.uniform(0, 1, (r, 1))
    edge_pt = v0[tri] + lam * e1[tri]  # points on the v0->v1 edge
    # Nudge a hair outside the triangle (negative v direction).
    edge_pt = edge_pt - rs.uniform(0, 2e-4, (r, 1)) * e2[tri]
    o = edge_pt + rs.normal(size=(r, 3)) * 3.0
    d = edge_pt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_min = np.zeros(r, np.float64)
    t_max = np.full(r, 50.0, np.float64)

    # The prepass sees f32-rounded vertices and rays; the float64 oracle
    # must judge the SAME rounded geometry or legit hits read as misses.
    p1 = (v0 + e1).astype(np.float32).astype(np.float64)
    p2 = (v0 + e2).astype(np.float32).astype(np.float64)
    v0 = v0.astype(np.float32).astype(np.float64)
    e1 = p1 - v0
    e2 = p2 - v0
    o = o.astype(np.float32).astype(np.float64)
    d = d.astype(np.float32).astype(np.float64)

    # float64 Moller-Trumbore oracle over all K tris.
    hit_any = np.zeros(r, bool)
    for j in range(k):
        pv = np.cross(d, e2[j])
        det = (e1[j] * pv).sum(-1)
        tv = o - v0[j]
        u = (tv * pv).sum(-1)
        qv = np.cross(tv, e1[j])
        v = (d * qv).sum(-1)
        t = (e2[j] * qv).sum(-1)
        sgn = np.sign(det)
        ad = np.abs(det)
        ok = (ad > 0) & (u * sgn >= -1e-9 * ad) & (v * sgn >= -1e-9 * ad) \
            & ((u + v) * sgn <= ad * (1 + 1e-9))
        tt = np.where(ad > 0, t / np.where(ad > 0, det, 1.0), np.inf)
        hit_any |= ok & (tt > 0) & (tt < 50.0)

    class _W:
        tri_vertex = jnp.arange(3 * k, dtype=jnp.int32).reshape(k, 3)
        position = jnp.asarray(
            np.stack([v0, v0 + e1, v0 + e2], 1).reshape(3 * k, 3), jnp.float32
        )

    class _Sc:
        world = _W()
        occluder_idx = jnp.arange(k, dtype=jnp.int32)

    occ, _ = pt._proxy_occlusion(
        _Sc(), jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(t_min, jnp.float32), jnp.asarray(t_max, jnp.float32),
    )
    occ = np.asarray(occ).astype(bool)
    false_hits = occ & ~hit_any
    assert not false_hits.any(), (offset, int(false_hits.sum()))


def test_shadow_prepass_image_identical(tmp_path, monkeypatch):
    """GLTF_TPU_SHADOWPRE must not change the rendered image (conservative
    prepass): box scene (opaque walls, punctual light + env NEE, 2 bounces)
    rendered with and without the knob, compared exactly."""
    path = write_box_gltf(str(tmp_path / "box.gltf"))
    scene, world, lights = _load_world(path)
    mats = jax.tree.map(jnp.asarray, scene.materials)
    texs = jax.tree.map(jnp.asarray, scene.textures)
    lts = jax.tree.map(jnp.asarray, lights)

    ptscene_off, meta_off = pt.make_pt_scene(world, mats, texs, lts)
    monkeypatch.setenv("GLTF_TPU_SHADOWPRE", "8")
    ptscene_on, meta_on = pt.make_pt_scene(world, mats, texs, lts)
    assert meta_on.shadow_prepass and not meta_off.shadow_prepass
    assert int((np.asarray(ptscene_on.occluder_idx) >= 0).sum()) > 0

    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -2.5, 1.2], [0.0, 0.0, 0.0])
    settings = S.PathTracerSettings(max_bounces=2, min_bounces=1)
    for alpha_sh in (False, True):
        st = S.PathTracerSettings(
            max_bounces=2, min_bounces=1, alpha_shadows=alpha_sh
        )
        img_off = _render(ptscene_off, meta_off, cam, st, res=32)
        img_on = _render(ptscene_on, meta_on, cam, st, res=32)
        np.testing.assert_allclose(img_on, img_off, atol=1e-6, rtol=0)


def test_shadow_prepass_masked_scene_identical(tmp_path, monkeypatch):
    """Prepass parity on MASKED geometry (foliage): opaque-only proxies must
    compose exactly with the alpha-retry loops and alpha shadows. (Known
    one-sided exception, documented in trace_shadow: >16 stacked alpha
    surfaces in front of a certain opaque occluder — the truncated loop
    keeps trans>0, the prepass returns the physically correct 0.)"""
    from gltf_renderer_tpu.scene.procedural import write_foliage_gltf

    path = write_foliage_gltf(str(tmp_path / "foliage.gltf"), tex_size=16)
    scene, world, lights = _load_world(path)
    mats = jax.tree.map(jnp.asarray, scene.materials)
    texs = jax.tree.map(jnp.asarray, scene.textures)
    lts = jax.tree.map(jnp.asarray, lights)
    ptscene_off, meta_off = pt.make_pt_scene(world, mats, texs, lts)
    monkeypatch.setenv("GLTF_TPU_SHADOWPRE", "8")
    ptscene_on, meta_on = pt.make_pt_scene(world, mats, texs, lts)
    assert meta_off.has_masked and meta_on.shadow_prepass

    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -3.0, 1.5], [0.0, 0.0, 0.5])
    st = S.PathTracerSettings(max_bounces=2, min_bounces=1, alpha_shadows=True)
    img_off = _render(ptscene_off, meta_off, cam, st, res=24)
    img_on = _render(ptscene_on, meta_on, cam, st, res=24)
    np.testing.assert_allclose(img_on, img_off, atol=1e-6, rtol=0)


def test_merged_light_dispatch_identical(box_setup):
    """Punctual-light shadow rays riding the merged bounce dispatch must
    give the exact same image as the dedicated any-hit dispatch (the
    radiance accumulation order is preserved by construction)."""
    ptscene, meta, cam = box_setup
    params = S.PathTracerParams(environment_color=(0.2, 0.2, 0.2))
    for env_map in (True, False):
        on = S.PathTracerSettings(
            max_bounces=2, min_bounces=1, environment_map=env_map,
            merged_light_dispatch=True,
        )
        off = dataclasses_replace(on, merged_light_dispatch=False)
        img_on = _render(ptscene, meta, cam, on, params=params, res=32, seed=5)
        img_off = _render(ptscene, meta, cam, off, params=params, res=32, seed=5)
        np.testing.assert_allclose(img_on, img_off, atol=1e-7, rtol=0)


def test_alpha_shadow_binary_fast_path_opaque_scene(box_setup):
    """On a scene with NO alpha layer, alpha_shadows and binary shadows are
    semantically identical (GetAlpha == 1 everywhere) — the fast path must
    not change the image."""
    ptscene, meta, cam = box_setup
    assert not meta.has_alpha_layer
    params = S.PathTracerParams(environment_color=(0.2, 0.2, 0.2))
    a = _render(ptscene, meta, cam, S.PathTracerSettings(
        max_bounces=2, min_bounces=1, alpha_shadows=True), params=params, res=32)
    b = _render(ptscene, meta, cam, S.PathTracerSettings(
        max_bounces=2, min_bounces=1, alpha_shadows=False), params=params, res=32)
    np.testing.assert_allclose(a, b, atol=1e-7, rtol=0)


def test_pt_accumulation():
    hist = jnp.zeros((4, 4, 3))
    f1 = jnp.ones((4, 4, 3))
    settings = S.PathTracerSettings()
    out0 = pt.accumulate(hist, f1, jnp.int32(0), settings)
    np.testing.assert_allclose(out0, 1.0)
    out1 = pt.accumulate(out0, 3 * f1, jnp.int32(1), settings)
    np.testing.assert_allclose(out1, 2.0)  # mean of 1 and 3


@pytest.mark.parametrize("layer", ["metal", "clearcoat", "sheen", "transmission"])
def test_pt_layer_furnace_no_energy_gain(layer, tmp_path):
    """Layer-wise furnace sweep: a white material with ONE extra BSDF layer
    enabled, in a uniform environment, must never GAIN energy (sampled
    layer weights / pdfs / MIS must compose ≤ 1) and must keep most of it
    (no layer silently eats the path). Complements the diffuse furnace and
    the zoo SSIM, which can mask a single layer's weight bug."""
    path = write_box_gltf(str(tmp_path / "box.gltf"), with_light=False,
                          base_color=(1.0, 1.0, 1.0, 1.0), roughness=0.5)
    scene, world, lights = _load_world(path)
    m = scene.materials
    ones = np.ones_like(np.asarray(m.metalness_factor))
    if layer == "metal":
        m = m._replace(metalness_factor=ones)
    elif layer == "clearcoat":
        m = m._replace(clearcoat_factor=ones,
                       clearcoat_roughness_factor=0.4 * ones)
    elif layer == "sheen":
        m = m._replace(
            sheen_color_factor=np.ones_like(np.asarray(m.sheen_color_factor)),
            sheen_roughness_factor=0.5 * ones,
        )
    else:  # transmission
        m = m._replace(transmission_factor=ones)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, m),
        jax.tree.map(jnp.asarray, scene.textures),
        jax.tree.map(jnp.asarray, lights),
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0])
    settings = S.PathTracerSettings(
        max_bounces=5, min_bounces=5, environment_map=False,
        point_lights=False, luminance_clamp_enabled=False,
    )
    params = S.PathTracerParams(environment_color=(0.5, 0.5, 0.5))
    c2w = jnp.asarray(cam.clip_to_world())
    trace_j = jax.jit(pt.trace, static_argnums=(1, 2, 5))
    imgs = [
        np.asarray(trace_j(ptscene, meta, settings, params, c2w, (32, 32),
                           jnp.uint32(s)))
        for s in range(16)
    ]
    mean = np.mean(imgs, 0)
    center = mean[12:20, 12:20].mean(axis=(0, 1))
    # No gain: ≤ env radiance + sampling-noise allowance.
    assert np.all(center <= 0.5 * 1.08), (layer, center)
    # Not black: truncation at 5 bounces + layer Fresnel losses bounded.
    assert np.all(center >= 0.5 * 0.55), (layer, center)


def test_pt_directional_closed_form(tmp_path):
    """Absolute end-to-end gate (no probe, no golden): a Lambertian plane
    under a straight-down directional light renders EXACTLY albedo*I/pi at
    every pixel — independent of the hit point, so primary-ray jitter
    cannot move the expected value. Pins camera rays, NEE (GetLightRay,
    Lights.hlsli:26-61), the diffuse BSDF*cos/pdf chain, and accumulation
    as one closed form."""
    from gltf_renderer_tpu.scene.procedural import write_plane_light_gltf

    albedo = np.asarray([0.8, 0.6, 0.4])
    intensity = 3.0
    path = write_plane_light_gltf(str(tmp_path / "plane.gltf"),
                                  kind="directional", intensity=intensity,
                                  base_color=(*albedo, 1.0))
    scene, world, lights = _load_world(path)
    # Precondition on the loader: the light axis really is world -Z.
    np.testing.assert_allclose(
        np.asarray(lights.direction[0]), [0.0, 0.0, -1.0], atol=1e-6)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures),
        jax.tree.map(jnp.asarray, lights),
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -2.0, 2.0], [0.0, 0.0, 0.0])
    settings = S.PathTracerSettings(
        max_bounces=1, min_bounces=1, environment_map=False,
        luminance_clamp_enabled=False,
    )
    params = S.PathTracerParams(environment_color=(0.0, 0.0, 0.0))
    c2w = jnp.asarray(cam.clip_to_world())
    img = np.asarray(
        pt.trace(ptscene, meta, settings, params, c2w, (64, 64),
                 jnp.uint32(3)))
    expected = albedo * intensity / np.pi   # cos(theta) = 1 everywhere
    assert np.all(np.isfinite(img))
    exp = np.broadcast_to(expected, img.shape)
    rel = np.abs(img - exp) / exp
    # Tight bound everywhere but the quad's shared-edge diagonal, where the
    # ray-offset epsilon can graze the sibling triangle for isolated pixels.
    assert np.mean(rel <= 2e-3) >= 0.999, rel.max()
    assert rel.max() <= 1e-2, rel.max()


def test_pt_point_light_closed_form(tmp_path):
    """Absolute inverse-square gate: Lambertian plane, point light at
    world (0,0,8), expected radiance albedo/pi * I * h/r^3 computed from
    the analytic unjittered ray-plane intersection per pixel. The light is
    far enough that sub-pixel jitter moves the value < 0.5%."""
    from gltf_renderer_tpu.scene.procedural import write_plane_light_gltf

    albedo = np.asarray([0.8, 0.6, 0.4])
    intensity = 40.0
    h = 8.0
    path = write_plane_light_gltf(str(tmp_path / "plane.gltf"),
                                  kind="point", intensity=intensity,
                                  base_color=(*albedo, 1.0))
    scene, world, lights = _load_world(path)
    np.testing.assert_allclose(
        np.asarray(lights.position[0]), [0.0, 0.0, h], atol=1e-6)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures),
        jax.tree.map(jnp.asarray, lights),
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([0.0, -2.0, 2.0], [0.0, 0.0, 0.0])
    settings = S.PathTracerSettings(
        max_bounces=1, min_bounces=1, environment_map=False,
        luminance_clamp_enabled=False,
    )
    params = S.PathTracerParams(environment_color=(0.0, 0.0, 0.0))
    c2w = jnp.asarray(cam.clip_to_world())
    res = 64
    img = np.asarray(
        pt.trace(ptscene, meta, settings, params, c2w, (res, res),
                 jnp.uint32(5)))
    # Analytic pixel-center hit points on the z=0 plane.
    py, px = np.mgrid[0:res, 0:res]
    zero_j = jnp.zeros((res, res, 2), jnp.float32)
    o, d = pt.generate_camera_rays(jnp.asarray(px), jnp.asarray(py),
                                   (res, res), c2w, zero_j)
    o, d = np.asarray(o), np.asarray(d)
    t = -o[..., 2] / d[..., 2]
    p = o + t[..., None] * d
    r2 = p[..., 0] ** 2 + p[..., 1] ** 2 + h * h
    expected = (albedo[None, None] / np.pi * intensity
                * (h / r2 ** 1.5)[..., None])
    assert np.all(np.isfinite(img))
    # The unjittered-ray closed form drifts with sub-pixel jitter in
    # proportion to the radiance gradient: tight centrally (hit points near
    # the light axis), loose at the oblique frame edges.
    np.testing.assert_allclose(img[16:48, 16:48], expected[16:48, 16:48],
                               rtol=2e-2)
    np.testing.assert_allclose(img, expected, rtol=8e-2)


def test_pt_furnace():
    """Furnace test (reference Material Diffuse White override +uniform env):
    white diffuse in a uniform environment must converge to env radiance."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = write_box_gltf(os.path.join(d, "box.gltf"), with_light=False)
        scene, world, lights = _load_world(path)
        ptscene, meta = pt.make_pt_scene(
            world, jax.tree.map(jnp.asarray, scene.materials),
            jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
        )
        cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
        cam.world_to_view = look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0])
        settings = S.PathTracerSettings(
            max_bounces=5, min_bounces=5, environment_map=False,
            material_diffuse_white=True, point_lights=False,
            luminance_clamp_enabled=False,
        )
        params = S.PathTracerParams(environment_color=(0.5, 0.5, 0.5))
        c2w = jnp.asarray(cam.clip_to_world())
        imgs = []
        trace_j = jax.jit(pt.trace, static_argnums=(1, 2, 5))
        for s in range(32):
            imgs.append(
                np.asarray(trace_j(ptscene, meta, settings, params, c2w, (48, 48), jnp.uint32(s)))
            )
        mean = np.mean(imgs, 0)
        # Center of box should be ~= env radiance 0.5 (energy conservation);
        # 5 bounces of a 0.5-albedo-free white diffuse leaves a small deficit
        # from truncation: remaining paths carry (1/2)^k ... allow 15%.
        center = mean[24, 24]
        assert np.all(np.abs(center - 0.5) < 0.15), center
