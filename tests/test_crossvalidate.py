"""Cross-validation: rasterizer vs converged path tracer on the same scene
(SURVEY.md §4 — the reference's implicit golden check), plus SSIM helper.
"""

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


def ssim(a, b, c1=0.01**2, c2=0.03**2):
    """Global SSIM (single window) on luminance — adequate for small frames."""
    la = a.mean(-1)
    lb = b.mean(-1)
    mu_a, mu_b = la.mean(), lb.mean()
    va, vb = la.var(), lb.var()
    cov = ((la - mu_a) * (lb - mu_b)).mean()
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s") / "box.gltf")
    # Diffuse-ish box so raster's split-sum IBL approximation is tight.
    write_box_gltf(path, base_color=(0.6, 0.55, 0.5, 1.0), roughness=1.0, with_light=False)
    scene = load_gltf(path)
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    pools = jax.tree.map(jnp.asarray, scene.pools)
    world = flatten.build_world_geometry(
        pools, plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)), tri_flags
    )
    lights = flatten.gather_lights(scene, tf)
    # Smooth low-dynamic-range environment for small MC noise.
    h, w = 32, 64
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    z = 1.0 - 2.0 * vv
    eq = np.stack(
        [0.5 + 0.2 * z, 0.5 + 0.1 * z, 0.5 - 0.1 * z], -1
    ).astype(np.float32)
    env = E.build_environment(eq, cube_size=32)
    ptscene, meta = pt.make_pt_scene(
        world, jax.tree.map(jnp.asarray, scene.materials),
        jax.tree.map(jnp.asarray, scene.textures), jax.tree.map(jnp.asarray, lights),
        env=env,
    )
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=1.0, z_near=0.01)
    cam.world_to_view = look_at([2.0, -2.0, 1.5], [0, 0, 0])
    return ptscene, meta, cam


def test_raster_vs_pathtracer_ssim(setup):
    ptscene, meta, cam = setup
    res = 32
    c2w = jnp.asarray(cam.clip_to_world())

    raster = np.asarray(
        rasterizer.render(
            ptscene, meta, S.RenderSettings(), S.PathTracerParams(), c2w,
            jnp.asarray(cam.position()), (res, res), jnp.uint32(0),
        )
    )

    settings = S.PathTracerSettings(
        max_bounces=3, min_bounces=3, point_lights=False, luminance_clamp_enabled=False
    )
    trace_j = jax.jit(pt.trace, static_argnums=(1, 2, 5))
    acc = np.zeros((res, res, 3), np.float64)
    spp = 48
    for s in range(spp):
        acc += np.asarray(
            trace_j(ptscene, meta, settings, S.PathTracerParams(), c2w, (res, res),
                    jnp.uint32(s))
        )
    traced = acc / spp

    s = ssim(raster, traced)
    assert s > 0.9, s
    # Mean intensity agreement (split-sum vs ground truth) within 15%.
    rel = abs(raster.mean() - traced.mean()) / traced.mean()
    assert rel < 0.15, (raster.mean(), traced.mean())
