#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip path tracing a DamagedHelmet-class scene
at 1080p (BASELINE.json north star: >= 50 Mrays/s/chip).

Scene: ~48k-triangle textured sphere (DamagedHelmet is ~46k tris) + HDR
environment with importance-sampled NEE + MIS, max_bounces=2 (reference
default, Main.cpp:470-471), luminance clamp on, progressive accumulation.
Rays counted are actual traced segments (primary + bounce + shadow), summed
on-device during the render.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def build_bench_scene(width, height, scene_kind=None):
    """Bench scene + camera. scene_kind (or $BENCH_SCENE): "helmet" (default,
    DamagedHelmet-class ~48k-tri textured sphere) or "courtyard" (Sponza-class
    ~274k-tri colonnaded courtyard with alpha-MASKED banners — BASELINE
    config-5 analogue, alpha shadows on). Returns
    (ptscene, meta, settings, params, c2w, n_tris)."""
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from gltf_renderer_tpu.camera import Camera, look_at
    from gltf_renderer_tpu.env.environment import build_environment
    from gltf_renderer_tpu.render import pathtracer as pt
    from gltf_renderer_tpu.render import settings as S
    from gltf_renderer_tpu.scene import flatten
    from gltf_renderer_tpu.scene.gltf import load_gltf
    from gltf_renderer_tpu.scene.procedural import write_textured_sphere_glb

    t_b = time.time()

    def mark(label):
        nonlocal t_b
        print(f"[bench]   {label}: {time.time() - t_b:.1f}s", file=sys.stderr,
              flush=True)
        t_b = time.time()

    scene_kind = scene_kind or os.environ.get("BENCH_SCENE", "helmet")
    d = tempfile.mkdtemp(prefix="bench_scene_")
    if scene_kind.startswith("courtyard"):
        from gltf_renderer_tpu.scene.procedural import write_courtyard_glb

        # "courtyard" ~274k tris; "courtyard2" ~1.1M tris (the 1M-triangle
        # soak — the reference's BLAS vertex cap scale, Config.h:25; exceeds
        # the Pallas VMEM budget so it exercises the XLA fallback path).
        density = 2 if scene_kind == "courtyard2" else 1
        path = write_courtyard_glb(os.path.join(d, "courtyard.glb"),
                                   density=density)
    else:
        path = write_textured_sphere_glb(
            os.path.join(d, "helmet_class.glb"), tex_size=512, n_lat=128, n_lon=192,
            metallic=0.3, roughness=0.45,
        )
    scene = load_gltf(path)
    mark("glb write+load")

    # Load-time precompute stays OFF the TPU: a device round trip through
    # the tunnel intermittently costs minutes (docs/PERFORMANCE.md).
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu):
        pools = jax.tree.map(jnp.asarray, scene.pools)
        world = jax.tree.map(np.asarray, flatten.build_world_geometry(
            pools, plan, jnp.asarray(tf),
            jnp.asarray(flatten.normal_transforms(tf)), tri_flags
        ))
    lights = flatten.gather_lights(scene, tf)

    # Analytic HDR sky (sun-ish hotspot + gradient), 512x256 equirect.
    h, w = 256, 512
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    z = 1.0 - 2.0 * vv
    phi = 2 * np.pi * uu
    s = np.sqrt(np.maximum(1 - z * z, 0))
    d3 = np.stack([s * np.cos(phi), s * np.sin(phi), z], -1)
    sun = np.asarray([0.5, 0.3, 0.8])
    sun /= np.linalg.norm(sun)
    hotspot = 50.0 * np.maximum((d3 * sun).sum(-1), 0.0) ** 200
    sky = 0.4 + 0.6 * np.maximum(d3[..., 2], 0)
    eq = np.stack(
        [hotspot + 0.8 * sky, hotspot + 0.85 * sky, hotspot + sky], -1
    ).astype(np.float32)
    env = build_environment(eq, cube_size=128)
    mark("env build")

    ptscene, meta = pt.make_pt_scene(
        world, scene.materials, scene.textures, lights, env=env,
    )
    mark("make_pt_scene")
    n_tris = int(np.asarray(world.tri_vertex).shape[0])

    settings = S.PathTracerSettings(
        max_bounces=2, min_bounces=2,
        alpha_shadows=scene_kind.startswith("courtyard"),
    )
    params = S.PathTracerParams()
    cam = Camera(y_fov=np.pi / 3, aspect_ratio=width / height, z_near=0.01)
    if scene_kind.startswith("courtyard"):
        # Interior colonnade view (the scene ships the same camera at node 1).
        cam.world_to_view = look_at([-9.0, 0.0, 1.7], [1.0, 0.0, 1.6])
    else:
        cam.world_to_view = look_at([1.1, -1.1, 0.6], [0.0, 0.0, 0.0])
    c2w = jnp.asarray(cam.clip_to_world())
    return ptscene, meta, settings, params, c2w, n_tris


FIDELITY_RES = (256, 144)
FIDELITY_SPP = 32  # 8 spp measured SSIM-bound by discrete path flips (~4% of
# pixels pick a different bounce path at decision boundaries across backends
# — one flipped sample dominates a pixel at 8 spp); 32 spp averages them out
# so the probe measures image fidelity, not sampler tie-breaks.
FIDELITY_GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tests", "goldens", "bench_fidelity.npy",
)


def render_fidelity_probe(ptscene, meta, settings, params, c2w):
    """Mean radiance of FIDELITY_SPP fixed-seed samples at FIDELITY_RES.

    Reuses the bench scene (FIDELITY_RES is 16:9, so the camera matrix is
    identical). Seeds are pinned; the committed golden (tools/make_goldens.py
    bench_fidelity) is the CPU render with the perf table knobs forced OFF
    (f32 rows), so a TPU probe under bench defaults measures backend
    numerics + kernel choice + table quantization combined — the gate the
    BASELINE north star's SSIM axis wants (>= 0.995 committed bar).
    """
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.render import pathtracer as pt

    w, h = FIDELITY_RES
    trace_j = jax.jit(pt.trace, static_argnums=(1, 2, 5))
    acc = np.zeros((h, w, 3), np.float64)
    for s in range(1, FIDELITY_SPP + 1):
        acc += np.asarray(
            trace_j(ptscene, meta, settings, params, c2w, (w, h), jnp.uint32(s))
        )
    return (acc / FIDELITY_SPP).astype(np.float32)


def fidelity_ssim(probe):
    """Windowed SSIM of the probe vs the committed CPU golden (or None)."""
    if not os.path.exists(FIDELITY_GOLDEN):
        return None
    from gltf_renderer_tpu.utils.ssim import ssim

    golden = np.load(FIDELITY_GOLDEN).astype(np.float32)
    if golden.shape != probe.shape:
        return None
    rng_ = float(max(golden.max(), probe.max(), 1e-6))
    return round(ssim(probe, golden, data_range=rng_), 5)


def measure_raster_fps(ptscene, meta, params, c2w, resolution, frames=6):
    """Full raster frame rate: draw_scene (raycast visibility + forward
    shading) + bloom + AgX tonemap at the bench resolution, timed pipelined
    over `frames` warm frames (one warm-up frame discarded)."""
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.render import settings as S
    from gltf_renderer_tpu.render.renderer import _post_step, _raster_step

    w, h = resolution
    rs = S.RenderSettings(backend="rasterizer", width=w, height=h)
    cam_pos = jnp.asarray([1.1, -1.1, 0.6])  # the bench helmet camera eye

    def frame(seed):
        hdr = _raster_step(ptscene, meta, rs, params, c2w, cam_pos,
                           resolution, jnp.uint32(seed), "raycast")
        return _post_step(hdr, rs.tonemap, rs.bloom, jnp.uint32(seed))

    t0 = time.time()
    jax.block_until_ready(frame(0))
    print(f"[bench] raster warm/compile {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    jax.block_until_ready(frame(1))
    t0 = time.time()
    outs = [frame(2 + i) for i in range(frames)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / frames
    print(f"[bench] raster {dt * 1e3:.1f} ms/frame = {1.0 / dt:.2f} FPS",
          file=sys.stderr, flush=True)
    return round(1.0 / dt, 3)


def _tunnel_alive() -> bool:
    """Under the axon tunnel, device init HANGS forever if the local relay
    is down (observed round 3: the relay process died mid-round and
    jax.devices() never returned). Probe the relay port so the bench fails
    FAST with an honest zero instead of hanging the driver."""
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True
    import socket

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082))
        return True
    except OSError:
        return False
    finally:
        s.close()


def _warm_pallas():
    """One tiny Pallas dispatch before anything is timed. On the axon tunnel
    a fresh process returns EARLY from block_until_ready until the first
    pallas dispatch lands (docs/PERFORMANCE.md 'Timing honesty') — warming
    here makes every later number honest regardless of call order."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # The tunnel backend is named "axon", NOT "tpu" — device detection
        # in this repo is `!= "cpu"` (pathtracer._pallas_available). The
        # previous `!= "tpu"` test interpreted the warm-up ON the device,
        # so no real dispatch landed and timings stayed fake-fast.
        interpret=jax.default_backend() == "cpu",
    )(x)
    jax.block_until_ready(out)


def main():
    t_setup = time.time()
    if not _tunnel_alive():
        print(json.dumps({"detail": {
            "error": "TPU tunnel relay down (port 8082 refused) — no device; "
                     "last measured on-chip: helmet 3.30 Mrays/s, see "
                     "docs/PERFORMANCE.md"}}), file=sys.stderr)
        print(json.dumps({
            "metric": "pt_mrays_per_s_per_chip_1080p", "value": 0.0,
            "unit": "Mrays/s", "vs_baseline": 0.0,
        }))
        return
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.render import pathtracer as pt

    try:
        _warm_pallas()
    except Exception as e:  # CPU-only runs etc. must not sink the bench
        print(f"[bench] pallas warm-up failed: {e}", file=sys.stderr)
    print(f"[bench] pallas warm in {time.time() - t_setup:.1f}s",
          file=sys.stderr, flush=True)

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    steps = int(os.environ.get("BENCH_STEPS", 8))
    # Samples per pixel traced INSIDE each dispatch (pixel slice shrinks to
    # keep ray count per dispatch constant). Default 4: the fixed-cost
    # amortization measured +9% helmet (3.30->3.598) and +19% courtyard
    # (0.777->0.927) on-chip (CHIP_QUEUE_RESULTS round 4); estimator is
    # bit-identical to spp sequential seeds (tests/test_pathtracer_spp).
    spp = int(os.environ.get("BENCH_SPP", 4))

    ptscene, meta, settings, params, c2w, n_tris = build_bench_scene(width, height)
    scene_s = time.time() - t_setup
    print(f"[bench] scene built in {scene_s:.1f}s", file=sys.stderr, flush=True)

    def trace_j(sc, c, s):
        return pt.trace_chunked(
            sc, meta, settings, params, c, (width, height), s, with_stats=True,
            spp=spp,
        )

    # Warmup / compile, then ONE discarded timed step: the first post-compile
    # dispatch through the tunnel carries residual transfer/cache effects
    # (round-4 reconciliation: the ledger's 9.87 vs the driver's 6.73 on the
    # same config was dominated by cold-start inside the timed window).
    img, stats0 = trace_j(ptscene, c2w, jnp.uint32(0))
    jax.block_until_ready((img, stats0))
    setup_s = time.time() - t_setup
    print(f"[bench] warmup done, compile {setup_s - scene_s:.1f}s",
          file=sys.stderr, flush=True)
    t_w = time.time()
    jax.block_until_ready(trace_j(ptscene, c2w, jnp.uint32(999)))
    print(f"[bench] warm step (discarded): {time.time() - t_w:.2f}s",
          file=sys.stderr, flush=True)

    # Headline: pipelined (enqueue all steps, block once) — host-side chunk
    # loops pipeline on the tunnel, so this is the deployment-shaped number.
    t0 = time.time()
    acc = None
    stats_list = []
    for i in range(steps):
        img, stats = trace_j(ptscene, c2w, jnp.uint32(i + 1))
        acc = img if acc is None else acc + img
        # Keep stats ON DEVICE: float(stats[0]) here would block per step,
        # serializing the loop on tunnel round-trips (round-5 profile showed
        # the chip ~30-40% idle inside the "pipelined" window).
        stats_list.append(stats)
    totals = jnp.sum(jnp.stack(stats_list), 0)
    jax.block_until_ready((acc, totals))
    elapsed = time.time() - t0
    total_rays = float(totals[0])
    nan_count = float(totals[1])

    # Per-step diagnostics (blocked; ~28 ms RPC overhead each): exposes
    # outlier steps so a variance-dominated run is visible in the artifact.
    step_s = []
    for i in range(steps):
        t1 = time.time()
        jax.block_until_ready(trace_j(ptscene, c2w, jnp.uint32(i + 1)))
        step_s.append(round(time.time() - t1, 3))

    mrays = total_rays / elapsed / 1e6
    scene_kind = os.environ.get("BENCH_SCENE", "helmet")

    ssim_score = None
    if scene_kind == "helmet" and os.environ.get("BENCH_SSIM", "1") != "0":
        try:
            probe = render_fidelity_probe(ptscene, meta, settings, params, c2w)
            ssim_score = fidelity_ssim(probe)
        except Exception as e:  # fidelity probe must never sink the bench
            print(f"[bench] fidelity probe failed: {e}", file=sys.stderr)

    # Raster backend FPS (BASELINE.json's raster axis: helmet, IBL + bloom +
    # AgX full frame, Rasterizer.cpp:150-288 pass chain).
    raster_fps = None
    if scene_kind == "helmet" and os.environ.get("BENCH_RASTER", "1") != "0":
        try:
            raster_fps = measure_raster_fps(
                ptscene, meta, params, c2w, (width, height))
        except Exception as e:  # raster probe must never sink the PT metric
            print(f"[bench] raster probe failed: {e}", file=sys.stderr)
    metric = ("pt_mrays_per_s_per_chip_1080p" if scene_kind == "helmet"
              else f"pt_mrays_per_s_{scene_kind}_1080p")
    result = {
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "resolution": [width, height],
                    "triangles": n_tris,
                    "steps": steps,
                    "spp_per_dispatch": spp,
                    "elapsed_s": round(elapsed, 3),
                    "rays": total_rays,
                    "setup_s": round(setup_s, 1),
                    "device": str(jax.devices()[0]),
                    "mean_radiance": float(np.asarray(acc).mean() / steps),
                    "nan_pixels": nan_count,
                    "ssim_vs_cpu_32spp": ssim_score,
                    "gates": {
                        "nan_pixels_zero": nan_count == 0.0,
                        # None (not false) when the probe didn't run — the
                        # SSIM golden exists for the helmet config only.
                        "ssim_ge_0995": (None if ssim_score is None
                                         else ssim_score >= 0.995),
                    },
                    "raster_fps": raster_fps,
                    "step_s": step_s,
                    "mrays_median_step": round(
                        (total_rays / steps) / sorted(step_s)[steps // 2] / 1e6,
                        3) if step_s else None,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
