import numpy as np

from gltf_renderer_tpu.scene.gltf import load_gltf
from gltf_renderer_tpu.scene import flatten
from gltf_renderer_tpu.scene import types as T
from tests.scenes import write_box_gltf, write_textured_sphere_glb, write_skinned_gltf, write_morph_gltf


def test_load_box(tmp_path):
    path = write_box_gltf(str(tmp_path / "box.gltf"))
    scene = load_gltf(path)
    assert scene.pools.positions.shape == (24, 3)
    assert scene.pools.tri_vertex.shape == (12, 3)
    assert len(scene.nodes) == 2
    assert len(scene.light_nodes) == 1
    # Material 0 is the default; the box uses material 1.
    assert scene.primitives.material[0] == 1
    np.testing.assert_allclose(
        scene.materials.base_color_factor[1], [0.8, 0.2, 0.2, 1.0], atol=1e-6
    )
    # Normals survive quantization roughly.
    n = scene.pools.normals
    assert np.abs(np.linalg.norm(n, axis=-1) - 1).max() < 1e-3


def test_box_flatten_world():
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = write_box_gltf(os.path.join(d, "box.gltf"))
        scene = load_gltf(path)
        tf = flatten.compute_global_transforms(scene)
        # Y-up -> Z-up: the +Y face normal (0,1,0) becomes +Z.
        plan = flatten.build_instance_plan(scene)
        tri_flags = flatten.plan_tri_flags(plan, scene.primitives)
        import jax.numpy as jnp

        world = flatten.build_world_geometry(
            jax_pools(scene), plan, jnp.asarray(tf), jnp.asarray(flatten.normal_transforms(tf)),
            tri_flags,
        )
        wp = np.asarray(world.position)
        assert wp.shape == (24, 3)
        # glTF (0, 0.5, 0) (top in Y-up) -> world (0, 0, 0.5).
        src_top = np.asarray(scene.pools.positions)
        k = np.argmax(src_top[:, 1])
        assert abs(wp[k][2] - 0.5) < 1e-5
        # Lights gathered in world space.
        lights = flatten.gather_lights(scene, tf)
        np.testing.assert_allclose(lights.position[0], [2.0, -2.0, 2.0], atol=1e-5)


def jax_pools(scene):
    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, scene.pools)


def test_load_glb_textured(tmp_path):
    path = write_textured_sphere_glb(str(tmp_path / "sphere.glb"))
    scene = load_gltf(path)
    assert scene.textures.atlas.shape[2] == 4
    assert scene.textures.width[0] == 64
    assert scene.materials.tex_index[1, T.TEX_ALBEDO] == 0
    assert scene.textures.srgb[0] == 1
    assert scene.textures.wrap_t[0] == T.WRAP_CLAMP


def test_load_skinned(tmp_path):
    path = write_skinned_gltf(str(tmp_path / "skin.gltf"))
    scene = load_gltf(path)
    assert len(scene.skins) == 1
    assert list(scene.skins[0].joints) == [1, 2]
    assert len(scene.animations) == 1
    assert scene.animations[0].duration == 2.0
    assert scene.primitives.has_joints[0] == 1


def test_load_morph(tmp_path):
    path = write_morph_gltf(str(tmp_path / "morph.gltf"))
    scene = load_gltf(path)
    assert scene.primitives.morph_count[0] == 1
    assert scene.pools.morph_pos.shape == (24, 3)
    assert scene.meshes[0].weights is not None
