"""Multi-mesh glTF/GLB scenes with PBR metallic-roughness materials
(BASELINE config 3): GLB container parsing, per-primitive materials,
material color baking, per-mesh textures, and rendering a multi-mesh
scene end to end."""

import numpy as np
import pytest

from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                             default_gltf_params, init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.sample_scenes import build_multimesh_glb
from funky_tpu.models.scene import FLAG_USE_TEXTURE, build_device_scene
from funky_tpu.ops.raster import RasterConfig


def _build_test_glb(tmp_path, two_textures=False):
    return build_multimesh_glb(tmp_path / "multi.glb",
                               two_textures=two_textures)


@pytest.fixture()
def glb_scene(tmp_path):
    return GltfScene.load(_build_test_glb(tmp_path))


def test_glb_multi_mesh_loading(glb_scene):
    s = glb_scene
    assert len(s.meshes) == 3
    assert len(s.materials) == 3
    assert len(s.textures) == 1
    assert s.textures[0].width == 2 and s.textures[0].height == 2
    np.testing.assert_array_equal(s.textures[0].data[0, 0],
                                  [255, 0, 0, 255])


def test_glb_pbr_materials(glb_scene):
    m0, m1, m2 = glb_scene.materials
    np.testing.assert_allclose(m0.base_color, [0.8, 0.1, 0.1, 1.0])
    assert m0.metallic == pytest.approx(0.9)
    assert m0.roughness == pytest.approx(0.2)
    assert m1.metallic == pytest.approx(0.0)
    assert m2.base_color_texture_index == 0


def test_glb_bounds(glb_scene):
    # cubes centered at (+-1.5, 0.5) with half-size .5 => x in [-2, 2],
    # y in [0, 1]; quad spans [-1, 1] in x/z at y=0
    np.testing.assert_allclose(glb_scene.bounds_min, [-2, 0, -1], atol=1e-6)
    np.testing.assert_allclose(glb_scene.bounds_max, [2, 1, 1], atol=1e-6)


def test_multimesh_scene_packs_and_renders(glb_scene):
    ds = build_device_scene(glb_scene)
    assert ds.num_triangles == 12 + 12 + 2 + 2  # cubes + quad + ground
    # material base colors baked per mesh
    cols = np.asarray(ds.colors)
    assert np.allclose(cols[4:12], [0.8, 0.1, 0.1])   # first cube verts

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=128, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(glb_scene.bounds_min[1]),
                                 gltf_scale=1.0)
    frame = compiled_gltf_frame(cfg)
    rgba, _ = frame(ds, params, init_frame_state(cfg))
    img = np.asarray(rgba)
    assert np.isfinite(img).all()
    # both colored cubes visible: some reddish and some bluish pixels
    red = (img[..., 0] > img[..., 2] * 1.5) & (img[..., 0] > 0.1)
    blue = (img[..., 2] > img[..., 0] * 1.5) & (img[..., 2] > 0.15) \
        & (img[..., 1] < img[..., 2])
    assert red.sum() > 20
    assert blue.sum() > 20


def test_per_mesh_texture_slots(tmp_path):
    """Materials without a texture render untextured; materials with
    different baseColorTexture indices land on their own layers (beyond
    the reference's single binding, gltf_renderer.rs:217-277)."""
    scene = GltfScene.load(_build_test_glb(tmp_path, two_textures=True))
    assert len(scene.textures) == 2
    ds = build_device_scene(scene)
    assert ds.texture.shape[0] == 2          # two layers
    # 2x2 quad texture wrap-padded to the 4x4 checker size
    np.testing.assert_array_equal(np.asarray(ds.texture_sizes),
                                  [[2, 2], [4, 4]])
    tex = np.asarray(ds.texture)
    np.testing.assert_allclose(tex[0, :2, 2:4], tex[0, :2, 0:2])  # wrap

    flags = np.asarray(ds.tri_flags)[:ds.num_triangles]
    # ground(2) + cube0(12, checker layer 1) + cube1(12, none) + quad(2,
    # layer 0)
    assert (flags[:2] == 0).all()
    assert (flags[2:14] == (FLAG_USE_TEXTURE | (1 << 8))).all()
    assert (flags[14:26] == 0).all()
    assert (flags[26:28] == FLAG_USE_TEXTURE).all()


def test_per_mesh_textures_render(tmp_path):
    scene = GltfScene.load(_build_test_glb(tmp_path, two_textures=True))
    ds = build_device_scene(scene)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=128, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(scene.bounds_min[1]),
                                 gltf_scale=1.0)
    rgba, _ = compiled_gltf_frame(cfg)(ds, params, init_frame_state(cfg))
    img = np.asarray(rgba)
    assert np.isfinite(img).all()
    # cube0 = red base x checker: red-dominant pixels with HIGH brightness
    # variance (bright vs dark squares) on the left half; cube1 stays
    # flat blue on the right (its untextured pixels are near-uniform).
    left = img[:, :128]
    right = img[:, 128:]
    reddish = (left[..., 0] > left[..., 2] * 1.5) & (left[..., 0] > 0.02)
    assert reddish.sum() > 40
    assert left[..., 0][reddish].std() > 0.08    # checker modulation
    blue = (right[..., 2] > right[..., 0] * 1.5) & (right[..., 2] > 0.15)
    assert blue.sum() > 20


def test_block_sparse_texture_matches_dense(tmp_path):
    """Block-sparse texture sampling (8x8 textured-block compaction) is
    bit-identical to dense sampling, including at tiny capacities (dense
    lax.cond fallback)."""
    import dataclasses

    scene = GltfScene.load(_build_test_glb(tmp_path, two_textures=True))
    ds = build_device_scene(scene)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=128, backend="jnp")
    base = GltfConfig(width=256, height=144, shadow_map_size=128,
                      raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(scene.bounds_min[1]),
                                 gltf_scale=1.0)

    def run(cfg):
        rgba, _ = compiled_gltf_frame(cfg)(ds, params,
                                           init_frame_state(cfg))
        return np.asarray(rgba)

    dense = run(dataclasses.replace(base, texture_block_capacity=0))
    auto = run(base)
    tiny = run(dataclasses.replace(base, texture_block_capacity=2))
    # The three configs are separately-compiled programs: XLA/LLVM's
    # contextual fp codegen makes the tiny uniform math drift by ~1 ulp
    # between them (see frame.compute_frame_uniforms), which is not what
    # this test is about. A wrong texel/layer would differ by >1e-3.
    np.testing.assert_allclose(auto, dense, atol=1e-6)
    np.testing.assert_allclose(tiny, dense, atol=1e-6)
