"""Multi-mesh glTF/GLB scenes with PBR metallic-roughness materials
(BASELINE config 3): GLB container parsing, per-primitive materials,
material color baking, and rendering a multi-mesh scene end to end."""

import io
import json
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                             default_gltf_params, init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig


def _build_test_glb(tmp_path):
    """Two cubes (different PBR materials) + a textured quad, as one GLB."""
    def cube_mesh(offset, size=1.0):
        s = size / 2
        verts = np.array([
            [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
            [-s, -s, -s], [-s, s, -s], [s, s, -s], [s, -s, -s],
        ], np.float32) + np.asarray(offset, np.float32)
        idx = np.array([0, 1, 2, 2, 3, 0, 4, 5, 6, 6, 7, 4,
                        3, 2, 6, 6, 5, 3, 0, 4, 7, 7, 1, 0,
                        1, 7, 6, 6, 2, 1, 0, 3, 5, 5, 4, 0], np.uint16)
        return verts, idx

    v0, i0 = cube_mesh((-1.5, 0.5, 0.0))
    v1, i1 = cube_mesh((1.5, 0.5, 0.0))
    quad = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                    np.float32)
    quad_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    quad_idx = np.array([0, 1, 2, 2, 3, 0], np.uint16)

    # tiny 2x2 PNG texture
    from funky_tpu.models.png_io import write_png
    tex_path = tmp_path / "tex.png"
    write_png(tex_path, np.array([[[255, 0, 0, 255], [0, 255, 0, 255]],
                                  [[0, 0, 255, 255], [255, 255, 0, 255]]],
                                 np.uint8))
    tex_bytes = tex_path.read_bytes()

    blobs = []
    views = []
    accessors = []

    def add(data, target, count, ctype, atype, vmin=None, vmax=None):
        offset = sum(len(b) for b in blobs)
        pad = (-len(data)) % 4
        blobs.append(data + b"\0" * pad)
        views.append({"buffer": 0, "byteOffset": offset,
                      "byteLength": len(data)})
        acc = {"bufferView": len(views) - 1, "componentType": ctype,
               "count": count, "type": atype}
        if vmin is not None:
            acc["min"] = vmin
            acc["max"] = vmax
        accessors.append(acc)
        return len(accessors) - 1

    a_v0 = add(v0.tobytes(), 34962, len(v0), 5126, "VEC3",
               v0.min(0).tolist(), v0.max(0).tolist())
    a_i0 = add(i0.tobytes(), 34963, len(i0), 5123, "SCALAR")
    a_v1 = add(v1.tobytes(), 34962, len(v1), 5126, "VEC3",
               v1.min(0).tolist(), v1.max(0).tolist())
    a_i1 = add(i1.tobytes(), 34963, len(i1), 5123, "SCALAR")
    a_q = add(quad.tobytes(), 34962, len(quad), 5126, "VEC3",
              quad.min(0).tolist(), quad.max(0).tolist())
    a_quv = add(quad_uv.tobytes(), 34962, len(quad_uv), 5126, "VEC2")
    a_qi = add(quad_idx.tobytes(), 34963, len(quad_idx), 5123, "SCALAR")

    tex_off = sum(len(b) for b in blobs)
    blobs.append(tex_bytes + b"\0" * ((-len(tex_bytes)) % 4))
    views.append({"buffer": 0, "byteOffset": tex_off,
                  "byteLength": len(tex_bytes)})

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}, {"mesh": 2}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": a_v0},
                             "indices": a_i0, "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": a_v1},
                             "indices": a_i1, "material": 1}]},
            {"primitives": [{"attributes": {"POSITION": a_q,
                                            "TEXCOORD_0": a_quv},
                             "indices": a_qi, "material": 2}]},
        ],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "metallicFactor": 0.9, "roughnessFactor": 0.2}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.1, 0.1, 0.8, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.9}},
            {"pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.5, "roughnessFactor": 0.5}},
        ],
        "textures": [{"source": 0}],
        "images": [{"bufferView": len(views) - 1, "mimeType": "image/png"}],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": sum(len(b) for b in blobs)}],
    }

    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    binv = b"".join(blobs)
    glb = io.BytesIO()
    total = 12 + 8 + len(js) + 8 + len(binv)
    glb.write(struct.pack("<III", 0x46546C67, 2, total))
    glb.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
    glb.write(struct.pack("<II", len(binv), 0x004E4942) + binv)
    p = tmp_path / "multi.glb"
    p.write_bytes(glb.getvalue())
    return p


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
