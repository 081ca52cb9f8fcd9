"""JPEG decode: native (C++) and pure-numpy decoders vs PIL, bit-parity
between the two implementations, format dispatch, and a JPEG-textured GLB
rendering end to end (reference parity: the `image` crate decodes any
format a glTF references — gltf_loader.rs:100, 116)."""

import io
import pathlib

import numpy as np
import pytest

from funky_tpu.models import jpeg_io
from funky_tpu.utils import native

ASSET = pathlib.Path(__file__).parent / "assets" / "quad_tex_420p.jpg"


def _test_image(h=80, w=104):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        127 + 80 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0),
        127 + 60 * np.cos(xx / 13.0 + yy / 11.0),
        xx * 255 / w,
    ], axis=-1).clip(0, 255).astype(np.uint8)


def _encode(img, **kw):
    PIL = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", **kw)
    return buf.getvalue()


def _pil_decode(data):
    PIL = pytest.importorskip("PIL.Image")
    return np.asarray(PIL.open(io.BytesIO(data)).convert("RGBA"), np.uint8)


# (subsampling, progressive): 4:4:4 has no upsampling, so decoders should
# match PIL to IDCT rounding; subsampled variants differ from PIL's
# triangle-filter chroma upsampling (we use the spec's box replication,
# like a minimal decoder), so compare loosely on mean error.
@pytest.mark.parametrize("subs,prog,q,tol_max,tol_mean", [
    (0, False, 95, 2, 0.1),    # baseline 4:4:4
    (0, True, 92, 2, 0.1),     # progressive 4:4:4
    (2, False, 85, 48, 2.0),   # baseline 4:2:0
    (1, True, 88, 48, 2.0),    # progressive 4:2:2
])
def test_decoders_vs_pil(subs, prog, q, tol_max, tol_mean):
    img = _test_image()
    data = _encode(img, quality=q, subsampling=subs, progressive=prog)
    pil = _pil_decode(data)
    pure = jpeg_io.decode_jpeg_pure(data)
    assert pure.shape == pil.shape
    diff = np.abs(pure.astype(int) - pil.astype(int))
    assert diff.max() <= tol_max
    assert diff.mean() <= tol_mean
    if native.available():
        nat = native.decode_jpeg(data)
        np.testing.assert_array_equal(nat, pure)  # bit-identical paths


def test_grayscale_jpeg():
    img = _test_image()[..., 0]
    data = _encode(img, quality=92)
    pil = _pil_decode(data)
    pure = jpeg_io.decode_jpeg_pure(data)
    assert np.abs(pure.astype(int) - pil.astype(int)).max() <= 2
    assert np.all(pure[..., 0] == pure[..., 1])
    if native.available():
        np.testing.assert_array_equal(native.decode_jpeg(data), pure)


def test_restart_markers():
    """DRI/RSTn streams decode (predictor + EOB-run reset per interval)."""
    img = _test_image(48, 64)
    data = _encode(img, quality=90, subsampling=0, restart_marker_blocks=2)
    assert b"\xff\xdd" in data  # DRI actually present
    pure = jpeg_io.decode_jpeg_pure(data)
    pil = _pil_decode(data)
    assert np.abs(pure.astype(int) - pil.astype(int)).max() <= 2
    if native.available():
        np.testing.assert_array_equal(native.decode_jpeg(data), pure)


def test_committed_asset_decodes():
    """The committed progressive 4:2:0 asset decodes identically through
    both implementations (no PIL needed)."""
    data = ASSET.read_bytes()
    assert jpeg_io.is_jpeg(data)
    pure = jpeg_io.decode_jpeg_pure(data)
    assert pure.shape == (64, 64, 4)
    assert np.all(pure[..., 3] == 255)
    if native.available():
        np.testing.assert_array_equal(native.decode_jpeg(data), pure)


def test_decode_image_dispatch(tmp_path):
    from funky_tpu.models.png_io import write_png

    img = _test_image(16, 24)
    p = tmp_path / "t.png"
    rgba = np.concatenate([img, np.full(img.shape[:2] + (1,), 255,
                                        np.uint8)], axis=-1)
    write_png(p, rgba)
    np.testing.assert_array_equal(jpeg_io.decode_image(p.read_bytes()), rgba)
    out = jpeg_io.decode_image(ASSET.read_bytes())
    assert out.shape == (64, 64, 4)


def test_jpeg_textured_glb_renders(tmp_path):
    """A GLB whose texture is an embedded JPEG loads and renders with the
    texture visible (gltf_loader.rs:107-116 parity)."""
    from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                                 default_gltf_params, init_frame_state)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.sample_scenes import build_textured_quad_glb
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.raster import RasterConfig

    glb = build_textured_quad_glb(tmp_path / "quad.glb", ASSET.read_bytes())
    scene = GltfScene.load(glb)
    assert len(scene.textures) == 1
    tex = scene.textures[0]
    assert (tex.width, tex.height) == (64, 64)
    np.testing.assert_array_equal(tex.data, jpeg_io.decode_jpeg_pure(
        ASSET.read_bytes()))

    ds = build_device_scene(scene)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=64, backend="jnp")
    cfg = GltfConfig(width=192, height=112, shadow_map_size=64,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=0.0, gltf_scale=1.0)
    frame = compiled_gltf_frame(cfg)
    rgba, _ = frame(ds, params, init_frame_state(cfg))
    img = np.asarray(rgba)
    assert np.isfinite(img).all()
    # the checkered texture has strong blue squares; some should shade in
    blue = (img[..., 2] > 0.25) & (img[..., 2] > img[..., 0] * 1.3) \
        & (img[..., 2] > img[..., 1] * 1.1)
    assert blue.sum() > 30
