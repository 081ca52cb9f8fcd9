"""Native C++ asset library vs the Python reference implementations."""

import io

import numpy as np
import pytest

from funky_tpu.models import png_io
from funky_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native


def test_native_decodes_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 53, 4), dtype=np.uint8)
    p = tmp_path / "t.png"
    png_io.write_png(p, img)
    out = lib.decode_png(p.read_bytes())
    np.testing.assert_array_equal(out, img)


def test_native_matches_pure_on_all_filters(lib):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(6)
    x = np.linspace(0, 255, 96)
    img = (x[None, :, None] * np.ones((64, 1, 3))
           + rng.normal(0, 6, (64, 96, 3))).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="PNG")
    a = lib.decode_png(buf.getvalue())
    b = png_io._decode_png_pure(buf.getvalue())
    np.testing.assert_array_equal(a, b)


def test_native_duck_texture(lib, duck_gltf_path):
    raw = (duck_gltf_path.parent / "DuckCM.png").read_bytes()
    a = lib.decode_png(raw)
    b = png_io._decode_png_pure(raw)
    np.testing.assert_array_equal(a, b)


def test_native_srgb_lut(lib):
    lut = lib.srgb_lut()
    ref = png_io.srgb_to_linear(np.arange(256, dtype=np.float32) / 255.0)
    np.testing.assert_allclose(lut, ref, atol=1e-6)


def test_decode_prefers_native_transparently(lib, tmp_path):
    # png_io.decode_png should give identical output whichever backend runs.
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    p = tmp_path / "t.png"
    png_io.write_png(p, img)
    np.testing.assert_array_equal(png_io.read_png(p), img)
