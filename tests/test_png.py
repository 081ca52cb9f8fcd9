"""PNG decode/encode round trips + pure-decoder parity with PIL."""

import io

import numpy as np
import pytest

from funky_tpu.models import png_io


def _random_rgba(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)


def test_write_read_roundtrip(tmp_path):
    img = _random_rgba(33, 47)
    p = tmp_path / "t.png"
    png_io.write_png(p, img)
    out = png_io.read_png(p)
    np.testing.assert_array_equal(out, img)


def test_pure_decoder_matches_default(tmp_path):
    img = _random_rgba(16, 24, seed=1)
    p = tmp_path / "t.png"
    png_io.write_png(p, img)
    raw = p.read_bytes()
    out = png_io._decode_png_pure(raw)
    np.testing.assert_array_equal(out, img)


def test_pure_decoder_all_filters():
    # Encode with PIL (which uses adaptive filtering incl. Paeth) and check
    # the pure decoder agrees.
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(2)
    # smooth gradient → PIL picks non-zero filters
    x = np.linspace(0, 255, 64)
    img = (x[None, :, None] * np.ones((48, 1, 3))
           + rng.normal(0, 4, (48, 64, 3))).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="PNG")
    out = png_io._decode_png_pure(buf.getvalue())
    np.testing.assert_array_equal(out[..., :3], img)
    assert np.all(out[..., 3] == 255)


def test_duck_texture_decodes(duck_gltf_path):
    raw = (duck_gltf_path.parent / "DuckCM.png").read_bytes()
    a = png_io.decode_png(raw)
    b = png_io._decode_png_pure(raw)
    np.testing.assert_array_equal(a, b)


def test_srgb_round_trip():
    x = np.linspace(0, 1, 256).astype(np.float32)
    lin = png_io.srgb_to_linear(x)
    back = np.asarray(png_io.linear_to_srgb(lin))
    np.testing.assert_allclose(back, x, atol=1e-5)
    # spot values
    assert abs(png_io.srgb_to_linear(np.float32(0.5)) - 0.21404114) < 1e-6
