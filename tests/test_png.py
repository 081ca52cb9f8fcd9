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


def _chunk(tag, payload):
    import struct
    import zlib

    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _png_bytes(ihdr, raw):
    import struct
    import zlib

    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def _decoders():
    """Every available decode path: (name, fn)."""
    out = [("pure", png_io._decode_png_pure)]
    try:
        from funky_tpu.utils import native

        if native.decode_png(b"") is None:  # loads the lib; bad data -> None
            pass
    except Exception:
        return out
    from funky_tpu.utils import native

    def native_fn(data):
        r = native.decode_png(data)
        assert r is not None, "native decoder rejected the file"
        return r
    out.append(("native", native_fn))
    return out


def test_decode_16bit_rgb():
    """16-bit channels fold to the high byte (image crate to_rgba8)."""
    import struct

    rng = np.random.default_rng(5)
    h, w = 5, 7
    img16 = rng.integers(0, 65536, (h, w, 3)).astype(">u2")
    raw = b"".join(b"\x00" + img16[y].tobytes() for y in range(h))
    png = _png_bytes(struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0), raw)
    want = (img16.astype(np.uint16) >> 8).astype(np.uint8)
    for name, fn in _decoders():
        got = fn(png)
        assert got.shape == (h, w, 4), name
        np.testing.assert_array_equal(got[..., :3], want, err_msg=name)
        assert (got[..., 3] == 255).all(), name


def test_decode_interlaced_rgba():
    """Adam7: assembled image equals the plain encoding of the same."""
    import struct

    rng = np.random.default_rng(7)
    h, w = 9, 13   # non-multiples of 8 exercise partial passes
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = b""
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += b"".join(b"\x00" + sub[y].tobytes()
                        for y in range(sub.shape[0]))
    png = _png_bytes(struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1), raw)
    for name, fn in _decoders():
        np.testing.assert_array_equal(fn(png), img, err_msg=name)


def test_decode_4bit_gray():
    import struct

    h, w = 3, 5
    vals = np.asarray([[0, 3, 7, 11, 15]] * h, np.uint8)   # 4-bit values
    packed = np.zeros((h, 3), np.uint8)
    packed[:, 0] = (vals[:, 0] << 4) | vals[:, 1]
    packed[:, 1] = (vals[:, 2] << 4) | vals[:, 3]
    packed[:, 2] = vals[:, 4] << 4
    raw = b"".join(b"\x00" + packed[y].tobytes() for y in range(h))
    png = _png_bytes(struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 0), raw)
    want = (vals.astype(np.uint16) * 17).astype(np.uint8)  # 255/15
    for name, fn in _decoders():
        got = fn(png)
        np.testing.assert_array_equal(got[..., 0], want, err_msg=name)
        np.testing.assert_array_equal(got[..., 1], want, err_msg=name)
