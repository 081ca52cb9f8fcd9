"""PNG decode/encode.

Decode prefers the native zlib-backed decoder in ``native/`` (built C++
helper) then PIL, then falls back to a pure-Python implementation (stdlib
zlib + numpy unfiltering) so the framework stays dependency-light.

The reference decodes textures with the `image` crate into RGBA8
(gltf_loader.rs:96-127) and uploads them as R8G8B8A8_SRGB
(gltf_renderer.rs:1495), i.e. the sampler returns *linear* light. Decoding
to linear float is done in models/scene.py, not here — this module returns
raw RGBA8 bytes exactly like the reference loader.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (H, W, 4) uint8 RGBA array."""
    try:
        from funky_tpu.utils import native  # noqa: PLC0415

        out = native.decode_png(data)
        if out is not None:
            return out
    except Exception:
        pass
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(data)).convert("RGBA")
        return np.asarray(img, np.uint8)
    except ImportError:
        return _decode_png_pure(data)


def read_png(path: str | Path) -> np.ndarray:
    return decode_png(Path(path).read_bytes())


def write_png(path: str | Path, rgba: np.ndarray) -> None:
    """Write (H, W, 3|4) uint8 (or float in [0,1]) as PNG."""
    arr = np.asarray(rgba)
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    h, w, c = arr.shape
    color_type = {3: 2, 4: 6}[c]

    # filter type 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1).tobytes()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (_PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    Path(path).write_bytes(png)


# ---------------------------------------------------------------------------
# Pure-Python decoder (fallback): 8-bit gray/RGB/RGBA/palette, all filters.
# ---------------------------------------------------------------------------

def _decode_png_pure(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    palette: np.ndarray | None = None
    trns: np.ndarray | None = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"pure decoder supports 8-bit non-interlaced PNGs only "
                    f"(depth={bit_depth}, interlace={interlace})")
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    assert width is not None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    img = _unfilter(rows[:, 1:].copy(), filters, channels)
    if color_type == 3:  # palette
        assert palette is not None
        rgb = palette[img.reshape(height, width)]
        if trns is not None:
            a = np.full((height, width), 255, np.uint8)
            idx = img.reshape(height, width)
            mask = idx < len(trns)
            a[mask] = trns[idx[mask]]
        else:
            a = np.full((height, width), 255, np.uint8)
        return np.concatenate([rgb, a[..., None]], axis=-1)
    img = img.reshape(height, width, channels)
    if color_type == 0:  # gray
        return np.concatenate(
            [np.repeat(img, 3, axis=-1),
             np.full((height, width, 1), 255, np.uint8)], axis=-1)
    if color_type == 4:  # gray+alpha
        return np.concatenate(
            [np.repeat(img[..., :1], 3, axis=-1), img[..., 1:]], axis=-1)
    if color_type == 2:  # rgb
        return np.concatenate(
            [img, np.full((height, width, 1), 255, np.uint8)], axis=-1)
    return img  # rgba


def _unfilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters. Rows mutated in place (uint8)."""
    h, stride = rows.shape
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f = filters[y]
        row = rows[y].astype(np.uint16)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif f == 2:  # Up
            row = (row + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        rows[y] = row.astype(np.uint8)
        prev = row
    return rows


def srgb_to_linear(srgb: np.ndarray) -> np.ndarray:
    """Exact sRGB EOTF — what R8G8B8A8_SRGB sampling performs in hardware."""
    s = np.asarray(srgb, np.float32)
    return np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(linear):
    """Exact sRGB OETF — what writing to an _SRGB swapchain image performs.

    Works with numpy or jax arrays.
    """
    import jax.numpy as jnp

    lin = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(lin <= 0.0031308,
                     lin * 12.92,
                     1.055 * jnp.power(lin, 1.0 / 2.4) - 0.055)
