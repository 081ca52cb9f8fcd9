"""Texture / shadow-map samplers as vectorized gathers.

Software equivalents of the reference's Vulkan samplers, with the exact
filter/address/compare configuration each binding uses:

- binding 1 texSampler: LINEAR mag/min, REPEAT
  (gltf_renderer.rs:1555-1565).
- binding 2 shadowMap (sampler2DArrayShadow): LINEAR + compare
  LESS_OR_EQUAL + CLAMP_TO_BORDER white (gltf_renderer.rs:806-819)
  — i.e. a hardware 2x2 PCF tap: four texel compares, bilinearly blended.
- binding 3 shadowMapDepth (raw depth): LINEAR, CLAMP_TO_BORDER white
  (gltf_renderer.rs:822-831).
- bindings 6/7 sceneDepth linear/nearest: CLAMP_TO_EDGE
  (gltf_renderer.rs:835-858).

All samplers take uv with (0,0) = top-left texel corner (Vulkan), and use
the GL/Vulkan bilinear rule: texel coords = uv*size - 0.5.

Shapes: uv may be any batch shape (..., 2); textures are (H, W, C) or
(H, W). Gathers use flattened int32 indices — one `take` per tap, which XLA
lowers to a dynamic-gather; the Pallas fast paths keep the tables in VMEM.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray):
    """img (H, W) or (H, W, C); iy/ix int32 of identical batch shape."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape((h * w,) + img.shape[2:])
    return jnp.take(flat, iy * w + ix, axis=0)


def sample_bilinear_repeat(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """LINEAR filter + REPEAT addressing (texSampler)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    ix0 = jnp.mod(x0.astype(jnp.int32), w)
    iy0 = jnp.mod(y0.astype(jnp.int32), h)
    ix1 = jnp.mod(ix0 + 1, w)
    iy1 = jnp.mod(iy0 + 1, h)
    t00 = _gather2d(tex, iy0, ix0)
    t10 = _gather2d(tex, iy0, ix1)
    t01 = _gather2d(tex, iy1, ix0)
    t11 = _gather2d(tex, iy1, ix1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def _bilinear_clamped_taps(shape_hw, uv):
    """Common bilinear tap setup with CLAMP handling split out: returns
    (iy0, ix0, iy1, ix1, fy, fx, inside) where `inside` flags each of the
    four taps as within [0,H)x[0,W) BEFORE clamping (for border color)."""
    h, w = shape_hw
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def inb(iy, ix):
        return (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)

    inside = (inb(y0, x0), inb(y0, x1), inb(y1, x0), inb(y1, x1))
    cx0 = jnp.clip(x0, 0, w - 1)
    cy0 = jnp.clip(y0, 0, h - 1)
    cx1 = jnp.clip(x1, 0, w - 1)
    cy1 = jnp.clip(y1, 0, h - 1)
    return cy0, cx0, cy1, cx1, fy, fx, inside


def sample_shadow_compare(shadow_map: jnp.ndarray, uv: jnp.ndarray,
                          ref_depth: jnp.ndarray) -> jnp.ndarray:
    """sampler2DArrayShadow tap for ONE cascade layer: hardware 2x2 PCF.

    Args:
      shadow_map: (S, S) depth of the selected cascade.
      uv: (..., 2).
      ref_depth: (...,) comparison reference.

    Returns (...,) visibility in [0,1]: compare LESS_OR_EQUAL (lit when
    ref <= stored), border taps compare against 1.0 (opaque white border
    => lit, since ref <= 1).
    """
    cy0, cx0, cy1, cx1, fy, fx, inside = _bilinear_clamped_taps(
        shadow_map.shape, uv)

    def tap(iy, ix, inb):
        d = _gather2d(shadow_map, iy, ix)
        d = jnp.where(inb, d, 1.0)  # border = opaque white
        return (ref_depth <= d).astype(jnp.float32)

    t00 = tap(cy0, cx0, inside[0])
    t10 = tap(cy0, cx1, inside[1])
    t01 = tap(cy1, cx0, inside[2])
    t11 = tap(cy1, cx1, inside[3])
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_bilinear_border(img: jnp.ndarray, uv: jnp.ndarray,
                           border: float = 1.0) -> jnp.ndarray:
    """LINEAR + CLAMP_TO_BORDER (shadowMapDepth raw sampler). (H, W) only."""
    cy0, cx0, cy1, cx1, fy, fx, inside = _bilinear_clamped_taps(
        img.shape[:2], uv)

    def tap(iy, ix, inb):
        return jnp.where(inb, _gather2d(img, iy, ix), border)

    t00 = tap(cy0, cx0, inside[0])
    t10 = tap(cy0, cx1, inside[1])
    t01 = tap(cy1, cx0, inside[2])
    t11 = tap(cy1, cx1, inside[3])
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_bilinear_edge(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """LINEAR + CLAMP_TO_EDGE (sceneDepthLinear). (H, W) only."""
    cy0, cx0, cy1, cx1, fy, fx, _ = _bilinear_clamped_taps(img.shape[:2], uv)
    t00 = _gather2d(img, cy0, cx0)
    t10 = _gather2d(img, cy0, cx1)
    t01 = _gather2d(img, cy1, cx0)
    t11 = _gather2d(img, cy1, cx1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def _gather_layered(maps: jnp.ndarray, layer: jnp.ndarray,
                    iy: jnp.ndarray, ix: jnp.ndarray):
    """maps (L, H, W); per-element layer index."""
    _, h, w = maps.shape
    flat = maps.reshape(-1)
    return jnp.take(flat, (layer * h + iy) * w + ix, axis=0)


def sample_shadow_compare_array(maps: jnp.ndarray, layer: jnp.ndarray,
                                uv: jnp.ndarray,
                                ref_depth: jnp.ndarray) -> jnp.ndarray:
    """sampler2DArrayShadow (binding 2): per-element cascade layer select +
    hardware 2x2 PCF compare LESS_OR_EQUAL, border white.

    maps: (L, S, S); layer: (...,) int32; uv: (..., 2); ref: (...,).
    """
    cy0, cx0, cy1, cx1, fy, fx, inside = _bilinear_clamped_taps(
        maps.shape[1:], uv)

    def tap(iy, ix, inb):
        d = _gather_layered(maps, layer, iy, ix)
        d = jnp.where(inb, d, 1.0)
        return (ref_depth <= d).astype(jnp.float32)

    t00 = tap(cy0, cx0, inside[0])
    t10 = tap(cy0, cx1, inside[1])
    t01 = tap(cy1, cx0, inside[2])
    t11 = tap(cy1, cx1, inside[3])
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_bilinear_border_array(maps: jnp.ndarray, layer: jnp.ndarray,
                                 uv: jnp.ndarray,
                                 border: float = 1.0) -> jnp.ndarray:
    """sampler2DArray raw depth (binding 3): LINEAR + border white."""
    cy0, cx0, cy1, cx1, fy, fx, inside = _bilinear_clamped_taps(
        maps.shape[1:], uv)

    def tap(iy, ix, inb):
        return jnp.where(inb, _gather_layered(maps, layer, iy, ix), border)

    t00 = tap(cy0, cx0, inside[0])
    t10 = tap(cy0, cx1, inside[1])
    t01 = tap(cy1, cx0, inside[2])
    t11 = tap(cy1, cx1, inside[3])
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_nearest_edge(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """NEAREST + CLAMP_TO_EDGE (sceneDepthNearest, shadowHistory-nearest)."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return _gather2d(img, iy, ix)
