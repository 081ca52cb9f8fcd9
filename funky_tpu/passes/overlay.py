"""UI overlay rasterization + premultiplied-alpha compositing.

Replaces the egui Vulkan backend (egui_vulkan.rs): screen-space triangles
with (pos, uv, premultiplied RGBA) vertices — egui's epaint layout
(egui_vulkan.rs:12-16) — blended ONE / ONE_MINUS_SRC_ALPHA
(egui_vulkan.rs:167-175) over the rendered frame. The fragment math is
egui.frag:10-21: rgb = v_color.rgb * tex.rgb * tex.a, a = v_color.a * tex.a.

The overlay draws into a fixed panel sub-rectangle (static shape), then
composites into the frame with one dynamic_update_slice — so UI cost is
independent of frame resolution. Blending is order-dependent, so triangles
process serially (lax.scan) over the small panel tile; vertex capacity is
static (pad with degenerate triangles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_bilinear_edge


@functools.partial(jax.jit, static_argnums=(6,))
def rasterize_overlay(verts: jnp.ndarray, uvs: jnp.ndarray,
                      colors: jnp.ndarray, tris: jnp.ndarray,
                      n_tris: jnp.ndarray, atlas: jnp.ndarray,
                      panel_hw: tuple) -> jnp.ndarray:
    """Rasterize UI triangles into an RGBA (premultiplied) panel image.

    Args:
      verts: (V, 2) panel-relative pixel positions.
      uvs: (V, 2) atlas uv.
      colors: (V, 4) premultiplied linear RGBA.
      tris: (T, 3) int32 (padded with -1 rows).
      n_tris: () int32 actual count.
      atlas: (Ah, Aw, 4) font atlas (rgb=1, a=coverage), linear.
      panel_hw: static (H, W) of the panel.

    Returns (H, W, 4) premultiplied RGBA overlay.
    """
    ph, pw = panel_hw
    px = jnp.arange(pw, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(ph, dtype=jnp.float32)[:, None] + 0.5

    def body(carry, xs):
        out = carry
        tri, idx = xs
        valid = (idx < n_tris) & (tri[0] >= 0)
        v0, v1, v2 = verts[tri[0]], verts[tri[1]], verts[tri[2]]
        x0, y0 = v0[0], v0[1]
        x1, y1 = v1[0], v1[1]
        x2, y2 = v2[0], v2[1]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        b0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
        b1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
        b2 = 1.0 - b0 - b1
        cover = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid
                 & (jnp.abs(area) > 1e-12))

        uv = (b0[..., None] * uvs[tri[0]] + b1[..., None] * uvs[tri[1]]
              + b2[..., None] * uvs[tri[2]])
        col = (b0[..., None] * colors[tri[0]] + b1[..., None] * colors[tri[1]]
               + b2[..., None] * colors[tri[2]])

        tex = sample_bilinear_edge(atlas, uv)             # (ph, pw, 4)
        src_rgb = col[..., :3] * tex[..., :3] * tex[..., 3:4]
        src_a = col[..., 3:4] * tex[..., 3:4]
        src = jnp.concatenate([src_rgb, src_a], axis=-1)

        blended = src + out * (1.0 - src_a)               # ONE/1-SRC_ALPHA
        out = jnp.where(cover[..., None], blended, out)
        return out, None

    init = jnp.zeros((ph, pw, 4), jnp.float32)
    t = tris.shape[0]
    out, _ = jax.lax.scan(body, init,
                          (tris, jnp.arange(t, dtype=jnp.int32)))
    return out


@functools.partial(jax.jit, static_argnums=(4,))
def composite_overlay(image: jnp.ndarray, overlay: jnp.ndarray,
                      panel_x: jnp.ndarray, panel_y: jnp.ndarray,
                      clip: bool = True) -> jnp.ndarray:
    """Blend the premultiplied overlay panel over the frame at (x, y).

    The overlay render pass LOADs the existing framebuffer
    (renderer.rs:232-265) — i.e. blends over the scene, never clears.
    """
    ph, pw = overlay.shape[:2]
    region = jax.lax.dynamic_slice(
        image, (panel_y, panel_x, 0), (ph, pw, image.shape[2]))
    a = overlay[..., 3:4]
    rgb = overlay[..., :3] + region[..., :3] * (1.0 - a)
    out_a = jnp.clip(a + region[..., 3:4] * (1.0 - a), 0.0, 1.0)
    blended = jnp.concatenate([rgb, out_a], axis=-1)
    return jax.lax.dynamic_update_slice(image, blended,
                                        (panel_y, panel_x, 0))
