"""Shadow cascade depth passes.

The reference renders 4 depth-only passes into a 4-layer 2048^2 D32 array
(gltf_renderer.rs:728-804, render loop 2075-2152; shadow.vert picks
lightViewProj[cascadeIndex]). Here each cascade is one depth-only run of
the shared tile rasterizer; world-space vertices are transformed by each
cascade's light matrix (the vertex work is a 4x batched MXU matmul over the
whole scene, replacing 4 re-draws of every mesh).

Clear depth is 1.0; depth compare semantics per ops/raster.py. All four
cascades are independent subgraphs inside the frame jit, so XLA/TPU can
overlap them freely — the reference's image barriers (2003-2032, 2154-2177)
become plain data dependencies.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.raster import RasterConfig, raster_scene
from .uniforms import SHADOW_MAP_SIZE

# capacity=None auto-sizes bins to the triangle count — the SAFE default
# (an undersized bin silently drops triangles from dense shadow tiles).
SHADOW_RASTER_CFG = RasterConfig(tile_h=128, tile_w=256, capacity=None)


def render_shadow_maps(world: jnp.ndarray, tri_indices: jnp.ndarray,
                       num_triangles: int, light_view_proj: jnp.ndarray,
                       cfg: RasterConfig = SHADOW_RASTER_CFG,
                       size: int = SHADOW_MAP_SIZE) -> jnp.ndarray:
    """Rasterize depth for each cascade.

    Args:
      world: (V, 3) world-space vertices (shared with the main pass).
      light_view_proj: (4, 4, 4).

    Returns (4, size, size) f32 NDC depth, 1.0 = empty.
    """
    ones = jnp.ones((world.shape[0], 1), jnp.float32)
    hom = jnp.concatenate([world, ones], axis=-1)        # (V, 4)

    depths = []
    for c in range(light_view_proj.shape[0]):
        clip = hom @ light_view_proj[c].T
        _, depth, _ = raster_scene(clip, tri_indices, size, size,
                                   num_triangles, cfg)
        depths.append(depth)
    return jnp.stack(depths)
