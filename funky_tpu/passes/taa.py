"""Shadow TAA: history reprojection + variance clamp (gltf.frag:529-590).

The reference ping-pongs two RG16F storage images per swapchain image
(gltf_renderer.rs:863-939) with barriers and descriptor swaps
(2180-2249, 2344-2387). In a pure frame function the history is simply a
carried (H, W, 2) array [shadow, ndcDepth]: read the old one, return the
new one. The host driver threads it between frames — no barriers, no
ping-pong bookkeeping.

History sampler is NEAREST + CLAMP_TO_EDGE (gltf_renderer.rs:912-920);
history initializes to (1.0, 1.0) = lit, far (gltf_renderer.rs:925-927).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_nearest_edge
from .shadow_filter import ShadowResult
from .uniforms import FrameUniforms


def init_history(height: int, width: int) -> jnp.ndarray:
    return jnp.ones((height, width, 2), jnp.float32)


def apply_shadow_taa(cur: ShadowResult, world: jnp.ndarray,
                     uni: FrameUniforms, history: jnp.ndarray,
                     use_shadow_taa: bool, y0=0,
                     full_height: int | None = None,
                     frag: jnp.ndarray | None = None,
                     full_width: int | None = None,
                     need_capacity: int | None = None,
                     committed: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out_shadow, new_history[..., 2]) matching cur.v's shape.
    `history` is always the FULL-frame buffer (reprojection can land
    anywhere on screen). Two input layouts:
      - row slab (h, W) starting at global row y0 (frag=None);
      - any batch shape with explicit `frag` pixel centers (x+0.5
        convention) and `full_width` — the blocked back half's flat
        compacted domain.

    need_capacity: sparse history read for MOVING frames (r5, VERDICT r4
    weak-6): only in-bounds pixels with motion <= 0.02 ever consume
    their history row (every other pixel rejects on motion or bounds
    before reading values), so the misaligned-frame gather compacts to
    that `need` set instead of the full domain (~1.4M rows at 1080p;
    under real motion the 0.02-uv threshold rejects nearly everything).
    Overflow (slow pans where most pixels keep history) lax.cond-falls
    back to the dense gather — bit-exact either way. Size from
    diagnostics' `taa_need` (measured in the mismatched-state regime —
    the matched/parked regime takes the aligned fast path instead).
    committed elides the overflow cond (GltfFrameFlags.committed
    contract: truncated entries blend as freshly-lit — bounded local
    artifact, detected by the driver's occupancy poll)."""
    current = cur.v
    if frag is None:
        h, w = cur.v.shape
        fh = full_height if full_height is not None else h
        fw = w
        frag_x = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5, (h, w))
        frag_y = jnp.broadcast_to(
            jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
            + jnp.asarray(y0, jnp.float32), (h, w))
    else:
        assert full_height is not None and full_width is not None
        fh = full_height
        fw = full_width
        frag_x = frag[..., 0]
        frag_y = frag[..., 1]

    # Current NDC depth for next frame's disocclusion test
    # (gltf.frag:535-538).
    ones = jnp.ones(world.shape[:-1] + (1,), jnp.float32)
    hom = jnp.concatenate([world, ones], axis=-1)
    cur_clip = jnp.einsum("ij,...j->...i", uni.view_proj, hom)
    cur_ndc_depth = jnp.where(cur_clip[..., 3] != 0.0,
                              cur_clip[..., 2] / cur_clip[..., 3], 1.0)
    cur_ndc_depth = jnp.clip(cur_ndc_depth, 0.0, 1.0)

    if not use_shadow_taa:
        new_history = jnp.stack([current, cur_ndc_depth], axis=-1)
        return current, new_history

    # gl_FragCoord.xy is already the pixel center (x+0.5); the reference
    # adds another 0.5 (gltf.frag:544) — reproduced.
    current_uv = jnp.stack(
        [(frag_x + 0.5) / fw, (frag_y + 0.5) / fh], axis=-1)

    prev_clip = jnp.einsum("ij,...j->...i", uni.prev_view_proj, hom)
    w_ok = prev_clip[..., 3] > 0.0
    prev_ndc = prev_clip[..., :3] / jnp.where(w_ok[..., None],
                                              prev_clip[..., 3:4], 1.0)
    prev_uv = prev_ndc[..., :2] * 0.5 + 0.5
    in_bounds = (w_ok
                 & (prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] <= 1.0)
                 & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] <= 1.0)
                 & (prev_ndc[..., 2] >= 0.0) & (prev_ndc[..., 2] <= 1.0))

    # Disocclusion rejection, motion half (gltf.frag:557-567): pixels
    # with motion > 0.02 reject regardless of history values, so only
    # in-bounds low-motion pixels actually need the history READ.
    motion = jnp.linalg.norm(prev_uv - current_uv, axis=-1)
    need = in_bounds & (motion <= 0.02)

    # Variance clamp terms (gltf.frag:569-578) — history-independent.
    variance = jnp.maximum(0.0, cur.m2 - cur.m1 * cur.m1)
    stdev = jnp.sqrt(variance)
    softness = jnp.clip(cur.kernel_radius_texels / 8.0, 0.0, 1.0)
    sigma = 2.5 + (0.9 - 2.5) * softness                  # mix(2.5,0.9,s)
    lo = cur.m1 - sigma * stdev
    hi = cur.m1 + sigma * stdev
    history_weight = 0.55 + (0.85 - 0.55) * softness      # gltf.frag:582

    def blend_with(hist):
        history_shadow = hist[..., 0]
        history_depth = hist[..., 1]
        delta = jnp.abs(history_shadow - current)
        depth_delta = jnp.abs(history_depth - prev_ndc[..., 2])
        reject = (motion > 0.02) | (depth_delta > 0.02) | (delta > 0.35)
        history_clamped = jnp.clip(history_shadow, lo, hi)
        blended = current + (history_clamped - current) * history_weight
        out = jnp.where(in_bounds & ~reject, blended, current)
        return out, jnp.stack([out, cur_ndc_depth], axis=-1)

    def blend_gathered():
        """Dense full-domain history gather (the exact reference read)."""
        return blend_with(sample_nearest_edge(history, prev_uv))

    def blend_sparse_read():
        """Compacted history read over the `need` mask; `~need` slots
        keep the (1, 1) init value, which blend_with never consumes for
        them (motion/bounds reject first). Returns the blend or None
        when the domain has no static capacity benefit."""
        from ..ops.compact import (compact_indices, gather_rows,
                                   scatter_back)

        n = int(need.size)
        cap = min(need_capacity, n)
        comp = compact_indices(need, cap)

        def sparse(_):
            uv_rows = gather_rows(prev_uv.reshape(n, 2), comp)
            hist_rows = sample_nearest_edge(history, uv_rows)  # (cap, 2)
            hist = scatter_back(jnp.ones((n, 2), jnp.float32), comp,
                                hist_rows)
            return blend_with(hist.reshape(need.shape + (2,)))

        if committed:
            return sparse(None)
        return jax.lax.cond(comp.count <= cap, sparse,
                            lambda _: blend_gathered(), operand=None)

    if frag is None:
        # Aligned-history fast path: the NEAREST tap at prev_uv is the
        # pixel's OWN texel whenever the camera is still (identical
        # view-proj makes reprojection the exact identity — object motion
        # doesn't matter because reprojection re-projects the CURRENT
        # world position). In that whole-frame case the 1-row-per-pixel
        # serial gather (~14 ns/row, ~16 ms at 1080p; r3 trace) collapses
        # to one aligned dynamic_slice. Any pixel that needs history from
        # a DIFFERENT texel falls the frame back to the exact gather via
        # lax.cond — bit-identical outputs either way (pixels whose tap
        # moved but are motion/oob-rejected never read their hist value).
        ix = jnp.clip(jnp.floor(prev_uv[..., 0] * fw).astype(jnp.int32),
                      0, fw - 1)
        iy = jnp.clip(jnp.floor(prev_uv[..., 1] * fh).astype(jnp.int32),
                      0, fh - 1)
        own_x = (frag_x - 0.5).astype(jnp.int32)
        own_y = (frag_y - 0.5).astype(jnp.int32)
        aligned = (ix == own_x) & (iy == own_y)
        all_aligned = jnp.all(aligned | ~need)

        def fast(_):
            slab = jax.lax.dynamic_slice(
                history, (jnp.asarray(y0, jnp.int32), 0, 0), (h, w, 2))
            return blend_with(slab)

        def slow(_):
            if need_capacity is not None:
                return blend_sparse_read()
            return blend_gathered()

        return jax.lax.cond(all_aligned, fast, slow, operand=None)

    if need_capacity is not None:
        return blend_sparse_read()
    return blend_gathered()
