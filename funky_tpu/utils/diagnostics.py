"""Occupancy diagnostics for the sparse-evaluation capacities.

Like ops.binning.bin_stats for raster bins: the sparse shadow/contact
paths have static compaction capacities whose padded slots still pay
gather cost, and whose overflow falls back to the (slow, exact) dense
path — so tune them from measured counts with headroom.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _frame_intermediates(scene, params, state, cfg):
    """Re-run the front half of render_gltf_frame up to the shade inputs
    (same code paths; see funky_tpu/frame.py)."""
    from ..frame import _main_raster_inputs, compute_frame_uniforms
    from ..ops.raster import raster_corners
    from ..passes import deferred, geometry, shadow
    from ..passes.shadow_classify import (build_class_maps,
                                          light_ground_planes)

    uni = compute_frame_uniforms(params, state, cfg)
    world_v, clip, normals_v = geometry.transform_vertices(
        scene, uni.models, uni.view_proj)
    blocks = geometry.build_shade_blocks(scene, world_v, clip, normals_v)
    raw = shadow.render_shadow_maps(
        world_v, scene.tri_indices, scene.num_triangles,
        uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
    cmaps = build_class_maps(raw, cfg.class_coarse, cfg.max_softness,
                             light_ground_planes(uni.light_view_proj))
    tri_clip_raw = clip[scene.tri_indices]
    tri_clip, blocks, tri_flags, tri_valid = _main_raster_inputs(
        scene, clip, blocks, cfg.clip_capacity)
    tri_id, depth, setup = raster_corners(
        tri_clip, tri_valid, cfg.width, cfg.height, cfg.raster)
    g = deferred.interpolate(tri_id, depth, setup.data, blocks,
                             tri_flags)
    # near-plane clip pressure: crossing triangles this view must fit
    # GltfConfig.clip_capacity (overflow whole-culls the excess — the
    # round-1 popping artifact)
    from ..frame import NEAR
    inside = tri_clip_raw[..., 3] > NEAR * 0.1
    real = jnp.arange(tri_clip_raw.shape[0]) < scene.num_triangles
    clip_crossing = jnp.sum(jnp.any(inside, -1) & ~jnp.all(inside, -1)
                            & real)
    normal = g.normal / jnp.maximum(
        jnp.linalg.norm(g.normal, axis=-1, keepdims=True), 1e-12)
    n_dot_l = jnp.maximum(jnp.sum(normal * uni.light_dir, axis=-1), 0.0)
    view_depth = -((g.world @ uni.view[2, :3].T) + uni.view[2, 3])
    return (uni, cmaps, g, normal, n_dot_l, view_depth, clip_crossing,
            world_v)


def footprint_extents(scene, params, state, cfg):
    """Per-cascade shadow-footprint extent (texels) — sizes the light-space
    ground-shadow windows (GltfConfig.light_window_sizes). Tiny program:
    uniforms + vertex transform + a bbox."""
    from ..frame import compute_frame_uniforms
    from ..passes.geometry import transform_vertices
    from ..passes.shadow_lightspace import occluder_uv_bbox

    uni = compute_frame_uniforms(params, state, cfg)
    world_v, _, _ = transform_vertices(scene, uni.models, uni.view_proj)
    lo, hi = occluder_uv_bbox(world_v, scene.vert_object,
                              uni.light_view_proj)
    ext = jnp.ceil((hi - lo) * cfg.shadow_map_size).astype(jnp.int32)
    return jnp.maximum(ext[:, 0], ext[:, 1])


def sparse_occupancy(scene, params, state, cfg, light_sizes=None,
                     route_sizes=None):
    """Counts for sizing GltfConfig.shadow_pen_capacity /
    contact_capacity on a representative (scene, view): dict of traced
    scalars (int() them outside jit). `state` should carry a real
    prev_depth (render one frame first) or contact candidates read as 0.

    light_sizes: static per-cascade light-space window sizes to measure
    fetch/tap splits against (the flag's windows must match the frame's).
    route_sizes: static per-cascade ROUTE window sizes (r5 routed tap
    groups) — defaults to cfg.shadow_route_windows; pass candidate sizes
    at startup so derive_sparse_config can judge adoption.
    """
    from ..passes import contact, shadow_filter

    scale = cfg.flags.effective_shadow_scale
    (uni, cmaps, g, normal, n_dot_l, view_depth, clip_crossing,
     world_v) = _frame_intermediates(scene, params, state, cfg)
    h, w = g.depth.shape
    frag = jnp.stack([
        jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5,
                         (h, w)),
        jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5,
                         (h, w))], axis=-1)

    light_windows = None
    if light_sizes is not None and any(light_sizes):
        from ..passes.shadow_lightspace import plan_windows

        origins, _ = plan_windows(uni, world_v, scene.vert_object,
                                  light_sizes, cfg.shadow_map_size,
                                  cfg.max_softness, cfg.class_coarse)
        light_windows = (origins, tuple(light_sizes))

    # Synth window-fit certificate as a pollable stat (committed mode
    # elides the in-frame synth_ok cond; ADVICE r4's offered
    # alternative). Stored inverted so the per-pose max-combine keeps
    # "any pose overflowed".
    synth_overflow = None
    if cfg.flags.synth_shadow_maps and light_windows is not None:
        from ..passes.shadow import synth_windows_fit

        fit = synth_windows_fit(world_v, scene.vert_object,
                                uni.light_view_proj,
                                cfg.shadow_map_size, light_windows[1],
                                light_windows[0])
        synth_overflow = 1 - fit.astype(jnp.int32)

    if route_sizes is None:
        route_sizes = cfg.shadow_route_windows
    route_windows = None
    if route_sizes is not None and any(route_sizes):
        from ..passes.shadow_lightspace import plan_windows

        r_origins, _ = plan_windows(uni, world_v, scene.vert_object,
                                    route_sizes, cfg.shadow_map_size,
                                    cfg.max_softness, cfg.class_coarse)
        route_windows = (r_origins, tuple(route_sizes))

    sub = (lambda a: a[::scale, ::scale]) if scale > 1 else (lambda a: a)
    stats = shadow_filter.classify_stats(
        uni, cmaps, sub(g.world), sub(normal), sub(n_dot_l),
        sub(view_depth), sub(frag), cfg.flags.use_pcss, sub(g.valid),
        light_windows=light_windows,
        skip_backfacing=cfg.flags.skip_backfacing_shadows,
        committed=cfg.flags.committed, route_windows=route_windows)
    if synth_overflow is not None:
        stats["synth_window_overflow"] = synth_overflow

    cvalid = (g.valid & (n_dot_l > 0.0)
              if cfg.flags.skip_backfacing_shadows else g.valid)
    stats.update(contact.contact_occupancy(
        sub(g.world), sub(normal), uni, state.prev_depth,
        valid=sub(cvalid),
        plane=contact.reference_plane(scene.positions, scene.tri_indices,
                                      uni.prev_view_proj, cfg.width,
                                      cfg.height)))

    # TAA misaligned-frame history-read need (passes/taa.py sparse read):
    # in-bounds pixels with reprojection motion <= 0.02 — the only ones
    # that ever consume a history row. Meaningful in the MISMATCHED
    # regime (state from the previous pose): with a pose-matched state
    # motion ~ 0 everywhere and the frame takes the aligned fast path
    # instead, so measure_sparse_occupancy overrides this entry with its
    # pre-render probe.
    ones = jnp.ones(g.world.shape[:-1] + (1,), jnp.float32)
    hom = jnp.concatenate([g.world, ones], axis=-1)
    prev_clip = jnp.einsum("ij,...j->...i", uni.prev_view_proj, hom)
    w_ok = prev_clip[..., 3] > 0.0
    prev_ndc = prev_clip[..., :3] / jnp.where(w_ok[..., None],
                                              prev_clip[..., 3:4], 1.0)
    prev_uv = prev_ndc[..., :2] * 0.5 + 0.5
    tin = (w_ok
           & (prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] <= 1.0)
           & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] <= 1.0)
           & (prev_ndc[..., 2] >= 0.0) & (prev_ndc[..., 2] <= 1.0))
    cur_uv = (frag + 0.5) / jnp.asarray([w, h], jnp.float32)
    motion = jnp.linalg.norm(prev_uv - cur_uv, axis=-1)
    need = tin & (motion <= 0.02) & g.valid
    # Gate on the frame's own aligned fast-path condition (taa.py):
    # aligned frames dynamic_slice the history and never touch the
    # capacity — without this, a parked-view driver poll (state matched
    # to params) would report need ~ full frame and thrash the retune.
    ix = jnp.clip(jnp.floor(prev_uv[..., 0] * w).astype(jnp.int32),
                  0, w - 1)
    iy = jnp.clip(jnp.floor(prev_uv[..., 1] * h).astype(jnp.int32),
                  0, h - 1)
    own_x = (frag[..., 0] - 0.5).astype(jnp.int32)
    own_y = (frag[..., 1] - 0.5).astype(jnp.int32)
    all_aligned = jnp.all(((ix == own_x) & (iy == own_y)) | ~need)
    stats["taa_need"] = jnp.where(all_aligned, 0, jnp.sum(need))

    # 8x8 candidate-block counts for the two-level compactions
    def blocks_of(mask):
        *lead, hh, ww = mask.shape
        return jnp.sum(mask[..., :hh // 8 * 8, :ww // 8 * 8].reshape(
            *lead, hh // 8, 8, ww // 8, 8).any(axis=(-3, -1)))

    stats["pair_blocks"] = blocks_of(stats.pop("_needs"))
    stats["contact_blocks"] = blocks_of(stats.pop("_stage2"))

    # Cascade blend-band size (would c1-classification be skippable?) and
    # per-screen-tile shadow-cell spans (viability of tile-local one-hot
    # cell selection instead of per-pixel gathers).
    c0, c1, t = shadow_filter.select_cascade_blend(sub(view_depth),
                                                   uni.cascade_splits)
    stats["blend_band"] = jnp.sum(sub(g.valid) & (t > 0.0))
    stats["clip_crossing"] = clip_crossing

    # 8x8 screen blocks containing textured pixels (block-sparse texture
    # sampling capacity, passes/shading.py)
    tex_mask = g.valid & ((g.flags & 1) != 0)
    hh, ww = tex_mask.shape
    stats["texture_blocks"] = jnp.sum(
        tex_mask[:hh // 8 * 8, :ww // 8 * 8].reshape(
            hh // 8, 8, ww // 8, 8).any(axis=(1, 3)))

    # 8x8 screen blocks with ANY coverage — sizes
    # GltfConfig.valid_block_capacity (the unified blocked back half)
    stats["valid_blocks"] = jnp.sum(
        g.valid[:hh // 8 * 8, :ww // 8 * 8].reshape(
            hh // 8, 8, ww // 8, 8).any(axis=(1, 3)))

    # Covered row span [first, last] — sizes GltfConfig.valid_slab_rows
    # (the row-slab back half)
    row_any = jnp.any(g.valid, axis=1)
    stats["valid_row_span"] = jnp.where(
        jnp.any(row_any),
        g.valid.shape[0] - jnp.argmax(row_any[::-1]) - jnp.argmax(row_any),
        0)

    uv, _, _, inb = shadow_filter._light_project(
        uni, c0, sub(g.world), sub(normal), sub(n_dot_l))
    sc = cfg.shadow_map_size // cfg.class_coarse
    cc = jnp.clip((uv * sc).astype(jnp.int32), 0, sc - 1)
    th, tw = 64, 128
    h2, w2 = inb.shape
    mask = (inb & sub(g.valid))[:h2 // th * th, :w2 // tw * tw]

    def tiled(a):
        return a[:h2 // th * th, :w2 // tw * tw].reshape(
            h2 // th, th, w2 // tw, tw).transpose(0, 2, 1, 3)

    big = jnp.int32(1 << 30)
    tm = tiled(mask)
    spans = []
    for axis in (0, 1):
        ta = tiled(cc[..., axis])
        amin = jnp.where(tm, ta, big).min(axis=(2, 3))
        amax = jnp.where(tm, ta, -1).max(axis=(2, 3))
        spans.append(jnp.where(amax >= 0, amax - amin + 1, 0))
    span = spans[0] * spans[1]
    stats["tile_cell_span_max"] = span.max()
    stats["tile_cell_span_mean"] = span.sum() / jnp.maximum(
        (span > 0).sum(), 1)
    return stats


def measure_sparse_occupancy(scene, params, cfg, frames: int = 2):
    """Convenience host-side wrapper: renders `frames` frames (so
    prev_depth is real), then returns python-int occupancy stats.

    `params` may be a LIST of poses — stats are measured per pose and
    max-combined, so capacities derived from them cover a camera
    trajectory instead of one parked view (a single-pose tune pins moving
    frames to the dense fallback once counts drift past the headroom).

    When the light-space ground mode is on, the windows are pre-sized
    from the (cheap) footprint-extent program so the measured fetch/tap
    split matches the windows the derived config will actually use."""
    import numpy as np

    from ..frame import compiled_gltf_frame, init_frame_state

    poses = params if isinstance(params, (list, tuple)) else [params]
    state = init_frame_state(cfg)
    frame = compiled_gltf_frame(cfg)
    for _ in range(frames):
        _, state = frame(scene, poses[0], state)

    ext_fn = jax.jit(footprint_extents, static_argnums=(3,))
    ext = np.max([np.asarray(ext_fn(scene, p, state, cfg))
                  for p in poses], axis=0)

    light_sizes = None
    if cfg.effective_light_windows() is not None:
        from ..passes.shadow_lightspace import (window_pad,
                                                window_size_for_extent)

        pad = window_pad(cfg.max_softness, cfg.class_coarse)
        light_sizes = tuple(window_size_for_extent(int(e), pad)
                            for e in ext)

    # Candidate ROUTE window sizes (r5 routed tap groups) from the same
    # footprint extents: footprint + tap-reach margin, sub-cliff only.
    # classify_stats measures how many pair entries each would capture;
    # derive_sparse_config decides adoption per cascade.
    import math
    pad_route = math.ceil(4.0 * cfg.max_softness) + 2 + 8
    cand = []
    for e in ext:
        need = -(-(int(e) + 2 * pad_route) // 64) * 64
        cand.append(need if 0 < int(e) and need <= 384
                    and need < cfg.shadow_map_size else 0)
    route_sizes = tuple(cand) if any(cand) else None
    if cfg.shadow_route_windows is not None:
        route_sizes = cfg.shadow_route_windows   # poll the live config

    occ_fn = jax.jit(sparse_occupancy, static_argnums=(3, 4, 5))
    out = {}
    for i, p in enumerate(poses):
        taa_need_mis = 0
        if i:
            # Mismatched-regime probe BEFORE advancing the state: pose p
            # against the previous pose's rendered state — the regime the
            # TAA slow path actually runs in (a pose-matched state takes
            # the aligned fast path, making its taa_need meaningless).
            pre = occ_fn(scene, p, state, cfg, light_sizes, route_sizes)
            taa_need_mis = int(np.asarray(pre["taa_need"]))
            _, state = frame(scene, p, state)   # pose-matched prev state
        stats = occ_fn(scene, p, state, cfg, light_sizes, route_sizes)
        cur = {k: (int(v) if np.asarray(v).size == 1
                   else tuple(int(x) for x in np.asarray(v).ravel()))
               for k, v in stats.items()}
        cur["taa_need"] = taa_need_mis
        for k, v in cur.items():
            if k not in out:
                out[k] = v
            elif isinstance(v, tuple):
                out[k] = tuple(max(a, b) for a, b in zip(out[k], v))
            else:
                out[k] = max(out[k], v)
    if light_sizes is not None:
        out["light_window_sizes"] = light_sizes
    if route_sizes is not None:
        out["route_window_sizes"] = route_sizes
    return out
