#!/usr/bin/env python
"""Isolated attribution of the sparse PCSS tap core (eval_sparse).

The r3 stage ladder (ablate_stack.py) charges ~61 ms to the `taps` stage
at 1080p while the raw gather arithmetic says ~18 ms (109568 slots x 32
rows x ~5.3 ns). This times eval_sparse's sub-steps on the REAL frame's
compacted inputs to find the missing 3x:

  payload gathers -> per-cascade blocker phase -> PCF phase -> scatter,
  windows on/off, caps tuned vs tight.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/profile_taps.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    import jax.numpy as jnp

    import funky_tpu.frame as fr
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.compact import (Compacted, compact_indices_blocked,
                                       gather_rows, scatter_back)
    from funky_tpu.ops.raster import raster_corners
    from funky_tpu.ops.sampling import quad_pack
    from funky_tpu.passes import deferred, geometry, shadow, shadow_filter
    from funky_tpu.passes.shadow_classify import (build_class_maps,
                                                  light_ground_planes)
    from funky_tpu.utils.autotune import autotune_config

    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    cfg = autotune_config(scene, params, fr.GltfConfig(), verbose=True)
    flags = cfg.flags
    state = fr.init_frame_state(cfg)

    # ---- build the real compacted inputs once (matches the frame path) --
    @jax.jit
    def build(scene, params, state):
        uni = fr.compute_frame_uniforms(params, state, cfg)
        world_v, clip, normals_v = geometry.transform_vertices(
            scene, uni.models, uni.view_proj)
        blocks = geometry.build_shade_blocks(scene, world_v, clip, normals_v)
        tri_clip, blocks_m, tri_flags_m, tri_valid = fr._main_raster_inputs(
            scene, clip, blocks, cfg.clip_capacity)
        tri_id, depth, setup = raster_corners(
            tri_clip, tri_valid, cfg.width, cfg.height, cfg.raster)
        raw_maps = shadow.render_shadow_maps(
            world_v, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        shadow_maps = jax.vmap(quad_pack)(raw_maps)
        class_maps = build_class_maps(
            raw_maps, cfg.class_coarse, cfg.max_softness,
            light_ground_planes(uni.light_view_proj))

        h, w = tri_id.shape
        slab_h = cfg.effective_slab_rows(h) or h
        row_any = jnp.any(tri_id >= 0, axis=1)
        y0d = jnp.clip(jnp.argmax(row_any).astype(jnp.int32), 0, h - slab_h)
        tri_s = jax.lax.dynamic_slice(tri_id, (y0d, 0), (slab_h, w))
        dep_s = jax.lax.dynamic_slice(depth, (y0d, 0), (slab_h, w))
        gbuf = deferred.interpolate(tri_s, dep_s, setup.data, blocks_m,
                                    tri_flags_m, y0d)
        normal = gbuf.normal / jnp.maximum(
            jnp.linalg.norm(gbuf.normal, axis=-1, keepdims=True), 1e-12)
        n_dot_l = jnp.maximum(jnp.sum(normal * uni.light_dir, axis=-1), 0.0)
        view_depth = -((gbuf.world @ uni.view[2, :3].T) + uni.view[2, 3])
        frag = jnp.stack([
            jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5,
                (slab_h, w)),
            jnp.broadcast_to(
                jnp.arange(slab_h, dtype=jnp.float32)[:, None] + 0.5,
                (slab_h, w)) + y0d.astype(jnp.float32),
        ], axis=-1)

        c0, c1, t = shadow_filter.select_cascade_blend(view_depth,
                                                       uni.cascade_splits)
        phi = shadow_filter.shadow_frame_phi(frag, uni.debug_flags[3],
                                             uni.debug_flags[2])
        softness = uni.shadow_bias[0]
        blend = t > 0.0
        (uv0, r0, inb0, lit0, um0, uv1, r1, inb1, lit1, um1, needs0,
         needs1) = shadow_filter._pair_classification(
            uni, class_maps, c0, c1, blend, gbuf.world, normal, n_dot_l,
            softness, flags.use_pcss, gbuf.valid)
        n = c0.size
        needs = jnp.stack([needs0, needs1])
        pair_layer = jnp.stack([c0, c1])
        blocked = compact_indices_blocked(
            needs, cfg.shadow_pen_capacity, 8, 8,
            cfg.shadow_pen_block_capacity, group_key=pair_layer)
        comp = blocked.comp
        counts_c = jnp.stack([
            jnp.sum(needs & (pair_layer == c), dtype=jnp.int32)
            for c in range(4)])
        payload = jnp.stack([
            jnp.stack([uv0[..., 0], uv0[..., 1], r0], axis=-1),
            jnp.stack([uv1[..., 0], uv1[..., 1], r1], axis=-1),
        ]).reshape(2 * n, 3)
        phi_flat = jnp.tile(phi.reshape(n), 2)
        return (shadow_maps, payload, phi_flat, comp.idx, counts_c, uni)

    (shadow_maps, payload, phi_flat, comp_idx, counts_c,
     uni) = build(scene, params, state)
    slab_h = cfg.effective_slab_rows(cfg.height) or cfg.height
    n = slab_h * cfg.width
    shadow_maps, payload, phi_flat, comp_idx, counts_c = jax.block_until_ready(
        (shadow_maps, payload, phi_flat, comp_idx, counts_c))
    counts_h = np.asarray(counts_c)
    print(f"# per-cascade pair counts: {counts_h.tolist()}  n={n}")

    caps_c = cfg.shadow_pen_cascade_caps
    offs = np.concatenate([[0], np.cumsum(counts_h)])[:4].astype(np.int32)
    print(f"# tuned caps: {caps_c}  windows: {cfg.shadow_tap_windows}")

    def timeit(label, fn, *args, iters=20):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.block_until_ready(out)

        def chained(args, nit):
            def body(c, _):
                zero = c * 1e-30
                # only perturb SMALL float args (perturbing the 256 MB
                # shadow-map operand would add ~1 ms of dense add per
                # iteration to every measurement)
                pert = tuple(
                    a + zero.astype(a.dtype)
                    if (hasattr(a, "dtype") and jnp.issubdtype(
                        a.dtype, jnp.floating) and a.size < (1 << 24))
                    else a
                    for a in args)
                o = jfn(*pert)
                return c + jnp.asarray(o).ravel()[0] * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=nit)
            return acc

        cfn = jax.jit(chained, static_argnums=1)
        float(np.asarray(cfn(args, iters)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(cfn(args, iters)))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{label:44s} {best*1e3:8.2f} ms", flush=True)
        return best

    idx_pad_np = int(max(caps_c))
    s_full = shadow_maps.shape[1]

    def segment(payload, phi_flat, comp_idx, c, cc):
        idx_pad = jnp.concatenate(
            [comp_idx, jnp.full((idx_pad_np,), -1, jnp.int32)])
        slot = jnp.arange(cc, dtype=jnp.int32)
        idx_c = jax.lax.dynamic_slice(idx_pad, (int(offs[c]),), (cc,))
        valid_c = slot < counts_c[c]
        compc = Compacted(idx=jnp.where(valid_c, idx_c, -1),
                          slot_valid=valid_c, count=counts_c[c])
        rows = gather_rows(payload, compc)
        phi_e = gather_rows(phi_flat, compc)
        return rows[:, :2], rows[:, 2], phi_e, compc

    # 1. payload gathers only
    def payload_only(payload, phi_flat):
        acc = jnp.float32(0.0)
        for c in range(4):
            uv_e, recv_e, phi_e, compc = segment(payload, phi_flat,
                                                 comp_idx, c, caps_c[c])
            acc += jnp.sum(uv_e[::7, 0]) + phi_e[0] + recv_e[0]
        return acc

    timeit("payload gathers x4", payload_only, payload, phi_flat)

    # 2. blocker phase only (full table)
    def blocker_only(shadow_maps, payload, phi_flat):
        from funky_tpu.ops.sampling import sample_nearest_border_packed
        acc = jnp.float32(0.0)
        for c in range(4):
            cc = caps_c[c]
            uv_e, recv_e, phi_e, compc = segment(payload, phi_flat,
                                                 comp_idx, c, cc)
            dx, dy = shadow_filter.vogel_disk_all(16, phi_e)
            texel = uni.shadow_map_size[2]
            off = jnp.stack([dx, dy], axis=-1) * (
                uni.shadow_bias[0] * 2.0 * texel)
            d = sample_nearest_border_packed(
                shadow_maps[c:c + 1], jnp.zeros((cc,), jnp.int32)[None],
                uv_e[None] + off, border=1.0)
            acc += jnp.sum(d[:, ::7])
        return acc

    timeit("blocker phase x4 (full tables)", blocker_only, shadow_maps,
           payload, phi_flat)

    # 3. full PCSS taps, no windows, per cascade + scatter
    def taps_full(shadow_maps, payload, phi_flat, windows=None):
        dense = jnp.zeros((2 * n, 4), jnp.float32)
        pad = jnp.ceil(4.0 * jnp.maximum(uni.shadow_bias[0], 1.0)).astype(
            jnp.int32) + 2
        for c in range(4):
            cc = caps_c[c]
            uv_e, recv_e, phi_e, compc = segment(payload, phi_flat,
                                                 comp_idx, c, cc)
            maps_c = shadow_maps[c:c + 1]
            layer0 = jnp.zeros((cc,), jnp.int32)

            def taps(window, uv_e=uv_e, recv_e=recv_e, phi_e=phi_e,
                     maps_c=maps_c, layer0=layer0):
                m1, m2, pen, hasb = shadow_filter._pcss_taps(
                    uni, maps_c, layer0, uv_e, recv_e, phi_e, window=window)
                one = jnp.ones_like(m1)
                return jnp.stack([jnp.where(hasb, m1, one),
                                  jnp.where(hasb, m1, one),
                                  jnp.where(hasb, m2, one),
                                  jnp.where(hasb, pen, 0.0)], axis=-1)

            wc = int(windows[c]) if windows is not None and windows[c] else 0
            if 0 < wc < s_full:
                big = jnp.int32(1 << 28)
                bx_e = jnp.floor(uv_e[:, 0] * s_full - 0.5).astype(jnp.int32)
                by_e = jnp.floor(uv_e[:, 1] * s_full - 0.5).astype(jnp.int32)
                valid_c = compc.slot_valid
                lo_x = jnp.min(jnp.where(valid_c, bx_e, big)) - pad
                hi_x = jnp.max(jnp.where(valid_c, bx_e, -big)) + pad + 1
                lo_y = jnp.min(jnp.where(valid_c, by_e, big)) - pad
                hi_y = jnp.max(jnp.where(valid_c, by_e, -big)) + pad + 1
                fits_w = ((hi_x - lo_x) < wc) & ((hi_y - lo_y) < wc)
                oy = jnp.clip(lo_y, 0, s_full - wc)
                ox = jnp.clip(lo_x, 0, s_full - wc)
                win = jax.lax.dynamic_slice(
                    shadow_maps, (c, oy, ox, 0), (1, wc, wc, 4))[0]
                vals = jax.lax.cond(
                    fits_w,
                    lambda _, win=win, oy=oy, ox=ox: taps(
                        (win, (oy, ox), s_full)),
                    lambda _: taps(None), operand=None)
            else:
                vals = taps(None)
            dense = scatter_back(dense, compc, vals)
        return jnp.sum(dense[::97])

    import functools
    timeit("PCSS taps+scatter, NO windows",
           functools.partial(taps_full, windows=None), shadow_maps,
           payload, phi_flat)
    timeit("PCSS taps+scatter, tuned windows",
           functools.partial(taps_full, windows=cfg.shadow_tap_windows),
           shadow_maps, payload, phi_flat)

    # 4. scatter only
    def scatter_only(payload):
        dense = jnp.zeros((2 * n, 4), jnp.float32)
        for c in range(4):
            cc = caps_c[c]
            _, _, _, compc = segment(payload, phi_flat, comp_idx, c, cc)
            vals = jnp.broadcast_to(payload[:cc, :1], (cc, 4)) * 0.5
            dense = scatter_back(dense, compc, vals)
        return jnp.sum(dense[::97])

    timeit("scatter_back x4 only", scatter_only, payload)

    # 5. one fused scatter instead of 4
    def scatter_once(payload):
        dense = jnp.zeros((2 * n, 4), jnp.float32)
        cap = comp_idx.shape[0]
        comp = Compacted(idx=comp_idx,
                         slot_valid=comp_idx >= 0,
                         count=jnp.sum(counts_c))
        vals = jnp.broadcast_to(payload[:cap, :1], (cap, 4)) * 0.5
        dense = scatter_back(dense, comp, vals)
        return jnp.sum(dense[::97])

    timeit("scatter_back fused x1", scatter_once, payload)

    # 6. blocker phase via ONE fused gather across all 4 cascades
    def blocker_fused(shadow_maps, payload, phi_flat):
        from funky_tpu.ops.sampling import sample_nearest_border_packed
        cap = comp_idx.shape[0]
        comp = Compacted(idx=comp_idx, slot_valid=comp_idx >= 0,
                         count=jnp.sum(counts_c))
        rows = gather_rows(payload, comp)
        phi_e = gather_rows(phi_flat, comp)
        uv_e = rows[:, :2]
        # cascade id per slot from segment offsets
        slot = jnp.arange(cap, dtype=jnp.int32)
        bnd = jnp.cumsum(counts_c)
        layer = (slot[:, None] >= bnd[None, :]).astype(jnp.int32).sum(1)
        dx, dy = shadow_filter.vogel_disk_all(16, phi_e)
        texel = uni.shadow_map_size[2]
        off = jnp.stack([dx, dy], axis=-1) * (
            uni.shadow_bias[0] * 2.0 * texel)
        d = sample_nearest_border_packed(shadow_maps, layer[None],
                                         uv_e[None] + off, border=1.0)
        return jnp.sum(d[:, ::7])

    timeit("blocker phase FUSED 1 gather (256MB)", blocker_fused,
           shadow_maps, payload, phi_flat)


if __name__ == "__main__":
    main()
