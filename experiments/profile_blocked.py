#!/usr/bin/env python
"""Blocked vs dense back-half stage timings at flagship scale (TPU).

Chained-scan timing per CLAUDE.md. Finds where the unified valid-block
compaction spends/saves time relative to the dense 2D path.
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

    from funky_tpu import frame as F
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.compact import (compact_valid_blocks, gather_blocks,
                                       scatter_blocks)
    from funky_tpu.ops.raster import RasterConfig, raster_scene
    from funky_tpu.ops.sampling import quad_pack
    from funky_tpu.passes import deferred, geometry, shadow, shadow_filter, taa, contact
    from funky_tpu.passes.shadow_classify import (build_class_maps,
                                                  light_ground_planes)

    iters = int(os.environ.get("PROFILE_ITERS", "10"))

    def timeit(fn, *args, label="", n=None):
        n = n or iters

        @jax.jit
        def run(a0, *args):
            def body(carry, _):
                chained = tuple(
                    jax.tree_util.tree_map(
                        lambda a: a + carry.astype(a.dtype)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a, arg)
                    for arg in args)
                out = fn(*chained)
                leaf = jax.tree_util.tree_leaves(out)[0]
                dep = (leaf.ravel()[0] * 1e-30).astype(jnp.float32)
                return dep, None
            dep, _ = jax.lax.scan(body, a0, None, length=n)
            return dep

        try:
            args = tuple(jax.device_put(a) for a in args)
            d = run(jnp.float32(0), *args)
            float(np.asarray(d))
            t0 = time.perf_counter()
            d = run(jnp.float32(0), *args)
            float(np.asarray(d))
            print(f"{label:42s} "
                  f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
                  flush=True)
        except Exception as e:
            import traceback
            detail = traceback.format_exc() if os.environ.get(
                "PROFILE_TRACE") else str(e)[:160]
            print(f"{label:42s} FAILED: {type(e).__name__}: "
                  f"{detail}", flush=True)

    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    params = F.default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))
    cfg = F.GltfConfig(
        raster=RasterConfig(tile_h=32, tile_w=128, capacity=1664),
        shadow_raster=RasterConfig(tile_h=128, tile_w=128, capacity=4224),
        shadow_pen_capacity=122880,
        shadow_pen_cascade_caps=(55296, 64512, 6144, 1024),
        contact_capacity=103424,
        contact_march_capacity=44032,
        texture_block_capacity=768,
        shadow_pen_block_capacity=2304,
        contact_block_capacity=2048,
        valid_block_capacity=22144,
    )
    flags = cfg.flags

    frame = F.compiled_gltf_frame(cfg)
    state = F.init_frame_state(cfg)
    for _ in range(2):
        rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))

    @jax.jit
    def front(scene, params, state):
        uni = F.compute_frame_uniforms(params, state, cfg)
        world_v, clip, normals_v = geometry.transform_vertices(
            scene, uni.models, uni.view_proj)
        blocks = geometry.build_shade_blocks(scene, world_v, clip,
                                             normals_v)
        raw = shadow.render_shadow_maps(
            world_v, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        raw = jax.lax.optimization_barrier(raw)
        cmaps_rows = build_class_maps(
            raw, cfg.class_coarse, cfg.max_softness,
            light_ground_planes(uni.light_view_proj))
        shadow_maps = jax.lax.optimization_barrier(
            jax.vmap(quad_pack)(raw))
        tri_clip, blocks_m, tri_flags_m, tri_valid = F._main_raster_inputs(
            scene, clip, blocks, cfg.clip_capacity)
        from funky_tpu.ops.raster import raster_corners
        tri_id, depth, setup = raster_corners(
            tri_clip, tri_valid, cfg.width, cfg.height, cfg.raster)
        return (uni, cmaps_rows, shadow_maps, tri_id, depth, setup.data,
                blocks_m, tri_flags_m)

    (uni, cmaps, shadow_maps, tri_id, depth, setup_data, blocks_m,
     tri_flags_m) = jax.block_until_ready(front(scene, params, state))
    # the jit boundary turned ShadowClassMaps' static size/coarse/
    # max_softness ints into device arrays — restore them
    from funky_tpu.passes.shadow_classify import ShadowClassMaps
    cmaps = ShadowClassMaps(cell_rows=cmaps.cell_rows, planes=cmaps.planes,
                            size=cfg.shadow_map_size, coarse=cfg.class_coarse,
                            max_softness=cfg.max_softness)
    h, w = cfg.height, cfg.width
    bcap = cfg.effective_valid_blocks(h, w)
    print(f"# bcap={bcap}")

    # whole back halves
    timeit(lambda d: F._shade_slab_dense(
        scene, uni, state, shadow_maps, tri_id, d, setup_data, blocks_m,
        cfg, 0, cmaps, tri_flags_m), depth, label="shade_slab DENSE (whole)")
    timeit(lambda d: F._shade_slab_blocked(
        scene, uni, state, shadow_maps, tri_id, d, setup_data, blocks_m,
        cfg, 0, cmaps, tri_flags_m, bcap), depth,
        label="shade_slab BLOCKED (whole)")

    # blocked machinery alone (jit only the array fields: a jitted return
    # of the NamedTuple would turn the static gh/gw/bh/bw ints into device
    # arrays and break later reshapes)
    from funky_tpu.ops.compact import BlockCompaction, Compacted
    _cb = jax.jit(lambda t: compact_valid_blocks(
        t >= 0, 8, 8, bcap).comp_b)(tri_id)
    bc = BlockCompaction(comp_b=Compacted(*_cb), gh=h // 8, gw=w // 8,
                         bh=8, bw=8)

    def compaction_only(d):
        return compact_valid_blocks((d + tri_id.astype(jnp.float32)) > -1e9,
                                    8, 8, bcap).comp_b.idx
    timeit(compaction_only, depth, label="compact_valid_blocks (mask+sort)")

    old_slab = state.shadow_history

    def gather_payload(d):
        payload = jnp.concatenate([
            jax.lax.bitcast_convert_type(tri_id, jnp.float32)[..., None],
            d[..., None], old_slab], axis=-1)
        return gather_blocks(payload, bc)
    timeit(gather_payload, depth, label="payload assemble+gather_blocks")

    vals6 = jnp.zeros((bcap * 64, 6), jnp.float32)

    def scatter_out(v):
        background = jnp.asarray(F.GLTF_CLEAR + (1.0,), jnp.float32)
        base = jnp.concatenate([
            jnp.broadcast_to(background, (h, w, 4)), old_slab], axis=-1)
        return scatter_blocks(base, bc, v)
    timeit(scatter_out, vals6, label="base assemble+scatter_blocks")

    # per-stage comparison: flat vs 2D
    rows = gather_blocks(jnp.concatenate([
        jax.lax.bitcast_convert_type(tri_id, jnp.float32)[..., None],
        depth[..., None], old_slab], axis=-1), bc)
    tri_e = jnp.where(bc.pixel_xy()[2],
                      jax.lax.bitcast_convert_type(rows[:, 0], jnp.int32),
                      -1)
    depth_e = rows[:, 1]
    px, py, slot_valid = bc.pixel_xy()
    pxf = px.astype(jnp.float32) + 0.5
    pyf = py.astype(jnp.float32) + 0.5
    frag_e = jnp.stack([pxf, pyf], axis=-1)
    frag2 = jnp.stack(jnp.meshgrid(jnp.arange(w, dtype=jnp.float32) + 0.5,
                                   jnp.arange(h, dtype=jnp.float32) + 0.5),
                      axis=-1)

    timeit(lambda d: deferred.interpolate(tri_id, d, setup_data, blocks_m,
                                          tri_flags_m, 0),
           depth, label="deferred.interpolate 2D")
    timeit(lambda d: deferred.interpolate_at(tri_e, d, setup_data, blocks_m,
                                             tri_flags_m, pxf, pyf),
           depth_e, label="deferred.interpolate flat")

    g2 = jax.jit(lambda: deferred.interpolate(tri_id, depth, setup_data,
                                              blocks_m, tri_flags_m, 0))()
    ge = jax.jit(lambda: deferred.interpolate_at(
        tri_e, depth_e, setup_data, blocks_m, tri_flags_m, pxf, pyf))()

    def prep(g):
        normal = g.normal / jnp.maximum(
            jnp.linalg.norm(g.normal, axis=-1, keepdims=True), 1e-12)
        n_dot_l = jnp.maximum(jnp.sum(normal * uni.light_dir, axis=-1), 0.0)
        view_depth = -((g.world @ uni.view[2, :3].T) + uni.view[2, 3])
        return normal, n_dot_l, view_depth

    n2, ndl2, vd2 = jax.jit(lambda: prep(g2))()
    ne, ndle, vde = jax.jit(lambda: prep(ge))()

    timeit(lambda wl: shadow_filter.cascaded_shadow_sparse(
        uni, shadow_maps, cmaps, wl, n2, ndl2, vd2, frag2, True, g2.valid,
        cfg.shadow_pen_capacity, cfg.shadow_pen_cascade_caps,
        cfg.shadow_pen_block_capacity)[0].v,
        g2.world, label="cascaded_shadow_sparse 2D")
    timeit(lambda wl: shadow_filter.cascaded_shadow_sparse(
        uni, shadow_maps, cmaps, wl, ne, ndle, vde, frag_e, True, ge.valid,
        cfg.shadow_pen_capacity, cfg.shadow_pen_cascade_caps,
        cfg.shadow_pen_block_capacity)[0].v,
        ge.world, label="cascaded_shadow_sparse flat")

    sres2 = shadow_filter.ShadowResult(*[jnp.ones((h, w), jnp.float32)] * 4)
    srese = shadow_filter.ShadowResult(
        *[jnp.ones((bcap * 64,), jnp.float32)] * 4)
    timeit(lambda wl: taa.apply_shadow_taa(
        sres2, wl, uni, state.shadow_history, True, 0, cfg.height)[0],
        g2.world, label="taa 2D")
    timeit(lambda wl: taa.apply_shadow_taa(
        srese, wl, uni, state.shadow_history, True,
        full_height=cfg.height, frag=frag_e, full_width=cfg.width)[0],
        ge.world, label="taa flat")

    timeit(lambda wl: contact.compute_contact_shadow_sparse(
        wl, n2, uni, state.prev_depth, 0, capacity=cfg.contact_capacity,
        march_capacity=cfg.contact_march_capacity, valid=g2.valid,
        block_capacity=cfg.contact_block_capacity),
        g2.world, label="contact sparse 2D")
    timeit(lambda wl: contact.compute_contact_shadow_sparse(
        wl, ne, uni, state.prev_depth, 0, capacity=cfg.contact_capacity,
        march_capacity=cfg.contact_march_capacity, valid=ge.valid,
        block_capacity=cfg.contact_block_capacity, frag=frag_e),
        ge.world, label="contact sparse flat")

    from funky_tpu.passes import shading
    shadow_t2 = jnp.ones((h, w), jnp.float32)
    shadow_te = jnp.ones((bcap * 64,), jnp.float32)
    bg = jnp.asarray(F.GLTF_CLEAR, jnp.float32)
    timeit(lambda st: shading.shade_gltf(
        g2, scene.texture, scene.texture_sizes, uni.camera_pos,
        uni.light_dir, st, bg, cfg.effective_texture_blocks),
        shadow_t2, label="shade_gltf 2D")
    timeit(lambda st: shading.shade_gltf(
        ge, scene.texture, scene.texture_sizes, uni.camera_pos,
        uni.light_dir, st, bg, cfg.effective_texture_blocks),
        shadow_te, label="shade_gltf flat")


if __name__ == "__main__":
    main()
