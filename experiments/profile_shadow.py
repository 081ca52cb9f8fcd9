#!/usr/bin/env python
"""Isolated chained timings of the shadow-stack stages at flagship scale.

Every stage is timed with iterations chained through a scalar data
dependency inside ONE jit (the only trustworthy protocol on this tunnel —
see CLAUDE.md).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    import jax.numpy as jnp

    from funky_tpu.frame import (GltfConfig, compute_frame_uniforms,
                                 default_gltf_params, init_frame_state,
                                 compiled_gltf_frame)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.raster import RasterConfig, raster_scene
    from funky_tpu.ops.sampling import quad_pack
    from funky_tpu.ops.compact import compact_indices, gather_rows
    from funky_tpu.passes import (contact, deferred, geometry, shadow,
                                  shadow_filter, taa)
    from funky_tpu.passes.shadow_classify import (build_class_maps,
                                                  classify,
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
            print(f"{label:34s} "
                  f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"{label:34s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))
    cfg = GltfConfig(
        raster=RasterConfig(tile_h=32, tile_w=128, capacity=1664),
        shadow_raster=RasterConfig(tile_h=128, tile_w=128, capacity=4224),
        shadow_pen_capacity=122880,
        shadow_pen_cascade_caps=(55296, 64512, 6144, 1024),
        contact_capacity=119808,
        contact_march_capacity=51200,
    )

    # Real intermediates: run two frames, capture state + inputs.
    frame = compiled_gltf_frame(cfg)
    state = init_frame_state(cfg)
    for _ in range(2):
        rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))

    @jax.jit
    def front(scene, params, state):
        uni = compute_frame_uniforms(params, state, cfg)
        world_v, clip, normals_v = geometry.transform_vertices(
            scene, uni.models, uni.view_proj)
        blocks = geometry.build_shade_blocks(scene, world_v, clip,
                                             normals_v)
        raw = shadow.render_shadow_maps(
            world_v, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        tri_id, depth, setup = raster_scene(
            clip, scene.tri_indices, cfg.width, cfg.height,
            scene.num_triangles, cfg.raster)
        g = deferred.interpolate(tri_id, depth, setup.data, blocks,
                                 scene.tri_flags)
        normal = g.normal / jnp.maximum(
            jnp.linalg.norm(g.normal, axis=-1, keepdims=True), 1e-12)
        n_dot_l = jnp.maximum(jnp.sum(normal * uni.light_dir, axis=-1), 0.0)
        view_depth = -((g.world @ uni.view[2, :3].T) + uni.view[2, 3])
        return uni, raw, g, normal, n_dot_l, view_depth, tri_id, depth, \
            setup.data, blocks

    (uni, raw, g, normal, n_dot_l, view_depth, tri_id, depth, setup_data,
     blocks) = jax.block_until_ready(front(scene, params, state))
    h, w = cfg.height, cfg.width
    frag = jnp.stack(jnp.meshgrid(jnp.arange(w, dtype=jnp.float32) + 0.5,
                                  jnp.arange(h, dtype=jnp.float32) + 0.5),
                     axis=-1)

    # -- stage timings --
    # (every fn must consume its chained args, else XLA hoists the body
    # out of the timing scan as loop-invariant)
    world_v0 = jax.jit(lambda: geometry.transform_vertices(
        scene, uni.models, uni.view_proj)[0])()
    timeit(lambda wv: shadow.render_shadow_maps(
        wv, scene.tri_indices, scene.num_triangles, uni.light_view_proj,
        cfg.shadow_raster, cfg.shadow_map_size),
        world_v0, label="shadow raster x4")

    planes = jax.jit(light_ground_planes)(uni.light_view_proj)
    timeit(lambda r: jax.vmap(quad_pack)(r), raw, label="quad_pack x4")
    timeit(lambda r: build_class_maps(r, cfg.class_coarse,
                                      cfg.max_softness, planes).cell_rows,
           raw, label="build_class_maps")

    cmaps = jax.jit(build_class_maps, static_argnums=(1, 2))(
        raw, cfg.class_coarse, cfg.max_softness, planes)
    # jit outputs turn every NamedTuple leaf into an array; classify
    # needs the static fields back as Python scalars.
    cmaps = cmaps._replace(size=int(cmaps.size), coarse=int(cmaps.coarse),
                           max_softness=float(cmaps.max_softness))
    packed = jax.jit(lambda r: jax.vmap(quad_pack)(r))(raw)
    c0, c1, t = jax.jit(shadow_filter.select_cascade_blend)(
        view_depth, uni.cascade_splits)

    def project_classify(world, normal, n_dot_l):
        uv, recv, inb, lit, um = shadow_filter._classified_project(
            uni, cmaps, c0, world, normal, n_dot_l,
            uni.shadow_bias[0], True)
        return lit

    timeit(project_classify, g.world, normal, n_dot_l,
           label="project+classify (1 cascade)")

    def classify_only(world, normal, n_dot_l):
        uv, recv, bias, inb = shadow_filter._light_project(
            uni, c0, world, normal, n_dot_l)
        return classify(cmaps, c0, uv, recv - bias, uni.shadow_bias[0],
                        True)[0]

    timeit(classify_only, g.world, normal, n_dot_l,
           label="  of which classify gathers")

    maskf = jnp.zeros((2, h, w)).at[:, 200:400, :].set(1.0)
    timeit(lambda m: compact_indices(m > 0.5, cfg.shadow_pen_capacity).idx,
           maskf, label="compact 2x(h,w) mask")

    comp = jax.jit(lambda m: compact_indices(m > 0.5,
                                             cfg.shadow_pen_capacity))(
        maskf)
    payload = jnp.concatenate(
        [frag, frag], axis=-1).reshape(h * w, 4)
    payload2 = jnp.concatenate([payload, payload], axis=0)

    ncap = 64512
    uv_e = jax.jit(lambda p: gather_rows(p, comp))(payload2)[:ncap, :2] / 2048.0
    recv_e = jnp.full((ncap,), 0.8)
    layer_e = jnp.zeros((ncap,), jnp.int32)
    phi_e = jnp.linspace(0, 6.28, ncap)

    timeit(lambda u, r, p: shadow_filter._pcss_taps(
        uni, packed[0:1], layer_e, u, r, p)[0],
        uv_e, recv_e, phi_e, label="pcss taps @64512 (1 casc table)",
        n=2)

    from funky_tpu.ops.sampling import (
        sample_bilinear_repeat_packed_layers, quad_pack_nhwc,
        sample_nearest_edge)

    tex_packed = jax.jit(lambda t: jax.vmap(quad_pack_nhwc)(t))(
        scene.texture)
    layer_px = jnp.zeros((h, w), jnp.int32)

    timeit(lambda uv: sample_bilinear_repeat_packed_layers(
        tex_packed, scene.texture_sizes, layer_px,
        uv / jnp.asarray([float(w), float(h)])),
        frag, label="texture sample dense")

    timeit(lambda uv: sample_nearest_edge(
        state.shadow_history, uv / jnp.asarray([float(w), float(h)])),
        frag, label="history nearest dense")

    packed_c0 = packed[0]

    def taps_single_cascade(u, r, p):
        from funky_tpu.ops.sampling import sample_depth_dual_packed
        acc = jnp.zeros_like(r)
        for i in range(32):
            d, _ = sample_depth_dual_packed(
                packed_c0, u + i * 1e-5)
            acc = acc + d
        return acc

    timeit(taps_single_cascade, uv_e, recv_e, phi_e,
           label="32 taps, per-cascade table", n=4)

    def full_sparse(world, normal, n_dot_l, view_depth, frag):
        s, _, _, _ = shadow_filter.cascaded_shadow_sparse(
            uni, packed, cmaps, world, normal, n_dot_l, view_depth, frag,
            True, g.valid, cfg.shadow_pen_capacity,
            cfg.shadow_pen_cascade_caps)
        return s.v

    timeit(full_sparse, g.world, normal, n_dot_l, view_depth, frag,
           label="cascaded_shadow_sparse total")

    def taa_apply(world, sh):
        sres = shadow_filter.ShadowResult(sh, sh, sh * sh,
                                          jnp.ones_like(sh))
        term, hist = taa.apply_shadow_taa(sres, world, uni,
                                          state.shadow_history, True, 0, h)
        return term

    timeit(taa_apply, g.world, jnp.ones((h, w)), label="shadow TAA")

    def contact_sparse(world, normal, pd):
        return contact.compute_contact_shadow_sparse(
            world, normal, uni, pd, 0, cfg.contact_capacity,
            cfg.contact_march_capacity, g.valid)

    timeit(contact_sparse, g.world, normal, state.prev_depth,
           label="contact sparse total")

    def main_raster(clip):
        return raster_scene(clip, scene.tri_indices, cfg.width, cfg.height,
                            scene.num_triangles, cfg.raster)[0]

    world_v, clip_v, _ = jax.jit(
        lambda: geometry.transform_vertices(scene, uni.models,
                                            uni.view_proj))()
    timeit(main_raster, clip_v, label="main raster (setup+bin+pallas)")

    timeit(lambda ti, d: deferred.interpolate(
        ti + (d[0, 0] * 1e-30).astype(jnp.int32), d, setup_data, blocks,
        scene.tri_flags).world,
        tri_id, depth, label="deferred interpolate")


if __name__ == "__main__":
    main()
