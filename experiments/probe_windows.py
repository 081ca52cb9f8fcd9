#!/usr/bin/env python
"""Round-4 design probe: windowed shadow pipeline feasibility numbers.

Measures, on the real flagship scene/view:
 1. per-cascade light-space texel bbox of the MODEL (non-ground) geometry
    (the window footprint) + texels-per-world-unit scales;
 2. NEAR pixel counts (world within the light column through the model
    AABB + pad) and how they split per consulted cascade;
 3. FAR-pixel analytic LIT certificate pass rate (must be ~100% of
    valid FAR pixels or the windowed mode would permanently fall back);
 4. where the current 82k penumbra pairs sit relative to NEAR/FAR
    (validates that the mesh-edge pairs vanish with the analytic path).

Run with ambient env: PYTHONPATH=/root/repo:/root/.axon_site python -u ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                             compute_frame_uniforms, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import OBJ_GROUND, build_device_scene

DUCK = "/root/reference/models/scene.gltf"


def main():
    gltf = GltfScene.load(DUCK)
    scene = build_device_scene(gltf)
    cfg = GltfConfig()
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))
    state = init_frame_state(cfg)
    frame = compiled_gltf_frame(cfg)
    for _ in range(2):
        _, state = frame(scene, params, state)

    @jax.jit
    def probe(scene, params, state):
        from funky_tpu.passes import geometry, shadow_filter
        from funky_tpu.passes.shadow_classify import light_ground_planes
        from funky_tpu.ops.raster import raster_corners
        from funky_tpu.frame import _main_raster_inputs
        from funky_tpu.passes import deferred

        uni = compute_frame_uniforms(params, state, cfg)
        world_v, clip, normals_v = geometry.transform_vertices(
            scene, uni.models, uni.view_proj)

        # -- 1. model world AABB + per-cascade footprint bbox --
        is_model = scene.vert_object != OBJ_GROUND
        big = jnp.float32(1e30)
        mn = jnp.min(jnp.where(is_model[:, None], world_v, big), axis=0)
        mx = jnp.max(jnp.where(is_model[:, None], world_v, -big), axis=0)
        corners = jnp.stack([
            jnp.stack([mn[0] if i & 1 == 0 else mx[0],
                       mn[1] if i & 2 == 0 else mx[1],
                       mn[2] if i & 4 == 0 else mx[2]])
            for i in range(8)])                        # (8, 3)
        ones = jnp.ones((8, 1), jnp.float32)
        hom = jnp.concatenate([corners, ones], axis=-1)
        s = cfg.shadow_map_size
        fp = []
        scales = []
        for c in range(4):
            cl = hom @ uni.light_view_proj[c].T
            uv = (cl[:, :2] / cl[:, 3:4]) * 0.5 + 0.5
            tex = uv * s
            fp.append(jnp.stack([jnp.min(tex, 0), jnp.max(tex, 0)]))
            # texels per world unit: norm of the uv xy rows of the matrix
            m2 = uni.light_view_proj[c][:2, :3]
            scales.append(0.5 * s * jnp.sqrt(jnp.sum(m2 * m2, axis=1)).max())
        fp = jnp.stack(fp)                             # (4, 2lo/hi, 2xy)
        scales = jnp.stack(scales)                     # (4,)

        # -- main raster + deferred (to get per-pixel world) --
        blocks = geometry.build_shade_blocks(scene, world_v, clip, normals_v)
        tri_clip, blocks_m, tri_flags_m, tri_valid = _main_raster_inputs(
            scene, clip, blocks, cfg.clip_capacity)
        tri_id, depth, setup = raster_corners(
            tri_clip, tri_valid, cfg.width, cfg.height, cfg.raster)
        g = deferred.interpolate(tri_id, depth, setup.data, blocks_m,
                                 tri_flags_m)
        normal = g.normal / jnp.maximum(
            jnp.linalg.norm(g.normal, axis=-1, keepdims=True), 1e-12)
        n_dot_l = jnp.maximum(jnp.sum(normal * uni.light_dir, -1), 0.0)
        view_depth = -((g.world @ uni.view[2, :3].T) + uni.view[2, 3])

        # -- 2. NEAR mask: light-frame 2D coords within model bbox + pad --
        l = uni.light_dir
        up = jnp.where(jnp.abs(l[1]) > 0.9,
                       jnp.asarray([0., 0., 1.], jnp.float32),
                       jnp.asarray([0., 1., 0.], jnp.float32))
        r0 = jnp.cross(l, up)
        r0 = r0 / jnp.linalg.norm(r0)
        r1 = jnp.cross(l, r0)
        c2 = corners @ jnp.stack([r0, r1], axis=1)     # (8, 2)
        b_lo = jnp.min(c2, axis=0)
        b_hi = jnp.max(c2, axis=0)
        R_TAP = 18.0 + 4.0   # rise window(max_softness=4) + slack texels
        pad_world = (R_TAP / jnp.min(scales)) + 0.02 + 1e-3
        w2 = jnp.stack([g.world @ r0, g.world @ r1], axis=-1)
        near = (jnp.all(w2 >= b_lo - pad_world, -1)
                & jnp.all(w2 <= b_hi + pad_world, -1) & g.valid)

        # -- 3. FAR analytic LIT certificate --
        planes = light_ground_planes(uni.light_view_proj)   # (4, 3)
        softness = uni.shadow_bias[0]
        c0, c1, t = shadow_filter.select_cascade_blend(view_depth,
                                                       uni.cascade_splits)

        def far_cert(layer):
            uv, receiver, bias, inb = shadow_filter._light_project(
                uni, layer, g.world, normal, n_dot_l)
            receiver = receiver - bias
            oh = (layer[..., None] == jnp.arange(4, dtype=jnp.int32))
            psel = lambda k: jnp.sum(jnp.where(oh, planes[:, k], 0.0), -1)
            p0, p1, p2 = psel(0), psel(1), psel(2)
            plane_uv = p0 * uv[..., 0] + p1 * uv[..., 1] + p2
            slope = (jnp.abs(p0) + jnp.abs(p1)) / s      # per texel
            eps = (jnp.abs(p0) + jnp.abs(p1) + jnp.abs(p2)) * 8e-7 + 4e-7
            light_size = softness * 2.0
            r_search = light_size + 2.0
            bd_low = plane_uv - slope * r_search - eps
            ratio = (receiver - bd_low) / jnp.maximum(bd_low, 1e-8)
            pen = jnp.clip(ratio * light_size, 0.5, light_size * 2.0)
            need_r = pen + 2.0
            lit = (receiver <= plane_uv - slope * (need_r + 2.0) - eps)
            return lit | ~inb, receiver - plane_uv

        lit0f, rpix0 = far_cert(c0)
        lit1f, _ = far_cert(c1)
        far = g.valid & ~near
        blend = t > 0.0
        far_ok = jnp.where(blend, lit0f & lit1f, lit0f)
        # margin distribution for FAR ground pixels
        far_fail = far & ~far_ok

        # -- 4. current pairs vs NEAR/FAR --
        from funky_tpu.passes.shadow_classify import build_class_maps
        from funky_tpu.passes import shadow as shadow_pass
        from funky_tpu.ops.sampling import quad_pack
        raw = shadow_pass.render_shadow_maps(
            world_v, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        cmaps = build_class_maps(raw, cfg.class_coarse, cfg.max_softness,
                                 planes)
        h, w = tri_id.shape
        frag = jnp.stack([
            jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None] + .5,
                             (h, w)),
            jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None] + .5,
                             (h, w))], -1)
        (_, _, _, _, _, _, _, _, _, _, needs0, needs1) = \
            shadow_filter._pair_classification(
                uni, cmaps, c0, c1, blend, g.world, normal, n_dot_l,
                softness, True, g.valid)

        # raster depth vs plane: max |stored - plane| over model-free cells
        tex_u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        out = {
            "fp_lo": fp[:, 0], "fp_hi": fp[:, 1], "scales": scales,
            "pad_world": pad_world,
            "near_px": jnp.sum(near),
            "valid_px": jnp.sum(g.valid),
            "far_fail": jnp.sum(far_fail),
            "far_fail_ground": jnp.sum(far_fail & ((g.flags & 1) == 0)),
            "pairs0_total": jnp.sum(needs0), "pairs1_total": jnp.sum(needs1),
            "pairs0_near": jnp.sum(needs0 & near),
            "pairs1_near": jnp.sum(needs1 & near),
            "needed_c": jnp.stack([
                jnp.sum(near & ((c0 == c) | (blend & (c1 == c))))
                for c in range(4)]),
        }
        # per-cascade raster-vs-plane residual (ground region only =
        # texels outside the model footprint)
        for c in range(4):
            plane_tex = (planes[c, 0] * tex_u[None, :]
                         + planes[c, 1] * tex_u[:, None] + planes[c, 2])
            in_fp = ((tex_u[None, :] * s >= fp[c, 0, 0] - 4)
                     & (tex_u[None, :] * s <= fp[c, 1, 0] + 4)
                     & (tex_u[:, None] * s >= fp[c, 0, 1] - 4)
                     & (tex_u[:, None] * s <= fp[c, 1, 1] + 4))
            ground = (~in_fp) & (raw[c] < 1.0) & (plane_tex <= 1.0) \
                & (plane_tex >= 0.0)
            resid = jnp.where(ground, jnp.abs(raw[c] - plane_tex), 0.0)
            out[f"resid_max_c{c}"] = jnp.max(resid)
            out[f"ground_texels_c{c}"] = jnp.sum(ground)
        return out

    out = probe(scene, params, state)
    for k, v in out.items():
        a = np.asarray(v)
        print(f"{k}: {np.array2string(a, precision=4, suppress_small=False)}")


if __name__ == "__main__":
    main()
