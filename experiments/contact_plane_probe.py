#!/usr/bin/env python
"""Measure ground residual R = depth - min(plane, 1) under (a) the 3-point
fitted plane and (b) the raster's own ground-triangle z-plane."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import funky_tpu.frame as fr
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.binning import triangle_setup
from funky_tpu.ops.raster import raster_corners
from funky_tpu.passes import contact, geometry


def main():
    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    cfg = fr.GltfConfig()

    @jax.jit
    def probe(scene, params, state):
        uni = fr.compute_frame_uniforms(params, state, cfg)
        world_v, clip, normals_v = geometry.transform_vertices(
            scene, uni.models, uni.view_proj)
        blocks = geometry.build_shade_blocks(scene, world_v, clip,
                                             normals_v)
        tri_clip, blocks_m, tri_flags_m, tri_valid = \
            fr._main_raster_inputs(scene, clip, blocks, cfg.clip_capacity)
        tri_id, depth, setup = raster_corners(
            tri_clip, tri_valid, cfg.width, cfg.height, cfg.raster)

        h, w = depth.shape
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5

        plane_fit = contact.fit_ground_plane(uni.view_proj, w, h,
                                             uni.camera_pos)
        # raster ground z-planes: setup rows 0/1 are the ground triangles
        zp = setup.data[:2, 9:12]                       # (2, 3)
        ground = (tri_id == 0) | (tri_id == 1)

        out = {}
        for name, pl in (("fit", plane_fit), ("tri0", zp[0]),
                         ("tri1", zp[1])):
            pt = pl[0] * xs + pl[1] * ys + pl[2]
            r = depth - jnp.minimum(pt, 1.0)
            rg = jnp.where(ground, r, 0.0)
            out[name + "_min"] = jnp.min(rg)
            out[name + "_max"] = jnp.max(rg)
        # min-of-two-planes residual
        p0 = zp[0, 0] * xs + zp[0, 1] * ys + zp[0, 2]
        p1 = zp[1, 0] * xs + zp[1, 1] * ys + zp[1, 2]
        r = depth - jnp.minimum(jnp.minimum(p0, p1), 1.0)
        rg = jnp.where(ground, r, 0.0)
        out["min2_min"] = jnp.min(rg)
        out["min2_max"] = jnp.max(rg)
        out["dcoef"] = zp[0] - zp[1]
        out["zp0"] = zp[0]
        return out

    state = fr.init_frame_state(cfg)
    out = probe(scene, params, state)
    for k, v in out.items():
        print(k, np.asarray(v))


if __name__ == "__main__":
    main()
