#!/usr/bin/env python
"""Why does contact stage-1 fail? Per-term breakdown of _segment_cert
on the real flagship frame (run on TPU with ambient env)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import funky_tpu.frame as fr
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import raster_corners
from funky_tpu.passes import contact, deferred, geometry


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
        gbuf = deferred.interpolate(tri_id, depth, setup.data, blocks_m,
                                    tri_flags_m)
        normal = gbuf.normal / jnp.maximum(
            jnp.linalg.norm(gbuf.normal, axis=-1, keepdims=True), 1e-12)

        # second frame's view: prev_depth = this depth, same view
        prev_depth = depth
        hd, wd = prev_depth.shape
        size = jnp.asarray([wd, hd], jnp.float32)
        plane = contact.reference_plane(scene.positions,
                                        scene.tri_indices,
                                        uni.view_proj, wd, hd)
        pyr = contact.build_residual_pyramid(prev_depth, plane)
        march_start, march_dir, on_screen, facing = contact._ray_setup(
            gbuf.world, normal, uni)
        cand = facing & on_screen & gbuf.valid

        cert, intersects = contact._segment_cert(pyr, march_start,
                                                 march_dir, size)

        # breakdown: recompute interval_ok internals for the two intervals
        p0 = (march_start[..., :2] * 0.5 + 0.5) * size
        p1 = ((march_start[..., :2] + march_dir[..., :2]) * 0.5 + 0.5) \
            * size
        aa, bb = pyr.plane[0], pyr.plane[1]
        m = (jnp.abs(aa) + jnp.abs(bb)) * (contact.FOOT + 0.5)
        thresh = -pyr.eps - pyr.eps

        def endpoint(t):
            cs_z = march_start[..., 2] + march_dir[..., 2] * t
            q = p0 + (p1 - p0) * t[..., None]
            plane_q = aa * q[..., 0] + bb * q[..., 1] + pyr.plane[2]
            return cs_z, plane_q, q

        zeros = jnp.zeros(p0.shape[:-1], jnp.float32)
        ones = jnp.ones(p0.shape[:-1], jnp.float32)

        def interval_diag(ts, te):
            z_s, pl_s, q_s = endpoint(ts)
            z_e, pl_e, q_e = endpoint(te)
            touch = jnp.zeros(ts.shape, bool)
            for k in range(2):
                cmin = jnp.minimum(q_s[..., k], q_e[..., k])
                cmax = jnp.maximum(q_s[..., k], q_e[..., k])
                touch = touch | (cmin < contact.FOOT) | (
                    cmax > size[k] - contact.FOOT)
            pen = m + jnp.where(touch, m, 0.0)
            okc = ((z_s - (jnp.minimum(pl_s, 1.0) - pen) <= thresh)
                   & (z_e - (jnp.minimum(pl_e, 1.0) - pen) <= thresh))
            case_a = (jnp.maximum(pl_s, pl_e) + m <= 1.0) & ~touch
            oka = case_a & (z_s - pl_s <= thresh) & (z_e - pl_e <= thresh)
            case_b = (jnp.minimum(pl_s, pl_e) - m >= 1.0) & ~touch
            okb = case_b & (z_s <= 1.0 + thresh) & (z_e <= 1.0 + thresh)
            return dict(touch=touch, case_a=case_a, case_b=case_b,
                        oka=oka, okb=okb, okc=okc,
                        ok=(oka | okb | okc))

        # full-interval diag (t_in/t_out ignored: how would [0,1] fare?)
        d01 = interval_diag(zeros, ones)

        def count(x):
            return jnp.sum(x & cand)

        return {
            "cand": jnp.sum(cand),
            "stage2": count(intersects | ~cert),
            "intersects": count(intersects),
            "cert_fail": count(~cert),
            "i01_ok": count(d01["ok"]),
            "i01_touch": count(d01["touch"]),
            "i01_case_a": count(d01["case_a"]),
            "i01_case_b": count(d01["case_b"]),
            "i01_oka": count(d01["oka"]),
            "i01_okc": count(d01["okc"]),
            "m": m, "eps": pyr.eps,
            "occl_lo": pyr.occl_lo, "occl_hi": pyr.occl_hi,
            "plane": pyr.plane,
        }

    state = fr.init_frame_state(cfg)
    out = probe(scene, params, state)
    for k, v in out.items():
        print(k, np.asarray(v))


if __name__ == "__main__":
    main()
