#!/usr/bin/env python
"""Why does contact stage-1 retire <1% at the bench's ORBIT poses?
(BENCH_r04: contact_stage2 = 1,166,368 of 1,174,264 covered pixels at
the max over parked + 3 orbit poses, vs ~tens of thousands parked.)

Per-pose, per-term breakdown of _segment_cert on the real flagship frame
with the same pose-matched prev state the bench autotune measures with.
Run on TPU with ambient env: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import dataclasses
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import funky_tpu.frame as fr
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.passes import contact
from funky_tpu.utils import diagnostics


def orbit_params(params, i: int):
    a = 0.02 * i
    target = np.asarray([0.0, 0.6, 0.0], np.float32)
    rel = np.asarray([0.0, 2.5, 10.0], np.float32) - target
    rot = np.asarray([[math.cos(a), 0, math.sin(a)],
                      [0, 1, 0],
                      [-math.sin(a), 0, math.cos(a)]], np.float32)
    pos = target + rot @ rel
    d = target - pos
    dn = d / np.linalg.norm(d)
    return dataclasses.replace(
        params,
        camera_pos=jnp.asarray(pos),
        camera_yaw=jnp.float32(math.atan2(float(dn[2]), float(dn[0]))),
        camera_pitch=jnp.float32(math.asin(float(dn[1]))),
        duck_position=params.duck_position
        + jnp.asarray([0.3 * math.sin(3 * a), 0.0,
                       0.3 * math.cos(3 * a) - 0.3], jnp.float32))


def main():
    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    cfg = fr.GltfConfig()

    @jax.jit
    def probe(scene, params, state):
        (uni, cmaps, g, normal, n_dot_l, view_depth, _clip,
         _wv) = diagnostics._frame_intermediates(scene, params, state,
                                                 cfg)
        prev_depth = state.prev_depth
        hd, wd = prev_depth.shape
        size = jnp.asarray([wd, hd], jnp.float32)
        plane = contact.reference_plane(scene.positions,
                                        scene.tri_indices,
                                        uni.prev_view_proj, wd, hd)
        pyr = contact.build_residual_pyramid(prev_depth, plane)
        march_start, march_dir, on_screen, facing = contact._ray_setup(
            g.world, normal, uni)
        cand = facing & on_screen & g.valid

        cert, intersects = contact._segment_cert(pyr, march_start,
                                                 march_dir, size)

        # residual stats: how many texels are "occluders", and where
        xs = jnp.arange(wd, dtype=jnp.float32)[None, :] + 0.5
        ys = jnp.arange(hd, dtype=jnp.float32)[:, None] + 0.5
        plane_tex = plane[0] * xs + plane[1] * ys + plane[2]
        resid = prev_depth - jnp.minimum(plane_tex, 1.0)
        occ = resid < -pyr.eps
        # occluder texels NOT on the duck: the duck should be the only
        # legit occluder; count occ texels by residual magnitude bands
        bands = [(-1e9, -1e-2), (-1e-2, -1e-4), (-1e-4, -1e-5),
                 (-1e-5, 0.0)]
        occ_bands = [jnp.sum((resid >= lo) & (resid < hi) & occ)
                     for lo, hi in bands]

        def count(x):
            return jnp.sum(x & cand)

        return {
            "cand": jnp.sum(cand),
            "stage2": count(intersects | ~cert),
            "intersects": count(intersects),
            "cert_fail": count(~cert),
            "occl_lo": pyr.occl_lo, "occl_hi": pyr.occl_hi,
            "eps": pyr.eps, "plane": pyr.plane,
            "n_occ_texels": jnp.sum(occ),
            "occ_bands(big..tiny)": jnp.stack(occ_bands),
        }

    state = fr.init_frame_state(cfg)
    frame = fr.compiled_gltf_frame(cfg)
    poses = [("parked", params)] + [
        (f"orbit{i}", orbit_params(params, i)) for i in (8, 16, 23)]
    # warm with 2 parked frames (real prev_depth)
    for _ in range(2):
        _, state = frame(scene, params, state)
    for name, p in poses:
        _, state = frame(scene, p, state)   # pose-matched prev state
        out = {k: np.asarray(v) for k, v in probe(scene, p,
                                                  state).items()}
        print(f"--- {name}")
        for k, v in out.items():
            print(f"  {k}: {v}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
