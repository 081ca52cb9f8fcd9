#!/usr/bin/env python
"""Shadow-raster tile-shape sweep on the real flagship scene.

The Pallas raster's per-triangle cost is one whole (tile_h, tile_w)
vector pass, so Sum_tiles count_t * tile_px sets the work; smaller tiles
cut per-triangle area but add grid steps and binning. Measure, don't
guess.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/bench_shadow_tiles.py
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
    from funky_tpu.ops.binning import bin_stats
    from funky_tpu.ops.raster import RasterConfig
    from funky_tpu.passes import geometry, shadow

    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    cfg0 = fr.GltfConfig()
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    state0 = fr.init_frame_state(cfg0)
    uni = jax.jit(lambda p, s: fr.compute_frame_uniforms(p, s, cfg0))(
        params, state0)

    world, clip, _ = jax.jit(lambda s, m, vp: geometry.transform_vertices(
        s, m, vp))(scene, uni.models, uni.view_proj)
    lvp = uni.light_view_proj
    iters = int(os.environ.get("N", "30"))

    shapes = [(128, 256), (256, 256), (128, 512), (128, 128)]
    for th, tw in shapes:
        # measured per-tile max for this shape
        ones = jnp.ones((world.shape[0], 1), jnp.float32)
        hom = jnp.concatenate([world, ones], axis=-1)
        mx = 0
        for c in range(4):
            clip_c = hom @ lvp[c].T
            st = jax.jit(lambda cc: bin_stats(
                cc, scene.tri_indices, 2048, 2048, th, tw,
                scene.num_triangles))(clip_c)
            mx = max(mx, int(st["max"]))
        cap = min(-(-int(mx * 1.2) // 128) * 128,
                  scene.tri_indices.shape[0])
        cfg = RasterConfig(tile_h=th, tile_w=tw, capacity=cap)

        @jax.jit
        def run(world, lvp, a0):
            def body(carry, _):
                w = world + carry
                maps = shadow.render_shadow_maps(
                    w, scene.tri_indices, scene.num_triangles, lvp, cfg,
                    2048)
                dep = jnp.sum(maps[:, ::233, ::233]) * 1e-30
                return dep.astype(jnp.float32), None
            dep, _ = jax.lax.scan(body, a0, None, length=iters)
            return dep

        try:
            d = run(world, lvp, jnp.float32(0))
            float(np.asarray(d))
            t0 = time.perf_counter()
            d = run(world, lvp, jnp.float32(0))
            float(np.asarray(d))
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"tile {th:4d}x{tw:<4d} cap {cap:5d}: {dt:7.2f} ms "
                  f"(4 cascades)", flush=True)
        except Exception as e:
            print(f"tile {th}x{tw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
