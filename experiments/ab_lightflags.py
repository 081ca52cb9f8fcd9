"""A/B the round-4 perf-mode flags in-frame on TPU.

Times 20-chained-frame batches for flag combos sharing one set of
capacities (so the comparison isolates the flags, not the tuning):
  base        — round-3 configuration (old caps)
  backface    — + skip_backfacing_shadows
  light       — + light_space_ground_shadows (fetch + dense window build)
  synth       — + synth_shadow_maps
  all         — everything
"""

import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             compiled_gltf_frame, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene


def time_cfg(name, cfg, scene, params, n=20):
    frame = compiled_gltf_frame(cfg)
    state = init_frame_state(cfg)
    rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            rgba, state = frame(scene, params, state)
        float(np.asarray(rgba.ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:10s} {best * 1e3:7.1f} ms/frame  {1.0 / best:6.2f} fps",
          flush=True)


def main():
    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))

    # shared tuned capacities (measured occupancy + headroom; the 2x2
    # -block classify adds ~12% pairs and ~35% pair-blocks vs r3 — an
    # undersized block cap here silently pins EVERY variant to the dense
    # fallback, which is exactly what it did on the first run)
    common = dict(
        shadow_pen_capacity=102400,
        shadow_pen_cascade_caps=(45 * 1024, 56 * 1024, 5120, 1024),
        light_fetch_caps=(8192, 8192, 0, 0),
        light_window_sizes=(384, 256, 0, 0),
        contact_capacity=110592, contact_march_capacity=38912,
        texture_block_capacity=768, shadow_pen_block_capacity=3072,
        contact_block_capacity=2176, valid_slab_rows=736,
        valid_block_capacity=0)
    raster = dataclasses.replace(GltfConfig().raster, capacity=1664)
    shadow_raster = dataclasses.replace(GltfConfig().shadow_raster,
                                        capacity=4224)

    def cfg(**flag_kw):
        return GltfConfig(raster=raster, shadow_raster=shadow_raster,
                          flags=GltfFrameFlags(**flag_kw), **common)

    time_cfg("base", cfg(), scene, params)
    time_cfg("backface", cfg(skip_backfacing_shadows=True), scene, params)
    time_cfg("light", cfg(light_space_ground_shadows=True), scene, params)
    time_cfg("synth", cfg(synth_shadow_maps=True), scene, params)
    time_cfg("all", cfg(skip_backfacing_shadows=True,
                        light_space_ground_shadows=True,
                        synth_shadow_maps=True), scene, params)


if __name__ == "__main__":
    main()
