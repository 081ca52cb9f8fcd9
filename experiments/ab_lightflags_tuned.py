"""A/B the r4 perf-mode flags in-frame with PER-VARIANT autotuned caps.

The first ab_lightflags.py shared one set of capacities across variants to
isolate the flags from tuning — but the tap core is CAPACITY-bound
(PERF.md r4 rule 1), and light_space_ground_shadows moves pairs from
34-row tap segments into 1-row fetch segments, a win that only material-
izes when the per-cascade TAP caps shrink accordingly. This A/B gives
every variant its own autotune_config pass (the same path bench.py and
FrameDriver use), so each flag is judged at the capacities a real app
would run it with.
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
from funky_tpu.utils.autotune import autotune_config


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
    print(f"{name:12s} {best * 1e3:7.1f} ms/frame  {1.0 / best:6.2f} fps",
          flush=True)
    return best


def main():
    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))

    variants = [
        ("base", {}),
        ("committed", dict(committed=True)),
        ("bf+com", dict(skip_backfacing_shadows=True, committed=True)),
        ("light+com", dict(light_space_ground_shadows=True,
                           committed=True)),
        ("lt+bf+com", dict(light_space_ground_shadows=True,
                           skip_backfacing_shadows=True, committed=True)),
        ("all+com", dict(light_space_ground_shadows=True,
                         skip_backfacing_shadows=True,
                         synth_shadow_maps=True, committed=True)),
    ]
    base_caps = {}
    for name, kw in variants:
        # Seed with the base-tuned caps so the occupancy-measurement
        # frame compiles small (occupancy counts are cap-independent:
        # overflow frames are exact fallbacks); autotune then re-derives.
        cfg = GltfConfig(flags=GltfFrameFlags(**kw), **base_caps)
        cfg = autotune_config(scene, params, cfg, verbose=True)
        if name == "base":
            base_caps = dict(
                raster=cfg.raster, shadow_raster=cfg.shadow_raster,
                shadow_pen_capacity=cfg.shadow_pen_capacity,
                shadow_pen_cascade_caps=cfg.shadow_pen_cascade_caps,
                shadow_pen_block_capacity=cfg.shadow_pen_block_capacity,
                contact_capacity=cfg.contact_capacity,
                contact_march_capacity=cfg.contact_march_capacity,
                contact_block_capacity=cfg.contact_block_capacity,
                texture_block_capacity=cfg.texture_block_capacity,
                valid_slab_rows=cfg.valid_slab_rows,
                valid_block_capacity=cfg.valid_block_capacity)
        print(f"# {name}: pen={cfg.shadow_pen_capacity} "
              f"casc={cfg.shadow_pen_cascade_caps} "
              f"fetch={cfg.light_fetch_caps} "
              f"win={cfg.light_window_sizes}", flush=True)
        time_cfg(name, cfg, scene, params)


if __name__ == "__main__":
    main()
