#!/usr/bin/env python
"""Per-pass cost breakdown of the flagship frame via flag-diff timing.

Chained-and-drained protocol (see bench.py). Capacities hardcoded from the
bench's tuned values for the default view.
"""

import dataclasses
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

    from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                                 compiled_gltf_frame, default_gltf_params,
                                 init_frame_state)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.raster import RasterConfig

    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))

    base = GltfConfig(
        raster=RasterConfig(tile_h=32, tile_w=128, capacity=1664),
        shadow_raster=RasterConfig(tile_h=128, tile_w=128, capacity=4224),
        shadow_pen_capacity=102400,
        contact_capacity=119808,
        contact_march_capacity=44032,
    )

    variants = {
        "full": base,
        "no_contact": dataclasses.replace(
            base, flags=GltfFrameFlags(enable_contact_shadows=False)),
        "no_shadows": dataclasses.replace(
            base, flags=GltfFrameFlags(enable_shadows=False)),
        "no_taa": dataclasses.replace(
            base, flags=GltfFrameFlags(use_shadow_taa=False)),
        "bare": dataclasses.replace(
            base, flags=GltfFrameFlags(enable_shadows=False,
                                       enable_contact_shadows=False)),
        "pcf": dataclasses.replace(
            base, flags=GltfFrameFlags(use_pcss=False)),
    }
    sel = os.environ.get("PROFILE_VARIANTS")
    if sel:
        variants = {k: variants[k] for k in sel.split(",")}

    n = int(os.environ.get("PROFILE_FRAMES", "8"))
    results = {}
    for name, cfg in variants.items():
        frame = compiled_gltf_frame(cfg)
        state = init_frame_state(cfg)
        rgba, state = frame(scene, params, state)
        float(np.asarray(rgba.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(n):
            rgba, state = frame(scene, params, state)
        float(np.asarray(rgba.ravel()[0]))
        ms = (time.perf_counter() - t0) / n * 1000.0
        results[name] = ms
        print(f"{name:12s} {ms:8.1f} ms", flush=True)

    if "full" in results:
        f = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"delta full - {k:12s} = {f - v:8.1f} ms")


if __name__ == "__main__":
    main()
