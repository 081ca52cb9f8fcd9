#!/usr/bin/env python
"""A/B the full flagship frame across back-half variants on the TPU.

Round-3 regression hunt: bench dropped 6.27 (r2 dense+two-level blocks)
-> 4.76 FPS (r3 autotune: row slab + tap windows). Times the WHOLE frame
(chained through carried state, one drain fetch) for each config delta so
the slowdown can be attributed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/ab_backhalf.py
"""

import dataclasses
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

    from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                                 default_gltf_params, init_frame_state)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.utils.autotune import autotune_config

    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))

    base = GltfConfig()
    tuned = autotune_config(scene, params, base, verbose=True)

    variants = {
        # r2 equivalent: dense back half + two-level block compactions
        "dense": dataclasses.replace(tuned, valid_slab_rows=0,
                                     valid_block_capacity=0,
                                     shadow_tap_windows=None),
        "dense+windows": dataclasses.replace(tuned, valid_slab_rows=0,
                                             valid_block_capacity=0),
        "slab": dataclasses.replace(tuned, shadow_tap_windows=None),
        "slab+windows": tuned,
        "blocked": dataclasses.replace(
            tuned, valid_slab_rows=0, valid_block_capacity=None,
            shadow_tap_windows=None),
    }

    n = int(os.environ.get("AB_FRAMES", "8"))
    reps = int(os.environ.get("AB_REPEATS", "3"))
    for name, cfg in variants.items():
        frame = compiled_gltf_frame(cfg)
        state = init_frame_state(cfg)
        rgba, state = frame(scene, params, state)
        float(np.asarray(rgba.ravel()[0]))
        fps = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                rgba, state = frame(scene, params, state)
            float(np.asarray(rgba.ravel()[0]))
            fps.append(n / (time.perf_counter() - t0))
        fps.sort()
        print(f"{name:16s} median {fps[len(fps)//2]:6.2f} fps "
              f"(min {fps[0]:.2f} max {fps[-1]:.2f})", flush=True)


if __name__ == "__main__":
    main()
