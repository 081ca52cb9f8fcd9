#!/usr/bin/env python
"""Benchmark: the flagship glTF Duck + 4-cascade-shadow frame at 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference claims 60+ FPS for the glTF scene with GPU sync on
its laptop GPU (README.md:12; BASELINE.md) — vs_baseline = fps / 60.

Timing protocol: frames are CHAINED through the carried temporal state and
drained with a real value fetch (on this TPU tunnel, block_until_ready can
acknowledge at enqueue, so only a data read proves completion).
"""

import json
import os
import sys
import time
from pathlib import Path

# keep the axon plugin path if the caller replaced PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

DUCK_PATHS = [
    "/root/reference/models/scene.gltf",
    "models/scene.gltf",
]


def find_scene():
    from funky_tpu.models.gltf import GltfScene

    for p in DUCK_PATHS:
        if Path(p).exists():
            return GltfScene.load(p)
    return None


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                                 default_gltf_params, init_frame_state)
    from funky_tpu.models.scene import build_device_scene

    gltf = find_scene()
    scene = build_device_scene(gltf)
    gltf_min_y = float(gltf.bounds_min[1]) if gltf else 0.0

    cfg = GltfConfig()  # 1920x1080, 4x2048^2 cascades, PCSS+TAA+contact
    params = default_gltf_params(gltf_min_y=gltf_min_y)
    state = init_frame_state(cfg)
    frame = compiled_gltf_frame(cfg)

    # warm / compile, then fully drain
    rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))

    n = int(os.environ.get("BENCH_FRAMES", "20"))
    t0 = time.perf_counter()
    for _ in range(n):
        rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "glTF Duck + 4-cascade PCSS shadows + TAA + contact "
                  "shadows, 1920x1080",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
