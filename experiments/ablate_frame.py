#!/usr/bin/env python
"""Whole-frame ablation timing: where do the flagship's ~150 ms go?

Each variant toggles one pass off (static flags -> re-jit) and times the
FULL frame chained x N with ONE drain fetch, so the ~33 ms tunnel RTT
(measured, experiments r3) is amortized to noise. Differences between
variants attribute real in-frame cost — unlike isolated stage scans,
which both distort scheduling and carry the RTT floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/ablate_frame.py
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
    tuned = autotune_config(scene, params, GltfConfig(), verbose=False)

    def f(**kw):
        return dataclasses.replace(tuned,
                                   flags=dataclasses.replace(tuned.flags,
                                                             **kw))

    variants = {
        "full": tuned,
        "no_contact": f(enable_contact_shadows=False),
        "no_taa": f(use_shadow_taa=False),
        "no_pcss(pcf)": f(use_pcss=False),
        "no_shadows": f(enable_shadows=False),
        "no_shadow_no_contact": f(enable_shadows=False,
                                  enable_contact_shadows=False),
        "dense_shadows": f(sparse_shadows=False),
        "dense_contact": f(sparse_contact=False),
    }

    n = int(os.environ.get("AB_FRAMES", "20"))
    reps = int(os.environ.get("AB_REPEATS", "3"))
    results = {}
    for name, cfg in variants.items():
        frame = compiled_gltf_frame(cfg)
        state = init_frame_state(cfg)
        rgba, state = frame(scene, params, state)
        float(np.asarray(rgba.ravel()[0]))
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                rgba, state = frame(scene, params, state)
            float(np.asarray(rgba.ravel()[0]))
            ms.append((time.perf_counter() - t0) / n * 1e3)
        ms.sort()
        results[name] = ms[len(ms) // 2]
        print(f"{name:22s} {ms[len(ms)//2]:7.2f} ms/frame "
              f"(min {ms[0]:.2f} max {ms[-1]:.2f})", flush=True)

    full = results.get("full")
    if full:
        print("\nattribution vs full:")
        for name, v in results.items():
            if name != "full":
                print(f"  {name:22s} saves {full - v:7.2f} ms")


if __name__ == "__main__":
    main()
