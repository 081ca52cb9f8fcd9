"""The missing r5 A/B variant: synth_shadow_maps + committed ALONE.

ab_lightflags_tuned measured all+com (synth + light-space + backface +
committed) at 88.5 ms vs committed 80.9, but light-space (+6.1) and
backface (+2.3) lose independently, so synthesized maps alone was never
judged under committed (where its r4 loss — the synth_ok cond barrier —
is NOT elided by design, but the surrounding conds are). Also measures
committed (the shipped flagship) as the control, with tap windows now
derived (r5).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os

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

    for name, kw in [
        ("committed", dict(committed=True)),
        ("synth+com", dict(synth_shadow_maps=True, committed=True)),
    ]:
        cfg = GltfConfig(flags=GltfFrameFlags(**kw))
        cfg = autotune_config(scene, params, cfg, verbose=True)
        print(f"# {name}: pen={cfg.shadow_pen_capacity} "
              f"casc={cfg.shadow_pen_cascade_caps} "
              f"win={cfg.light_window_sizes} "
              f"taps={cfg.shadow_tap_windows}", flush=True)
        time_cfg(name, cfg, scene, params)


if __name__ == "__main__":
    main()
