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

    # Tune bin capacities for THIS scene+view with measured headroom
    # (capacity-sized per-tile DMA is pure overhead above the real
    # occupancy; undersizing silently drops triangles, so verify first).
    try:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from funky_tpu.frame import compute_frame_uniforms
        from funky_tpu.ops.binning import bin_stats
        from funky_tpu.passes.geometry import transform_vertices

        @jax.jit
        def occupancy(scene, params, st0):
            uni = compute_frame_uniforms(params, st0, cfg)
            world, clip, _ = transform_vertices(scene, uni.models,
                                                uni.view_proj)
            main = bin_stats(clip, scene.tri_indices, cfg.width, cfg.height,
                             cfg.raster.tile_h, cfg.raster.tile_w,
                             scene.num_triangles)["max"]
            ones = jnp.ones((world.shape[0], 1), jnp.float32)
            world_h = jnp.concatenate([world, ones], axis=-1)
            sm = jnp.zeros((), jnp.int32)
            for c in range(4):
                clip_c = world_h @ uni.light_view_proj[c].T
                sm = jnp.maximum(sm, bin_stats(
                    clip_c, scene.tri_indices, cfg.shadow_map_size,
                    cfg.shadow_map_size, cfg.shadow_raster.tile_h,
                    cfg.shadow_raster.tile_w, scene.num_triangles)["max"])
            return main, sm

        main_max, sm_max = map(int, occupancy(scene, params,
                                              init_frame_state(cfg)))

        def cap(max_count):
            if max_count <= 0:
                return None  # fall back to always-correct auto sizing
            return min(-(-int(max_count * 1.5) // 128) * 128,
                       scene.tri_indices.shape[0])

        cfg = dataclasses.replace(
            cfg,
            raster=dataclasses.replace(cfg.raster, capacity=cap(main_max)),
            shadow_raster=dataclasses.replace(cfg.shadow_raster,
                                              capacity=cap(sm_max)))
        print(f"# tuned capacities: main {cfg.raster.capacity} "
              f"(max {main_max}), shadow {cfg.shadow_raster.capacity} "
              f"(max {sm_max})", file=sys.stderr)
    except Exception as e:
        print(f"# capacity tuning failed ({e}); using auto", file=sys.stderr)

    # Tune the sparse-evaluation capacities the same way: padded compaction
    # slots pay real gather cost, so size them to measured occupancy with
    # headroom (overflow is exact-but-slow via the dense lax.cond fallback).
    try:
        import dataclasses

        from funky_tpu.utils.diagnostics import measure_sparse_occupancy

        occ = measure_sparse_occupancy(scene, params, cfg)

        def blocks128(count):
            return max(-(-int(count * 1.3) // 128) * 128, 128)

        def cap1k(count, headroom=1.3):
            # padded slots pay real gather cost; occupancy drifts only a
            # few % frame-to-frame (IGN jitter), and overflow is an
            # exact dense-fallback frame, not an error
            return max(-(-int(count * headroom) // 1024) * 1024, 1024)

        cfg = dataclasses.replace(
            cfg,
            shadow_pen_capacity=cap1k(occ["pairs"], 1.5),
            shadow_pen_cascade_caps=tuple(
                cap1k(c) for c in occ["pairs_per_cascade"]),
            contact_capacity=cap1k(occ["contact_stage2"]),
            contact_march_capacity=cap1k(occ["contact_march"]),
            texture_block_capacity=blocks128(occ["texture_blocks"]),
            shadow_pen_block_capacity=blocks128(occ["pair_blocks"]),
            contact_block_capacity=blocks128(occ["contact_blocks"]))
        print(f"# sparse occupancy {occ} -> pen_capacity "
              f"{cfg.shadow_pen_capacity}, contact_capacity "
              f"{cfg.contact_capacity}, march "
              f"{cfg.contact_march_capacity}", file=sys.stderr)
    except Exception as e:
        print(f"# sparse tuning failed ({e}); using defaults",
              file=sys.stderr)

    state = init_frame_state(cfg)
    frame = compiled_gltf_frame(cfg)

    # warm / compile, then fully drain
    rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))

    n = int(os.environ.get("BENCH_FRAMES", "10"))
    t0 = time.perf_counter()
    for _ in range(n):
        rgba, state = frame(scene, params, state)
    float(np.asarray(rgba.ravel()[0]))
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    # Secondary metrics (stderr; the driver consumes only the stdout line).
    try:
        import dataclasses

        from funky_tpu.frame import (FrameConfig, GltfFrameFlags,
                                     compiled_cube_frame,
                                     default_cube_params)
        from funky_tpu.models.scene import build_cube_scene

        def chained(f, s0, nn=10):
            st = s0
            rgba, st = f(scene, params, st)
            float(np.asarray(rgba.ravel()[0]))
            t0 = time.perf_counter()
            for _ in range(nn):
                rgba, st = f(scene, params, st)
            float(np.asarray(rgba.ravel()[0]))
            return nn / (time.perf_counter() - t0)

        half = dataclasses.replace(
            cfg, flags=GltfFrameFlags(half_res_shadows=True))
        fps_half = chained(compiled_gltf_frame(half), init_frame_state(half))
        print(f"# half-res shadows: {fps_half:.2f} fps", file=sys.stderr)

        import jax
        import jax.numpy as jnp

        from funky_tpu.models.sdf import (SdfConfig, default_sdf_camera,
                                          render_sdf_frame)

        scfg = SdfConfig(width=960, height=540)
        pos, yaw, pitch, fov = default_sdf_camera()

        # Chained-and-drained inside ONE jit (CLAUDE.md protocol): each
        # frame's time depends on the previous frame's output, so the
        # final fetch proves all 20 executed.
        @jax.jit
        def sdf_chain(t0v):
            def body(carry, i):
                img = render_sdf_frame(carry + i * 0.02, pos, yaw, pitch,
                                       fov, scfg)
                return carry + (img[0, 0, 0] * 1e-30).astype(jnp.float32), \
                    None
            out, _ = jax.lax.scan(body, t0v,
                                  jnp.arange(20, dtype=jnp.float32))
            return out

        d = sdf_chain(jnp.float32(1.0))
        float(np.asarray(d))
        t0 = time.perf_counter()
        d = sdf_chain(jnp.float32(1.0))
        float(np.asarray(d))
        print(f"# sdf 960x540: {20 / (time.perf_counter() - t0):.1f} fps",
              file=sys.stderr)

        ccfg = FrameConfig(width=512, height=512)
        cscene = build_cube_scene()
        cframe = compiled_cube_frame(ccfg)
        # pre-build params so host-side eager transfers stay off the clock
        all_params = [default_cube_params(i * 0.02) for i in range(30)]
        img = cframe(cscene, all_params[0])
        float(np.asarray(img.ravel()[0]))
        t0 = time.perf_counter()
        for p in all_params:
            img = cframe(cscene, p)
        float(np.asarray(img.ravel()[0]))
        print(f"# cube 512x512: {30 / (time.perf_counter() - t0):.1f} fps "
              f"(reference headline: 144+)", file=sys.stderr)
    except Exception as e:  # secondary metrics must never break the bench
        print(f"# secondary metrics failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "glTF Duck + 4-cascade PCSS shadows + TAA + contact "
                  "shadows, 1920x1080",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
