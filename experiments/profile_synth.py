"""Isolated cost of synthesize_shadow_maps vs render_shadow_maps (chained
in one jit per CLAUDE.md timing protocol)."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

import funky_tpu.frame as fr
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.passes import geometry, shadow
from funky_tpu.passes import shadow_lightspace as lsm


def timeit(label, fn, *args, n=20):
    @jax.jit
    def chain(args):
        def body(carry, _):
            out = fn(*args, tweak=carry)
            return carry + out * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    d = chain(args)
    float(np.asarray(d))
    ms = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = chain(args)
        float(np.asarray(d))
        ms.append((time.perf_counter() - t0) / n * 1e3)
    ms.sort()
    print(f"{label:28s} {ms[1]:7.2f} ms", flush=True)


def main():
    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    cfg = fr.GltfConfig()
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    state = fr.init_frame_state(cfg)
    uni = jax.jit(fr.compute_frame_uniforms, static_argnums=2)(
        params, state, cfg)
    world_v, _, _ = jax.jit(geometry.transform_vertices)(
        scene, uni.models, uni.view_proj)
    sizes = (384, 256, 256, 256)
    origins, _ = lsm.plan_windows(uni, world_v, scene.vert_object, sizes,
                                  cfg.shadow_map_size, cfg.max_softness,
                                  cfg.class_coarse)
    origins = tuple((jnp.asarray(oy), jnp.asarray(ox))
                    for oy, ox in origins)

    def full(world_v, tweak):
        m = shadow.render_shadow_maps(
            world_v + tweak, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        return jnp.sum(m[:, ::233, ::233])

    def synth(world_v, tweak):
        m, ok = shadow.synthesize_shadow_maps(
            scene, world_v + tweak, uni, cfg.shadow_map_size, sizes,
            origins)
        return jnp.sum(m[:, ::233, ::233]) + ok

    def synth_ground_only(world_v, tweak):
        m, ok = shadow.synthesize_shadow_maps(
            scene, world_v + tweak, uni, cfg.shadow_map_size,
            (0, 0, 0, 0), (None,) * 4)
        return jnp.sum(m[:, ::233, ::233])

    def lightmap(world_v, tweak):
        _, n_off, gbias = lsm.ground_constants(uni)
        planes_b = lsm.biased_ground_planes(uni.light_view_proj,
                                            lsm.GROUND_Y + n_off)
        raw = shadow.render_shadow_maps(
            world_v + tweak, scene.tri_indices, scene.num_triangles,
            uni.light_view_proj, cfg.shadow_raster, cfg.shadow_map_size)
        acc = jnp.float32(0.0)
        for c in range(2):
            rows = lsm.build_light_shadow_map(
                raw[c], origins[c], planes_b[c], uni, True, sizes[c],
                cfg.max_softness, gbias, cfg.light_pcf_rungs)
            acc = acc + jnp.sum(rows[::97])
        return acc + jnp.sum(raw[:, ::233, ::233])

    timeit("full raster", full, world_v)
    timeit("synth (ground+windows)", synth, world_v)
    timeit("synth ground only", synth_ground_only, world_v)
    timeit("raster + 2 light maps", lightmap, world_v)


if __name__ == "__main__":
    main()
