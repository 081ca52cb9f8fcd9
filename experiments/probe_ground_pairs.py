"""How many penumbra pairs are GROUND-plane pixels, and how big is the
light-space region they actually tap?

Decides the light-space dense shadow pass (PERF.md roadmap #2 / VERDICT r3
item 1): ground receivers have receiver depth affine in shadow uv, so their
blocker search + PCF can run densely in light space with shifted-image ops
(zero gathers) — IF most pairs are ground pixels and the dense window is
tractable.  Downloads the masks and computes stats host-side (a TPU scatter
per cell histogram is a serial-loop trap).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                             default_gltf_params, init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.passes import shadow_filter
from funky_tpu.passes import shadow_lightspace as lsm
from funky_tpu.utils.diagnostics import _frame_intermediates


def main():
    gltf = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(gltf)
    cfg = GltfConfig()
    params = default_gltf_params(gltf_min_y=float(gltf.bounds_min[1]))

    state = init_frame_state(cfg)
    frame = compiled_gltf_frame(cfg)
    for _ in range(2):
        _, state = frame(scene, params, state)

    s = cfg.shadow_map_size

    @jax.jit
    def probe(scene, params, state):
        (uni, cmaps, g, normal, n_dot_l, view_depth, _,
         world_v) = _frame_intermediates(scene, params, state, cfg)
        h, w = g.depth.shape
        frag = jnp.stack([
            jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5, (h, w)),
            jnp.broadcast_to(
                jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5, (h, w)),
        ], axis=-1)
        stats = shadow_filter.classify_stats(
            uni, cmaps, g.world, normal, n_dot_l, view_depth, frag,
            cfg.flags.use_pcss, g.valid)
        needs = stats["_needs"]                      # (2, H, W)
        c0, c1, t = shadow_filter.select_cascade_blend(
            view_depth, uni.cascade_splits)
        pair_layer = jnp.stack([c0, c1])

        from funky_tpu.passes.geometry import transform_vertices
        world_v, _, _ = transform_vertices(scene, uni.models, uni.view_proj)
        lo, hi = lsm.occluder_uv_bbox(world_v, scene.vert_object,
                                      uni.light_view_proj)

        ground = (jnp.abs(g.world[..., 1]) < 1e-4) & (
            normal[..., 1] > 0.9999) & g.valid
        txs, tys = [], []
        for cas in (c0, c1):
            uv, _, _, _ = shadow_filter._light_project(
                uni, cas, g.world, normal, n_dot_l)
            txs.append(jnp.clip(jnp.floor(uv[..., 0] * s), 0,
                                s - 1).astype(jnp.int32))
            tys.append(jnp.clip(jnp.floor(uv[..., 1] * s), 0,
                                s - 1).astype(jnp.int32))
        return (needs, pair_layer, ground, jnp.stack(txs), jnp.stack(tys),
                lo, hi)

    needs, pl, ground, tx, ty, lo, hi = map(np.asarray,
                                            probe(scene, params, state))
    print(f"ground_pixels={ground.sum()}")
    print(f"occluder footprint bbox (texels): "
          + "; ".join(f"c{c}: x[{lo[c,0]*s:.0f},{hi[c,0]*s:.0f}] "
                      f"y[{lo[c,1]*s:.0f},{hi[c,1]*s:.0f}]"
                      for c in range(4)))
    print("half cas   pairs  ground    bbox(x)       bbox(y)   "
          "ext  cells16")
    for half in range(2):
        for c in range(4):
            m = needs[half] & (pl[half] == c)
            mg = m & ground
            if mg.any():
                x = tx[half][mg]
                y = ty[half][mg]
                ext = max(x.max() - x.min() + 1, y.max() - y.min() + 1)
                cells = len(set(zip((y // 16).tolist(),
                                    (x // 16).tolist())))
                print(f"{half:4d} {c:3d} {m.sum():7d} {mg.sum():7d} "
                      f"[{x.min():5d},{x.max():5d}] "
                      f"[{y.min():5d},{y.max():5d}] {ext:5d} {cells:6d}")
            else:
                print(f"{half:4d} {c:3d} {m.sum():7d} {mg.sum():7d}")


if __name__ == "__main__":
    main()
