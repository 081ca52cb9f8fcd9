#!/usr/bin/env python
"""Where do the penumbra pairs come from? Splits the sparse shadow
pair set (needs0/needs1, shadow_filter._pair_classification) by surface
(duck = textured vs ground) and failure cause, to target the r5
structural cuts (VERDICT r4: pairs_per_cascade 36k/42k dominated by
duck-top pixels — verify that claim and find what certificate would
close them).

Runs on CPU at reduced res (structure, not absolute counts).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import funky_tpu.frame as fr
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig
from funky_tpu.passes import shadow_filter
from funky_tpu.passes.shadow_classify import classify
from funky_tpu.utils import diagnostics


def main():
    duck = GltfScene.load("/root/reference/models/scene.gltf")
    scene = build_device_scene(duck)
    params = fr.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=4352,
                        backend="jnp")
    # Flagship dims: at smaller maps the per-texel ground slope
    # exceeds the depth bias and NOTHING classifies (measured: 1024-maps
    # probe returned needs0 == pixels) — counts are only meaningful at
    # the shipped 2048^2 cascades.
    cfg = fr.GltfConfig(width=1920, height=1080,
                        raster=tile, shadow_raster=tile)

    @jax.jit
    def probe(scene, params, state):
        (uni, cmaps, g, normal, n_dot_l, view_depth, _clip,
         _wv) = diagnostics._frame_intermediates(scene, params, state,
                                                 cfg)
        c0, c1, t = shadow_filter.select_cascade_blend(
            view_depth, uni.cascade_splits)
        softness = uni.shadow_bias[0]
        blend = t > 0.0
        valid = g.valid
        (uv0, r0, inb0, lit0, um0, uv1, r1, inb1, lit1, um1, needs0,
         needs1) = shadow_filter._pair_classification(
            uni, cmaps, c0, c1, blend, g.world, normal, n_dot_l,
            softness, True, valid)

        duckp = valid & ((g.flags & 1) != 0)   # textured = duck
        ground = valid & ((g.flags & 1) == 0)

        out = {"pixels": valid, "duck_px": duckp, "ground_px": ground}
        # cause split for needs0 (the c0 pair): not closed because
        # neither lit nor umbra (PCSS closure also involves blend)
        out["needs0"] = needs0
        out["needs1"] = needs1
        out["needs0_duck"] = needs0 & duckp
        out["needs0_ground"] = needs0 & ground
        out["needs0_blend"] = needs0 & blend
        out["needs1_blend"] = needs1 & blend
        # among needs0 NON-blend pixels: lit0/um0 both failed
        nb0 = needs0 & ~blend
        out["needs0_nonblend"] = nb0
        out["needs0_nonblend_duck"] = nb0 & duckp
        # receiver-vs-anchor diagnostics on the duck's needs0 pixels:
        # what margin does the LIT certificate miss by?
        counts = {k: jnp.sum(v) for k, v in out.items()}
        # per-cascade split of needs0
        for c in range(4):
            counts[f"needs0_c{c}"] = jnp.sum(needs0 & (c0 == c))
            counts[f"needs0_duck_c{c}"] = jnp.sum(needs0 & duckp
                                                  & (c0 == c))
            counts[f"needs0_ground_c{c}"] = jnp.sum(needs0 & ground
                                                    & (c0 == c))
        return counts

    state = fr.init_frame_state(cfg)
    frame = fr.compiled_gltf_frame(cfg)
    for _ in range(2):
        _, state = frame(scene, params, state)
    out = {k: int(v) for k, v in probe(scene, params, state).items()}
    for k, v in sorted(out.items()):
        print(f"{k:28s} {v}")


if __name__ == "__main__":
    main()
