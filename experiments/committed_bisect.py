"""Bisect which committed-mode cond elision breaks bit-exactness
(tests/test_committed.py::test_committed_matches_conded, red in r4).

Runs the test's exact config on CPU; for each pass-level elision site
(shadow_filter / contact / shading) forces committed=False via
monkeypatch while the frame runs committed=True, and reports the diff.
The frame-level sites (row-slab frame.py:648, blocked frame.py:709) are
isolated by elimination: if all pass-level sites forced off still
diverge, it's a frame-level site.
"""

import dataclasses
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from funky_tpu import frame as frame_mod
from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             default_gltf_params, init_frame_state,
                             render_gltf_frame)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig
from funky_tpu.passes import contact, shading, shadow_filter
from funky_tpu.utils.autotune import autotune_config

duck = GltfScene.load("/root/reference/models/scene.gltf")
scene = build_device_scene(duck)
tile = RasterConfig(tile_h=16, tile_w=128, capacity=4352, backend="jnp")
cfg = GltfConfig(width=256, height=144, shadow_map_size=256,
                 raster=tile, shadow_raster=tile)
params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
cfg = autotune_config(scene, params, cfg)


def run(cfg, frames=3):
    fn = jax.jit(functools.partial(render_gltf_frame, cfg=cfg))
    state = init_frame_state(cfg)
    for _ in range(frames):
        rgba, state = fn(scene, params, state)
    return np.asarray(rgba), np.asarray(state.shadow_history)


def report(tag, img_c, img_d, hist_c, hist_d):
    di = np.abs(img_c - img_d)
    dh = np.abs(hist_c - hist_d)
    print(f"{tag}: img diff frac={np.mean(di > 0):.4f} max={di.max():.6g} "
          f"| hist frac={np.mean(dh > 0):.4f} max={dh.max():.6g}",
          flush=True)
    return di.max() > 0 or dh.max() > 0


img_d, hist_d = run(cfg)

FORCE = {}

orig_csp = shadow_filter.cascaded_shadow_sparse
orig_ccs = contact.compute_contact_shadow_sparse
orig_sg = shading.shade_gltf


def patched_csp(*a, **k):
    if FORCE.get("shadow"):
        a = list(a)
        if len(a) >= 17:
            a[16] = False
        else:
            k["committed"] = False
        a = tuple(a)
    return orig_csp(*a, **k)


def patched_ccs(*a, **k):
    if FORCE.get("contact"):
        k["committed"] = False
    return orig_ccs(*a, **k)


def patched_sg(*a, **k):
    if FORCE.get("shading"):
        k["committed"] = False
    return orig_sg(*a, **k)


shadow_filter.cascaded_shadow_sparse = patched_csp
contact.compute_contact_shadow_sparse = patched_ccs
shading.shade_gltf = patched_sg
# frame.py binds the modules, not the functions, so the patches take.

ccfg = dataclasses.replace(
    cfg, flags=dataclasses.replace(cfg.flags, committed=True))

combos = [
    ("all committed (baseline red)", {}),
    ("force shadow conded", {"shadow": True}),
    ("force contact conded", {"contact": True}),
    ("force shading conded", {"shading": True}),
    ("force ALL pass-level conded (residual = frame-level sites)",
     {"shadow": True, "contact": True, "shading": True}),
]

for tag, force in combos:
    FORCE.clear()
    FORCE.update(force)
    img_c, hist_c = run(ccfg)
    report(tag, img_c, img_d, hist_d=hist_d, hist_c=hist_c)
