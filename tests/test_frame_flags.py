"""All static frame-flag variants compile and behave sanely."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             compiled_gltf_frame, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig


@pytest.fixture(scope="module")
def setup(duck_gltf_path):
    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    return scene, cfg, params


def _run(scene, cfg, params, frames=2):
    frame = compiled_gltf_frame(cfg)
    state = init_frame_state(cfg)
    for _ in range(frames):
        rgba, state = frame(scene, params, state)
    return np.asarray(rgba)


@pytest.mark.parametrize("flags", [
    GltfFrameFlags(),                                     # default: PCSS+TAA
    GltfFrameFlags(use_pcss=False),                       # PCF path
    GltfFrameFlags(use_shadow_taa=False),
    GltfFrameFlags(enable_contact_shadows=False),
    GltfFrameFlags(enable_shadows=False,
                   enable_contact_shadows=False),
    GltfFrameFlags(debug_cascades=True),
    GltfFrameFlags(half_res_shadows=True),
], ids=["default", "pcf", "no-taa", "no-contact", "no-shadows",
        "debug-cascades", "half-res"])
def test_flag_variant_renders(setup, flags):
    scene, cfg, params = setup
    img = _run(scene, dataclasses.replace(cfg, flags=flags), params)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # sky in the top corner for every variant
    corner = img[0, 0, :3]
    if flags.debug_cascades:
        assert corner.max() > 0.3
    else:
        np.testing.assert_allclose(corner, [0.53, 0.81, 0.92], atol=1e-5)


def test_pcf_3x3_fast_path(setup):
    """softness <= 1.25 takes the 3x3 branch of the lax.cond
    (gltf.frag:474-489) without error and produces shadows."""
    scene, cfg, params = setup
    cfg = dataclasses.replace(cfg, flags=GltfFrameFlags(use_pcss=False))
    params = dataclasses.replace(params,
                                 shadow_softness=jnp.asarray(1.0, jnp.float32))
    img = _run(scene, cfg, params)
    assert np.isfinite(img).all()


def test_shadows_darken_ground(setup):
    scene, cfg, params = setup
    # larger shadow map: at 128^2 the whole ground shows soft acne, which
    # would drown the cast-shadow check
    cfg = dataclasses.replace(cfg, shadow_map_size=512)
    with_shadows = _run(scene, cfg, params)
    no_shadows = _run(scene, dataclasses.replace(
        cfg, flags=GltfFrameFlags(enable_shadows=False,
                                  enable_contact_shadows=False,
                                  use_shadow_taa=False)), params)
    diff = (no_shadows[..., :3] - with_shadows[..., :3]).max(-1)
    assert diff.max() > 0.05          # a cast shadow exists somewhere
    assert (diff > 0.02).mean() < 0.2  # but not everywhere


def test_half_res_close_to_full(setup):
    scene, cfg, params = setup
    cfg = dataclasses.replace(cfg, shadow_map_size=512)
    full = _run(scene, cfg, params)
    half = _run(scene, dataclasses.replace(
        cfg, flags=GltfFrameFlags(half_res_shadows=True)), params)
    # same image modulo softened shadow edges
    diff = np.abs(full - half).max(-1)
    assert diff.mean() < 0.02
    assert (diff > 0.15).mean() < 0.03


def test_cast_shadow_present_with_auto_capacity(setup):
    """Regression: an undersized shadow bin capacity silently dropped the
    whole model from the cascade maps (no cast shadow). With the auto
    (None = full triangle count) capacity the duck's soft shadow must
    darken the ground just left of it (light (0.5,1,0.3): shadow falls
    toward -x/-z)."""
    scene, cfg, params = setup
    cfg = dataclasses.replace(
        cfg, shadow_map_size=1024,
        raster=RasterConfig(tile_h=16, tile_w=128, backend="jnp"),
        shadow_raster=RasterConfig(tile_h=64, tile_w=128, backend="jnp"),
        flags=GltfFrameFlags(use_shadow_taa=False,
                             enable_contact_shadows=False))
    lit_cfg = dataclasses.replace(cfg, flags=GltfFrameFlags(
        enable_shadows=False, enable_contact_shadows=False,
        use_shadow_taa=False))
    shadowed = _run(scene, cfg, params)
    lit = _run(scene, lit_cfg, params)
    diff = (lit[..., :3] - shadowed[..., :3]).max(-1)
    # The scene is 256x128: the duck sits near the center (~col 128-150,
    # rows ~60-75); its shadow lands in the rows just below-left.
    shadow_zone = diff[68:85, 95:130]
    assert shadow_zone.max() > 0.1, (
        f"no cast shadow found (zone max {shadow_zone.max():.4f})")


def test_quarter_res_shadow_scale(setup):
    scene, cfg, params = setup
    cfg = dataclasses.replace(
        cfg, shadow_map_size=512,
        flags=GltfFrameFlags(shadow_eval_scale=4))
    img = _run(scene, cfg, params)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[0, 0, :3], [0.53, 0.81, 0.92], atol=1e-5)
