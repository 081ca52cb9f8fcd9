"""Unified valid-block back half: the blocked (flat block-major) per-pixel
pipeline must reproduce the dense 2D path exactly.

Comparison runs BOTH paths inside ONE jitted program: per compiled config
results are deterministic, but XLA/LLVM's contextual fp codegen makes the
tiny uniform math differ by ulps BETWEEN separately-compiled programs
(see frame.compute_frame_uniforms), so a cross-program comparison would
measure the compiler, not the refactor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funky_tpu import frame as F
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig

TOL = 1e-5


@pytest.fixture(scope="module")
def duck_setup(duck_gltf_path):
    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=16, tile_w=128, backend="jnp")
    params = F.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    return scene, params


def _pair(scene, params, flags, frames=2, **cfg_kw):
    """Run `frames` chained frames through the dense and blocked paths in
    ONE program; returns (rgba_dense, rgba_blocked, hist_d, hist_b)."""
    base = dict(width=128, height=80, shadow_map_size=128,
                raster=RasterConfig(tile_h=16, tile_w=128, backend="jnp"),
                shadow_raster=RasterConfig(tile_h=16, tile_w=128,
                                           backend="jnp"),
                flags=flags)
    base.update(cfg_kw)
    cfg_d = F.GltfConfig(valid_block_capacity=0, **base)
    cfg_b = F.GltfConfig(valid_block_capacity=None, **base)

    @jax.jit
    def run(scene, params, st0):
        std = stb = st0
        outs = []
        for _ in range(frames):
            rd, std = F.render_gltf_frame(scene, params, std, cfg_d)
            rb, stb = F.render_gltf_frame(scene, params, stb, cfg_b)
            outs.append((rd, rb))
        return outs[-1][0], outs[-1][1], std.shadow_history, \
            stb.shadow_history

    return run(scene, params, F.init_frame_state(cfg_d))


@pytest.mark.parametrize("flags", [
    F.GltfFrameFlags(),
    F.GltfFrameFlags(use_pcss=False),
    F.GltfFrameFlags(use_shadow_taa=False),
    F.GltfFrameFlags(debug_cascades=True),
    F.GltfFrameFlags(sparse_shadows=False, sparse_contact=False),
    F.GltfFrameFlags(enable_shadows=False),
], ids=["pcss", "pcf", "no-taa", "debug", "dense-eval", "no-shadows"])
def test_blocked_matches_dense(duck_setup, flags):
    scene, params = duck_setup
    rd, rb, hd, hb = _pair(scene, params, flags)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(rd), atol=TOL)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(hd), atol=TOL)


def test_blocked_overflow_falls_back_exact(duck_setup):
    """A 1-block budget must produce the dense result via the lax.cond
    fallback (capacity never changes the image)."""
    scene, params = duck_setup
    flags = F.GltfFrameFlags()
    base = dict(width=128, height=80, shadow_map_size=128,
                raster=RasterConfig(tile_h=16, tile_w=128, backend="jnp"),
                shadow_raster=RasterConfig(tile_h=16, tile_w=128,
                                           backend="jnp"),
                flags=flags)
    cfg_d = F.GltfConfig(valid_block_capacity=0, **base)
    cfg_t = F.GltfConfig(valid_block_capacity=1, **base)

    @jax.jit
    def run(scene, params, st0):
        rd, _ = F.render_gltf_frame(scene, params, st0, cfg_d)
        rt, _ = F.render_gltf_frame(scene, params, st0, cfg_t)
        return rd, rt

    rd, rt = run(scene, params, F.init_frame_state(cfg_d))
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(rt))


def test_blocked_sky_blocks_keep_background_and_history(duck_setup):
    """Pixels in all-sky 8x8 blocks never enter the compacted domain: the
    scattered frame must carry the background color and untouched
    history there."""
    scene, params = duck_setup
    flags = F.GltfFrameFlags()
    cfg = F.GltfConfig(width=128, height=80, shadow_map_size=128,
                       raster=RasterConfig(tile_h=16, tile_w=128,
                                           backend="jnp"),
                       shadow_raster=RasterConfig(tile_h=16, tile_w=128,
                                                  backend="jnp"),
                       flags=flags)
    st0 = F.init_frame_state(cfg)
    marker = st0._replace(
        shadow_history=jnp.full_like(st0.shadow_history, 0.123))
    frame = jax.jit(lambda s, p, t: F.render_gltf_frame(s, p, t, cfg))
    rgba, st1 = frame(scene, params, marker)
    rgba = np.asarray(rgba)
    hist = np.asarray(st1.shadow_history)

    # top-left corner of the frame is sky in the default view
    bg = np.asarray(F.GLTF_CLEAR + (1.0,), np.float32)
    np.testing.assert_allclose(rgba[0, 0], bg, atol=1e-6)
    np.testing.assert_allclose(hist[0, 0], [0.123, 0.123], atol=1e-6)
