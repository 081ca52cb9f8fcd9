"""Valid-row-slab back half: the dynamic_slice'd row-slab pipeline must
reproduce the dense full-height path exactly.

Comparison runs BOTH paths inside ONE jitted program (see
test_blocked_backhalf.py for why cross-program comparisons would measure
the compiler's contextual fp codegen instead of the refactor).
"""

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
    params = F.default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    return scene, params


def _base_cfg(flags, **kw):
    base = dict(width=128, height=80, shadow_map_size=128,
                raster=RasterConfig(tile_h=16, tile_w=128, backend="jnp"),
                shadow_raster=RasterConfig(tile_h=16, tile_w=128,
                                           backend="jnp"),
                flags=flags)
    base.update(kw)
    return base


def _pair(scene, params, flags, slab_rows, frames=2, **cfg_kw):
    """Run `frames` chained frames through the dense and row-slab paths in
    ONE program; returns (rgba_dense, rgba_slab, hist_d, hist_s)."""
    base = _base_cfg(flags, **cfg_kw)
    cfg_d = F.GltfConfig(valid_slab_rows=0, valid_block_capacity=0, **base)
    cfg_s = F.GltfConfig(valid_slab_rows=slab_rows, valid_block_capacity=0,
                         **base)

    @jax.jit
    def run(scene, params, st0):
        std = sts = st0
        outs = []
        for _ in range(frames):
            rd, std = F.render_gltf_frame(scene, params, std, cfg_d)
            rs, sts = F.render_gltf_frame(scene, params, sts, cfg_s)
            outs.append((rd, rs))
        return outs[-1][0], outs[-1][1], std.shadow_history, \
            sts.shadow_history

    return run(scene, params, F.init_frame_state(cfg_d))


@pytest.mark.parametrize("flags", [
    F.GltfFrameFlags(),
    F.GltfFrameFlags(use_pcss=False),
    F.GltfFrameFlags(use_shadow_taa=False),
    F.GltfFrameFlags(sparse_shadows=False, sparse_contact=False),
], ids=["pcss", "pcf", "no-taa", "dense-eval"])
def test_rowslab_matches_dense(duck_setup, flags):
    scene, params = duck_setup
    # 64 of 80 rows: the default view's covered band (~55 rows) fits.
    rd, rs, hd, hs = _pair(scene, params, flags, slab_rows=64)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd), atol=TOL)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hd), atol=TOL)


@pytest.mark.parametrize("scale", [2, 4])
def test_rowslab_routes_shadow_eval_scale(duck_setup, scale):
    """shadow_eval_scale > 1 must route through the row-slab back half and
    match the full-height dense path running the same scale (round-3 fell
    back to full height, making the perf mode slower than exact)."""
    scene, params = duck_setup
    flags = F.GltfFrameFlags(shadow_eval_scale=scale)
    rd, rs, hd, hs = _pair(scene, params, flags, slab_rows=64)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd), atol=TOL)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hd), atol=TOL)


def test_rowslab_overflow_falls_back_exact(duck_setup):
    """A slab shorter than the covered span must produce the dense result
    via the lax.cond fallback (the slab height never changes the image)."""
    scene, params = duck_setup
    flags = F.GltfFrameFlags()
    base = _base_cfg(flags)
    cfg_d = F.GltfConfig(valid_slab_rows=0, valid_block_capacity=0, **base)
    cfg_t = F.GltfConfig(valid_slab_rows=8, valid_block_capacity=0, **base)

    @jax.jit
    def run(scene, params, st0):
        rd, _ = F.render_gltf_frame(scene, params, st0, cfg_d)
        rt, _ = F.render_gltf_frame(scene, params, st0, cfg_t)
        return rd, rt

    rd, rt = run(scene, params, F.init_frame_state(cfg_d))
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(rt))


def test_rowslab_sky_rows_keep_background_and_history(duck_setup):
    """Rows above the slab never enter the back half: the output must carry
    the clear color and untouched history there."""
    scene, params = duck_setup
    cfg = F.GltfConfig(valid_slab_rows=64, valid_block_capacity=0,
                       **_base_cfg(F.GltfFrameFlags()))
    st0 = F.init_frame_state(cfg)
    marker = st0._replace(
        shadow_history=jnp.full_like(st0.shadow_history, 0.123))
    frame = jax.jit(lambda s, p, t: F.render_gltf_frame(s, p, t, cfg))
    rgba, st1 = frame(scene, params, marker)
    rgba = np.asarray(rgba)
    hist = np.asarray(st1.shadow_history)

    # the top rows of the frame are sky in the default view
    bg = np.asarray(F.GLTF_CLEAR + (1.0,), np.float32)
    np.testing.assert_allclose(rgba[0, 0], bg, atol=1e-6)
    np.testing.assert_allclose(hist[0, 0], [0.123, 0.123], atol=1e-6)
