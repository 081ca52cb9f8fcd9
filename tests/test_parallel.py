"""Multi-chip row-sharded frame vs single-device: bit-exact parity.

Runs on the 8-device virtual CPU mesh from conftest. This validates the
all-gather layout (shadow cascade slabs, rgba/history/depth rows) and the
y_offset plumbing through binning/raster/deferred/TAA/contact passes.
"""

import numpy as np
import jax
import pytest

from funky_tpu.frame import (GltfConfig, compiled_gltf_frame,
                             default_gltf_params, init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig
from funky_tpu.parallel import make_mesh, sharded_gltf_frame


@pytest.fixture(scope="module")
def setup(duck_gltf_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=8, tile_w=128, capacity=256, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    return scene, cfg, params


def test_sharded_matches_single_device(setup):
    scene, cfg, params = setup
    mesh = make_mesh(8)
    assert mesh.shape["rows"] == 8

    frame8 = sharded_gltf_frame(mesh, cfg)
    frame1 = compiled_gltf_frame(cfg)

    s8 = init_frame_state(cfg)
    s1 = init_frame_state(cfg)
    for i in range(3):  # cover the temporal paths (TAA, prev depth)
        rgba8, s8 = frame8(scene, params, s8)
        rgba1, s1 = frame1(scene, params, s1)
        np.testing.assert_array_equal(np.asarray(rgba8), np.asarray(rgba1),
                                      err_msg=f"frame {i}")
        np.testing.assert_array_equal(np.asarray(s8.shadow_history),
                                      np.asarray(s1.shadow_history))
        np.testing.assert_array_equal(np.asarray(s8.prev_depth),
                                      np.asarray(s1.prev_depth))


def test_sharded_output_replicated(setup):
    scene, cfg, params = setup
    mesh = make_mesh(8)
    frame8 = sharded_gltf_frame(mesh, cfg)
    rgba, state = frame8(scene, params, init_frame_state(cfg))
    # outputs are fully replicated; every shard holds the full frame
    assert rgba.shape == (cfg.height, cfg.width, 4)
    assert np.isfinite(np.asarray(rgba)).all()


def test_sharded_perf_modes_match_single_device(setup):
    """The perf-deviation modes deviate from the EXACT path, not across
    the sharding axis: sharded synth+light-space frames must equal the
    single-device frames with the same flags — and the synth path must
    hold ZERO shadow-map collectives (each device builds the maps from
    replicated math; only rgba/history/depth rows all-gather)."""
    import dataclasses

    scene, cfg, params = setup
    pcfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(
            cfg.flags, light_space_ground_shadows=True,
            skip_backfacing_shadows=True, synth_shadow_maps=True))
    mesh = make_mesh(8)
    frame8 = sharded_gltf_frame(mesh, pcfg)
    frame1 = compiled_gltf_frame(pcfg)
    s8 = init_frame_state(pcfg)
    s1 = init_frame_state(pcfg)
    for i in range(2):
        rgba8, s8 = frame8(scene, params, s8)
        rgba1, s1 = frame1(scene, params, s1)
        np.testing.assert_array_equal(np.asarray(rgba8),
                                      np.asarray(rgba1),
                                      err_msg=f"frame {i}")

    # collective accounting: the only all-gathers left are the three
    # framebuffer-row gathers (rgba, history, depth)
    from funky_tpu.parallel.sharded_frame import sharded_gltf_frame as sf
    hlo = frame8.lower(scene, params, init_frame_state(pcfg)) \
        .compile().as_text()
    n_ag = hlo.count("all-gather-start") or hlo.count("all-gather(")
    assert n_ag <= 3, f"expected <=3 all-gathers, found {n_ag}"


def test_four_device_mesh(setup):
    scene, cfg, params = setup
    mesh = make_mesh(4)
    frame4 = sharded_gltf_frame(mesh, cfg)
    frame1 = compiled_gltf_frame(cfg)
    rgba4, _ = frame4(scene, params, init_frame_state(cfg))
    rgba1, _ = frame1(scene, params, init_frame_state(cfg))
    np.testing.assert_array_equal(np.asarray(rgba4), np.asarray(rgba1))
