"""GltfFrameFlags.committed: overflow lax.conds elided after autotune.

Committed mode runs every tuned sparse path unconditionally (each
overflow cond is an XLA scheduling barrier — PERF.md r4 rule 2). With
capacities verified by autotune over the rendered poses the fallback
branch is provably never taken, so the committed frame runs the same
math on the same values as the default cond'd frame — but as a
DIFFERENT compiled program, which XLA's contextual fp codegen gives
ulp-level uniform differences that cascade-depth tap compares amplify
into isolated penumbra flips of ~0.01 (the documented cross-program
divergence, frame.compute_frame_uniforms; bisected r5 to the
frame-level elision sites with every pass-level elision forced off —
experiments/committed_bisect.py). The tests therefore assert:
(a) agreement within the documented divergence envelope, (b) bit-exact
determinism per compiled config, and (c) overflow detectability via the
driver's occupancy poll."""

import dataclasses

import numpy as np
import pytest

from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             compiled_gltf_frame, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.raster import RasterConfig
from funky_tpu.utils.autotune import autotune_config, capacity_overflows


@pytest.fixture(scope="module")
def tuned_setup(duck_gltf_path):
    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=4352, backend="jnp")
    cfg = GltfConfig(width=256, height=144, shadow_map_size=256,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    cfg = autotune_config(scene, params, cfg)
    return scene, cfg, params


def _run(scene, cfg, params, frames=3):
    frame = compiled_gltf_frame(cfg)
    state = init_frame_state(cfg)
    for _ in range(frames):
        rgba, state = frame(scene, params, state)
    return np.asarray(rgba), state


def test_committed_matches_conded(tuned_setup):
    """Committed vs cond'd agreement within the documented cross-program
    fp-divergence envelope: every differing pixel is an isolated
    penumbra-compare flip of ~0.01 magnitude, never a structural change
    (a truncated capacity or a wrong branch would show up as O(0.1+)
    color/history differences over contiguous regions)."""
    scene, cfg, params = tuned_setup
    img_c, st_c = _run(scene, dataclasses.replace(
        cfg, flags=dataclasses.replace(cfg.flags, committed=True)), params)
    img_d, st_d = _run(scene, cfg, params)
    np.testing.assert_allclose(img_c, img_d, atol=0.02)
    np.testing.assert_allclose(np.asarray(st_c.shadow_history),
                               np.asarray(st_d.shadow_history), atol=0.15)
    # the second TAA moment is bounded by the first's envelope squared +
    # blend; loose sanity: histories agree on average
    assert np.mean(np.abs(np.asarray(st_c.shadow_history)
                          - np.asarray(st_d.shadow_history))) < 5e-3


def test_committed_deterministic(tuned_setup):
    """Per compiled config, committed mode is bit-exact run-to-run (the
    fp divergence is cross-PROGRAM, not run-to-run)."""
    scene, cfg, params = tuned_setup
    ccfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(cfg.flags, committed=True))
    img_a, st_a = _run(scene, ccfg, params)
    img_b, st_b = _run(scene, ccfg, params)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(np.asarray(st_a.shadow_history),
                                  np.asarray(st_b.shadow_history))


def test_committed_overflow_is_detectable(tuned_setup):
    """A committed frame whose capacities are too small must be caught by
    the driver's occupancy poll — the same counts the elided conds would
    have compared (it may also render wrong pixels; that's the documented
    trade, bounded by retune_check_every frames)."""
    from funky_tpu.utils.diagnostics import measure_sparse_occupancy

    scene, cfg, params = tuned_setup
    tiny = dataclasses.replace(
        cfg, shadow_pen_capacity=64,
        shadow_pen_cascade_caps=(64, 64, 64, 64), contact_capacity=64,
        contact_march_capacity=64,
        flags=dataclasses.replace(cfg.flags, committed=True))
    occ = measure_sparse_occupancy(scene, params, tiny)
    over = capacity_overflows(tiny, occ)
    assert "shadow_pen_capacity" in over
    assert "contact_capacity" in over


def test_committed_synth_window_overflow_is_detectable(tuned_setup):
    """ADVICE r4 (low): committed mode elides the synth_ok window-fit
    cond, so the DRIVER-style runtime poll (sparse_occupancy with the
    live config's window sizes -> capacity_overflows) must flag an
    undersized synth window — the certificate rides the poll instead of
    the cond."""
    import jax

    from funky_tpu.utils.diagnostics import sparse_occupancy

    scene, cfg, params = tuned_setup
    synth = dataclasses.replace(
        cfg, light_window_sizes=(16, 16, 16, 16),
        flags=dataclasses.replace(cfg.flags, committed=True,
                                  synth_shadow_maps=True))
    frame = compiled_gltf_frame(synth)
    state = init_frame_state(synth)
    for _ in range(2):
        _, state = frame(scene, params, state)
    occ_fn = jax.jit(sparse_occupancy, static_argnums=(3, 4))
    stats = occ_fn(scene, params, state, synth,
                   synth.effective_light_windows())
    occ = {k: (int(v) if np.asarray(v).size == 1
               else tuple(int(x) for x in np.asarray(v).ravel()))
           for k, v in stats.items()}
    assert "synth_window_fit" in capacity_overflows(synth, occ)
