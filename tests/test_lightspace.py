"""Dense light-space ground-shadow evaluation (passes/shadow_lightspace).

The dense window must reproduce the per-pixel tap cores
(shadow_filter._pcf_taps / _pcss_taps) evaluated at light-space texel
centers with the same spatially-constant rotation:
  - PCF (fixed radius): exactly, up to fp rounding of tap fractions
    (the dense path derives the bilinear fractions from the constant
    offsets instead of per-pixel uv arithmetic — at most a one-ulp floor
    flip at tap-corner boundaries).
  - PCSS: blocker phase + penumbra exactly (same caveat); the PCF phase
    through the log-radius ladder within a small tolerance.
A sub-window must match the corresponding region of the full-window
evaluation exactly.
"""

import jax.numpy as jnp
import numpy as np

from funky_tpu.passes import shadow_filter as sf
from funky_tpu.passes import shadow_lightspace as lsm
from funky_tpu.passes.uniforms import FrameUniforms

S = 128
BIAS = 0.003


def _mk_uni(softness: float, taa=1.0, frame=3.0) -> FrameUniforms:
    z = jnp.zeros((4, 4), jnp.float32)
    return FrameUniforms(
        view=z, proj=z, view_proj=z,
        camera_pos=jnp.zeros(3, jnp.float32),
        light_dir=jnp.asarray([0.39, 0.86, 0.32], jnp.float32),
        light_view_proj=jnp.zeros((4, 4, 4), jnp.float32),
        cascade_splits=jnp.zeros(4, jnp.float32),
        shadow_map_size=jnp.asarray([S, S, 1.0 / S, 1.0 / S], jnp.float32),
        debug_flags=jnp.asarray([0.0, 1.0, taa, frame], jnp.float32),
        shadow_bias=jnp.asarray([softness, 0, 0, 0], jnp.float32),
        prev_view_proj=z,
        models=jnp.zeros((2, 4, 4), jnp.float32))


def _scene():
    """Sloped plane depth map with a floating RAMP blocker (varying
    height, so the penumbra estimate — and thus the PCF radius ladder —
    spans a real range instead of one radius)."""
    plane = jnp.asarray([0.0004, -0.0006, 0.55], jnp.float32)
    t = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    base = plane[0] * t[None, :] + plane[1] * t[:, None] + plane[2]
    ramp = jnp.linspace(0.02, 0.3, 40)[None, :]   # height above the plane
    raw = base.at[40:70, 50:90].add(-jnp.broadcast_to(ramp, (30, 40)))
    receiver = base - BIAS
    return plane, raw, receiver


def _pixel_inputs(uni):
    t = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    uv = jnp.stack(jnp.meshgrid(t, t, indexing="xy"), axis=-1)  # (S, S, 2)
    phi0 = sf.shadow_frame_phi(jnp.zeros(2, jnp.float32),
                               uni.debug_flags[3], uni.debug_flags[2])
    phi = jnp.broadcast_to(phi0, (S, S))
    return uv, phi


def _dense(raw, plane, uni, use_pcss, origin=(0, 0), wc=S, rungs=6,
           phases=1):
    # phases=1 compares against the per-pixel cores at ONE constant phi;
    # the production default (4) checkerboards rotations for dithering.
    org = (jnp.asarray(origin[0], jnp.int32),
           jnp.asarray(origin[1], jnp.int32))
    rows = lsm.build_light_shadow_map(
        raw, org, plane, uni, use_pcss, wc, max_softness=4.0,
        bias=jnp.float32(BIAS), rungs=rungs, phases=phases)
    return np.asarray(rows).reshape(wc, wc, 4)


def test_pcf_dense_matches_pixel_taps():
    from funky_tpu.ops.sampling import quad_pack

    uni = _mk_uni(softness=3.0)      # radius 3 > 1.25 -> Vogel path
    plane, raw, receiver = _scene()
    out = _dense(raw, plane, uni, use_pcss=False)

    uv, phi = _pixel_inputs(uni)
    quad = quad_pack(raw)[None]
    layer0 = jnp.zeros((S, S), jnp.int32)
    m1, m2, kern = sf._pcf_taps(uni, quad, layer0, uv, receiver, phi)

    np.testing.assert_allclose(out[..., 0], np.asarray(m1), atol=0.07)
    assert float(jnp.mean(jnp.abs(out[..., 0] - m1))) < 2e-3
    np.testing.assert_allclose(out[..., 1], np.asarray(m2), atol=0.07)
    np.testing.assert_allclose(out[..., 2], np.asarray(kern), atol=1e-6)
    # the map must actually contain shadow (the blocker casts)
    assert out[..., 0].min() < 0.2 and out[..., 0].max() == 1.0


def test_pcf_3x3_fast_path():
    from funky_tpu.ops.sampling import quad_pack

    uni = _mk_uni(softness=1.0)      # radius 1 <= 1.25 -> 3x3 path
    plane, raw, receiver = _scene()
    out = _dense(raw, plane, uni, use_pcss=False)

    uv, phi = _pixel_inputs(uni)
    quad = quad_pack(raw)[None]
    layer0 = jnp.zeros((S, S), jnp.int32)
    m1, m2, kern = sf._pcf_taps(uni, quad, layer0, uv, receiver, phi)
    np.testing.assert_allclose(out[..., 0], np.asarray(m1), atol=2e-5)
    np.testing.assert_allclose(out[..., 2], np.asarray(kern), atol=1e-6)


def test_pcss_dense_matches_pixel_taps():
    uni = _mk_uni(softness=2.5)
    plane, raw, receiver = _scene()
    out = _dense(raw, plane, uni, use_pcss=True)

    uv, phi = _pixel_inputs(uni)
    from funky_tpu.ops.sampling import quad_pack
    quad = quad_pack(raw)[None]
    layer0 = jnp.zeros((S, S), jnp.int32)
    m1, m2, pen, hasb = sf._pcss_taps(uni, quad, layer0, uv, receiver, phi)
    one = jnp.ones_like(m1)
    v_ref = np.asarray(jnp.where(hasb, m1, one))
    m2_ref = np.asarray(jnp.where(hasb, m2, one))
    pen_ref = np.asarray(jnp.where(hasb, pen, 0.0))

    # blocker phase + penumbra: same integer shifts -> near-exact
    pen_diff = np.abs(out[..., 2] - pen_ref)
    assert np.quantile(pen_diff, 0.99) < 1e-3
    # PCF-through-ladder: interpolation tolerance
    v_diff = np.abs(out[..., 0] - v_ref)
    assert v_diff.mean() < 0.02, v_diff.mean()
    assert np.quantile(v_diff, 0.99) < 0.2
    m2_diff = np.abs(out[..., 1] - m2_ref)
    assert m2_diff.mean() < 0.03
    # penumbra must show contact hardening structure (the ramp blocker
    # spans a real radius range, so the ladder was actually exercised)
    inside = pen_ref > 0
    assert pen_ref[inside].max() - pen_ref[inside].min() > 1.0


def test_subwindow_matches_full():
    # production phases=4: the phase checkerboard keys off GLOBAL texel
    # parity, so a moved window must reproduce the same texels exactly
    uni = _mk_uni(softness=2.5)
    plane, raw, _ = _scene()
    full = _dense(raw, plane, uni, use_pcss=True, phases=4)
    oy, ox, wc = 24, 40, 64
    sub = _dense(raw, plane, uni, use_pcss=True, origin=(oy, ox), wc=wc,
                 phases=4)
    np.testing.assert_array_equal(sub, full[oy:oy + wc, ox:ox + wc])


def test_phase_checkerboard_decorrelates():
    """phases=4 must actually vary the rotation between neighbor texels
    (the anti-banding property the verify drive demanded)."""
    uni = _mk_uni(softness=2.5)
    plane, raw, _ = _scene()
    p1 = _dense(raw, plane, uni, use_pcss=True, phases=1)
    p4 = _dense(raw, plane, uni, use_pcss=True, phases=4)
    pen = (p4[..., 2] > 0) & (p4[..., 0] < 1.0)
    assert pen.any()
    # same statistics, different per-texel values in penumbra
    assert abs(p4[..., 0][pen].mean() - p1[..., 0][pen].mean()) < 0.05
    assert np.abs(p4[..., 0] - p1[..., 0])[pen].max() > 0.01


def test_frame_mode_close_to_exact(duck_gltf_path):
    """End-to-end: the light-space perf mode must track the exact frame
    closely (it is a documented deviation, not an approximation free-for
    -all), engage its fetch path for real, and leave sky pixels and
    shadow-free regions bit-identical."""
    import dataclasses

    from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                                 compiled_gltf_frame, default_gltf_params,
                                 init_frame_state)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.ops.raster import RasterConfig
    from funky_tpu.utils.diagnostics import measure_sparse_occupancy

    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=4352,
                        backend="jnp")
    cfg = GltfConfig(width=256, height=144, shadow_map_size=256,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))

    light_cfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(
            cfg.flags, light_space_ground_shadows=True,
            skip_backfacing_shadows=True, synth_shadow_maps=True))

    def run(c):
        frame = compiled_gltf_frame(c)
        state = init_frame_state(c)
        for _ in range(3):
            rgba, state = frame(scene, params, state)
        return np.asarray(rgba)

    img_exact = run(cfg)
    img_light = run(light_cfg)

    diff = np.abs(img_light - img_exact).max(axis=-1)
    assert diff.mean() < 5e-3, diff.mean()
    assert diff.max() < 0.4, diff.max()
    # most of the frame is bit-identical (sky + closed-form pixels)
    assert (diff == 0).mean() > 0.7, (diff == 0).mean()

    # the fetch path must actually engage (else this test is vacuous)
    occ = measure_sparse_occupancy(scene, params, light_cfg, frames=2)
    assert sum(occ["light_fetch_per_cascade"]) > 100, occ


def test_synth_maps_match_raster(duck_gltf_path):
    """Synthesized cascade maps (analytic ground + windowed occluder
    raster) must reproduce the full raster up to the documented ~1-ulp
    /rim-texel deviations: <1% of texels differ beyond 1e-5, the occluder
    is really in there, and the fit certificate holds."""
    from funky_tpu.frame import (GltfConfig, compute_frame_uniforms,
                                 default_gltf_params, init_frame_state)
    from funky_tpu.models.gltf import GltfScene
    from funky_tpu.models.scene import build_device_scene
    from funky_tpu.passes import shadow
    from funky_tpu.passes import shadow_lightspace as lsm
    from funky_tpu.passes.geometry import transform_vertices

    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    cfg = GltfConfig(width=256, height=144, shadow_map_size=256)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    uni = compute_frame_uniforms(params, init_frame_state(cfg), cfg)
    world_v, _, _ = transform_vertices(scene, uni.models, uni.view_proj)

    full = np.asarray(shadow.render_shadow_maps(
        world_v, scene.tri_indices, scene.num_triangles,
        uni.light_view_proj, size=cfg.shadow_map_size))

    sizes = (128, 128, 128, 128)
    origins, _ = lsm.plan_windows(uni, world_v, scene.vert_object, sizes,
                                  cfg.shadow_map_size, cfg.max_softness,
                                  cfg.class_coarse)
    synth, ok = shadow.synthesize_shadow_maps(
        scene, world_v, uni, cfg.shadow_map_size, sizes, origins)
    synth = np.asarray(synth)

    assert bool(ok)
    mismatch = np.abs(synth - full) > 1e-5
    assert mismatch.mean() < 0.01, mismatch.mean()
    # the occluder really rasterized into the synthetic maps
    assert synth[0].min() < full[0].min() + 1e-3
    # agreement where both have real coverage (not rim/empty flips):
    # plane-fit + cropped-viewport rounding, well under the 8e-4 bias
    both = (synth < 0.999) & (full < 0.999)
    assert np.abs((synth - full)[both]).max() < 5e-4


def test_ground_eligible():
    world = jnp.zeros((4, 3), jnp.float32).at[1, 1].set(0.5)
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (4, 1))
    normal = normal.at[2].set(jnp.asarray([0.0, 0.70710678, 0.70710678]))
    recv = jnp.asarray([0.5, 0.5, 0.5, 1.2], jnp.float32)
    el = np.asarray(lsm.ground_eligible(world, normal, recv))
    assert el.tolist() == [True, False, False, False]
