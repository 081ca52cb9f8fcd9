"""Shadow filtering unit tests on synthetic scenes + uniforms math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funky_tpu import math3d as m3
from funky_tpu.ops.sampling import quad_pack
from funky_tpu.passes import shadow_filter as sf
from funky_tpu.passes import uniforms as U


def test_cascade_splits_values():
    # lambda=0.6 practical split scheme, near=.1 far=100
    # (gltf_renderer.rs:1829-1840): split_i = .6*log_i + .4*uni_i.
    splits = np.asarray(U.cascade_splits())
    near, far = 0.1, 100.0
    for i in range(4):
        p = (i + 1) / 4
        log = near * (far / near) ** p
        uni = near + (far - near) * p
        expect = 0.6 * log + 0.4 * uni
        assert abs(splits[i] - expect) < 1e-3
    assert abs(splits[3] - 100.0) < 1e-3


def test_interleaved_gradient_noise_range():
    xs = jnp.asarray(np.random.default_rng(0).uniform(0, 2000, (100, 2)),
                     jnp.float32)
    n = np.asarray(sf.interleaved_gradient_noise(xs))
    assert np.all((n >= 0) & (n < 1))
    # IGN should be well spread
    assert n.std() > 0.2


def test_vogel_disk_radii():
    phi = jnp.zeros(())
    for i in range(16):
        dx, dy = sf.vogel_disk(i, 16, phi)
        r = float(jnp.sqrt(dx * dx + dy * dy))
        expect = np.sqrt((i + 0.5) / 16)
        assert abs(r - expect) < 1e-5
    # last sample near the disk edge
    assert abs(r - np.sqrt(15.5 / 16)) < 1e-5


def test_select_cascade_blend_bands():
    splits = U.cascade_splits()
    s0 = float(splits[0])
    f0 = max(0.1 * s0, 0.5)
    vd = jnp.asarray([1.0, s0, s0 + 2 * f0, 50.0, 99.0], jnp.float32)
    c0, c1, t = sf.select_cascade_blend(vd, splits)
    c0, c1, t = map(np.asarray, (c0, c1, t))
    assert c0[0] == 0 and t[0] == 0.0           # well inside cascade 0
    assert c0[1] == 0 and c1[1] == 1            # at split: blending band
    assert abs(t[1] - 0.5) < 1e-5               # exactly mid-band
    assert c0[2] == 1                           # past the band
    assert c0[4] == 3 and t[4] == 0.0           # far field


def _make_uniforms(shadow_map_size=64):
    """Uniforms for a simple top-down test configuration."""
    params = dict(
        camera_pos=jnp.asarray([0.0, 2.5, 10.0], jnp.float32),
        camera_yaw=jnp.asarray(-1.5707964, jnp.float32),
        camera_pitch=jnp.asarray(-0.2, jnp.float32),
        camera_fov=jnp.asarray(0.785398, jnp.float32),
        aspect_ratio=1.0,
        duck_position=jnp.zeros(3, jnp.float32),
        duck_scale=jnp.asarray(0.01, jnp.float32),
        prev_view_proj=jnp.eye(4, dtype=jnp.float32),
        has_prev=jnp.zeros((), bool),
        frame_index=jnp.zeros((), jnp.int32),
        debug_cascades=False, use_pcss=True, use_shadow_taa=False,
        shadow_softness=jnp.asarray(2.5, jnp.float32),
        shadow_map_size=shadow_map_size,
    )
    return U.compute_uniforms(**params)


def test_fully_lit_and_fully_shadowed():
    """Synthetic: an empty shadow map => everything lit; a zero-depth
    shadow map (occluder at the light's near plane) => shadowed."""
    uni = jax.jit(_make_uniforms, static_argnames=())( ) if False else _make_uniforms()
    n = 8
    world = jnp.zeros((n, n, 3), jnp.float32)  # ground points at origin
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, n, 1))
    ndl = jnp.full((n, n), 0.8, jnp.float32)
    phi = jnp.zeros((n, n), jnp.float32)
    cascade = jnp.zeros((n, n), jnp.int32)

    lit_maps = jax.vmap(quad_pack)(jnp.ones((4, 64, 64), jnp.float32))
    res = sf.shadow_pcss(uni, lit_maps, cascade, world, normal, ndl, phi)
    np.testing.assert_allclose(np.asarray(res.v), 1.0)

    dark_maps = jax.vmap(quad_pack)(jnp.zeros((4, 64, 64), jnp.float32))
    res = sf.shadow_pcss(uni, dark_maps, cascade, world, normal, ndl, phi)
    np.testing.assert_allclose(np.asarray(res.v), 0.0, atol=1e-6)

    # PCF agrees on the extremes
    res = sf.shadow_pcf(uni, lit_maps, cascade, world, normal, ndl, phi)
    np.testing.assert_allclose(np.asarray(res.v), 1.0)
    res = sf.shadow_pcf(uni, dark_maps, cascade, world, normal, ndl, phi)
    np.testing.assert_allclose(np.asarray(res.v), 0.0, atol=1e-6)


def test_pcss_penumbra_widens_with_distance():
    """Contact hardening: a receiver farther below the occluder gets a
    wider penumbra kernel (gltf.frag:425-431)."""
    uni = _make_uniforms()
    lvp = np.asarray(uni.light_view_proj[0])

    # occluder depth = what a blocker plane at world y=1 projects to
    occ_world = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    occ_ndc = lvp @ occ_world
    occ_depth = float(occ_ndc[2] / occ_ndc[3])
    maps = jax.vmap(quad_pack)(
        jnp.full((4, 64, 64), occ_depth, jnp.float32))

    def kernel_at(y):
        world = jnp.asarray([[[0.0, y, 0.0]]], jnp.float32)
        normal = jnp.asarray([[[0.0, 1.0, 0.0]]], jnp.float32)
        ndl = jnp.asarray([[0.8]], jnp.float32)
        phi = jnp.zeros((1, 1), jnp.float32)
        cascade = jnp.zeros((1, 1), jnp.int32)
        res = sf.shadow_pcss(uni, maps, cascade, world, normal, ndl, phi)
        return float(res.kernel_radius_texels[0, 0]), float(res.v[0, 0])

    k_near, v_near = kernel_at(0.9)    # receiver just below occluder
    k_far, v_far = kernel_at(0.0)      # receiver on the ground
    assert v_near < 1.0 and v_far < 1.0   # both shadowed
    assert k_far > k_near                  # penumbra widens with distance


def test_mix_shadow_result_lerp():
    a = sf.ShadowResult(*(jnp.full((2, 2), v) for v in (0.0, 0.1, 0.2, 1.0)))
    b = sf.ShadowResult(*(jnp.full((2, 2), v) for v in (1.0, 0.9, 0.8, 3.0)))
    m = sf.mix_shadow(a, b, jnp.full((2, 2), 0.25))
    assert abs(float(m.v[0, 0]) - 0.25) < 1e-6
    assert abs(float(m.kernel_radius_texels[0, 0]) - 1.5) < 1e-6
