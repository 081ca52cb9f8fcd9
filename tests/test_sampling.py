"""Sampler parity: bilinear/nearest filtering, addressing, shadow compare."""

import numpy as np
import jax
import jax.numpy as jnp

from funky_tpu.ops import sampling


def test_bilinear_texel_centers():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # uv at texel center (i+0.5)/4 returns the texel exactly.
    for iy in range(4):
        for ix in range(4):
            uv = jnp.asarray([(ix + 0.5) / 4, (iy + 0.5) / 4])
            v = sampling.sample_bilinear_repeat(tex, uv)
            assert float(v[0]) == iy * 4 + ix


def test_bilinear_midpoint_average():
    tex = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]])[..., None])
    v = sampling.sample_bilinear_repeat(tex, jnp.asarray([0.5, 0.5]))
    assert abs(float(v[0]) - 1.5) < 1e-6


def test_repeat_wrap():
    tex = jnp.asarray(np.array([[0.0, 10.0]])[..., None])  # (1, 2)
    # uv.x = 1.25 == 0.25 by REPEAT
    a = sampling.sample_bilinear_repeat(tex, jnp.asarray([1.25, 0.5]))
    b = sampling.sample_bilinear_repeat(tex, jnp.asarray([0.25, 0.5]))
    assert abs(float(a[0]) - float(b[0])) < 1e-6


def test_clamp_to_edge():
    tex = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]]))
    v = sampling.sample_bilinear_edge(tex, jnp.asarray([-1.0, -1.0]))
    assert abs(float(v) - 1.0) < 1e-6
    v = sampling.sample_bilinear_edge(tex, jnp.asarray([2.0, 2.0]))
    assert abs(float(v) - 4.0) < 1e-6


def test_border_outside_is_border():
    tex = jnp.zeros((4, 4))
    v = sampling.sample_bilinear_border(tex, jnp.asarray([-0.5, 0.5]),
                                        border=1.0)
    assert abs(float(v) - 1.0) < 1e-6


def test_shadow_compare_semantics():
    # stored depth 0.5 everywhere: lit iff ref <= 0.5 (LESS_OR_EQUAL).
    sm = jnp.full((8, 8), 0.5)
    uv = jnp.asarray([0.5, 0.5])
    lit = sampling.sample_shadow_compare(sm, uv, jnp.asarray(0.4))
    shadowed = sampling.sample_shadow_compare(sm, uv, jnp.asarray(0.6))
    assert float(lit) == 1.0
    assert float(shadowed) == 0.0
    eq = sampling.sample_shadow_compare(sm, uv, jnp.asarray(0.5))
    assert float(eq) == 1.0


def test_shadow_compare_bilinear_blend():
    # Half the 2x2 neighborhood passes -> fractional visibility.
    sm = jnp.asarray(np.array([[0.0, 1.0], [0.0, 1.0]], np.float32))
    # sample exactly between the two columns at row center
    uv = jnp.asarray([0.5, 0.5])
    v = sampling.sample_shadow_compare(sm, uv, jnp.asarray(0.5))
    assert abs(float(v) - 0.5) < 1e-6


def test_shadow_border_is_lit():
    sm = jnp.zeros((4, 4))  # everything occluded inside
    v = sampling.sample_shadow_compare(sm, jnp.asarray([-1.0, 0.5]),
                                       jnp.asarray(0.9))
    assert float(v) == 1.0  # border white => ref 0.9 <= 1.0 => lit


def test_nearest_edge():
    tex = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert float(sampling.sample_nearest_edge(tex, jnp.asarray([0.2, 0.2]))) == 1.0
    assert float(sampling.sample_nearest_edge(tex, jnp.asarray([0.9, 0.2]))) == 2.0
    assert float(sampling.sample_nearest_edge(tex, jnp.asarray([5.0, 5.0]))) == 4.0


def test_batched_shapes():
    tex = jnp.ones((16, 16, 4))
    uv = jnp.zeros((8, 8, 2)) + 0.5
    out = sampling.sample_bilinear_repeat(tex, uv)
    assert out.shape == (8, 8, 4)


def test_nearest_border_packed_matches_bruteforce():
    """PCSS blocker sampler (NEAREST + CLAMP_TO_BORDER white,
    gltf_renderer.rs:822-833): packed fast path vs direct texel lookup."""
    rng = np.random.default_rng(7)
    maps = jnp.asarray(rng.random((2, 8, 8), dtype=np.float32))
    packed = jnp.stack([jax.vmap(sampling.quad_pack)(maps)[i]
                        for i in range(2)])
    uv = jnp.asarray(rng.uniform(-0.3, 1.3, size=(64, 2)).astype(np.float32))
    layer = jnp.asarray(rng.integers(0, 2, size=(64,)), jnp.int32)

    got = sampling.sample_nearest_border_packed(packed, layer, uv,
                                                border=1.0)

    m = np.asarray(maps)
    u = np.asarray(uv)
    lay = np.asarray(layer)
    want = np.empty(64, np.float32)
    for i in range(64):
        ix = int(np.floor(u[i, 0] * 8))
        iy = int(np.floor(u[i, 1] * 8))
        if 0 <= ix < 8 and 0 <= iy < 8:
            want[i] = m[lay[i], iy, ix]
        else:
            want[i] = 1.0
    np.testing.assert_allclose(np.asarray(got), want, atol=0, rtol=0)


def test_nearest_border_packed_texel_centers():
    maps = jnp.asarray(np.arange(32, dtype=np.float32).reshape(2, 4, 4))
    packed = jax.vmap(sampling.quad_pack)(maps)
    for iy in range(4):
        for ix in range(4):
            uv = jnp.asarray([(ix + 0.5) / 4, (iy + 0.5) / 4])
            v = sampling.sample_nearest_border_packed(
                packed, jnp.int32(1), uv)
            assert float(v) == 16 + iy * 4 + ix


def test_layered_repeat_matches_per_texture():
    """Layered packed REPEAT sampling == plain repeat sampling of each
    layer's TRUE-size texture (wrap padding + true-size mod are exact)."""
    import numpy as np

    from funky_tpu.ops.sampling import (
        quad_pack_nhwc, sample_bilinear_repeat,
        sample_bilinear_repeat_packed_layers)

    rng = np.random.default_rng(7)
    t0 = rng.random((2, 2, 4)).astype(np.float32)
    t1 = rng.random((4, 4, 4)).astype(np.float32)
    # wrap-pad t0 to 4x4 like models/scene._pack_texture_layers
    t0p = np.tile(t0, (2, 2, 1))
    layers = jnp.asarray(np.stack([t0p, t1]))
    sizes = jnp.asarray([[2.0, 2.0], [4.0, 4.0]])
    packed = jax.vmap(quad_pack_nhwc)(layers)

    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (64, 2)).astype(np.float32))
    layer = jnp.asarray(rng.integers(0, 2, 64).astype(np.int32))
    got = sample_bilinear_repeat_packed_layers(packed, sizes, layer, uv)

    want0 = sample_bilinear_repeat(jnp.asarray(t0), uv)
    want1 = sample_bilinear_repeat(jnp.asarray(t1), uv)
    want = jnp.where((layer == 0)[:, None], want0, want1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
