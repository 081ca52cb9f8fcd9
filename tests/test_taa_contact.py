"""Shadow TAA + contact shadow unit tests (synthetic setups)."""

import numpy as np
import jax.numpy as jnp

from funky_tpu.passes import contact, taa
from funky_tpu.passes.shadow_filter import ShadowResult
from funky_tpu.passes.uniforms import FrameUniforms, compute_uniforms


def _uniforms(**overrides):
    kw = dict(
        camera_pos=jnp.asarray([0.0, 2.0, 5.0], jnp.float32),
        camera_yaw=jnp.asarray(-1.5707964, jnp.float32),
        camera_pitch=jnp.asarray(-0.3, jnp.float32),
        camera_fov=jnp.asarray(0.785398, jnp.float32),
        aspect_ratio=1.0,
        duck_position=jnp.zeros(3, jnp.float32),
        duck_scale=jnp.asarray(0.01, jnp.float32),
        prev_view_proj=jnp.eye(4, dtype=jnp.float32),
        has_prev=jnp.zeros((), bool),
        frame_index=jnp.zeros((), jnp.int32),
        debug_cascades=False, use_pcss=True, use_shadow_taa=True,
        shadow_softness=jnp.asarray(2.5, jnp.float32),
        shadow_map_size=64,
    )
    kw.update(overrides)
    return compute_uniforms(**kw)


def _world_grid(uni, n=16):
    """World positions of ground points visible near screen center."""
    return jnp.stack([
        jnp.linspace(-1, 1, n)[None, :].repeat(n, 0),
        jnp.zeros((n, n)),
        jnp.linspace(0, 2, n)[:, None].repeat(n, 1),
    ], axis=-1).astype(jnp.float32)


def _res(val, n=16):
    one = jnp.full((n, n), val, jnp.float32)
    return ShadowResult(one, one, one * 1.0, jnp.full((n, n), 2.0))


def test_taa_disabled_passthrough():
    uni = _uniforms(use_shadow_taa=False)
    world = _world_grid(uni)
    hist = taa.init_history(16, 16)
    out, new_hist = taa.apply_shadow_taa(_res(0.3), world, uni, hist,
                                         use_shadow_taa=False)
    np.testing.assert_allclose(np.asarray(out), 0.3)
    # history still records shadow + ndc depth
    np.testing.assert_allclose(np.asarray(new_hist[..., 0]), 0.3)
    assert np.all(np.asarray(new_hist[..., 1]) <= 1.0)


def _world_at_pixels(uni, n=16):
    """World points that reproject exactly to each pixel's history-lookup
    uv (the shader's currentUv = (fragCoord+0.5)/size, gltf.frag:544), so
    a static camera gives motion == 0."""
    from funky_tpu import math3d as m3
    inv = m3.view_proj_inverse(uni.view, uni.proj)
    xs = (jnp.arange(n, dtype=jnp.float32) + 1.0) / n * 2.0 - 1.0
    ndc = jnp.stack([
        jnp.broadcast_to(xs[None, :], (n, n)),
        jnp.broadcast_to(xs[:, None], (n, n)),
        jnp.full((n, n), 0.5),
    ], axis=-1)
    hom = jnp.concatenate([ndc, jnp.ones((n, n, 1))], -1)
    p = jnp.einsum("ij,hwj->hwi", inv, hom)
    return p[..., :3] / p[..., 3:4]


def test_taa_static_camera_blends_history():
    """With an identical prev_view_proj (static camera) and geometry that
    reprojects onto the same pixels, history passes the motion/depth tests
    and blends at the softness-derived weight."""
    uni = _uniforms()
    uni = uni._replace(prev_view_proj=uni.view_proj)
    world = _world_at_pixels(uni)
    cur = _res(0.5)
    # history everywhere 0.6 with CORRECT prev ndc depth:
    hom = jnp.concatenate([world, jnp.ones((16, 16, 1))], -1)
    clip = jnp.einsum("ij,hwj->hwi", uni.view_proj, hom)
    ndc_z = jnp.clip(clip[..., 2] / clip[..., 3], 0, 1)
    hist = jnp.stack([jnp.full((16, 16), 0.6), ndc_z], axis=-1)

    out, _ = taa.apply_shadow_taa(cur, world, uni, hist, True)
    out = np.asarray(out)
    # our _res sets m1=m2=0.5: variance = 0.5-0.25 = 0.25, stdev=.5,
    # softness = 2/8 = .25, sigma = 2.5+(0.9-2.5)*.25 = 2.1 -> window
    # covers 0.6 -> history kept; weight = .55+.3*.25 = .625
    # -> out = .5 + (.6-.5)*.625 = .5625
    expect = 0.5 + (0.6 - 0.5) * 0.625
    # interior pixels (borders can clamp the nearest history fetch)
    np.testing.assert_allclose(out[1:-1, 1:-1], expect, atol=1e-3)


def test_taa_rejects_on_shadow_delta():
    uni = _uniforms()
    world = _world_grid(uni)
    uni = uni._replace(prev_view_proj=uni.view_proj)
    cur = _res(0.1)
    hom = jnp.concatenate([world, jnp.ones((16, 16, 1))], -1)
    clip = jnp.einsum("ij,hwj->hwi", uni.view_proj, hom)
    ndc_z = jnp.clip(clip[..., 2] / clip[..., 3], 0, 1)
    # |history - current| = 0.8 > 0.35 -> reject (gltf.frag:563)
    hist = jnp.stack([jnp.full((16, 16), 0.9), ndc_z], axis=-1)
    out, _ = taa.apply_shadow_taa(cur, world, uni, hist, True)
    np.testing.assert_allclose(np.asarray(out), 0.1, atol=1e-6)


def test_taa_rejects_on_motion():
    """A large camera move => prev uv far from current => reject."""
    uni = _uniforms()
    world = _world_grid(uni)
    moved = _uniforms(camera_pos=jnp.asarray([3.0, 2.0, 5.0], jnp.float32))
    uni = uni._replace(prev_view_proj=moved.view_proj)
    cur = _res(0.2)
    hist = jnp.stack([jnp.full((16, 16), 0.9),
                      jnp.full((16, 16), 0.5)], axis=-1)
    out, _ = taa.apply_shadow_taa(cur, world, uni, hist, True)
    np.testing.assert_allclose(np.asarray(out), 0.2, atol=1e-6)


def test_taa_aligned_fast_path_bit_parity():
    """The slab layout's aligned-history fast path (lax.cond in
    apply_shadow_taa) must be bit-identical to the always-gather frag
    layout — both for a static camera (fast branch taken: every needed
    tap is the pixel's own texel) and a nudged camera (gather branch)."""
    rng = np.random.default_rng(7)
    n = 16
    uni = _uniforms()
    for prev in (uni.view_proj,  # static -> fast branch
                 _uniforms(camera_pos=jnp.asarray([0.05, 2.0, 5.0],
                                                  jnp.float32)).view_proj):
        u = uni._replace(prev_view_proj=prev)
        world = _world_at_pixels(u)
        v = jnp.asarray(rng.uniform(0, 1, (n, n)), jnp.float32)
        cur = ShadowResult(v, v, v * v + 0.01,
                           jnp.asarray(rng.uniform(0, 8, (n, n)),
                                       jnp.float32))
        hist = jnp.asarray(rng.uniform(0, 1, (n, n, 2)), jnp.float32)
        out_a, hist_a = taa.apply_shadow_taa(cur, world, u, hist, True,
                                             full_height=n)
        # (n, n, 2) with frag[...,0]=x+0.5, frag[...,1]=y+0.5
        frag = jnp.stack(jnp.meshgrid(
            jnp.arange(n, dtype=jnp.float32) + 0.5,
            jnp.arange(n, dtype=jnp.float32) + 0.5), axis=-1)
        out_b, hist_b = taa.apply_shadow_taa(
            cur, world, u, hist, True, full_height=n, frag=frag,
            full_width=n)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
        np.testing.assert_array_equal(np.asarray(hist_a),
                                      np.asarray(hist_b))


def test_contact_shadow_backface_lit():
    """Surfaces facing away from the light never get contact shadows
    (gltf.frag:326-329)."""
    uni = _uniforms()
    n = 8
    world = _world_grid(uni, n)
    normal = jnp.tile(-uni.light_dir, (n, n, 1))  # facing away
    depth = jnp.ones((n, n), jnp.float32)
    out = contact.compute_contact_shadow(world, normal, uni, depth)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_contact_shadow_empty_depth_lit():
    """An empty depth buffer (all far) cannot occlude anything."""
    uni = _uniforms()
    n = 8
    world = _world_grid(uni, n)
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, n, 1)).astype(
        jnp.float32)
    depth = jnp.ones((n, n), jnp.float32)
    out = np.asarray(contact.compute_contact_shadow(world, normal, uni,
                                                    depth))
    # rayLinearDepth = 1/z ~ small... with far depth the dual-sample max
    # is 1/1.0 = 1; occluded only if surface < ray. Expect fully lit.
    np.testing.assert_allclose(out, 1.0)


def test_contact_shadow_occluder_darkens():
    """A near-depth wall in front of the ray path produces occlusion."""
    uni = _uniforms()
    n = 8
    world = _world_grid(uni, n)
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, n, 1)).astype(
        jnp.float32)
    # Build a stored depth surface 0.03 world units NEARER than the ray
    # start, so the marching ray is behind it within the 0.05 thickness.
    hom = jnp.concatenate([world + 0.01 * normal, jnp.ones((n, n, 1))], -1)
    clip = jnp.einsum("ij,hwj->hwi", uni.proj @ uni.view, hom)
    z_surface = clip[..., 2] / clip[..., 3]
    near, far = 0.1, 100.0
    d_surface = near * far / (far - z_surface * (far - near))
    d_stored = jnp.mean(d_surface) - 0.03
    z_stored = far * (d_stored - near) / (d_stored * (far - near))
    depth = jnp.full((n, n), float(z_stored), jnp.float32)
    out = np.asarray(contact.compute_contact_shadow(world, normal, uni,
                                                    depth))
    assert out.min() < 1.0  # some occlusion found
    assert out.min() >= 1.0 - 0.8 - 1e-5  # max darkness 0.8 (gltf.frag:359)


def test_taa_sparse_history_read_bit_parity():
    """The compacted misaligned-frame history read (need_capacity; r5)
    must be bit-identical to the dense gather in every regime: nudged
    camera (small motion: most pixels need history), large move (most
    reject on motion), and overflow (capacity < need -> dense cond
    fallback). Both the slab and frag layouts."""
    rng = np.random.default_rng(11)
    n = 16
    base = _uniforms()
    nudged = _uniforms(camera_pos=jnp.asarray([0.02, 2.0, 5.0],
                                              jnp.float32)).view_proj
    moved = _uniforms(camera_pos=jnp.asarray([3.0, 2.0, 5.0],
                                             jnp.float32)).view_proj
    for prev in (nudged, moved):
        u = base._replace(prev_view_proj=prev)
        world = _world_at_pixels(u)
        v = jnp.asarray(rng.uniform(0, 1, (n, n)), jnp.float32)
        cur = ShadowResult(v, v, v * v + 0.01,
                           jnp.asarray(rng.uniform(0, 8, (n, n)),
                                       jnp.float32))
        hist = jnp.asarray(rng.uniform(0, 1, (n, n, 2)), jnp.float32)
        dense_out, dense_hist = taa.apply_shadow_taa(
            cur, world, u, hist, True, full_height=n)
        for cap in (n * n, 8):   # fits / overflow->cond fallback
            out_c, hist_c = taa.apply_shadow_taa(
                cur, world, u, hist, True, full_height=n,
                need_capacity=cap)
            np.testing.assert_array_equal(np.asarray(dense_out),
                                          np.asarray(out_c))
            np.testing.assert_array_equal(np.asarray(dense_hist),
                                          np.asarray(hist_c))
        # frag layout (the blocked back half's flat domain)
        frag = jnp.stack(jnp.meshgrid(
            jnp.arange(n, dtype=jnp.float32) + 0.5,
            jnp.arange(n, dtype=jnp.float32) + 0.5), axis=-1)
        fd_out, fd_hist = taa.apply_shadow_taa(
            cur, world, u, hist, True, full_height=n, frag=frag,
            full_width=n)
        fs_out, fs_hist = taa.apply_shadow_taa(
            cur, world, u, hist, True, full_height=n, frag=frag,
            full_width=n, need_capacity=n * n)
        np.testing.assert_array_equal(np.asarray(fd_out),
                                      np.asarray(fs_out))
        np.testing.assert_array_equal(np.asarray(fd_hist),
                                      np.asarray(fs_hist))
