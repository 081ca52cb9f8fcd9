"""Near-plane triangle clipping (ops/clipping.py).

The reference relies on Vulkan's fixed-function clipper
(gltf_renderer.rs:1324-1444 pipeline); here crossing triangles expand
into sub-triangles. Verified against brute-force references: a
barycentric subdivision rasterizer for coverage/depth, ray-plane
intersection for perspective-correct attributes, and the full frame for
the fly-into-the-ground case.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             compiled_gltf_frame, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.clipping import expand_near_clipped
from funky_tpu.ops.raster import RasterConfig, raster_corners
from funky_tpu.passes import deferred
from funky_tpu import math3d as m3

W, H = 160, 120
CFG = RasterConfig(tile_h=8, tile_w=128, backend="jnp")
W_EPS = 1e-2


def _view_proj():
    view = m3.look_at_rh(jnp.asarray([0.0, 0.0, 2.0]),
                         jnp.asarray([0.0, 0.0, 0.0]),
                         jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective_vk(jnp.float32(0.9), W / H, 0.1, 100.0)
    return proj @ view


def _crossing_triangle():
    """World triangle with one vertex behind the camera (w < 0)."""
    return np.asarray([
        [-1.0, -0.5, 0.0],    # in front
        [1.0, -0.5, 0.0],     # in front
        [0.0, 0.6, 5.0],      # behind the camera (camera at z=2, -z look)
    ], np.float32)


def _to_clip(world, vp):
    ones = jnp.ones((world.shape[0], 1), jnp.float32)
    return jnp.concatenate([jnp.asarray(world), ones], axis=-1) @ vp.T


def _blocks_for(world, clip, attrs):
    """Minimal shade blocks (T=1): [attr(11), inv_w]."""
    inv_w = 1.0 / jnp.maximum(clip[:, 3:4], 1e-12)
    per_v = jnp.concatenate([jnp.asarray(attrs), inv_w], axis=-1)
    return per_v[None, :, :]                              # (1, 3, 12)


def _subdivision_reference(world, vp, m=96):
    """Brute force: split the triangle into m^2 barycentric cells, raster
    every fully-in-front cell. Converges to the exact clipped coverage
    (boundary cells straddle, so compare with a tolerance band)."""
    tris = []
    w3 = np.asarray(world)
    for i in range(m):
        for j in range(m - i):
            b = [(i, j), (i + 1, j), (i, j + 1)]
            tris.append(b)
            if i + j < m - 1:
                tris.append([(i + 1, j), (i + 1, j + 1), (i, j + 1)])
    corners = []
    for t in tris:
        pts = [(w3[0] * (m - i - j) + w3[1] * i + w3[2] * j) / m
               for i, j in t]
        corners.append(pts)
    corners = jnp.asarray(np.asarray(corners, np.float32))  # (N, 3, 3)
    n = corners.shape[0]
    ones = jnp.ones((n, 3, 1), jnp.float32)
    tc = jnp.einsum("ij,ntj->nti", vp,
                    jnp.concatenate([corners, ones], axis=-1))
    keep = jnp.all(tc[..., 3] > W_EPS, axis=-1)
    tri_id, depth = raster_corners(tc, keep, W, H, CFG)[:2]
    return np.asarray(tri_id) >= 0, np.asarray(depth)


def test_unclipped_scene_is_unchanged():
    """With no crossing triangles the expansion is an exact no-op on the
    raster output (extra rows all invalid)."""
    vp = _view_proj()
    world = np.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                        [0.0, 0.5, 0.0]], np.float32)
    clip = _to_clip(world, vp)
    tri_clip = clip[None, :, :]
    blocks = _blocks_for(world, clip, np.random.default_rng(0)
                         .normal(size=(3, 11)).astype(np.float32))
    flags = jnp.zeros((1,), jnp.int32)
    g = expand_near_clipped(tri_clip, blocks, flags, 1, capacity=8,
                            w_eps=W_EPS)
    assert not bool(g.overflow)
    assert g.tri_clip.shape[0] == 1 + 2 * min(8, 1)   # K clamps to T
    assert bool(g.valid[0]) and not np.asarray(g.valid[1:]).any()

    id_ref, d_ref = raster_corners(tri_clip, jnp.ones(1, bool), W, H, CFG)[:2]
    id_new, d_new = raster_corners(g.tri_clip, g.valid, W, H, CFG)[:2]
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_new))
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_new))


def test_clipped_coverage_and_depth_match_subdivision():
    vp = _view_proj()
    world = _crossing_triangle()
    clip = _to_clip(world, vp)
    assert float(clip[2, 3]) < 0.0          # the setup really crosses

    tri_clip = clip[None, :, :]
    blocks = _blocks_for(world, clip, np.zeros((3, 11), np.float32))
    g = expand_near_clipped(tri_clip, blocks, jnp.zeros((1,), jnp.int32),
                            1, capacity=4, w_eps=W_EPS)
    tri_id, depth = raster_corners(g.tri_clip, g.valid, W, H, CFG)[:2]
    cover = np.asarray(tri_id) >= 0
    depth = np.asarray(depth)

    # Without clipping the triangle vanished entirely (round-1 behavior).
    id_cull, _ = raster_corners(tri_clip, jnp.ones(1, bool), W, H, CFG)[:2]
    assert not (np.asarray(id_cull) >= 0).any()

    ref_cover, ref_depth = _subdivision_reference(world, vp)
    assert ref_cover.sum() > 500            # the visible part is large
    both = cover & ref_cover
    mismatch = (cover != ref_cover).mean()
    assert mismatch < 0.02, f"coverage mismatch {mismatch:.3%}"
    np.testing.assert_allclose(depth[both], ref_depth[both], atol=2e-4)


def test_clipped_attributes_perspective_correct():
    """Deferred attributes on a clipped triangle match exact ray-plane
    interpolation (the sub-triangle corner combination preserves
    perspective-correct interpolation)."""
    vp = _view_proj()
    world = _crossing_triangle()
    clip = _to_clip(world, vp)
    # attrs: world position in slots 0:3 (so the reference is the exact
    # ray-plane intersection point), plus a linear ramp in slot 6.
    attrs = np.zeros((3, 11), np.float32)
    attrs[:, 0:3] = world
    attrs[:, 6] = [0.0, 1.0, 2.0]
    tri_clip = clip[None, :, :]
    blocks = _blocks_for(world, clip, attrs)
    g = expand_near_clipped(tri_clip, blocks, jnp.zeros((1,), jnp.int32),
                            1, capacity=4, w_eps=W_EPS)
    tri_id, depth, setup = raster_corners(g.tri_clip, g.valid, W, H, CFG)
    gbuf = deferred.interpolate(tri_id, depth, setup.data, g.blocks,
                                g.tri_flags)
    cover = np.asarray(tri_id) >= 0
    ys, xs = np.nonzero(cover)
    sel = slice(0, None, 37)
    ys, xs = ys[sel], xs[sel]

    # Exact reference: camera ray through each pixel center intersected
    # with the triangle's world plane.
    inv = np.linalg.inv(np.asarray(vp, np.float64))
    ndc_x = (xs + 0.5) / W * 2.0 - 1.0
    ndc_y = (ys + 0.5) / H * 2.0 - 1.0
    p0 = inv @ np.stack([ndc_x, ndc_y, 0.1 * np.ones_like(ndc_x),
                         np.ones_like(ndc_x)])
    p1 = inv @ np.stack([ndc_x, ndc_y, 0.9 * np.ones_like(ndc_x),
                         np.ones_like(ndc_x)])
    p0 = (p0[:3] / p0[3]).T
    p1 = (p1[:3] / p1[3]).T
    n_pl = np.cross(world[1] - world[0], world[2] - world[0])
    t = ((world[0] - p0) @ n_pl) / ((p1 - p0) @ n_pl)
    hit = p0 + t[:, None] * (p1 - p0)

    got = np.asarray(gbuf.world)[ys, xs]
    np.testing.assert_allclose(got, hit, atol=5e-3)

    # The scalar ramp attribute: solve exact barycentrics from world pos.
    a_mat = np.stack([world[1] - world[0], world[2] - world[0]], axis=1)
    sol, *_ = np.linalg.lstsq(a_mat, (hit - world[0]).T, rcond=None)
    ramp_ref = sol[0] * 1.0 + sol[1] * 2.0
    np.testing.assert_allclose(np.asarray(gbuf.uv)[ys, xs, 0], ramp_ref,
                               atol=5e-3)


def test_frame_fly_into_ground():
    """Camera grazing the ground: the ground quad crosses the near plane;
    with clipping it still fills the lower half of the frame (round 1:
    it vanished)."""
    scene = build_device_scene(None)        # ground plane only
    tile = RasterConfig(tile_h=16, tile_w=128, backend="jnp")
    base = GltfConfig(width=256, height=144, shadow_map_size=64,
                      raster=tile, shadow_raster=tile,
                      flags=GltfFrameFlags(enable_shadows=False,
                                           enable_contact_shadows=False))
    params = dataclasses.replace(
        default_gltf_params(),
        camera_pos=jnp.asarray([0.0, 0.05, 2.0], jnp.float32),
        camera_pitch=jnp.asarray(-0.05, jnp.float32))

    state = init_frame_state(base)
    rgba, _ = compiled_gltf_frame(base)(scene, params, state)
    sky = np.asarray(jnp.asarray([0.53, 0.81, 0.92]))
    bottom = np.asarray(rgba)[-40:, :, :3]
    ground_frac = (np.abs(bottom - sky).sum(-1) > 0.05).mean()
    assert ground_frac > 0.95, f"ground coverage {ground_frac:.2%}"

    unclipped = dataclasses.replace(base, clip_capacity=0)
    rgba0, _ = compiled_gltf_frame(unclipped)(
        scene, params, init_frame_state(unclipped))
    bottom0 = np.asarray(rgba0)[-40:, :, :3]
    assert (np.abs(bottom0 - sky).sum(-1) > 0.05).mean() < 0.05
