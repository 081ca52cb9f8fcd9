"""Per-frame uniform computation: view/proj, cascade splits, light matrices.

In-jit jnp port of GltfRenderer::update_uniform_buffer
(gltf_renderer.rs:1784-1993). In the reference this is per-frame CPU math
memcpy'd into a UBO; here it traces into the frame function, so XLA overlaps
it with everything else and there is no host->device hop at all.

Pipeline (all exact semantics):
1. camera front from yaw/pitch (gltf_renderer.rs:1799-1803), look_at_rh,
   perspective with Vulkan Y-flip (1815-1820).
2. practical split scheme, lambda=0.6 log/uniform blend (1829-1840).
3. per-cascade frustum corner fit in light space with radius-based light
   distance (1842-1906), texel snapping (1914-1936), padded ortho
   (1938-1944).
4. light direction (0.5, 1, 0.3) normalized (1860, 1957-1960).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import math3d as m3

SHADOW_CASCADE_COUNT = 4      # gltf_renderer.rs:9
SHADOW_MAP_SIZE = 2048        # gltf_renderer.rs:10
NEAR_PLANE = 0.1              # gltf_renderer.rs:1829
FAR_PLANE = 100.0
CASCADE_LAMBDA = 0.6          # gltf_renderer.rs:1831
LIGHT_DIR_WORLD = (0.5, 1.0, 0.3)  # gltf_renderer.rs:1860


class FrameUniforms(NamedTuple):
    """The UBO contents (gltf.vert/gltf.frag `ubo`, gltf_renderer.rs:89-106)
    plus per-object model matrices."""
    view: jnp.ndarray            # (4, 4)
    proj: jnp.ndarray            # (4, 4) Y-flipped
    view_proj: jnp.ndarray       # (4, 4)
    camera_pos: jnp.ndarray      # (3,)
    light_dir: jnp.ndarray       # (3,) normalized
    light_view_proj: jnp.ndarray  # (4, 4, 4) per cascade
    cascade_splits: jnp.ndarray  # (4,) view-space split distances
    shadow_map_size: jnp.ndarray  # (4,) (w, h, 1/w, 1/h)
    # debugFlags: x=debug cascades, y=use PCSS, z=shadow TAA, w=frame index
    debug_flags: jnp.ndarray     # (4,)
    shadow_bias: jnp.ndarray     # (4,) x = softness (light size in texels)
    prev_view_proj: jnp.ndarray  # (4, 4)
    models: jnp.ndarray          # (O, 4, 4): 0=ground identity, 1=duck


def cascade_splits() -> jnp.ndarray:
    """Practical split scheme (gltf_renderer.rs:1833-1840)."""
    i = jnp.arange(1, SHADOW_CASCADE_COUNT + 1, dtype=jnp.float32)
    p = i / SHADOW_CASCADE_COUNT
    log_split = NEAR_PLANE * jnp.power(FAR_PLANE / NEAR_PLANE, p)
    uni_split = NEAR_PLANE + (FAR_PLANE - NEAR_PLANE) * p
    return CASCADE_LAMBDA * log_split + (1.0 - CASCADE_LAMBDA) * uni_split


def fit_cascades(view: jnp.ndarray, proj: jnp.ndarray,
                 splits: jnp.ndarray,
                 shadow_map_size: int = SHADOW_MAP_SIZE) -> jnp.ndarray:
    """Fit a stabilized ortho light frustum per cascade.

    Port of gltf_renderer.rs:1842-1948. Returns (4, 4, 4) lightViewProj.
    """
    inv_view_proj = m3.view_proj_inverse(view, proj)

    ndc = jnp.asarray([
        [-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0],
        [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0], [1.0, 1.0, 1.0], [-1.0, 1.0, 1.0],
    ], jnp.float32)
    corners_h = m3.transform_homogeneous(inv_view_proj, ndc)  # (8, 4)

    # NOTE: the reference divides the whole vec4 by w and truncates
    # ((p / p.w).truncate(), gltf_renderer.rs:1855-1856).
    frustum = corners_h[:, :3] / corners_h[:, 3:4]            # (8, 3)

    light_dir = m3.normalize(jnp.asarray(LIGHT_DIR_WORLD, jnp.float32))

    # up vector choice (gltf_renderer.rs:1884-1888): Z if |dot(dir, Y)|>0.9
    up = jnp.where(jnp.abs(light_dir[1]) > 0.9,
                   jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                   jnp.asarray([0.0, 1.0, 0.0], jnp.float32))

    near4 = frustum[:4]
    far4 = frustum[4:]

    prev_splits = jnp.concatenate([jnp.asarray([NEAR_PLANE], jnp.float32),
                                   splits[:-1]])

    def fit_one(prev_split, split):
        t0 = jnp.clip((prev_split - NEAR_PLANE) / (FAR_PLANE - NEAR_PLANE),
                      0.0, 1.0)
        t1 = jnp.clip((split - NEAR_PLANE) / (FAR_PLANE - NEAR_PLANE),
                      0.0, 1.0)
        corners = jnp.concatenate([
            near4 + (far4 - near4) * t0,
            near4 + (far4 - near4) * t1,
        ])                                                     # (8, 3)
        center = jnp.mean(corners, axis=0)

        radius = jnp.max(jnp.linalg.norm(corners - center, axis=1))
        radius = jnp.maximum(radius, 1.0)
        light_pos = center + light_dir * (radius * 2.5)
        light_view = m3.look_at_rh(light_pos, center, up)

        ls = m3.transform_point(light_view, corners)           # (8, 3)
        mn = jnp.min(ls, axis=0)
        mx = jnp.max(ls, axis=0)

        pad_xy = radius * 0.05
        left = mn[0] - pad_xy
        right = mx[0] + pad_xy
        bottom = mn[1] - pad_xy
        top = mx[1] + pad_xy

        # Texel snapping (gltf_renderer.rs:1914-1936).
        width = jnp.maximum(right - left, 0.001)
        height = jnp.maximum(top - bottom, 0.001)
        texel_x = width / shadow_map_size
        texel_y = height / shadow_map_size
        cx = 0.5 * (left + right)
        cy = 0.5 * (bottom + top)
        dx = jnp.round(cx / texel_x) * texel_x - cx
        dy = jnp.round(cy / texel_y) * texel_y - cy
        left, right = left + dx, right + dx
        bottom, top = bottom + dy, top + dy

        # RH look_at forward is -Z (gltf_renderer.rs:1938-1941).
        pad_z = radius * 0.2
        near_dist = jnp.maximum(-mx[2] - pad_z, 0.1)
        far_dist = jnp.maximum(-mn[2] + pad_z, near_dist + 0.1)

        light_proj = m3.orthographic_rh(left, right, bottom, top,
                                        near_dist, far_dist)
        return light_proj @ light_view

    return jax.vmap(fit_one)(prev_splits, splits)


def compute_uniforms(camera_pos, camera_yaw, camera_pitch, camera_fov,
                     aspect_ratio, duck_position, duck_scale,
                     prev_view_proj, has_prev, frame_index,
                     debug_cascades, use_pcss, use_shadow_taa,
                     shadow_softness,
                     shadow_map_size: int = SHADOW_MAP_SIZE) -> FrameUniforms:
    """Full UBO computation (gltf_renderer.rs:1784-1993).

    All inputs traced (except nothing — flags are traced f32/bool too, so
    toggling them does not recompile; the PCF/PCSS *selection* is a static
    arg at the frame level for speed, see frame.py).
    """
    front = m3.camera_front(camera_yaw, camera_pitch)
    target = camera_pos + front
    view = m3.look_at_rh(camera_pos, target,
                         jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    proj = m3.perspective_vk(camera_fov, aspect_ratio, NEAR_PLANE, FAR_PLANE)
    view_proj = proj @ view

    prev_vp = jnp.where(has_prev, prev_view_proj, view_proj)

    splits = cascade_splits()
    light_vp = fit_cascades(view, proj, splits, shadow_map_size)

    # Per-object models: ground identity (gltf_renderer.rs:1806), duck =
    # scale * rotY(pi) * translate (gltf_renderer.rs:1809-1811).
    duck_rot = m3.quat_from_rotation_y(jnp.asarray(jnp.pi, jnp.float32))
    duck_model = m3.mat4_from_scale_rotation_translation(
        duck_scale, duck_rot, duck_position)
    models = jnp.stack([jnp.eye(4, dtype=jnp.float32), duck_model])

    s = float(shadow_map_size)
    frame_f = jnp.asarray(frame_index, jnp.float32) % 1024.0

    return FrameUniforms(
        view=view,
        proj=proj,
        view_proj=view_proj,
        camera_pos=jnp.asarray(camera_pos, jnp.float32),
        light_dir=m3.normalize(jnp.asarray(LIGHT_DIR_WORLD, jnp.float32)),
        light_view_proj=light_vp,
        cascade_splits=splits,
        shadow_map_size=jnp.asarray([s, s, 1.0 / s, 1.0 / s], jnp.float32),
        debug_flags=jnp.stack([
            jnp.asarray(debug_cascades, jnp.float32),
            jnp.asarray(use_pcss, jnp.float32),
            jnp.asarray(use_shadow_taa, jnp.float32),
            frame_f,
        ]),
        shadow_bias=jnp.stack([
            jnp.asarray(shadow_softness, jnp.float32),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32)]),
        prev_view_proj=prev_vp,
        models=models,
    )
