"""Composed frame functions + jit compile cache.

Each frame is ONE pure jit-compiled function: scene arrays + per-frame
parameters (+ carried temporal state for the glTF path) in, linear RGBA
framebuffer (+ new state) out. This is the TPU-native replacement for the
reference's command-buffer recording + render passes + queue submit
(main.rs:575-913): pass ordering becomes ordinary data dependencies, and
XLA overlaps/fuses everything it can.

Swapchain recreation (renderer.rs:497-613) maps to "re-jit at the new
static (H, W)" — handled by the per-resolution compile cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import math3d as m3
from .models.scene import DeviceScene
from .ops.raster import RasterConfig, raster_scene
from .passes import deferred, geometry, shading

CUBE_CLEAR = (0.39, 0.58, 0.93)    # cornflower blue (cube.rs:277)
GLTF_CLEAR = (0.53, 0.81, 0.92)    # sky (gltf_renderer.rs:2252-2255)
NEAR, FAR = 0.1, 100.0             # both pipelines (renderer/gltf_renderer)


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    width: int = 1920
    height: int = 1080
    raster: RasterConfig = dataclasses.field(default_factory=RasterConfig)

    @property
    def aspect(self) -> float:
        return self.width / self.height


@dataclasses.dataclass(frozen=True)
class CubeParams:
    """Traced per-frame inputs of the cube demo (cube.rs:166-213)."""
    rotation: jnp.ndarray      # scalar f32, radians
    position: jnp.ndarray      # (3,)
    camera_pos: jnp.ndarray    # (3,)
    yaw: jnp.ndarray           # scalar — cube.rs yaw convention!
    pitch: jnp.ndarray
    fov: jnp.ndarray
    scale: jnp.ndarray


jax.tree_util.register_pytree_node(
    CubeParams,
    lambda p: ((p.rotation, p.position, p.camera_pos, p.yaw, p.pitch,
                p.fov, p.scale), None),
    lambda _, c: CubeParams(*c))


def default_cube_params(rotation: float = 0.0) -> CubeParams:
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    return CubeParams(
        rotation=f32(rotation),
        position=f32([0.0, 0.0, 0.0]),
        camera_pos=f32([0.0, 0.0, 3.0]),
        # cube.rs:186-190 convention: target = pos +
        #   (sin(yaw)cos(pitch), sin(pitch), cos(yaw)cos(pitch));
        # yaw=pi => looking down -Z at the origin from z=+3.
        yaw=f32(3.14159265),
        pitch=f32(0.0),
        fov=f32(0.7853981634),   # 45 deg
        scale=f32(1.0),
    )


def render_cube_frame(scene: DeviceScene, params: CubeParams,
                      cfg: FrameConfig) -> jnp.ndarray:
    """The rotating-cube demo (BASELINE config 1): linear RGBA out."""
    model = (m3.mat4_from_translation(params.position)
             @ m3.mat4_from_rotation_y(params.rotation)
             @ m3.mat4_from_rotation_x(params.rotation * 0.5)
             @ m3.mat4_from_scale(params.scale))

    front = jnp.stack([
        jnp.sin(params.yaw) * jnp.cos(params.pitch),
        jnp.sin(params.pitch),
        jnp.cos(params.yaw) * jnp.cos(params.pitch),
    ])
    view = m3.look_at_rh(params.camera_pos, params.camera_pos + front,
                         jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    proj = m3.perspective_vk(params.fov, cfg.aspect, NEAR, FAR)
    view_proj = proj @ view

    models = model[None]
    world, clip, normals = geometry.transform_vertices(scene, models, view_proj)
    blocks = geometry.build_shade_blocks(scene, world, clip, normals)

    tri_id, depth, setup = raster_scene(
        clip, scene.tri_indices, cfg.width, cfg.height,
        scene.num_triangles, cfg.raster)
    gbuf = deferred.interpolate(tri_id, depth, setup.data, blocks,
                                scene.tri_flags)

    light_dir = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)  # cube.rs:202
    background = jnp.asarray(CUBE_CLEAR, jnp.float32)
    return shading.shade_cube(gbuf, params.camera_pos, light_dir, background)


# ---------------------------------------------------------------------------
# Compile cache: one jitted frame fn per (static config) — the analogue of
# swapchain-recreation re-jitting at a new resolution.
# ---------------------------------------------------------------------------

_CACHE: Dict[Tuple[Any, ...], Any] = {}


def compiled_cube_frame(cfg: FrameConfig):
    key = ("cube", cfg)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(
            functools.partial(render_cube_frame, cfg=cfg))
    return _CACHE[key]
