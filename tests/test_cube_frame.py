"""End-to-end cube demo: analytic golden checks at 512x512 (BASELINE cfg 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from funky_tpu.frame import (CUBE_CLEAR, CubeParams, FrameConfig,
                             compiled_cube_frame, default_cube_params)
from funky_tpu.models.scene import build_cube_scene
from funky_tpu.ops.raster import RasterConfig

CFG = FrameConfig(width=512, height=512,
                  raster=RasterConfig(tile_h=32, tile_w=128, capacity=32,
                                      backend="jnp"))


@pytest.fixture(scope="module")
def cube_image():
    scene = build_cube_scene()
    frame = compiled_cube_frame(CFG)
    img = frame(scene, default_cube_params(rotation=0.0))
    return np.asarray(img)


def test_shape_and_range(cube_image):
    assert cube_image.shape == (512, 512, 4)
    assert np.all(np.isfinite(cube_image))
    assert cube_image.min() >= 0.0


def test_background_color(cube_image):
    # Corners are background (cornflower blue, cube.rs:277).
    np.testing.assert_allclose(cube_image[0, 0, :3], CUBE_CLEAR, atol=1e-6)
    np.testing.assert_allclose(cube_image[-1, -1, :3], CUBE_CLEAR, atol=1e-6)


def test_cube_is_centered_and_covered(cube_image):
    # Camera at (0,0,3) looking at origin, unit cube, fov 45:
    # projected half-size at the front face (z=0.5 -> dist 2.5) is
    # 0.5/2.5 / tan(22.5deg) = 0.4829 in ndc -> ~124 px; cube must cover
    # the center and not the border region.
    bg = np.asarray(CUBE_CLEAR)
    is_cube = np.abs(cube_image[..., :3] - bg).sum(-1) > 1e-5
    assert is_cube[256, 256]
    assert not is_cube[256, 50]
    assert not is_cube[50, 256]
    frac = is_cube.mean()
    # Front face ~ (2*124)^2 px = 23.5% of 512^2.
    assert 0.18 < frac < 0.30


def test_front_face_shading_value(cube_image):
    # At rotation=0 the +Z face points at the camera: N=(0,0,1).
    # light=(1,1,1)/sqrt3, diff=0.577; fill dir normalized z<0 => fill=0;
    # view=(0,0,1); half=normalize(light+view); spec=pow(n.h,64);
    # rim = 0 (n==view). color = teal (0.45,0.70,0.75).
    n = np.array([0.0, 0.0, 1.0])
    light = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    view = np.array([0.0, 0.0, 1.0])
    half = light + view
    half = half / np.linalg.norm(half)
    diff = max(n @ light, 0.0)
    spec = max(n @ half, 0.0) ** 64
    color = np.array([0.45, 0.70, 0.75])
    expected = 0.20 * color + 0.65 * diff * color + 0.4 * spec
    np.testing.assert_allclose(cube_image[256, 256, :3], expected, atol=1e-4)


def test_rotation_changes_image(cube_image):
    scene = build_cube_scene()
    frame = compiled_cube_frame(CFG)
    img2 = np.asarray(frame(scene, default_cube_params(rotation=0.7)))
    assert np.abs(img2 - cube_image).max() > 0.05


def test_depth_order_with_rotation():
    # At a 45deg rotation two faces are visible; the edge between them is
    # at the screen center column; both must be teal-ish (lit cube).
    scene = build_cube_scene()
    frame = compiled_cube_frame(CFG)
    img = np.asarray(frame(scene, default_cube_params(rotation=np.pi / 4)))
    bg = np.asarray(CUBE_CLEAR)
    is_cube = np.abs(img[..., :3] - bg).sum(-1) > 1e-5
    assert is_cube[256, 200] and is_cube[256, 312]
