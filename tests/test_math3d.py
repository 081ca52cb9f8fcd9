"""math3d vs glam conventions.

Golden values were derived by hand from the glam formulas the reference
uses (look_at_rh / perspective_rh 0..1 depth / orthographic_rh 0..1 depth /
quaternion Hamilton products), cited per-function in funky_tpu/math3d.py.
"""

import numpy as np
import jax.numpy as jnp

from funky_tpu import math3d as m3


def test_look_at_rh_identity_frame():
    # Camera at origin looking down -Z with +Y up => identity view.
    m = np.asarray(m3.look_at_rh([0, 0, 0], [0, 0, -1], [0, 1, 0]))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_look_at_rh_translation():
    # Camera at (0,0,5): world origin maps to view z=-5.
    m = np.asarray(m3.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0]))
    p = np.asarray(m3.transform_point(jnp.asarray(m), jnp.zeros(3)))
    np.testing.assert_allclose(p, [0, 0, -5], atol=1e-6)


def test_look_at_rh_handedness():
    # Looking down -Z, +X world should stay +X view (right-handed).
    m = m3.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    p = np.asarray(m3.transform_point(m, jnp.array([1.0, 0, 0])))
    np.testing.assert_allclose(p, [1, 0, -5], atol=1e-6)


def test_perspective_rh_depth_range():
    near, far = 0.1, 100.0
    m = m3.perspective_rh(np.pi / 4, 16 / 9, near, far)

    def project(z):
        clip = np.asarray(m3.transform_homogeneous(m, jnp.array([0.0, 0.0, z])))
        return clip[2] / clip[3]

    assert abs(project(-near) - 0.0) < 1e-6     # near plane -> ndc z=0
    assert abs(project(-far) - 1.0) < 1e-5      # far plane  -> ndc z=1
    assert project(-1.0) > 0 and project(-1.0) < 1


def test_perspective_vk_y_flip():
    m = np.asarray(m3.perspective_vk(np.pi / 4, 1.0, 0.1, 100.0))
    m0 = np.asarray(m3.perspective_rh(np.pi / 4, 1.0, 0.1, 100.0))
    assert m[1, 1] == -m0[1, 1]
    # A point above center (world +Y in view space) lands at ndc y < 0
    # => top of the image in row-major framebuffers, matching Vulkan.
    clip = np.asarray(m3.transform_homogeneous(
        jnp.asarray(m), jnp.array([0.0, 1.0, -5.0])))
    assert clip[1] / clip[3] < 0


def test_orthographic_rh_depth_and_extent():
    m = m3.orthographic_rh(-10, 10, -5, 5, 1.0, 50.0)

    def ndc(p):
        clip = np.asarray(m3.transform_homogeneous(m, jnp.asarray(p, jnp.float32)))
        return clip[:3] / clip[3]

    np.testing.assert_allclose(ndc([10, 5, -1.0]), [1, 1, 0], atol=1e-6)
    np.testing.assert_allclose(ndc([-10, -5, -50.0]), [-1, -1, 1], atol=1e-6)


def test_quat_rotation_y():
    q = m3.quat_from_rotation_y(np.pi / 2)
    r = m3.mat3_from_quat(q)
    # +X rotates to -Z under a +90deg yaw (right-hand rule about +Y).
    p = np.asarray(r @ jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, -1], atol=1e-6)


def test_quat_mul_order():
    # YXZ euler == qy * qx * qz applied right-to-left.
    qy = m3.quat_from_rotation_y(0.3)
    qx = m3.quat_from_rotation_x(0.5)
    qz = m3.quat_from_rotation_z(-0.2)
    q = m3.quat_from_euler_yxz(0.3, 0.5, -0.2)
    q2 = m3.quat_mul(m3.quat_mul(qy, qx), qz)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)
    r = np.asarray(m3.mat3_from_quat(q))
    ry = np.asarray(m3.mat3_from_quat(qy))
    rx = np.asarray(m3.mat3_from_quat(qx))
    rz = np.asarray(m3.mat3_from_quat(qz))
    np.testing.assert_allclose(r, ry @ rx @ rz, atol=1e-6)


def test_scale_rotation_translation_compose():
    q = m3.quat_from_rotation_y(np.pi)  # duck's 180deg turn
    m = np.asarray(m3.mat4_from_scale_rotation_translation(
        0.01, q, jnp.array([0.0, 1.0, 0.0])))
    p = np.asarray(m3.transform_point(jnp.asarray(m), jnp.array([100.0, 0.0, 0.0])))
    np.testing.assert_allclose(p, [-1.0, 1.0, 0.0], atol=1e-5)


def test_camera_front_matches_default_camera():
    # Reference default camera: pos (0,2.5,10) looking at (0,0.6,0)
    # (main.rs:119-127). yaw/pitch derived there must reproduce direction.
    position = np.array([0.0, 2.5, 10.0])
    target = np.array([0.0, 0.6, 0.0])
    d = target - position
    d = d / np.linalg.norm(d)
    yaw = np.arctan2(d[2], d[0])
    pitch = np.arcsin(d[1])
    f = np.asarray(m3.camera_front(yaw, pitch))
    np.testing.assert_allclose(f, d, atol=1e-6)


def test_transform_homogeneous_w():
    m = m3.perspective_rh(np.pi / 3, 1.0, 0.1, 100.0)
    clip = np.asarray(m3.transform_homogeneous(m, jnp.array([0.0, 0.0, -2.0])))
    assert abs(clip[3] - 2.0) < 1e-6  # w' = -z_view
