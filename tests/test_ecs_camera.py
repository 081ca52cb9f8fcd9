"""ECS world/systems + fly-camera semantics (components #2/#3)."""

import math

import numpy as np

from funky_tpu import ecs
from funky_tpu.app.camera import (MAX_PITCH, CameraController, Keys,
                                  apply_scroll_zoom, update_camera)


def test_world_spawn_query_despawn():
    w = ecs.World()
    e1 = w.spawn(ecs.Transform(), ecs.Velocity())
    w.spawn(ecs.Transform())
    assert w.entity_count() == 2
    assert w.component_count() == 3
    pairs = list(w.query(ecs.Transform, ecs.Velocity))
    assert len(pairs) == 1 and pairs[0][0] == e1
    w.despawn(e1)
    assert w.entity_count() == 1
    assert list(w.query(ecs.Transform, ecs.Velocity)) == []


def test_rotation_system_integrates_yaw():
    """main.rs:188-200: YXZ euler rates integrate into the quaternion."""
    w = ecs.World()
    w.insert_resource(ecs.FrameTiming(delta_time=0.5))
    t = ecs.Transform()
    v = ecs.Velocity(angular=np.array([0.0, math.pi, 0.0], np.float32))
    w.spawn(t, v)
    ecs.rotation_system(w)
    # half a second at pi rad/s => 90 deg yaw: q = (0, sin45, 0, cos45)
    np.testing.assert_allclose(
        t.rotation, [0, math.sin(math.pi / 4), 0, math.cos(math.pi / 4)],
        atol=1e-6)


def test_rotation_system_linear_velocity():
    w = ecs.World()
    w.insert_resource(ecs.FrameTiming(delta_time=0.25))
    t = ecs.Transform()
    v = ecs.Velocity(linear=np.array([4.0, 0.0, -8.0], np.float32))
    w.spawn(t, v)
    ecs.rotation_system(w)
    np.testing.assert_allclose(t.position, [1.0, 0.0, -2.0], atol=1e-6)


def test_camera_defaults_look_at_duck():
    c = CameraController()
    # default spawn looks from (0,2.5,10) at (0,0.6,0) (main.rs:119-127)
    d = np.array([0.0, 0.6, 0.0]) - c.position
    d /= np.linalg.norm(d)
    assert abs(math.atan2(d[2], d[0]) - c.yaw) < 1e-6
    assert abs(math.asin(d[1]) - c.pitch) < 1e-6


def test_camera_wasd_ground_projected():
    """Forward motion ignores pitch's vertical component
    (main.rs:287-297: forward.y forced to 0)."""
    c = CameraController()
    y0 = float(c.position[1])
    c2 = update_camera(c, [Keys.W], 1.0)
    assert abs(float(c2.position[1]) - y0) < 1e-6     # no vertical drift
    moved = np.linalg.norm(np.asarray(c2.position) - np.asarray(c.position))
    assert abs(moved - c.move_speed) < 1e-5


def test_camera_strafe_perpendicular():
    c = CameraController()
    cw = update_camera(c, [Keys.W], 0.1)
    ca = update_camera(c, [Keys.A], 0.1)
    fwd = np.asarray(cw.position) - np.asarray(c.position)
    left = np.asarray(ca.position) - np.asarray(c.position)
    assert abs(float(fwd @ left)) < 1e-6


def test_camera_pitch_clamp_and_yaw_wrap():
    c = CameraController()
    for _ in range(100):
        c = update_camera(c, [Keys.UP, Keys.RIGHT], 0.5)
    assert abs(c.pitch - MAX_PITCH) < 1e-6
    assert 0.0 <= c.yaw < 2 * math.pi


def test_camera_fov_zoom_clamped():
    c = CameraController()
    for _ in range(100):
        c = update_camera(c, [Keys.Z], 1.0)
    assert abs(c.fov - math.radians(10.0)) < 1e-6
    for _ in range(300):
        c = update_camera(c, [Keys.X], 1.0)
    assert abs(c.fov - math.radians(120.0)) < 1e-6


def test_scroll_zoom():
    """main.rs:534-541: fov -= 0.1 per line, clamped."""
    c = CameraController()
    c2 = apply_scroll_zoom(c, 1.0)
    assert abs((c.fov - 0.1) - c2.fov) < 1e-9
    c3 = apply_scroll_zoom(c, -1000.0)
    assert abs(c3.fov - math.radians(120.0)) < 1e-9


def test_qe_vertical():
    c = CameraController()
    up = update_camera(c, [Keys.E], 0.2)
    down = update_camera(c, [Keys.Q], 0.2)
    assert float(up.position[1]) > float(c.position[1])
    assert float(down.position[1]) < float(c.position[1])
