"""SDF raymarch demo, UI overlay compositing, and the frame driver."""

import numpy as np
import jax.numpy as jnp
import pytest

from funky_tpu.models.sdf import (SdfConfig, compiled_sdf_frame,
                                  default_sdf_camera, scene_sdf)


def test_sdf_scene_distances():
    # ground plane at y=0
    d, mat = scene_sdf(jnp.asarray([5.0, 2.0, 5.0]), jnp.asarray(0.0))
    assert abs(float(d) - 2.0) < 0.2 or float(d) <= 2.0  # min of all objects
    d, mat = scene_sdf(jnp.asarray([8.0, 0.0, 8.0]), jnp.asarray(0.0))
    assert abs(float(d)) < 1e-5 and int(mat) == 0


def test_sdf_render():
    cfg = SdfConfig(width=160, height=96)
    pos, yaw, pitch, fov = default_sdf_camera()
    img = np.asarray(compiled_sdf_frame(cfg)(0.7, pos, yaw, pitch, fov))
    assert img.shape == (96, 160, 4)
    assert np.isfinite(img).all()
    # sky at the top, ground at the bottom
    assert img[0, 80, 2] > img[0, 80, 0]          # bluish sky
    # scene object somewhere near center (warm blob or blue torus)
    center = img[40:70, 60:110, :3]
    assert center.std() > 0.02
    # animation changes the image
    img2 = np.asarray(compiled_sdf_frame(cfg)(2.9, pos, yaw, pitch, fov))
    assert np.abs(img2 - img).max() > 0.05


def test_overlay_rasterize_and_blend():
    from funky_tpu.app.ui import Tessellator
    from funky_tpu.passes.overlay import composite_overlay, rasterize_overlay

    t = Tessellator()
    t.rect(2, 2, 20, 10, (1.0, 0.0, 0.0, 0.5))      # half-transparent red
    verts, uvs, cols, tris, n = t.arrays()
    overlay = rasterize_overlay(jnp.asarray(verts), jnp.asarray(uvs),
                                jnp.asarray(cols), jnp.asarray(tris),
                                jnp.asarray(n), jnp.asarray(t.atlas),
                                (32, 64))
    ov = np.asarray(overlay)
    # inside the rect: premultiplied red at alpha .5
    np.testing.assert_allclose(ov[6, 10], [0.5, 0, 0, 0.5], atol=1e-5)
    np.testing.assert_allclose(ov[20, 40], [0, 0, 0, 0], atol=1e-6)

    frame = jnp.full((48, 80, 4), 0.2, jnp.float32)
    out = np.asarray(composite_overlay(frame, overlay,
                                       jnp.int32(8), jnp.int32(4)))
    # ONE/ONE_MINUS_SRC_ALPHA: 0.5 + 0.2*0.5 = 0.6 red, 0.1 green
    np.testing.assert_allclose(out[10, 18, 0], 0.6, atol=1e-5)
    np.testing.assert_allclose(out[10, 18, 1], 0.1, atol=1e-5)
    # outside the panel: untouched
    np.testing.assert_allclose(out[0, 0], 0.2, atol=1e-6)


def test_ui_text_renders_coverage():
    from funky_tpu.app.ui import Tessellator
    from funky_tpu.passes.overlay import rasterize_overlay

    t = Tessellator()
    t.text(2, 2, "FPS", (1, 1, 1, 1))
    verts, uvs, cols, tris, n = t.arrays()
    ov = np.asarray(rasterize_overlay(
        jnp.asarray(verts), jnp.asarray(uvs), jnp.asarray(cols),
        jnp.asarray(tris), jnp.asarray(n), jnp.asarray(t.atlas), (16, 32)))
    assert ov[..., 3].max() > 0.5          # glyph coverage present
    assert (ov[..., 3] > 0.2).sum() > 10   # several lit texels


def test_ui_panel_and_hits():
    from funky_tpu.app.ui import UiData, build_panel, DebugPanel

    data = UiData(fps=59.9, frame_time_ms=16.7, gltf_scale=0.01,
                  use_pcss=True, use_shadow_taa=False)
    panel = build_panel(data)
    assert len(panel.tris) > 50  # background + text + widgets

    dp = DebugPanel(320, 200)
    img = jnp.full((200, 320, 4), 0.3, jnp.float32)
    out = np.asarray(dp.render_over(img, data))
    assert out.shape == (200, 320, 4)
    # panel darkens its region, leaves the margin above/left of its origin
    assert abs(out[5, 5, 0] - 0.3) < 1e-5
    assert out[20, 40, 0] != 0.3

    # checkbox hit toggles; slider hit sets values in range
    ch = dp.hit(16, 100, data)
    toggles = [v for v in (ch.use_pcss, ch.use_shadow_taa,
                           ch.debug_cascades) if v is not None]
    assert len(toggles) <= 1


def test_driver_end_to_end(duck_gltf_path):
    from funky_tpu.app.camera import Keys
    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.app.ui import UiChanges
    from funky_tpu.frame import GltfConfig
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    drv = FrameDriver(cfg, scene_path=duck_gltf_path, autotune=False)
    drv.step()
    drv.step(keys=[Keys.W, Keys.LEFT])
    img = drv.readback()
    assert img.shape == (128, 256, 3)
    assert np.isfinite(img).all()
    assert drv.frame_count == 2
    assert "FPS" in drv.title()

    # UI changes propagate to ECS resources -> next frame flags
    drv.apply_ui_changes(UiChanges(use_pcss=False, gltf_scale=0.02))
    drv.step()
    ui = drv.ui_data()
    assert ui.use_pcss is False
    assert abs(ui.gltf_scale - 0.02) < 1e-9

    # camera moved under keys
    assert float(np.asarray(drv.camera.position[2])) != 10.0


def test_driver_save_load_state(duck_gltf_path, tmp_path):
    """Checkpoint/resume: saved session state restores bit-exact frames."""
    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.app.camera import Keys
    from funky_tpu.frame import GltfConfig
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    a = FrameDriver(cfg, scene_path=duck_gltf_path, autotune=False)
    a.step(keys=[Keys.W])
    a.step(keys=[Keys.LEFT])
    a.save_state(tmp_path / "session.ckpt")
    img_next_a = np.asarray(a.step())

    b = FrameDriver(cfg, scene_path=duck_gltf_path, autotune=False)
    b.load_state(tmp_path / "session.ckpt")
    img_next_b = np.asarray(b.step())
    np.testing.assert_array_equal(img_next_a, img_next_b)


def test_ui_hit_state_is_per_instance():
    """Two concurrent panels must not clobber each other's hit boxes;
    hit() before the first build is an empty no-op."""
    from funky_tpu.app.ui import DebugPanel, UiData

    data = UiData(use_pcss=True)
    a = DebugPanel(320, 200)
    b = DebugPanel(320, 200)

    # b never rendered: no hit boxes, empty changes
    ch = b.hit(16, 100, data)
    assert all(v is None for v in vars(ch).values())

    img = jnp.full((200, 320, 4), 0.3, jnp.float32)
    a.render_over(img, data)
    assert a._checkboxes and a._sliders
    assert not b._checkboxes and not b._sliders


def test_ui_panel_shows_last_error():
    from funky_tpu.app.ui import UiData, build_panel

    clean = build_panel(UiData())
    dirty = build_panel(UiData(last_error="frame 3: boom"))
    assert len(dirty.tris) > len(clean.tris)


def test_driver_failure_escalation(duck_gltf_path):
    """One-off frame failures skip + recover; persistent failures re-raise
    after max_consecutive_failures, and the error surfaces in UiData."""
    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.frame import GltfConfig
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=128, height=64, shadow_map_size=64,
                     raster=tile, shadow_raster=tile)
    drv = FrameDriver(cfg, scene_path=duck_gltf_path, enable_ui=False, autotune=False)
    drv.step()
    good_fn = drv._frame_fn

    boom = RuntimeError("injected device loss")

    def bad_fn(*a, **k):
        raise boom

    # transient: two failures, then recovery resets the counter
    drv._frame_fn = bad_fn
    drv.step()
    drv.step()
    assert drv.consecutive_failures == 2
    assert "injected device loss" in drv.ui_data().last_error
    drv._frame_fn = good_fn
    drv.step()
    assert drv.consecutive_failures == 0
    assert drv.ui_data().last_error == ""

    # persistent: the third consecutive failure re-raises
    drv._frame_fn = bad_fn
    drv.step()
    drv.step()
    with pytest.raises(RuntimeError, match="injected device loss"):
        drv.step()


def test_shadow_raster_default_capacity_is_safe():
    from funky_tpu.passes.shadow import SHADOW_RASTER_CFG

    assert SHADOW_RASTER_CFG.capacity is None


def test_driver_runtime_retune(duck_gltf_path):
    """A view whose occupancy overflows a sparse capacity pins frames to
    the exact-but-dense fallback; the driver's periodic occupancy check
    must re-derive the capacities (autotune's runtime half) instead of
    staying slow until restart."""
    import dataclasses

    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.frame import GltfConfig
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    drv = FrameDriver(cfg, scene_path=duck_gltf_path, enable_ui=False,
                      autotune=False)
    drv.step()  # prev_depth becomes real for the contact occupancy probe

    # Simulate a post-view-change overflow: clamp the pair capacity far
    # below this view's true pair count (frames stay EXACT — the in-frame
    # lax.cond takes the dense path — just slow).
    drv.autotune = True
    drv.retune_check_every = 1
    drv.retune_after = 2
    drv.cfg = dataclasses.replace(drv.cfg, shadow_pen_capacity=1)

    drv.step()                     # strike 1: overflow seen, no retune yet
    assert drv.retune_count == 0 and drv._overflow_strikes == 1
    drv.step()                     # strike 2: re-derive + cached re-jit
    assert drv.retune_count == 1
    assert drv.cfg.shadow_pen_capacity > 1
    img = np.asarray(drv.step())   # renders fine under the retuned config
    assert np.isfinite(img).all()
    assert drv._overflow_strikes == 0


def test_driver_retune_tightens(duck_gltf_path):
    """The tighten direction (r5): capacities inflated by a past motion
    phase shrink back once measured occupancy sits >= 2x below what
    re-deriving would give — a parked view after motion must recover
    parked gather cost (padded compaction slots gather like real rows)."""
    import dataclasses

    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.frame import GltfConfig
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, capacity=512, backend="jnp")
    cfg = GltfConfig(width=256, height=128, shadow_map_size=128,
                     raster=tile, shadow_raster=tile)
    drv = FrameDriver(cfg, scene_path=duck_gltf_path, enable_ui=False,
                      autotune=False)
    drv.step()  # prev_depth becomes real for the contact occupancy probe

    # Simulate a motion-inflated config: pair capacity far ABOVE this
    # parked view's needs (frames are exact, just padded-slot slow).
    drv.autotune = True
    drv.retune_check_every = 1
    drv.retune_after = 2
    inflated = 1024 * 64
    drv.cfg = dataclasses.replace(drv.cfg, shadow_pen_capacity=inflated)

    drv.step()                     # strike 1: slack seen, no retune yet
    assert drv.retune_count == 0 and drv._slack_strikes == 1
    drv.step()                     # strike 2: re-derive + cached re-jit
    assert drv.retune_count == 1
    assert drv.cfg.shadow_pen_capacity < inflated
    img = np.asarray(drv.step())   # renders fine under the retuned config
    assert np.isfinite(img).all()
    assert drv._slack_strikes == 0
