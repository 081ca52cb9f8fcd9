"""Terminal viewer: the event-loop behaviors of main.rs:470-567 mapped to
scripted key events (ESC, F3, F11, minimize, egui key consumption)."""

import numpy as np
import pytest

from funky_tpu.app.driver import FrameDriver
from funky_tpu.app.viewer import TerminalViewer
from funky_tpu.frame import GltfConfig, GltfFrameFlags
from funky_tpu.ops.raster import RasterConfig


@pytest.fixture(scope="module")
def viewer():
    tile = RasterConfig(tile_h=16, tile_w=128, backend="jnp")
    cfg = GltfConfig(width=128, height=80, shadow_map_size=64,
                     raster=tile, shadow_raster=tile,
                     flags=GltfFrameFlags(enable_shadows=False,
                                          enable_contact_shadows=False))
    drv = FrameDriver(cfg)          # ground-only scene
    return TerminalViewer(drv, cols=32, fullscreen_size=(256, 160))


def test_esc_exits(viewer):
    viewer.state.running = True
    assert viewer.step(["\x1b"]) is None
    assert not viewer.state.running
    viewer.state.running = True


def test_minimize_skips_frames(viewer):
    viewer.state.running = True
    before = viewer.driver.frame_count
    assert viewer.step(["n"]) is None               # minimize: no render
    assert viewer.driver.frame_count == before
    viewer.step(["n"])                              # restore renders again
    assert viewer.driver.frame_count == before + 1


def test_camera_keys_move(viewer):
    viewer.state.running = True
    pos0 = np.array(viewer.driver.camera.position, copy=True)
    viewer.step(["w"], dt=0.1)
    assert not np.allclose(viewer.driver.camera.position, pos0)


def test_ui_focus_consumes_keys(viewer):
    """egui keyboard consumption (main.rs:475-486): with panel focus the
    camera must NOT move, and widget keys mutate UI state."""
    viewer.state.running = True
    viewer.step([])                                  # ensure a frame exists
    viewer.feed(["\t"])                              # focus the panel
    pos0 = np.array(viewer.driver.camera.position, copy=True)
    soft0 = viewer.driver.ui_data().shadow_softness
    viewer.step(["j", "+", "w"], dt=0.1)             # j -> softness widget
    assert np.allclose(viewer.driver.camera.position, pos0)
    assert viewer.driver.ui_data().shadow_softness > soft0
    # checkbox toggle
    viewer.feed(["j"])                               # -> debug_cascades
    dc0 = viewer.driver.ui_data().debug_cascades
    viewer.feed([" "])
    assert viewer.driver.ui_data().debug_cascades != dc0
    viewer.feed([" "])                               # restore
    viewer.feed(["\t"])                              # unfocus
    viewer.step(["w"], dt=0.1)
    assert not np.allclose(viewer.driver.camera.position, pos0)


def test_f3_toggles_panel(viewer):
    viewer.state.running = True
    vis = viewer.driver.ui_visible
    viewer.feed(["3"])
    assert viewer.driver.ui_visible != vis
    viewer.feed(["3"])


def test_fullscreen_toggle_resizes(viewer):
    viewer.state.running = True
    viewer.feed(["f"])
    assert (viewer.driver.cfg.width, viewer.driver.cfg.height) == (256, 160)
    viewer.step([])
    img = viewer.driver.readback()
    assert img.shape[:2] == (160, 256)
    viewer.feed(["f"])
    assert (viewer.driver.cfg.width, viewer.driver.cfg.height) == (128, 80)
    viewer.step([])


def test_render_ansi(viewer):
    viewer.state.running = True
    viewer.step([])
    s = viewer.render_ansi()
    lines = s.split("\n")
    assert all("▀" in ln for ln in lines)
    assert "\x1b[38;2;" in s
