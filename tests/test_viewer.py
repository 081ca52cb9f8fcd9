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
    drv = FrameDriver(cfg, autotune=False)  # ground-only scene
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


def _cell_inside(viewer, fx0, fy0, fw, fh):
    """Find a terminal cell whose pixel mapping lands inside the frame-space
    rect — mirrors how a user aims the pointer at a widget."""
    w, h = viewer.driver.cfg.width, viewer.driver.cfg.height
    cols = min(viewer.cols, w)
    rows = max(2, int(cols * (h / w) * 0.5) * 2)
    for cy in range(1, rows + 1):
        for cx in range(1, cols + 1):
            px, py = viewer._cell_to_pixel(cx, cy)
            if fx0 <= px <= fx0 + fw and fy0 <= py <= fy0 + fh:
                return cx, cy
    return None


def test_mouse_click_toggles_checkbox(viewer):
    """SGR-1006 left click routed through the egui hit test
    (main.rs:475-486)."""
    from funky_tpu.app.ui import PANEL_X, PANEL_Y

    viewer.state.running = True
    viewer.state.minimized = False
    viewer.driver.ui_visible = True
    viewer.step([])
    viewer.driver.readback()                 # builds the panel hit boxes
    bx, by, bw, bh = viewer.driver.ui._checkboxes["debug_cascades"]
    cell = _cell_inside(viewer, bx + PANEL_X, by + PANEL_Y, bw, bh)
    assert cell is not None, "no terminal cell maps inside the checkbox"
    dc0 = viewer.driver.ui_data().debug_cascades
    viewer.feed([f"\x1b[<0;{cell[0]};{cell[1]}M"])
    assert viewer.driver.ui_data().debug_cascades != dc0
    viewer.feed([f"\x1b[<0;{cell[0]};{cell[1]}M"])   # restore


def test_mouse_scroll_zooms_fov(viewer):
    """Wheel -> FOV zoom (main.rs:534-542): scroll up narrows by 0.1 rad,
    release events ('m') are ignored."""
    viewer.state.running = True
    fov0 = viewer.driver.camera.fov
    viewer.feed(["\x1b[<64;4;4M"])           # wheel up press
    assert viewer.driver.camera.fov == pytest.approx(fov0 - 0.1)
    viewer.feed(["\x1b[<64;4;4m"])           # release: no-op
    assert viewer.driver.camera.fov == pytest.approx(fov0 - 0.1)
    viewer.feed(["\x1b[<65;4;4M"])           # wheel down restores
    assert viewer.driver.camera.fov == pytest.approx(fov0)


def test_failed_frame_preserves_taa_history(viewer):
    """One transient frame failure must NOT reset the carried FrameState
    (the reference early-returns with GPU state intact, main.rs:601-613);
    only escalation may."""
    drv = viewer.driver
    viewer.state.running = True
    viewer.state.minimized = False
    viewer.step([])
    state_before = drv.state
    real_fn = drv._frame_fn
    calls = {"n": 0}

    def failing_fn(scene, params, state):
        calls["n"] += 1
        raise RuntimeError("injected transient failure")

    drv._frame_fn = failing_fn
    out = drv.step([])
    drv._frame_fn = real_fn
    assert calls["n"] == 1
    assert drv.consecutive_failures == 1
    assert drv.state is state_before          # history survived untouched
    drv.step([])                              # next frame recovers
    assert drv.consecutive_failures == 0
