"""Numeric sanitizers (utils/sanitize): the validation-layer analogue."""

import jax.numpy as jnp
import numpy as np
import pytest

from funky_tpu.utils import sanitize


def test_checked_flags_nan_source():
    def bad(x):
        return jnp.log(x - 2.0)          # log of negatives -> NaN

    with pytest.raises(Exception) as exc:
        sanitize.checked(bad)(jnp.asarray([1.0, 3.0]))
    assert "nan" in str(exc.value).lower()

    def good(x):
        return jnp.sqrt(x * x + 1.0)

    out = sanitize.checked(good)(jnp.asarray([1.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out),
                               np.sqrt([2.0, 10.0]), rtol=1e-6)


def test_assert_finite():
    clean = {"a": jnp.ones((4, 4)), "b": jnp.zeros(3),
             "i": jnp.arange(3)}                 # ints are skipped
    sanitize.assert_finite(clean)
    dirty = {"a": jnp.ones((4, 4)).at[1, 2].set(jnp.nan)}
    with pytest.raises(FloatingPointError, match="non-finite"):
        sanitize.assert_finite(dirty, label="test")


def test_driver_sanitize_mode():
    from funky_tpu.app.driver import FrameDriver
    from funky_tpu.frame import GltfConfig, GltfFrameFlags
    from funky_tpu.ops.raster import RasterConfig

    tile = RasterConfig(tile_h=16, tile_w=128, backend="jnp")
    cfg = GltfConfig(width=128, height=80, shadow_map_size=64,
                     raster=tile, shadow_raster=tile,
                     flags=GltfFrameFlags(enable_shadows=False,
                                          enable_contact_shadows=False))
    drv = FrameDriver(cfg, sanitize=True, enable_ui=False, autotune=False)
    drv.step()                                    # clean frame passes
    # poison the carried state -> the guard must catch it on the next step
    drv.state = drv.state._replace(
        shadow_history=drv.state.shadow_history.at[0, 0, 0].set(jnp.inf))
    with pytest.raises(FloatingPointError):
        drv.step()
