"""Golden-image regression: renders must match the committed PNGs.

Regenerate with `python tests/golden_utils.py` after INTENTIONAL visual
changes (and eyeball the diff before committing).
"""

import numpy as np
import pytest

from funky_tpu.models.png_io import linear_to_srgb, read_png

from . import golden_utils as G

TOL = 3.0 / 255.0   # u8 quantization + fp-reordering headroom
MAX_BAD_FRAC = 2e-3  # allow a few edge pixels to flicker


@pytest.mark.parametrize("name", sorted(G.GOLDENS))
def test_golden(name, duck_gltf_path):
    path = G.GOLDEN_DIR / name
    if not path.exists():
        pytest.skip(f"golden {name} not generated")
    want = read_png(path)[..., :3].astype(np.float32) / 255.0
    got = np.asarray(linear_to_srgb(G.GOLDENS[name]()))
    assert got.shape == want.shape
    diff = np.abs(got - want).max(axis=-1)
    bad = (diff > TOL).mean()
    assert bad <= MAX_BAD_FRAC, (
        f"{name}: {bad:.4%} pixels differ > {TOL:.4f} "
        f"(max diff {diff.max():.4f})")
