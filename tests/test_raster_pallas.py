"""Pallas raster kernel regression tests (interpret mode on CPU).

The production TPU path auto-selects the Pallas kernels
(ops/raster.py::_backend); these tests pin their behavior against the jnp
reference path without TPU hardware via pltpu.force_tpu_interpret_mode:
both kernels (pre-gathered blocks + table-resident), the table-size
fallback branch, tight-capacity overflow, and row-slab offsets.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import funky_tpu.ops.raster_pallas as rp
from funky_tpu.ops.raster import RasterConfig, raster_scene

from .test_raster import brute_force, clip_from_screen


def random_scene(seed=0, n_tris=40, width=128, height=64):
    rng = np.random.default_rng(seed)
    v = n_tris * 3
    pts = rng.uniform([-20, -20], [width + 20, height + 20], (v, 2))
    z = rng.uniform(0.05, 0.95, v)
    clip = np.array(clip_from_screen(pts, width, height, z=z))
    # a couple of degenerate / culled triangles
    clip[5] = clip[3]                      # zero-area
    clip[9, 3] = 1e-9                      # w <= eps cull
    tris = np.arange(v, dtype=np.int32).reshape(n_tris, 3)
    return jnp.asarray(clip), tris


def run(clip, tris, width, height, cfg):
    if cfg.backend == "pallas":
        with pltpu.force_tpu_interpret_mode():
            tri_id, depth, _ = raster_scene(
                clip, jnp.asarray(tris), width, height, len(tris), cfg)
            tri_id, depth = np.asarray(tri_id), np.asarray(depth)
    else:
        tri_id, depth, _ = raster_scene(
            clip, jnp.asarray(tris), width, height, len(tris), cfg)
        tri_id, depth = np.asarray(tri_id), np.asarray(depth)
    return tri_id, depth


WIDTH, HEIGHT = 128, 64
JNP = RasterConfig(tile_h=8, tile_w=128, backend="jnp")
PALLAS = RasterConfig(tile_h=8, tile_w=128, backend="pallas")


@pytest.fixture(scope="module")
def scene():
    return random_scene()


def test_table_kernel_matches_jnp(scene):
    """Default on-TPU path: the (T, 16) setup table fits the VMEM budget
    -> table-resident kernel."""
    clip, tris = scene
    assert len(tris) * 64 <= rp.TABLE_VMEM_LIMIT  # really the table path
    id_j, z_j = run(clip, tris, WIDTH, HEIGHT, JNP)
    id_p, z_p = run(clip, tris, WIDTH, HEIGHT, PALLAS)
    np.testing.assert_array_equal(id_p, id_j)
    np.testing.assert_allclose(z_p, z_j, atol=1e-6)
    # and both match the brute-force reference
    id_b, z_b = brute_force(clip, tris, WIDTH, HEIGHT)
    np.testing.assert_array_equal(id_p, id_b)
    np.testing.assert_allclose(z_p, z_b, atol=1e-4)


def test_pregather_kernel_matches_jnp(scene, monkeypatch):
    """Table over the VMEM budget -> pre-gathered per-tile block kernel
    (the fallback branch at ops/raster.py)."""
    clip, tris = scene
    monkeypatch.setattr(rp, "TABLE_VMEM_LIMIT", 0)
    id_j, z_j = run(clip, tris, WIDTH, HEIGHT, JNP)
    id_p, z_p = run(clip, tris, WIDTH, HEIGHT, PALLAS)
    np.testing.assert_array_equal(id_p, id_j)
    np.testing.assert_allclose(z_p, z_j, atol=1e-6)


@pytest.mark.parametrize("force_pregather", [False, True],
                         ids=["table", "pregather"])
def test_tight_capacity_overflow_parity(scene, monkeypatch,
                                        force_pregather):
    """An overflowing bin drops the same triangles in every backend (the
    silent-overflow bug class is at least deterministic + identical)."""
    clip, tris = scene
    if force_pregather:
        monkeypatch.setattr(rp, "TABLE_VMEM_LIMIT", 0)
    tight_j = RasterConfig(tile_h=8, tile_w=128, capacity=4, backend="jnp")
    tight_p = RasterConfig(tile_h=8, tile_w=128, capacity=4,
                           backend="pallas")
    id_j, z_j = run(clip, tris, WIDTH, HEIGHT, tight_j)
    id_p, z_p = run(clip, tris, WIDTH, HEIGHT, tight_p)
    np.testing.assert_array_equal(id_p, id_j)
    np.testing.assert_allclose(z_p, z_j, atol=1e-6)
    # the tight capacity really overflows somewhere (test has teeth)
    full_id, _ = run(clip, tris, WIDTH, HEIGHT, JNP)
    assert (full_id != id_j).any()


@pytest.mark.parametrize("force_pregather", [False, True],
                         ids=["table", "pregather"])
def test_row_slab_offset(scene, monkeypatch, force_pregather):
    """Rastering a row slab (multi-chip sharding path) equals the matching
    rows of the full-frame raster."""
    clip, tris = scene
    if force_pregather:
        monkeypatch.setattr(rp, "TABLE_VMEM_LIMIT", 0)
    full_id, full_z = run(clip, tris, WIDTH, HEIGHT, JNP)
    y0, slab = 32, 16
    with pltpu.force_tpu_interpret_mode():
        tri_id, depth, _ = raster_scene(
            clip, jnp.asarray(tris), WIDTH, HEIGHT, len(tris), PALLAS,
            y_offset=y0, slice_height=slab)
    np.testing.assert_array_equal(np.asarray(tri_id),
                                  full_id[y0:y0 + slab])
    np.testing.assert_allclose(np.asarray(depth), full_z[y0:y0 + slab],
                               atol=1e-6)
