"""Sparse-exact shadow filtering: compaction utils, classification
soundness, and bit-parity of the sparse frame vs the dense path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funky_tpu.frame import (GltfConfig, GltfFrameFlags,
                             compiled_gltf_frame, default_gltf_params,
                             init_frame_state)
from funky_tpu.models.gltf import GltfScene
from funky_tpu.models.scene import build_device_scene
from funky_tpu.ops.compact import (compact_indices, gather_rows,
                                   scatter_back)
from funky_tpu.ops.raster import RasterConfig
from funky_tpu.ops.sampling import quad_pack
from funky_tpu.passes import shadow_classify


# ---------------------------------------------------------------------------
# ops/compact.py
# ---------------------------------------------------------------------------

def test_compact_roundtrip():
    mask = np.zeros((8, 16), bool)
    mask[2, 3] = mask[5, 1] = mask[7, 15] = True
    comp = compact_indices(jnp.asarray(mask), capacity=8)
    assert int(comp.count) == 3
    idx = np.asarray(comp.idx)
    np.testing.assert_array_equal(idx[:3], [2 * 16 + 3, 5 * 16 + 1,
                                            7 * 16 + 15])
    assert (idx[3:] == -1).all()

    table = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8 * 16, 1)
    rows = gather_rows(table, comp)
    np.testing.assert_array_equal(np.asarray(rows[:3, 0]),
                                  [35.0, 81.0, 127.0])

    dense = jnp.full((8 * 16, 1), -1.0)
    out = scatter_back(dense, comp, rows * 2.0)
    out = np.asarray(out).reshape(8, 16)
    assert out[2, 3] == 70.0 and out[5, 1] == 162.0 and out[7, 15] == 254.0
    assert (out == -1.0).sum() == 8 * 16 - 3


def test_compact_overflow_and_groups():
    mask = jnp.ones((4, 4), bool)
    comp = compact_indices(mask, capacity=5)
    assert int(comp.count) == 16          # true count exceeds capacity
    assert int(comp.slot_valid.sum()) == 5
    key = jnp.asarray(np.arange(16).reshape(4, 4) % 3, jnp.int32)
    comp_g = compact_indices(mask, capacity=16, group_key=key)
    keys_sorted = np.asarray(key).ravel()[np.asarray(comp_g.idx)]
    assert (np.diff(keys_sorted) >= 0).all()


def test_compact_group_keys_near_int32_max():
    """Grouped compaction must stay correct for group keys up to
    INT32_MAX - 1 on any domain size (round-2 ADVICE: the old composite
    `group_key * n + arange` key overflowed int32 once
    (max_group + 1) * n >= 2^31 and silently mis-ordered; the stable
    single-key argsort has no such precondition)."""
    rng = np.random.default_rng(7)
    n = 4096
    mask_np = rng.random(n) < 0.3
    # Huge spread keys: the old composite formula would overflow for any
    # of these (key * n alone exceeds 2^31).
    key_np = rng.choice(
        np.asarray([0, 1, 2 ** 20, 2 ** 30, 2 ** 31 - 2], np.int32), n)
    comp = compact_indices(jnp.asarray(mask_np), capacity=n,
                           group_key=jnp.asarray(key_np))
    idx = np.asarray(comp.idx)
    sel = idx[np.asarray(comp.slot_valid)]
    assert int(comp.count) == mask_np.sum()
    assert sorted(sel) == list(np.nonzero(mask_np)[0])  # exact set
    keys_sel = key_np[sel]
    assert (np.diff(keys_sel.astype(np.int64)) >= 0).all()  # grouped
    # raster order within each group (stable sort)
    for k in np.unique(keys_sel):
        grp = sel[keys_sel == k]
        assert (np.diff(grp) > 0).all()


def test_group_key_collision_overflows():
    """A selected element whose group key equals INT32_MAX (the padding
    key) cannot be distinguished from padding — compaction must FORCE the
    callers' overflow check to fail (count > any capacity) so their
    lax.cond takes the exact dense fallback, instead of silently
    selecting wrong elements (VERDICT r3 item 9)."""
    from funky_tpu.ops.compact import compact_indices_blocked

    n = 256
    mask_np = np.zeros(n, bool)
    mask_np[7] = mask_np[100] = True
    key_np = np.zeros(n, np.int32)
    key_np[100] = np.iinfo(np.int32).max
    comp = compact_indices(jnp.asarray(mask_np), capacity=64,
                           group_key=jnp.asarray(key_np))
    assert int(comp.count) > 64              # forces the fallback branch

    blocked = compact_indices_blocked(
        jnp.asarray(mask_np).reshape(16, 16), 64, 8, 8, 8,
        group_key=jnp.asarray(key_np).reshape(16, 16))
    assert int(blocked.comp.count) > 64

    # Benign keys (including INT32_MAX - 1) stay exact.
    key_np[100] = np.iinfo(np.int32).max - 1
    comp = compact_indices(jnp.asarray(mask_np), capacity=64,
                           group_key=jnp.asarray(key_np))
    assert int(comp.count) == 2
    sel = np.asarray(comp.idx)[np.asarray(comp.slot_valid)]
    assert sorted(sel) == [7, 100]


# ---------------------------------------------------------------------------
# Classification soundness: conservative by construction, checked by brute
# force on random maps.
# ---------------------------------------------------------------------------

def _sloped_maps(key, l=2, s=256, slope=0.0001):
    """Ground-plane-like cascades: depth slopes across uv (the case that
    defeats naive min/max classification) plus a nearer occluder blob.
    Returns (maps, planes): the matching uv-space analytic planes the
    anchor-residual bounds are measured against."""
    x = jnp.arange(s, dtype=jnp.float32)
    base = 0.5 + slope * x[None, None, :] + slope * 0.3 * x[None, :, None]
    maps = jnp.broadcast_to(base, (l, s, s))
    maps = maps.at[:, 60:180, 80:200].set(0.25)          # occluder blob
    noise = jax.random.uniform(key, (l, s, s)) * 1e-5
    # texel x = u*s - 0.5  =>  base(u, v) in uv coordinates:
    planes = jnp.tile(jnp.asarray(
        [[slope * s, 0.3 * slope * s,
          0.5 - 0.5 * slope - 0.15 * slope]], jnp.float32), (l, 1))
    return jnp.clip(maps + noise, 0.0, 1.0), planes


def _test_uniforms(s, softness):
    from funky_tpu.passes.uniforms import FrameUniforms

    return FrameUniforms(
        view=jnp.eye(4), proj=jnp.eye(4), view_proj=jnp.eye(4),
        camera_pos=jnp.zeros(3), light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_view_proj=jnp.zeros((4, 4, 4)), cascade_splits=jnp.zeros(4),
        shadow_map_size=jnp.asarray([s, s, 1 / s, 1 / s], jnp.float32),
        debug_flags=jnp.zeros(4),
        shadow_bias=jnp.asarray([softness, 0, 0, 0]),
        prev_view_proj=jnp.eye(4), models=jnp.zeros((2, 4, 4)))


@pytest.mark.parametrize("use_pcss", [True, False], ids=["pcss", "pcf"])
def test_classification_sound_vs_exact_taps(use_pcss):
    from funky_tpu.passes.shadow_filter import _pcf_taps, _pcss_taps

    key = jax.random.PRNGKey(3)
    maps, planes = _sloped_maps(key)
    s = maps.shape[1]
    cmaps = shadow_classify.build_class_maps(maps, coarse=8,
                                             max_softness=4.0,
                                             planes=planes)
    packed = jax.vmap(quad_pack)(maps)

    n = 8192
    ks = jax.random.split(key, 4)
    uv = jax.random.uniform(ks[0], (n, 2), minval=0.02, maxval=0.98)
    layer = jax.random.randint(ks[2], (n,), 0, 2)
    phi = jax.random.uniform(ks[3], (n,)) * 6.2831853
    # Receivers relative to the stored surface at each sample's texel:
    # on-surface-with-bias (ground pixels), deep below (occluded pixels),
    # and marginal offsets around the relief scale.
    px = jnp.floor(uv * s).astype(jnp.int32)
    anchor = maps[layer, px[:, 1], px[:, 0]]
    delta = jnp.select(
        [jnp.arange(n) % 3 == 0, jnp.arange(n) % 3 == 1],
        [jnp.full(n, -0.0012), jnp.full(n, 0.15)],
        (jax.random.uniform(ks[1], (n,)) - 0.5) * 0.02)
    recv = anchor + delta

    softness = jnp.float32(2.5)
    uni = _test_uniforms(s, softness)

    lit, umbra = shadow_classify.classify(cmaps, layer, uv, recv, softness,
                                          use_pcss)
    lit, umbra = np.asarray(lit), np.asarray(umbra)

    if use_pcss:
        m1, m2, pen, hasb = jax.jit(_pcss_taps)(uni, packed, layer, uv,
                                                recv, phi)
        m1, m2, hasb = (np.asarray(m1), np.asarray(m2), np.asarray(hasb))
        # LIT => fully lit whether or not blockers exist (gltf.frag:402,
        # 420-423: no blockers -> 1; else all compares pass -> m1 = 1).
        np.testing.assert_allclose(np.where(hasb, m1, 1.0)[lit], 1.0)
        np.testing.assert_allclose(np.where(hasb, m2, 1.0)[lit], 1.0)
        # UMBRA => blockers exist and every compare is shadowed.
        assert hasb[umbra].all()
        np.testing.assert_allclose(m1[umbra], 0.0)
        np.testing.assert_allclose(m2[umbra], 0.0)
    else:
        pm1, pm2, _ = jax.jit(_pcf_taps)(uni, packed, layer, uv, recv, phi)
        pm1, pm2 = np.asarray(pm1), np.asarray(pm2)
        np.testing.assert_allclose(pm1[lit], 1.0)
        np.testing.assert_allclose(pm2[lit], 1.0)
        np.testing.assert_allclose(pm1[umbra], 0.0)
        np.testing.assert_allclose(pm2[umbra], 0.0)

    # The classes are non-trivial on this map (the test has teeth) —
    # crucially, LIT fires on the SLOPED surface with on-surface receivers.
    assert lit.sum() > 500 and umbra.sum() > 500
    assert (~lit & ~umbra).sum() > 100


def test_classification_respects_softness_budget():
    key = jax.random.PRNGKey(0)
    maps, planes = _sloped_maps(key)
    cmaps = shadow_classify.build_class_maps(maps, coarse=8,
                                             max_softness=2.0,
                                             planes=planes)
    uv = jnp.asarray([[0.5, 0.5]])
    recv = jnp.asarray([0.9])
    layer = jnp.asarray([0])
    lit, umbra = shadow_classify.classify(cmaps, layer, uv, recv,
                                          jnp.float32(3.0), True)
    assert not bool(lit[0]) and not bool(umbra[0])


# ---------------------------------------------------------------------------
# End-to-end: sparse frame == dense frame (bit parity modulo capacity).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def duck_setup(duck_gltf_path):
    duck = GltfScene.load(duck_gltf_path)
    scene = build_device_scene(duck)
    tile = RasterConfig(tile_h=16, tile_w=128, capacity=4352, backend="jnp")
    cfg = GltfConfig(width=256, height=144, shadow_map_size=256,
                     raster=tile, shadow_raster=tile)
    params = default_gltf_params(gltf_min_y=float(duck.bounds_min[1]))
    return scene, cfg, params


def _run(scene, cfg, params, frames=3):
    frame = compiled_gltf_frame(cfg)
    state = init_frame_state(cfg)
    for _ in range(frames):
        rgba, state = frame(scene, params, state)
    return np.asarray(rgba), state


@pytest.mark.parametrize("flags", [
    GltfFrameFlags(),
    GltfFrameFlags(use_pcss=False),
    GltfFrameFlags(use_shadow_taa=False),
    GltfFrameFlags(debug_cascades=True),
], ids=["pcss", "pcf", "no-taa", "debug"])
def test_sparse_matches_dense(duck_setup, flags):
    scene, cfg, params = duck_setup
    sparse_cfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(flags, sparse_shadows=True),
        shadow_pen_capacity=256 * 144)          # ample: no overflow
    dense_cfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(flags, sparse_shadows=False))
    img_s, st_s = _run(scene, sparse_cfg, params)
    img_d, st_d = _run(scene, dense_cfg, params)
    np.testing.assert_allclose(img_s, img_d, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_s.shadow_history),
                               np.asarray(st_d.shadow_history), atol=1e-6)


def test_sparse_default_capacity_exact(duck_setup):
    """At default capacity the image is exact whether or not the
    penumbra count fits (overflow -> dense lax.cond fallback)."""
    scene, cfg, params = duck_setup
    img_s, _ = _run(scene, dataclasses.replace(
        cfg, flags=GltfFrameFlags(sparse_shadows=True)), params)
    img_d, _ = _run(scene, dataclasses.replace(
        cfg, flags=GltfFrameFlags(sparse_shadows=False)), params)
    np.testing.assert_allclose(img_s, img_d, atol=1e-6)


def test_sparse_overflow_falls_back_exact(duck_setup):
    """A deliberately tiny capacity must still produce the exact image via
    the dense fallback branch."""
    scene, cfg, params = duck_setup
    tiny = dataclasses.replace(cfg, shadow_pen_capacity=64,
                               contact_capacity=64)
    dense_cfg = dataclasses.replace(
        cfg, flags=GltfFrameFlags(sparse_shadows=False,
                                  sparse_contact=False))
    img_t, _ = _run(scene, tiny, params)
    img_d, _ = _run(scene, dense_cfg, params)
    np.testing.assert_allclose(img_t, img_d, atol=1e-6)


def test_contact_sparse_matches_dense_with_hits():
    """Pyramid classification never rules out a pixel whose exact march
    intersects: sparse == dense on a scene with real occlusion (the
    near-wall setup of test_taa_contact.py)."""
    from funky_tpu.passes import contact

    from .test_taa_contact import _uniforms, _world_grid

    uni = _uniforms()
    n = 16
    world = _world_grid(uni, n)
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, n, 1)).astype(
        jnp.float32)
    hom = jnp.concatenate([world + 0.01 * normal, jnp.ones((n, n, 1))], -1)
    clip = jnp.einsum("ij,hwj->hwi", uni.proj @ uni.view, hom)
    z_surface = clip[..., 2] / clip[..., 3]
    near, far = 0.1, 100.0
    d_surface = near * far / (far - z_surface * (far - near))
    d_stored = jnp.mean(d_surface) - 0.03
    z_stored = far * (d_stored - near) / (d_stored * (far - near))
    depth = jnp.full((n, n), float(z_stored), jnp.float32)

    dense = np.asarray(jax.jit(contact.compute_contact_shadow)(
        world, normal, uni, depth))
    sparse = np.asarray(jax.jit(
        lambda *a: contact.compute_contact_shadow_sparse(
            *a, capacity=n * n))(world, normal, uni, depth))
    np.testing.assert_allclose(sparse, dense, atol=1e-6)
    assert (dense < 1.0).any()     # the occluder casts something


def test_sparse_softness_above_budget_still_exact(duck_setup):
    scene, cfg, params = duck_setup
    params = dataclasses.replace(
        params, shadow_softness=jnp.asarray(6.0, jnp.float32))
    sparse_cfg = dataclasses.replace(cfg, max_softness=4.0,
                                     shadow_pen_capacity=2 * 256 * 144)
    dense_cfg = dataclasses.replace(
        cfg, flags=GltfFrameFlags(sparse_shadows=False))
    img_s, _ = _run(scene, sparse_cfg, params)
    img_d, _ = _run(scene, dense_cfg, params)
    # flat-batch taps fuse differently than the (H, W) dense path: allow
    # fp-reorder noise (observed 2 px at ~3e-6 relative)
    np.testing.assert_allclose(img_s, img_d, atol=2e-5)


def test_blocked_compaction_same_set():
    """compact_indices_blocked selects exactly the same element set as
    compact_indices (order may differ), keeps group contiguity, and
    reports true counts."""
    from funky_tpu.ops.compact import compact_indices_blocked

    rng = np.random.default_rng(11)
    mask = np.zeros((2, 32, 64), bool)
    # clustered blobs + a few isolated pixels
    mask[0, 4:9, 10:20] = True
    mask[1, 20:25, 40:55] = rng.random((5, 15)) > 0.4
    mask[0, 31, 63] = True
    gk = rng.integers(0, 4, mask.shape).astype(np.int32)
    mask_j, gk_j = jnp.asarray(mask), jnp.asarray(gk)

    plain = compact_indices(mask_j, 4096, group_key=gk_j)
    blocked = compact_indices_blocked(mask_j, 4096, 8, 8, 64,
                                      group_key=gk_j)
    comp = blocked.comp
    assert int(comp.count) == int(plain.count) == mask.sum()
    got = np.sort(np.asarray(comp.idx)[np.asarray(comp.slot_valid)])
    want = np.sort(np.asarray(plain.idx)[np.asarray(plain.slot_valid)])
    np.testing.assert_array_equal(got, want)
    # group-contiguous: keys of selected entries are non-decreasing
    keys = gk.ravel()[np.asarray(comp.idx)[np.asarray(comp.slot_valid)]]
    assert (np.diff(keys) >= 0).all()
    # block-overflow detection
    tiny = compact_indices_blocked(mask_j, 4096, 8, 8, 2)
    assert int(tiny.block_count) > 2


def test_light_ground_planes_reproduce_ortho_depth():
    """The fitted uv-space plane reproduces the true NDC depth of y=0
    points under an ortho light matrix (the anchor-bound reference)."""
    from funky_tpu.passes.shadow_classify import light_ground_planes
    from funky_tpu.passes.uniforms import compute_uniforms

    uni = compute_uniforms(
        camera_pos=jnp.asarray([0.0, 2.5, 10.0]),
        camera_yaw=jnp.asarray(-1.5), camera_pitch=jnp.asarray(-0.2),
        camera_fov=jnp.asarray(0.785), aspect_ratio=16 / 9,
        duck_position=jnp.zeros(3), duck_scale=jnp.asarray(0.01),
        prev_view_proj=jnp.eye(4), has_prev=jnp.zeros((), bool),
        frame_index=jnp.zeros((), jnp.int32), debug_cascades=False,
        use_pcss=True, use_shadow_taa=True,
        shadow_softness=jnp.asarray(2.5), shadow_map_size=512)
    planes = np.asarray(light_ground_planes(uni.light_view_proj))

    rng = np.random.default_rng(3)
    pts = np.stack([rng.uniform(-5, 5, 32), np.zeros(32),
                    rng.uniform(-5, 5, 32)], -1).astype(np.float32)
    hom = np.concatenate([pts, np.ones((32, 1), np.float32)], -1)
    for c in range(4):
        clip = hom @ np.asarray(uni.light_view_proj[c]).T
        ndc = clip[:, :3] / clip[:, 3:4]
        uv = ndc[:, :2] * 0.5 + 0.5
        pred = planes[c, 0] * uv[:, 0] + planes[c, 1] * uv[:, 1] \
            + planes[c, 2]
        np.testing.assert_allclose(pred, ndc[:, 2], atol=2e-5)


def test_contact_fit_ground_plane_reproduces_depth():
    """contact.fit_ground_plane: screen-space plane matches projected
    y=0 points (the residual-certificate reference surface)."""
    from funky_tpu import math3d as m3
    from funky_tpu.passes.contact import fit_ground_plane

    view = m3.look_at_rh(jnp.asarray([0.0, 2.5, 10.0]),
                         jnp.asarray([0.0, 0.6, 0.0]),
                         jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective_vk(jnp.float32(0.785), 16 / 9, 0.1, 100.0)
    vp = proj @ view
    w, h = 640, 360
    plane = np.asarray(fit_ground_plane(vp, w, h,
                                        jnp.asarray([0.0, 2.5, 10.0])))

    rng = np.random.default_rng(5)
    pts = np.stack([rng.uniform(-3, 3, 32), np.zeros(32),
                    rng.uniform(-6, 4, 32)], -1).astype(np.float32)
    hom = np.concatenate([pts, np.ones((32, 1), np.float32)], -1)
    clip = hom @ np.asarray(vp).T
    keep = clip[:, 3] > 0.5               # well in front of the camera
    ndc = clip[keep, :3] / clip[keep, 3:4]
    px = (ndc[:, 0] + 1) * 0.5 * w
    py = (ndc[:, 1] + 1) * 0.5 * h
    pred = plane[0] * px + plane[1] * py + plane[2]
    np.testing.assert_allclose(pred, ndc[:, 2], atol=5e-5)


def test_tap_windows_match_full_table(duck_setup):
    """Windowed per-cascade tap tables (dynamic-sliced sub-tables) read the
    exact same texels as the full-table path: images match."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    win = dataclasses.replace(base,
                              shadow_tap_windows=(192, 192, 192, 192))
    img_w, st_w = _run(scene, win, params)
    img_f, st_f = _run(scene, base, params)
    np.testing.assert_allclose(img_w, img_f, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_w.shadow_history),
                               np.asarray(st_f.shadow_history), atol=1e-6)


def test_tap_window_overflow_falls_back_exact(duck_setup):
    """Taps that do not fit a (deliberately tiny) window take the
    full-table branch per cascade: the image never depends on the window
    size."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    tiny = dataclasses.replace(base, shadow_tap_windows=(8, 8, 8, 8))
    img_t, _ = _run(scene, tiny, params)
    img_f, _ = _run(scene, base, params)
    np.testing.assert_allclose(img_t, img_f, atol=1e-6)


def test_tap_windows_committed_match(duck_setup):
    """Committed mode elides the window-fit cond (r5): with windows that
    FIT, the committed windowed frame reads the same texels — output
    agrees with the committed full-table frame within the documented
    cross-program fp envelope (tests/test_committed.py)."""
    scene, cfg, params = duck_setup
    com = dataclasses.replace(
        cfg, shadow_pen_capacity=256 * 144,
        flags=dataclasses.replace(cfg.flags, committed=True))
    win = dataclasses.replace(com,
                              shadow_tap_windows=(192, 192, 192, 192))
    img_w, _ = _run(scene, win, params)
    img_f, _ = _run(scene, com, params)
    np.testing.assert_allclose(img_w, img_f, atol=0.02)
    assert np.mean(np.abs(img_w - img_f)) < 1e-3


def test_contact_march_window_committed_bounded_and_polled(duck_setup):
    """Committed-mode contact march window (r5) contract at a window
    SMALLER than the stage-3 probe bbox (at this 256x144 config the
    border-band rays spread the bbox to 262 px, so no in-frame window
    fits — autotune would derive None): out-of-window probes clamp to
    the window edge, a BOUNDED local artifact (a handful of pixels, not
    a structural change), and the driver's poll flags the overflow via
    contact_march_extent."""
    from funky_tpu.utils.autotune import capacity_overflows
    from funky_tpu.utils.diagnostics import measure_sparse_occupancy

    scene, cfg, params = duck_setup
    com = dataclasses.replace(
        cfg, flags=dataclasses.replace(cfg.flags, committed=True))
    win = dataclasses.replace(com, contact_window=128)
    img_w, _ = _run(scene, win, params)
    img_f, _ = _run(scene, com, params)
    bad = np.abs(img_w - img_f) > 0.02
    assert np.mean(bad) < 2e-3      # bounded local artifact
    occ = measure_sparse_occupancy(scene, params, win)
    assert "contact_window" in capacity_overflows(win, occ)


def test_contact_march_window_fitting_bit_exact():
    """_march through a window that covers every probe is bit-identical
    to the full-table march (same texels, same math)."""
    import jax.numpy as jnp

    from funky_tpu.ops.sampling import quad_pack
    from funky_tpu.passes.contact import _march

    rng = np.random.default_rng(3)
    h, w = 64, 128
    depth = jnp.asarray(rng.uniform(0.3, 1.0, (h, w)), jnp.float32)
    packed = quad_pack(depth)
    n = 40
    # segments confined to the central third of the screen
    start = jnp.asarray(np.stack([
        rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
        rng.uniform(0.3, 0.9, n)], -1), jnp.float32)
    direction = jnp.asarray(np.stack([
        rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
        rng.uniform(-0.05, 0.05, n)], -1), jnp.float32)
    jitter = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    full = _march(packed, start, direction, jitter)
    win = (packed[8:56, 24:104], (8, 24), (h, w))
    windowed = _march(packed, start, direction, jitter, window=win)
    for a, b in zip(full, windowed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_contact_march_window_conded_ignored(duck_setup):
    """Without committed, contact_window must be inert (the cond'd path
    is the parity reference): bit-identical frames."""
    scene, cfg, params = duck_setup
    win = dataclasses.replace(cfg, contact_window=128)
    img_w, _ = _run(scene, win, params)
    img_f, _ = _run(scene, cfg, params)
    np.testing.assert_array_equal(img_w, img_f)


def test_radius_only_groups_match_full(duck_setup):
    """r5 radius-only groups: LIT-certified pair sides run the 16-tap
    blocker search only (their PCF result is provably all-pass) — the
    frame must be bit-identical to the unsplit sparse path AND the dense
    path."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    split = dataclasses.replace(
        base, shadow_lit_cascade_caps=(8192, 8192, 8192, 8192))
    img_s, st_s = _run(scene, split, params)
    img_u, st_u = _run(scene, base, params)
    np.testing.assert_allclose(img_s, img_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_s.shadow_history),
                               np.asarray(st_u.shadow_history), atol=1e-6)
    dense_cfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(cfg.flags, sparse_shadows=False))
    img_d, _ = _run(scene, dense_cfg, params)
    np.testing.assert_allclose(img_s, img_d, atol=1e-6)


def test_radius_only_overflow_falls_back_exact(duck_setup):
    """Undersized lit caps (including 0 with nonzero counts) take the
    dense fallback cond — image unchanged."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    tiny = dataclasses.replace(base,
                               shadow_lit_cascade_caps=(64, 0, 64, 0))
    img_t, _ = _run(scene, tiny, params)
    img_f, _ = _run(scene, base, params)
    np.testing.assert_allclose(img_t, img_f, atol=1e-6)


def test_route_window_groups_match(duck_setup):
    """r5 routed window tap groups: entries inside the pre-planned
    footprint window gather from the dynamic-sliced sub-table — exact
    containment, so the frame is bit-identical to the unrouted sparse
    path and the dense path."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    routed = dataclasses.replace(
        base, shadow_route_windows=(96, 96, 96, 96),
        shadow_route_caps=(8192, 8192, 8192, 8192))
    img_r, st_r = _run(scene, routed, params)
    img_u, st_u = _run(scene, base, params)
    np.testing.assert_allclose(img_r, img_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_r.shadow_history),
                               np.asarray(st_u.shadow_history), atol=1e-6)
    dense_cfg = dataclasses.replace(
        cfg, flags=dataclasses.replace(cfg.flags, sparse_shadows=False))
    img_d, _ = _run(scene, dense_cfg, params)
    np.testing.assert_allclose(img_r, img_d, atol=1e-6)


def test_route_window_overflow_falls_back_exact(duck_setup):
    """Undersized route caps take the dense fallback cond — image
    unchanged."""
    scene, cfg, params = duck_setup
    base = dataclasses.replace(cfg, shadow_pen_capacity=256 * 144)
    tiny = dataclasses.replace(
        base, shadow_route_windows=(96, 96, 96, 96),
        shadow_route_caps=(16, 16, 16, 16))
    img_t, _ = _run(scene, tiny, params)
    img_f, _ = _run(scene, base, params)
    np.testing.assert_allclose(img_t, img_f, atol=1e-6)
