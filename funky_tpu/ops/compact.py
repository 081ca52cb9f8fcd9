"""Sparse compaction: evaluate an expensive per-element function on only
the elements that need it.

TPU rationale: every per-pixel data-dependent fetch costs a serial-loop
gather row (~3-13 ns/row depending on table size — see PERF.md), so a pass
that only a few % of pixels need (penumbra shadow taps, contact-shadow
marches) should run on a compacted list of those pixels, not the full
framebuffer. Masking alone saves nothing: gather cost is data-independent.

This is the TPU-native stand-in for the GPU's divergence handling (early
`return`s in gltf.frag, e.g. the lit/out-of-bounds early-outs at
gltf.frag:402-423) — a fragment shader retires cheap pixels for free; we
compact instead.

Pipeline:   mask -> compact_indices (one argsort; ~4 ms for 2M keys)
         -> gather payload rows for the selected elements
         -> evaluate on the (capacity,)-shaped batch
         -> scatter_back into the dense result.

Capacity is STATIC (jit shapes): `count` may exceed it, in which case the
overflow elements keep the caller's dense fallback values. Callers pick
capacity from measured occupancy (see `CompactDiagnostics` in callers'
stats) exactly like RasterConfig.capacity, and the padded entries still pay
gather cost — capacity is the knob that sets the pass's cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Compacted(NamedTuple):
    idx: jnp.ndarray     # (capacity,) int32 flat indices into the mask,
    #                      -1 for padding slots
    slot_valid: jnp.ndarray  # (capacity,) bool
    count: jnp.ndarray   # () int32 — TRUE number of masked elements
    #                      (may exceed capacity; compare to detect overflow)


def compact_indices(mask: jnp.ndarray, capacity: int,
                    group_key: jnp.ndarray | None = None) -> Compacted:
    """Indices of True elements of `mask` (flattened), first-N by raster
    order (or grouped by `group_key` then raster order), padded to
    `capacity` with -1.

    Args:
      mask: bool array, any shape.
      capacity: static output length.
      group_key: optional int32 array (same shape) — selected elements are
        ordered by key first (e.g. cascade layer, for gather locality),
        raster order within a key.
    """
    flat = mask.ravel()
    n = flat.shape[0]
    capacity = min(capacity, n)
    arange = jnp.arange(n, dtype=jnp.int32)
    if group_key is None:
        # Stable argsort of (not mask): True (0) sorts first, stable keeps
        # raster order.
        order = jnp.argsort(~flat, stable=True)
    else:
        # int32 keys: requires (max_group + 1) * n < 2^31 (fine for pixel
        # masks grouped by cascade: 5 * 4M << 2^31).
        key = jnp.where(flat, group_key.ravel() * n + arange,
                        jnp.int32(group_key.max() + 1) * n + arange)
        order = jnp.argsort(key)
    order = order[:capacity].astype(jnp.int32)
    count = jnp.sum(flat, dtype=jnp.int32)
    slot_valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(
        count, capacity)
    return Compacted(idx=jnp.where(slot_valid, order, -1),
                     slot_valid=slot_valid, count=count)


def compact_blocks(mask: jnp.ndarray, bh: int, bw: int,
                   capacity_blocks: int) -> Compacted:
    """Whole-block compaction of a 2D mask: every (bh, bw) block with ANY
    True pixel expands to all its pixel indices. The argsort runs over
    the tiny block grid instead of the pixel grid (a 2M-pixel mask costs
    a ~4 ms sort; its 32k-block grid costs ~0.1 ms) — the right tool
    when the masked pixels cluster spatially (e.g. textured model
    pixels). Returns a pixel-level Compacted whose `count` is the TRUE
    BLOCK count (compare against capacity_blocks for overflow)."""
    h, w = mask.shape
    assert h % bh == 0 and w % bw == 0
    gh, gw = h // bh, w // bw
    bm = mask.reshape(gh, bh, gw, bw).any(axis=(1, 3))
    comp_b = compact_indices(bm, capacity_blocks)
    safe = jnp.maximum(comp_b.idx, 0)
    by = safe // gw
    bx = safe % gw
    py = by[:, None, None] * bh + jnp.arange(bh, dtype=jnp.int32)[None, :,
                                                                  None]
    px = bx[:, None, None] * bw + jnp.arange(bw, dtype=jnp.int32)[None,
                                                                  None, :]
    idx = (py * w + px).reshape(-1)
    slot_valid = jnp.repeat(comp_b.slot_valid, bh * bw)
    return Compacted(idx=jnp.where(slot_valid, idx, -1),
                     slot_valid=slot_valid, count=comp_b.count)


class BlockedCompacted(NamedTuple):
    comp: Compacted          # element-level result (original flat domain)
    block_count: jnp.ndarray  # () int32 TRUE candidate-block count —
    #                           include `block_count <= block_capacity`
    #                           in the caller's overflow check


def compact_indices_blocked(mask: jnp.ndarray, capacity: int,
                            bh: int, bw: int, block_capacity: int,
                            group_key: jnp.ndarray | None = None
                            ) -> BlockedCompacted:
    """Two-level compaction for spatially-clustered masks: argsort the
    (bh, bw)-block-any grid first (e.g. 65k keys instead of 4M — the
    full-domain sort costs ~2 ns/key on TPU), then compact elements
    within the candidate blocks only. Selects the SAME element set as
    compact_indices (order differs: block-major instead of raster — fine
    for independent-entry evaluation); `count` is still the true element
    count. Blocks beyond block_capacity are DROPPED — callers must treat
    `block_count > block_capacity` as overflow."""
    *lead, h, w = mask.shape
    assert h % bh == 0 and w % bw == 0
    gh, gw = h // bh, w // bw
    bm = mask.reshape(*lead, gh, bh, gw, bw).any(axis=(-3, -1))
    comp_b = compact_indices(bm, block_capacity)

    safe = jnp.maximum(comp_b.idx, 0)
    li = safe // (gh * gw)
    bi = safe % (gh * gw)
    by = bi // gw
    bx = bi % gw
    base = (li * h + by * bh) * w + bx * bw
    within = (jnp.arange(bh, dtype=jnp.int32)[:, None] * w
              + jnp.arange(bw, dtype=jnp.int32)[None, :])
    cand = (base[:, None, None] + within[None]).reshape(-1)
    cand_valid = jnp.repeat(comp_b.slot_valid, bh * bw)
    cand_safe = jnp.maximum(cand, 0)

    flat = mask.ravel()
    m = flat[cand_safe] & cand_valid
    n_cand = cand.shape[0]
    capacity = min(capacity, n_cand)
    arange = jnp.arange(n_cand, dtype=jnp.int32)
    if group_key is None:
        order = jnp.argsort(~m, stable=True)
    else:
        gk = group_key.ravel()[cand_safe]
        key = jnp.where(m, gk * n_cand + arange,
                        jnp.int32(group_key.max() + 1) * n_cand + arange)
        order = jnp.argsort(key)
    order = order[:capacity]
    count = jnp.sum(flat, dtype=jnp.int32)
    slot_valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(
        count, capacity)
    comp = Compacted(idx=jnp.where(slot_valid, cand[order], -1),
                     slot_valid=slot_valid, count=count)
    return BlockedCompacted(comp=comp, block_count=comp_b.count)


def gather_rows(table: jnp.ndarray, comp: Compacted) -> jnp.ndarray:
    """Gather payload rows (flat-first-dim `table`) for compacted elements;
    padding slots fetch row 0 (callers mask with comp.slot_valid)."""
    safe = jnp.maximum(comp.idx, 0)
    return table[safe]


def scatter_back(dense: jnp.ndarray, comp: Compacted,
                 values: jnp.ndarray) -> jnp.ndarray:
    """Write per-slot `values` (capacity, ...) into flat-first-dim `dense`
    at the compacted indices; padding slots are dropped. Returns updated
    dense array (same shape as input)."""
    flat = dense.reshape((-1,) + values.shape[1:])
    # Padding idx = -1 -> redirect to an out-of-range row and drop.
    n = flat.shape[0]
    idx = jnp.where(comp.slot_valid, comp.idx, n)
    out = flat.at[idx].set(values, mode="drop")
    return out.reshape(dense.shape)
