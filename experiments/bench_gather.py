#!/usr/bin/env python
"""Microbenchmarks for gather strategies on the TPU (v5e via axon tunnel).

Round-1 finding: XLA's TPU gather is a serial loop at ~15 ns per gathered
row, width-independent. This script measures every candidate replacement:

  1. jnp.take baseline at several (table, width) shapes
  2. take_along_axis (per-row lane select) at several widths
  3. Pallas: VMEM-resident table, fori_loop of dynamic-slice row reads
  4. Pallas: HBM table, ring of outstanding per-row DMAs (scalar-prefetched
     indices) — the "hardware texture unit" candidate
  5. one-hot matmul gather (MXU) for small tables
  6. sort / argsort of 2M keys (compaction primitive)
  7. dense elementwise calibration

Timing: iterations chained through data dependencies inside one jitted
scan; completion forced by a value fetch (block_until_ready can lie on the
tunnel — see CLAUDE.md).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20


def timeit(fn, *args, iters=ITERS, label=""):
    """fn(*args) -> array; iterations chained via a zero-valued scalar
    data dependency added to every argument."""

    @jax.jit
    def run(a0, *args):
        def body(carry, _):
            chained = tuple(a + carry.astype(a.dtype) for a in args)
            out = fn(*chained)
            dep = (out.ravel()[0] * 1e-30).astype(jnp.float32)
            return dep, None

        dep, _ = jax.lax.scan(body, a0, None, length=iters)
        return dep

    args = tuple(jax.device_put(a) for a in args)
    d = run(jnp.float32(0), *args)
    float(np.asarray(d))  # warm + drain
    t0 = time.perf_counter()
    d = run(jnp.float32(0), *args)
    float(np.asarray(d))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.3f} ms/iter", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices())

    N = 1 << 20  # 1M rows gathered per iteration

    # --- 1. jnp.take baselines -------------------------------------------
    for (t, w) in [(4096, 4), (16384, 46), (1 << 22, 4), (1 << 24, 4)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        dt = timeit(lambda tb, ix: jnp.take(tb, ix, axis=0), table, idx,
                    label=f"take T={t} W={w}")
        print(f"   -> {dt / N * 1e9:.2f} ns/row")

    # sorted indices
    t, w = 1 << 22, 4
    table = jax.random.normal(key, (t, w), jnp.float32)
    idx = jnp.sort(jax.random.randint(key, (N,), 0, t, jnp.int32))
    dt = timeit(lambda tb, ix: jnp.take(tb, ix, axis=0), table, idx,
                label=f"take sorted T={t}")
    print(f"   -> {dt / N * 1e9:.2f} ns/row")

    # big-table variants (the quad-packed cascade case)
    for (t, w, dty) in [(1 << 24, 4, jnp.float32), (1 << 24, 4, jnp.bfloat16),
                        (1 << 22, 16, jnp.float32)]:
        table = jax.random.normal(key, (t, w), jnp.float32).astype(dty)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        dt = timeit(lambda tb, ix: jnp.take(tb, ix, axis=0), table, idx,
                    label=f"take T={t} W={w} {dty.__name__}")
        print(f"   -> {dt / N * 1e9:.2f} ns/row")

    # --- 1b. 2-D patch gather (vmapped dynamic_slice) ----------------------
    img = jax.random.normal(key, (2048, 2048), jnp.float32)
    for ps in [(8, 8), (8, 128), (16, 16)]:
        starts = jax.random.randint(key, (N // 4, 2), 0, 2048 - 16,
                                    jnp.int32)

        def patch_gather(im, st, ps=ps):
            return jax.vmap(
                lambda yx: jax.lax.dynamic_slice(im, (yx[0], yx[1]), ps)
            )(st)

        dt = timeit(patch_gather, img, starts,
                    label=f"patch-gather {ps} x{N // 4}")
        print(f"   -> {dt / (N // 4) * 1e9:.2f} ns/patch")

    # --- 2. take_along_axis widths ---------------------------------------
    for k in [8, 64, 128, 512]:
        a = jax.random.normal(key, (N, k), jnp.float32)
        i = jax.random.randint(key, (N, 1), 0, k, jnp.int32)
        dt = timeit(lambda aa, ii: jnp.take_along_axis(aa, ii, axis=1),
                    a, i, label=f"take_along_axis K={k}")
        print(f"   -> {dt / N * 1e9:.2f} ns/row")

    # multi-tap per-row selects: (N, K) -> (N, M)
    for (k, m) in [(128, 32), (289, 32), (512, 128)]:
        a = jax.random.normal(key, (N // 4, k), jnp.float32)
        i = jax.random.randint(key, (N // 4, m), 0, k, jnp.int32)
        dt = timeit(lambda aa, ii: jnp.take_along_axis(aa, ii, axis=1),
                    a, i, label=f"take_along_axis K={k} M={m} x{N // 4}")
        print(f"   -> {dt / (N // 4 * m) * 1e9:.2f} ns/select, "
              f"{dt / (N // 4) * 1e9:.2f} ns/px")

    # --- 7. dense calibration --------------------------------------------
    a = jax.random.normal(key, (N, 64), jnp.float32)
    dt = timeit(lambda x: x * 1.0001 + 0.5, a, label="dense mul-add (N,64)")
    print(f"   -> {dt / (N * 64) * 1e12:.2f} ps/elem")

    # --- 6. sort ----------------------------------------------------------
    keys32 = jax.random.randint(key, (2 * N,), 0, 1 << 30, jnp.int32)
    dt = timeit(lambda k_: jnp.sort(k_), keys32, label="sort 2M i32")
    dt = timeit(lambda k_: jnp.argsort(k_), keys32, label="argsort 2M i32")
    vals = jax.random.normal(key, (2 * N,), jnp.float32)
    dt = timeit(lambda k_, v: jax.lax.sort([k_, v], num_keys=1)[1],
                keys32, vals, label="sort 2M kv")

    # --- 5. one-hot matmul gather (small table) ---------------------------
    for (t, w) in [(4096, 46), (4096, 4), (1024, 46)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)

        def onehot_gather(tb, ix, t=t, w=w):
            tb16 = tb.astype(jnp.bfloat16)
            chunk = 8192

            def body(carry, ic):
                oh = (ic[:, None] == jnp.arange(t, dtype=jnp.int32)[None]
                      ).astype(jnp.bfloat16)
                y = jnp.dot(oh, tb16,
                            preferred_element_type=jnp.float32)
                return carry + y.ravel()[0] * 1e-30, None

            s, _ = jax.lax.scan(body, jnp.float32(0),
                                ix.reshape(-1, chunk))
            return s[None]

        dt = timeit(onehot_gather, table, idx,
                    label=f"onehot-matmul T={t} W={w}")
        print(f"   -> {dt / N * 1e9:.2f} ns/row")

    # --- 3. Pallas VMEM-table serial row loop ------------------------------
    def vmem_gather(table, idx, block=4096):
        t, w = table.shape
        n = idx.shape[0]

        def kernel(idx_ref, table_ref, out_ref):
            b = pl.program_id(0)

            def body(r, _):
                i = idx_ref[b * block + r]
                out_ref[pl.ds(r, 1), :] = table_ref[pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(0, block, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, w), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
            grid_spec=grid_spec,
        )(idx, table)

    for (t, w) in [(4096, 4), (8192, 8), (4096, 128)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        try:
            dt = timeit(vmem_gather, table, idx,
                        label=f"pallas-vmem-loop T={t} W={w}")
            print(f"   -> {dt / N * 1e9:.2f} ns/row")
        except Exception as e:
            print(f"pallas-vmem-loop T={t} W={w} FAILED: {type(e).__name__}:"
                  f" {str(e)[:300]}")

    # --- 4. Pallas HBM DMA ring gather -------------------------------------
    def dma_gather(table, idx, block=1024, ring=16):
        t, w = table.shape
        n = idx.shape[0]

        def kernel(idx_ref, table_ref, out_ref, sem):
            b = pl.program_id(0)

            def dma(r):
                i = idx_ref[b * block + r]
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(i, 1), :],
                    out_ref.at[pl.ds(r, 1), :],
                    sem.at[r % ring],
                )

            def warm(r, _):
                dma(r).start()
                return 0

            jax.lax.fori_loop(0, ring, warm, 0)

            def body(r, _):
                dma(r).wait()

                @pl.when(r + ring < block)
                def _():
                    dma(r + ring).start()

                return 0

            jax.lax.fori_loop(0, block, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((block, w), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    for (t, w) in [(1 << 22, 4), (1 << 20, 46), (1 << 24, 4)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        try:
            dt = timeit(dma_gather, table, idx,
                        label=f"pallas-dma-ring T={t} W={w}")
            print(f"   -> {dt / N * 1e9:.2f} ns/row")
        except Exception as e:
            print(f"pallas-dma-ring T={t} W={w} FAILED: {type(e).__name__}:"
                  f" {str(e)[:300]}")


if __name__ == "__main__":
    main()
