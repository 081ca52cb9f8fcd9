#!/usr/bin/env python
"""Bisect which Pallas gather constructs compile on this tunnel's Mosaic
helper, and the ns/row each achieves.

raster_pallas._raster_table_kernel PROVES scalar-dynamic VMEM row reads
(`table_ref[tid]`) compile here. The r1-r3 failures used pl.ds slices and
dynamic-index DMA instead. Variants:

  A  dynamic read table_ref[i], accumulate in registers (raster-style)
  B  A + scalar-index write out_ref[r] = row  (dynamic sublane store)
  C  A + pl.ds(r*8, 8) BLOCK write (aligned dynamic store, 8 rows/iter)
  D  read via table_ref[pl.ds(i,1), :] (the r1 formulation that 500'd)
  E  make_async_copy HBM->VMEM with dynamic source row

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/pallas_gather_bisect.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20


def timeit(fn, *args, iters=ITERS, label=""):
    @jax.jit
    def run(a0, *args):
        def body(carry, _):
            chained = tuple(
                a + carry.astype(a.dtype) if jnp.issubdtype(
                    a.dtype, jnp.floating) else a for a in args)
            out = fn(*chained)
            dep = (out.ravel()[0] * 1e-30).astype(jnp.float32)
            return dep, None

        dep, _ = jax.lax.scan(body, a0, None, length=iters)
        return dep

    args = tuple(jax.device_put(a) for a in args)
    d = run(jnp.float32(0), *args)
    float(np.asarray(d))
    t0 = time.perf_counter()
    d = run(jnp.float32(0), *args)
    float(np.asarray(d))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.3f} ms/iter", flush=True)
    return dt


def make_spec(n, w, block, t_rows, extra_in=(), scratch=()):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM), *extra_in],
        out_specs=pl.BlockSpec((block, w), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )


def gather_a(table, idx, block=2048):
    """Accumulate-only (no per-row store): lower bound on read cost."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(r, acc):
            return acc + table_ref[idx_ref[b * block + r]]

        acc = jax.lax.fori_loop(0, block, body, jnp.zeros((w,), table.dtype))
        out_ref[0, :] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n // block, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, table)


def gather_b(table, idx, block=2048):
    """Scalar-index row store: out_ref[r] = table_ref[i]."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(r, _):
            out_ref[r] = table_ref[idx_ref[b * block + r]]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=make_spec(n, w, block, t_rows),
    )(idx, table)


def gather_c(table, idx, block=2048, rows_per=8):
    """8 gathered rows stacked in registers, one aligned block store."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(g, _):
            rows = [table_ref[idx_ref[b * block + g * rows_per + r]]
                    for r in range(rows_per)]
            out_ref[pl.ds(g * rows_per, rows_per), :] = jnp.stack(rows)
            return 0

        jax.lax.fori_loop(0, block // rows_per, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=make_spec(n, w, block, t_rows),
    )(idx, table)


def gather_d(table, idx, block=2048):
    """pl.ds dynamic slice read + write (r1 formulation)."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(r, _):
            i = idx_ref[b * block + r]
            out_ref[pl.ds(r, 1), :] = table_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=make_spec(n, w, block, t_rows),
    )(idx, table)


def gather_e(table, idx, block=1024, ring=8):
    """Dynamic-source DMA ring from HBM (no VMEM residency needed)."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref, sem):
        b = pl.program_id(0)

        def dma(r):
            i = idx_ref[b * block + r]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(i, 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sem.at[r % ring])

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

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    N = 1 << 20

    cases = [("A-accum", gather_a), ("B-rowstore", gather_b),
             ("C-blockstore", gather_c), ("D-plds", gather_d)]
    for (t, w) in [(4096, 128), (65536, 4)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        ref = jnp.take(table, idx, axis=0)
        for name, fn in cases:
            try:
                dt = timeit(fn, table, idx, label=f"{name} T={t} W={w}")
                if name != "A-accum":
                    err = float(jnp.max(jnp.abs(fn(table, idx) - ref)))
                else:
                    err = -1.0
                print(f"   -> {dt / N * 1e9:.2f} ns/row  max-err {err}",
                      flush=True)
            except Exception as e:
                print(f"{name} T={t} W={w} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    for (t, w) in [(1 << 22, 4)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        try:
            dt = timeit(gather_e, table, idx, label=f"E-dma T={t} W={w}")
            err = float(jnp.max(jnp.abs(
                gather_e(table, idx) - jnp.take(table, idx, axis=0))))
            print(f"   -> {dt / N * 1e9:.2f} ns/row  max-err {err}",
                  flush=True)
        except Exception as e:
            print(f"E-dma T={t} W={w} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
