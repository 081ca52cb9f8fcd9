#!/usr/bin/env python
"""Bisect v2: isolate dynamic-READ vs dynamic-STORE in Pallas gathers.

v1 result: every kernel with a dynamic store (scalar row, pl.ds slice, or
DMA) crashes the remote Mosaic helper; the repo's raster kernel (dynamic
scalar READS, static stores) compiles. Variants here keep all stores
static:

  A2  2048 dynamic reads accumulated in registers, ONE static store
      (pure read-path cost)
  B2  grid step per 8 output rows: 8 unrolled dynamic reads ->
      jnp.stack -> static (8, W) store (a practical exact gather)
  C2  dynamic stores into VMEM *scratch*, one static copy to out
      (does scratch tolerate dynamic stores?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/pallas_gather_bisect2.py
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


def gather_a2(table, idx, block=2048):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)

        def body(r, acc):
            return acc + table_ref[idx_ref[b * block + r]]

        acc = jax.lax.fori_loop(0, block, body,
                                jnp.zeros((w,), table.dtype))
        out_ref[:] = jnp.broadcast_to(acc, (8, w))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8 * (n // block), w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, table)


def gather_b2(table, idx):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)
        rows = [table_ref[idx_ref[b * 8 + r]] for r in range(8)]
        out_ref[:] = jnp.stack(rows)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // 8,),
            in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, table)


def gather_b2w(table, idx, rows_per=64):
    """Wider step: rows_per unrolled reads per grid step."""
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        b = pl.program_id(0)
        rows = [table_ref[idx_ref[b * rows_per + r]]
                for r in range(rows_per)]
        out_ref[:] = jnp.stack(rows)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // rows_per,),
            in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows_per, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, table)


def gather_c2(table, idx, block=1024):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref, scratch):
        b = pl.program_id(0)

        def body(r, _):
            scratch[r] = table_ref[idx_ref[b * block + r]]
            return 0

        jax.lax.fori_loop(0, block, body, 0)
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec((t_rows, w), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, w), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block, w), table.dtype)],
        ),
    )(idx, table)


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    N = 1 << 20

    for (t, w) in [(4096, 128), (16384, 128), (65536, 8)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        ref = jnp.take(table, idx, axis=0)
        for name, fn in [("A2-accum", gather_a2), ("B2-stack8", gather_b2),
                         ("B2w-stack64", gather_b2w),
                         ("C2-scratch", gather_c2)]:
            try:
                dt = timeit(fn, table, idx, label=f"{name} T={t} W={w}")
                if name != "A2-accum":
                    err = float(jnp.max(jnp.abs(fn(table, idx) - ref)))
                else:
                    err = -1.0
                print(f"   -> {dt / N * 1e9:.2f} ns/row  max-err {err}",
                      flush=True)
            except Exception as e:
                print(f"{name} T={t} W={w} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
