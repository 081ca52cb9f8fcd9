#!/usr/bin/env python
"""Bisect v3: indices as a VMEM tensor input (NOT scalar-prefetch).

v2 insight: every failing kernel passed the 1M-element index array via
PrefetchScalarGridSpec -> SMEM, which is 1 MB on this core; the 4 MB
prefetch plausibly crashes the Mosaic helper. The repo's WORKING raster
kernel reads its per-tile id list from a VMEM block and scalar-indexes it
on the sublane dim (`ids_ref[0, i, 0]`). Do the same for a gather.

  A3  dynamic reads (idx from VMEM), accumulate, one static store
  B3  rows_per unrolled reads -> jnp.stack -> static (rows_per, W) store
  C3  dynamic row store into the out block (isolate store legality)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/pallas_gather_bisect3.py
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


def specs(t_rows, w, block):
    return dict(
        in_specs=[
            pl.BlockSpec((t_rows, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ])


def gather_a3(table, idx, block=2048):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(table_ref, idx_ref, out_ref):
        def body(r, acc):
            return acc + table_ref[idx_ref[0, r, 0]]

        acc = jax.lax.fori_loop(0, block, body,
                                jnp.zeros((w,), table.dtype))
        out_ref[:] = jnp.broadcast_to(acc, (8, w))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8 * (n // block), w), table.dtype),
        grid=(n // block,),
        out_specs=pl.BlockSpec((8, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        **specs(t_rows, w, block),
    )(table, idx.reshape(n // block, block, 1))


def gather_b3(table, idx, rows_per=32):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(table_ref, idx_ref, out_ref):
        rows = [table_ref[idx_ref[0, r, 0]] for r in range(rows_per)]
        out_ref[:] = jnp.stack(rows)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid=(n // rows_per,),
        out_specs=pl.BlockSpec((rows_per, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        **specs(t_rows, w, rows_per),
    )(table, idx.reshape(n // rows_per, rows_per, 1))


def gather_c3(table, idx, block=1024):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(table_ref, idx_ref, out_ref):
        def body(r, _):
            out_ref[idx_ref[0, r, 0] % block] = table_ref[idx_ref[0, r, 0]]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid=(n // block,),
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        **specs(t_rows, w, block),
    )(table, idx.reshape(n // block, block, 1))


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    N = 1 << 20

    for (t, w) in [(4096, 128), (16384, 128), (65536, 8), (4096, 16)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        for name, fn in [("A3-accum", gather_a3), ("B3-stack32", gather_b3),
                         ("C3-dynstore", gather_c3)]:
            try:
                dt = timeit(fn, table, idx, label=f"{name} T={t} W={w}")
                print(f"   -> {dt / N * 1e9:.2f} ns/row", flush=True)
                if name == "B3-stack32":
                    ref = jnp.take(table, idx, axis=0)
                    err = float(jnp.max(jnp.abs(fn(table, idx) - ref)))
                    print(f"      max-err {err}", flush=True)
            except Exception as e:
                print(f"{name} T={t} W={w} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
