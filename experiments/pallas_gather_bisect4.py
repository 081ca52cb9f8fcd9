#!/usr/bin/env python
"""Bisect v4: DMA-ring gather from HBM with VMEM-resident indices.

v3 solved the HTTP-500 mystery (index array via scalar-prefetch blew the
1 MB SMEM); scalar-read VMEM gathers compile but run ~10 ns/row — slower
than XLA's own small-table gather (~3-4). The remaining target is BIG
tables (the 64-256 MB quad-packed cascades, XLA ~12.9 ns/row): a ring of
outstanding single-row HBM->VMEM DMAs with dynamic source indices.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/pallas_gather_bisect4.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 10


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


def dma_gather(table, idx, block=512, ring=16):
    t_rows, w = table.shape
    n = idx.shape[0]

    def kernel(table_ref, idx_ref, out_ref, sem):
        def dma(r):
            i = idx_ref[0, r, 0]
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
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table, idx.reshape(n // block, block, 1))


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    N = 1 << 20

    for (t, w) in [(1 << 22, 8), (1 << 24, 4)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        for ring in (8, 16, 32):
            fn = functools.partial(dma_gather, ring=ring)
            try:
                dt = timeit(fn, table, idx,
                            label=f"dma ring={ring} T={t} W={w}")
                print(f"   -> {dt / N * 1e9:.2f} ns/row", flush=True)
                if ring == 16:
                    ref = jnp.take(table, idx, axis=0)
                    err = float(jnp.max(jnp.abs(fn(table, idx) - ref)))
                    print(f"      max-err {err}", flush=True)
            except Exception as e:
                print(f"dma ring={ring} T={t} W={w} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
