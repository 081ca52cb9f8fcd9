#!/usr/bin/env python
"""Round-3 retest: do the Pallas custom-gather kernels compile on this
tunnel's Mosaic helper now? (HTTP 500 in rounds 1-2 — PERF.md.)

Runs only the Pallas sections of bench_gather.py plus a blocked
multi-row-per-DMA variant; prints ns/row for whatever compiles. If the
DMA ring lands at ~2-4 ns/row it supersedes the sub-cliff table repack
plan (VERDICT r2 item 3).
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
            chained = tuple(a + carry.astype(a.dtype) for a in args)
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
        scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices())
    N = 1 << 20

    for (t, w) in [(4096, 4), (4096, 128)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        try:
            dt = timeit(vmem_gather, table, idx,
                        label=f"pallas-vmem-loop T={t} W={w}")
            print(f"   -> {dt / N * 1e9:.2f} ns/row")
        except Exception as e:
            print(f"pallas-vmem-loop T={t} W={w} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")

    for (t, w) in [(1 << 22, 4), (1 << 24, 4), (1 << 20, 46)]:
        table = jax.random.normal(key, (t, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, t, jnp.int32)
        try:
            dt = timeit(dma_gather, table, idx,
                        label=f"pallas-dma-ring T={t} W={w}")
            err = float(jnp.max(jnp.abs(
                dma_gather(table, idx) - jnp.take(table, idx, axis=0))))
            print(f"   -> {dt / N * 1e9:.2f} ns/row, max-err {err}")
        except Exception as e:
            print(f"pallas-dma-ring T={t} W={w} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
