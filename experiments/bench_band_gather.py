#!/usr/bin/env python
"""Microbench: banded chunk-scan tap gathers vs full-table gathers.

Hypothesis (PERF.md gather law #1): sorting penumbra slots by shadow-map
row and gathering each fixed-size chunk from a dynamic-sliced (BH, S, 4)
band slab (~2-3 MB, under the ~2.5 MB cliff) runs ~3-4x faster per row
than gathering from the full (S, S, 4) 64 MB cascade table.

Simulates the real shape: N slots sorted by v, 32 taps each within a
+-pad row neighborhood, scan over chunks with a per-chunk lax.cond
fallback to the full table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/bench_band_gather.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    S = 2048
    N = 49152          # ~ one cascade's tuned capacity
    TAPS = 32
    PAD = 12

    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (S, S, 4), jnp.float32)
    # slot anchors: clustered rows (penumbra band ~1/3 of the map), sorted
    v = np.sort(np.random.randint(300, 1600, size=N)).astype(np.int32)
    u = np.random.randint(0, S, size=N).astype(np.int32)
    # 32 taps per slot within +-PAD rows
    dv = np.random.randint(-PAD, PAD + 1, size=(N, TAPS)).astype(np.int32)
    du = np.random.randint(-PAD, PAD + 1, size=(N, TAPS)).astype(np.int32)
    ty = np.clip(v[:, None] + dv, 0, S - 1)
    tx = np.clip((u[:, None] + du) % S, 0, S - 1)
    ty_d = jnp.asarray(ty)
    tx_d = jnp.asarray(tx)
    v_d = jnp.asarray(v)

    def timeit(label, fn, *args, iters=20):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(np.asarray(out.ravel()[0]))

        def chained(args, n):
            def body(c, _):
                # Perturb the index args by a runtime-zero derived from the
                # carry so the body is NOT loop-invariant (CLAUDE.md: XLA
                # hoists otherwise and you measure nothing).
                zero = (c > 1e30).astype(jnp.int32)
                pert = tuple(a + zero if a.dtype == jnp.int32 else a
                             for a in args)
                o = jfn(*pert)
                return c + o.ravel()[0] * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc

        cfn = jax.jit(chained, static_argnums=1)
        acc = cfn(args, iters)
        float(np.asarray(acc))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc = cfn(args, iters)
            float(np.asarray(acc))
            best = min(best, (time.perf_counter() - t0) / iters)
        rows = N * TAPS
        print(f"{label:34s} {best*1e3:8.2f} ms  {best/rows*1e9:6.2f} ns/row",
              flush=True)
        return best

    def full_gather(table, ty, tx):
        flat = table.reshape(S * S, 4)
        rows = flat[ty * S + tx]                     # (N, TAPS, 4)
        return jnp.sum(rows, axis=(1, 2))

    timeit("full 64MB table, one gather", full_gather, table, ty_d, tx_d)

    for chunk, bh in ((1024, 96), (1024, 64), (2048, 128), (512, 64),
                      (4096, 160)):
        nc = N // chunk

        def banded(table, ty, tx, v, chunk=chunk, bh=bh, nc=nc):
            flat_full = table.reshape(S * S, 4)

            def step(carry, i):
                ty_c = jax.lax.dynamic_slice(ty, (i * chunk, 0),
                                             (chunk, TAPS))
                tx_c = jax.lax.dynamic_slice(tx, (i * chunk, 0),
                                             (chunk, TAPS))
                v_c = jax.lax.dynamic_slice(v, (i * chunk,), (chunk,))
                vlo = jnp.min(v_c) - PAD
                vhi = jnp.max(v_c) + PAD + 1
                fits = (vhi - vlo) <= bh
                oy = jnp.clip(vlo, 0, S - bh)

                def slab_path(_):
                    slab = jax.lax.dynamic_slice(table, (oy, 0, 0),
                                                 (bh, S, 4))
                    fs = slab.reshape(bh * S, 4)
                    ly = jnp.clip(ty_c - oy, 0, bh - 1)
                    rows = fs[ly * S + tx_c]
                    return jnp.sum(rows, axis=(1, 2))

                def full_path(_):
                    rows = flat_full[ty_c * S + tx_c]
                    return jnp.sum(rows, axis=(1, 2))

                out = jax.lax.cond(fits, slab_path, full_path, operand=None)
                return carry, out

            _, outs = jax.lax.scan(step, 0.0, jnp.arange(nc))
            return outs.reshape(N)

        timeit(f"banded chunk={chunk} bh={bh}", banded, table, ty_d, tx_d,
               v_d)

    # two-phase variant (blocker then dependent PCF) within each chunk:
    # second gather's indices depend on the first's result.
    chunk, bh = 1024, 96
    nc = N // chunk

    def banded_two_phase(table, ty, tx, v):
        def step(carry, i):
            ty_c = jax.lax.dynamic_slice(ty, (i * chunk, 0), (chunk, TAPS))
            tx_c = jax.lax.dynamic_slice(tx, (i * chunk, 0), (chunk, TAPS))
            v_c = jax.lax.dynamic_slice(v, (i * chunk,), (chunk,))
            oy = jnp.clip(jnp.min(v_c) - PAD, 0, S - bh)
            slab = jax.lax.dynamic_slice(table, (oy, 0, 0), (bh, S, 4))
            fs = slab.reshape(bh * S, 4)
            ly = jnp.clip(ty_c - oy, 0, bh - 1)
            h = TAPS // 2
            r1 = fs[ly[:, :h] * S + tx_c[:, :h]]
            m = jnp.sum(r1, axis=(1, 2))
            tx2 = (tx_c[:, h:] + (m[:, None] > 2.0)) % S
            r2 = fs[ly[:, h:] * S + tx2]
            return carry, m + jnp.sum(r2, axis=(1, 2))

        _, outs = jax.lax.scan(step, 0.0, jnp.arange(nc))
        return outs.reshape(N)

    timeit("banded 2-phase chunk=1024 bh=96", banded_two_phase, table,
           ty_d, tx_d, v_d)




def locality_test():
    """Does index order matter for the full-table gather after all?"""
    import jax
    import jax.numpy as jnp
    import time

    S = 2048
    N = 49152
    TAPS = 32

    key = jax.random.PRNGKey(1)
    table = jax.random.uniform(key, (S, S, 4), jnp.float32)

    def mk(ty, tx):
        ty_d, tx_d = jnp.asarray(ty), jnp.asarray(tx)

        def full_gather(ty, tx):
            flat = table.reshape(S * S, 4)
            return jnp.sum(flat[ty * S + tx], axis=(1, 2))

        jfn = jax.jit(full_gather)

        def chained(ty, tx, n):
            def body(c, _):
                z = (c > 1e30).astype(jnp.int32)
                o = jfn(ty + z, tx + z)
                return c + o.ravel()[0] * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc

        cfn = jax.jit(chained, static_argnums=2)
        float(np.asarray(cfn(ty_d, tx_d, 20)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(cfn(ty_d, tx_d, 20)))
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    rows = N * TAPS
    # sorted + clustered (the original microbench)
    v = np.sort(np.random.randint(300, 1600, size=N)).astype(np.int32)
    u = np.random.randint(0, S, size=N).astype(np.int32)
    dv = np.random.randint(-12, 13, size=(N, TAPS)).astype(np.int32)
    du = np.random.randint(-12, 13, size=(N, TAPS)).astype(np.int32)
    ty = np.clip(v[:, None] + dv, 0, S - 1)
    tx = np.clip((u[:, None] + du) % S, 0, S - 1)
    b = mk(ty, tx)
    print(f"sorted clustered taps      {b*1e3:8.2f} ms {b/rows*1e9:5.2f} ns/row")

    # same taps, slot order shuffled (random v order, taps still local per slot)
    perm = np.random.permutation(N)
    b = mk(ty[perm], tx[perm])
    print(f"shuffled slots, local taps {b*1e3:8.2f} ms {b/rows*1e9:5.2f} ns/row")

    # fully random taps
    tyr = np.random.randint(0, S, size=(N, TAPS)).astype(np.int32)
    txr = np.random.randint(0, S, size=(N, TAPS)).astype(np.int32)
    b = mk(tyr, txr)
    print(f"fully random taps          {b*1e3:8.2f} ms {b/rows*1e9:5.2f} ns/row")

    # taps in row-major within-slot order but tap-major array layout
    # (the real code's (TAPS, cc) layout vs (cc, TAPS))
    b = mk(ty.T.copy(), tx.T.copy())
    print(f"tap-major layout (16,cc)   {b*1e3:8.2f} ms {b/rows*1e9:5.2f} ns/row")


if __name__ == "__main__":
    import sys
    if "--locality" in sys.argv:
        locality_test()
    else:
        main()
