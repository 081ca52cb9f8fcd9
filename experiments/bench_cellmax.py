#!/usr/bin/env python
"""Variants of the per-cell (16x16) max reduction over (4, 2048, 2048).

The class-map build calls this 8x per frame; the current two-stage
reshape-reduce measures ~1.5 ms/call (~45 GB/s effective) — way off the
dense elementwise floor. Find the fast formulation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/bench_cellmax.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/funky_tpu_jax_tpu"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    import jax.numpy as jnp

    iters = int(os.environ.get("N", "30"))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((4, 2048, 2048), np.float32))
    coarse = 16

    def timeit(fn, label):
        @jax.jit
        def run(a0, x):
            def body(carry, _):
                out = fn(x + carry)
                dep = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    dep = dep + (leaf.ravel()[0] * 1e-30).astype(
                        jnp.float32)
                return dep, None
            dep, _ = jax.lax.scan(body, a0, None, length=iters)
            return dep

        try:
            d = run(jnp.float32(0), x0)
            float(np.asarray(d))
            t0 = time.perf_counter()
            d = run(jnp.float32(0), x0)
            float(np.asarray(d))
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"{label:44s} {dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{label:44s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)

    l, s, _ = x0.shape
    sc = s // coarse

    def current(x):
        rows = x.reshape(l, sc, coarse, s).max(axis=2)
        cols = rows.transpose(0, 2, 1)
        return cols.reshape(l, sc, coarse, sc).max(axis=2).transpose(
            0, 2, 1)

    def naive(x):
        return x.reshape(l, sc, coarse, sc, coarse).max(axis=(2, 4))

    def reduce_window(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, coarse, coarse),
            (1, coarse, coarse), "VALID")

    def strided_rows(x):
        y = x.reshape(l, sc, coarse, s)
        m = y[:, :, 0, :]
        for i in range(1, coarse):
            m = jnp.maximum(m, y[:, :, i, :])
        # lanes: (l, sc, s) -> (l, sc, sc, coarse) minor-dim reduce
        return m.reshape(l, sc, sc, coarse).max(axis=-1)

    def log2_fold(x):
        # pairwise fold rows: (l, 2048, 2048) -> (l, 128, 2048) in 4 halvings
        y = x
        rows = s
        while rows > sc:
            y = jnp.maximum(y[:, 0::2, :], y[:, 1::2, :])
            rows //= 2
        # lanes via minor-dim reduce
        return y.reshape(l, sc, sc, coarse).max(axis=-1)

    def rows_then_minor(x):
        rows = x.reshape(l, sc, coarse, s).max(axis=2)     # (l, sc, s)
        return rows.reshape(l, sc, sc, coarse).max(axis=-1)

    timeit(current, "current two-stage (transpose)")
    timeit(naive, "naive reshape.max((2,4))")
    timeit(reduce_window, "lax.reduce_window 16x16")
    timeit(strided_rows, "strided row slices + minor reduce")
    timeit(log2_fold, "log2 pairwise fold + minor reduce")
    timeit(rows_then_minor, "row reshape-max + minor reduce")

    # the pooling ops the multires plan needs
    def pool2(x):
        hi = jnp.maximum(x[:, 0::2, :], x[:, 1::2, :])
        hi = jnp.maximum(hi[:, :, 0::2], hi[:, :, 1::2])
        lo = jnp.minimum(x[:, 0::2, :], x[:, 1::2, :])
        lo = jnp.minimum(lo[:, :, 0::2], lo[:, :, 1::2])
        return hi, lo

    def pool2_reshape(x):
        a = x.reshape(l, s // 2, 2, s // 2, 2)
        return a.max(axis=(2, 4)), a.min(axis=(2, 4))

    timeit(pool2, "2x2 max+min pool (strided slices)")
    timeit(pool2_reshape, "2x2 max+min pool (reshape reduce)")


if __name__ == "__main__":
    main()
