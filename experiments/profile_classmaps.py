#!/usr/bin/env python
"""Attribute build_class_maps' in-frame cost: dilations vs cell_max vs
residuals, at flagship shape (4, 2048, 2048).

Chained-scan protocol (CLAUDE.md): all iterations inside one jit, one
value fetch at the end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/profile_classmaps.py
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

    from funky_tpu.passes import shadow_classify as sc

    iters = int(os.environ.get("N", "20"))
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.random((4, 2048, 2048), np.float32))
    planes = jnp.asarray(rng.random((4, 3), np.float32))

    def timeit(fn, *args, label="", n=None):
        n = n or iters

        @jax.jit
        def run(a0, *args):
            def body(carry, _):
                chained = tuple(
                    jax.tree_util.tree_map(
                        lambda a: a + carry.astype(a.dtype)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a, arg)
                    for arg in args)
                out = fn(*chained)
                # consume EVERY leaf (one element each) or XLA dead-code
                # eliminates unconsumed branches (CLAUDE.md foot-gun b)
                dep = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    if not hasattr(leaf, "ravel"):
                        continue
                    dep = dep + (leaf.ravel()[0] * 1e-30).astype(jnp.float32)
                return dep, None
            dep, _ = jax.lax.scan(body, a0, None, length=n)
            return dep

        args = tuple(jax.device_put(a) for a in args)
        d = run(jnp.float32(0), *args)
        float(np.asarray(d))
        t0 = time.perf_counter()
        d = run(jnp.float32(0), *args)
        float(np.asarray(d))
        print(f"{label:40s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
              flush=True)

    K = sc.DROP_LADDER

    timeit(lambda m: sc.build_class_maps(m, 16, 4.0, planes),
           maps, label="build_class_maps FULL")

    timeit(lambda m: jax.tree_util.tree_map(
        lambda x: x, sc._dilate_exact(m, K[-1], jnp.minimum, 1.0,
                                      collect_at=K)),
        maps, label=f"mins dilation (reach {K[-1]}, collect {K})")

    timeit(lambda m: sc._dilate_exact(m, sc.rise_window(4.0), jnp.maximum,
                                      1.0),
           maps, label=f"maxs dilation (reach {sc.rise_window(4.0)})")

    timeit(lambda m: sc._cell_max(m, 16), maps, label="one _cell_max")

    def drops_only(m):
        mins = sc._dilate_exact(m, K[-1], jnp.minimum, 1.0, collect_at=K)
        return [sc._cell_max(m - mins[r], 16) for r in K]
    timeit(drops_only, maps, label="mins dilation + 5x(sub+cell_max)")

    def resid_part(m):
        resid = m - sc._plane_at_texels(planes, 2048)
        eps = (jnp.sum(jnp.abs(planes), axis=-1) * 4e-7 + 2e-7)[:, None,
                                                                None]
        return (-sc._cell_max(-(resid - eps), 16),
                sc._cell_max(resid + eps, 16))
    timeit(resid_part, maps, label="resid plane + 2x cell_max")


if __name__ == "__main__":
    main()
