"""Localize slab-kernel time at 256^3: fwd vs adj, K sweep, prec tiers.

Each config is timed as its own jitted program (best-of-N, rep-chained
inside jit via an epsilon data dependency)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quad", default="plane")
    ap.add_argument("--prec", default="bf16")
    ap.add_argument("--ks", default="4,8,12,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import phantom, slab_projector as sp

    rng = np.random.default_rng(0)
    n, n_proj = args.size, args.views
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    views = Views.create(
        n_proj, phi=np.linspace(0, np.pi, n_proj, endpoint=False),
        alpha=rng.uniform(-0.01, 0.01, n_proj),
        beta=rng.uniform(-0.01, 0.01, n_proj),
        t=rng.uniform(-1.5, 1.5, (n_proj, 3)))
    gstruct, scalars = sp.scalar_groups(geom, views, args.quad)

    def bench(fn, x0, label):
        x = fn(x0)
        jax.block_until_ready(x)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            x = fn(x)
            jax.block_until_ready(x)
            best = min(best, time.perf_counter() - t0)
        print(f"[{label}] {n_proj / best:.1f} proj/s ({best * 1e3:.1f} ms)",
              flush=True)

    for K in [int(k) for k in args.ks.split(",")]:
        os.environ["TOMOJAX_SLAB_K"] = str(K)
        quad, prec = args.quad, args.prec

        @jax.jit
        def fwd(v):
            y = sp.project_scalars(v, geom, gstruct, scalars, quad,
                                   prec=prec)
            return v + 1e-20 * y.sum()

        @jax.jit
        def adj(g):
            x = sp.backproject_scalars(g, geom, gstruct, scalars, quad,
                                       prec=prec)
            return g + 1e-20 * x.sum()

        @jax.jit
        def fused(v):
            y = sp.project_scalars(v, geom, gstruct, scalars, quad,
                                   prec=prec)
            x = sp.backproject_scalars(y, geom, gstruct, scalars, quad,
                                       prec=prec)
            return v + 1e-20 * x

        g0 = jnp.zeros((n_proj, geom.n_det), jnp.float32) + 0.1
        bench(fwd, vol, f"K={K} {quad} {prec} fwd")
        bench(adj, g0, f"K={K} {quad} {prec} adj")
        bench(fused, vol, f"K={K} {quad} {prec} fused")


if __name__ == "__main__":
    main()
