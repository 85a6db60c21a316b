"""A/B the slab kernel's bf16 selection tier vs f32x2 on the real TPU.

Accuracy (64^3, jittered views, both quads) + throughput (--size N,
jit-fused fwd+adjoint chain like bench.py)."""
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
    ap.add_argument("--skip-acc", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import phantom, slab_projector as sp

    rng = np.random.default_rng(0)

    if not args.skip_acc:
        n, n_proj = 64, 8
        geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3,
                        det_shape=(n, n))
        vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
        views = Views.create(
            n_proj,
            phi=0.3 + np.linspace(0, np.pi, n_proj, endpoint=False),
            alpha=rng.uniform(-0.01, 0.01, n_proj),
            beta=rng.uniform(-0.01, 0.01, n_proj),
            t=rng.uniform(-1.5, 1.5, (n_proj, 3)))
        for quad in ("arc", "plane"):
            y32 = np.asarray(sp.project(vol, geom, views, quad=quad,
                                        prec="f32x2"))
            y16 = np.asarray(sp.project(vol, geom, views, quad=quad,
                                        prec="bf16"))
            rel = np.linalg.norm(y16 - y32) / np.linalg.norm(y32)
            g = jnp.asarray(
                rng.standard_normal(y32.shape).astype(np.float32))
            xb16 = sp.backproject(g, geom, views, quad=quad, prec="bf16")
            lhs = float(jnp.vdot(jnp.asarray(y16), g))
            rhs = float(jnp.vdot(vol, xb16))
            xb32 = sp.backproject(g, geom, views, quad=quad,
                                  prec="f32x2")
            reladj = float(jnp.linalg.norm(xb16 - xb32)
                           / jnp.linalg.norm(xb32))
            print(f"[acc {quad}] fwd rel {rel:.2e}  adj rel {reladj:.2e}"
                  f"  dot-test rel {abs(lhs - rhs) / abs(lhs):.2e}",
                  flush=True)

    # throughput: jit-fused fwd+adjoint chain (rep-chained inside jit)
    n, n_proj = args.size, args.views
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    views = Views.create(
        n_proj, phi=np.linspace(0, np.pi, n_proj, endpoint=False),
        alpha=rng.uniform(-0.01, 0.01, n_proj),
        beta=rng.uniform(-0.01, 0.01, n_proj),
        t=rng.uniform(-1.5, 1.5, (n_proj, 3)))
    for quad in ("arc", "plane"):
        for prec in ("f32x2", "bf16"):
            gstruct, scalars = sp.scalar_groups(geom, views, quad)

            @jax.jit
            def chain(v, sc):
                y = sp.project_scalars(v, geom, gstruct, sc, quad,
                                       prec=prec)
                bk = sp.backproject_scalars(y, geom, gstruct, sc, quad,
                                            prec=prec)
                return v + 1e-20 * bk

            x = chain(vol, scalars)
            jax.block_until_ready(x)
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                x = chain(x, scalars)
                jax.block_until_ready(x)
                best = min(best, time.perf_counter() - t0)
            print(f"[perf {quad} {prec}] {n}^3 {n_proj}v fused "
                  f"{n_proj / best:.1f} proj/s ({best * 1e3:.1f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
