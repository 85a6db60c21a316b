"""Bisect the 512^3 config-5 TPU device error (VERDICT r3 item 1).

Runs ONE stage per process invocation (a kernel fault kills the process,
so the sweep driver is a shell loop over invocations):

    python scripts/config5_bisect.py STAGE [--size N] [--views V]
        [--quad plane|arc] [--niter K]

Stages:
    fwd    — project() random volume, all views, one program
    adj    — backproject() random sinogram, all views, one program
    chain  — one jitted fwd+adjoint apply (x -> AT(A(x)))
    cgls   — the _slab_recon_prog CGLS chunk program (the crashing one)

Environment knobs under test: TOMOJAX_SLAB_KERNEL, TOMOJAX_SLAB_K.
Prints one line: "OK stage=... t=..s" or dies with the device error.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["fwd", "adj", "chain", "cgls"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=1024)
    ap.add_argument("--quad", default="plane")
    ap.add_argument("--niter", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import slab_projector as sp

    n, n_proj = args.size, args.views
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(0)
    phi = np.linspace(0.0, np.pi, n_proj)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    views = Views.create(n_proj, phi=phi, t=t)
    vol = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))

    t0 = time.perf_counter()
    if args.stage == "fwd":
        y = sp.project(vol, geom, views, quad=args.quad)
        jax.block_until_ready(y)
        chk = float(jnp.abs(y).sum())
    elif args.stage == "adj":
        sino = jnp.asarray(
            rng.standard_normal((n_proj, n * n)).astype(np.float32))
        x = sp.backproject(sino, geom, views, quad=args.quad)
        jax.block_until_ready(x)
        chk = float(jnp.abs(x).sum())
    elif args.stage == "chain":
        gstruct, scalars = sp.scalar_groups(geom, views, args.quad)

        @jax.jit
        def chain(v, sc):
            y = sp.project_scalars(v, geom, gstruct, sc, args.quad)
            return sp.backproject_scalars(y, geom, gstruct, sc, args.quad)

        x = chain(vol, scalars)
        jax.block_until_ready(x)
        chk = float(jnp.abs(x).sum())
    else:  # cgls — the exact program that crashes in baseline_config5
        from tomojax.align.pipeline import _slab_recon_prog
        gstruct, scalars = sp.scalar_groups(geom, views, args.quad)
        proj = sp.project(vol, geom, views, quad=args.quad)
        jax.block_until_ready(proj)
        print(f"[pre] datagen ok t={time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        prog = _slab_recon_prog(geom, args.quad, "cgls", args.niter,
                                False, gstruct, "float32")
        x0 = jnp.zeros(geom.vox_shape, jnp.float32)
        x, rms, nit = prog(x0, proj.reshape(n_proj, -1), scalars)
        jax.block_until_ready(x)
        chk = float(jnp.abs(x).sum())
    dt = time.perf_counter() - t0
    print(f"OK stage={args.stage} size={n} views={n_proj} "
          f"quad={args.quad} niter={args.niter} "
          f"K={os.environ.get('TOMOJAX_SLAB_K', 'auto')} "
          f"kern={os.environ.get('TOMOJAX_SLAB_KERNEL', 'on')} "
          f"t={dt:.1f}s chk={chk:.3e}", flush=True)


if __name__ == "__main__":
    main()
