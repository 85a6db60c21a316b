"""tomojax benchmark — projections/sec for fused forward+adjoint.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "proj/s", "vs_baseline": N}

The BASELINE north-star metric is "projections/sec at 256³ fwd+adjoint"
(BASELINE.json). The reference publishes no numbers (BASELINE.md) and its
f2py modules cannot be built here (no gfortran), so ``vs_baseline`` uses a
measured stand-in: the vectorized f64 NumPy implementation of the identical
math (tests/oracle.py) measured 0.0036 proj/s for 256³ fwd+adjoint on this
host (179 s fwd + 99 s adjoint per view, 2026-08-16). Granting the
reference's Fortran inner loops a ~100× speedup over vectorized NumPy gives
a generous 0.4 proj/s baseline estimate, which is what we compare against
(note the reference also needs ~2 GB of COO triplets per 256³ view, so its
CSR path is effectively memory-bound out of practicality at this size).

Env overrides: TOMOJAX_BENCH_SIZE (default 256), TOMOJAX_BENCH_VIEWS
(default 32), TOMOJAX_BENCH_REPS (default 3).
"""

import json
import os
import time

import numpy as np

REFERENCE_CPU_PROJ_PER_S = 0.4  # est. reference CSR build+spmv at 256³


def main():
    import jax
    if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.jax_cache"))
        except Exception:
            pass
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import projector

    n = int(os.environ.get("TOMOJAX_BENCH_SIZE", 256))
    n_proj = int(os.environ.get("TOMOJAX_BENCH_VIEWS", 32))
    reps = int(os.environ.get("TOMOJAX_BENCH_REPS", 3))

    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((n, n, n)), dtype=jnp.float32)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    # realistic acquisition: phis span the half-circle (exercises every
    # marching octant; round-1 benches used all-zero phi)
    views = Views.create(n_proj,
                         phi=np.linspace(0, np.pi, n_proj, endpoint=False),
                         alpha=rng.uniform(-0.017, 0.017, n_proj),
                         beta=rng.uniform(-0.017, 0.017, n_proj), t=t)

    # headline family: the slab-plane kernel beats the round-1 fast
    # family on throughput (37.2 vs 31.9 proj/s fwd+adjoint at 256^3)
    # with better per-view accuracy; slab-arc (21.4) is the
    # reference-grade tier
    family = os.environ.get("TOMOJAX_BENCH_FAMILY", "slab_plane")
    if family == "fast":
        from tomojax.core import fast_projector as fp
        fwd = jax.jit(lambda v: fp.project(v, geom, views))
        adj = jax.jit(lambda y: fp.backproject(y, geom, views))
    elif family in ("slab", "slab_plane"):
        from tomojax.core import slab_projector as sp
        quad = "arc" if family == "slab" else "plane"
        fwd = jax.jit(lambda v: sp.project(v, geom, views, quad=quad))
        adj = jax.jit(lambda y: sp.backproject(y, geom, views, quad=quad))
    else:
        fwd = jax.jit(lambda v: projector.project(v, geom, views))
        adj = jax.jit(lambda y: projector.backproject(y, geom.vox_shape,
                                                      geom, views))

    # one fused device program per rep: iterations chain through a data
    # dependency (the runtime caches repeated executions with identical
    # arguments), and the chaining update lives INSIDE jit — an eager
    # op between reps costs a full tunnel round-trip on axon and was
    # dominating the measurement (72-134 proj/s run-to-run scatter for a
    # 234 proj/s operator)
    @jax.jit
    def step(x, x0):
        sino = fwd(x)
        back = adj(sino)
        return x0 + 1e-30 * back, sino, back

    x, sino, back = step(vol, vol)
    jax.block_until_ready((x, sino, back))

    t0 = time.perf_counter()
    for _ in range(reps):
        x, sino, back = step(x, vol)
    jax.block_until_ready((x, sino, back))
    dt = time.perf_counter() - t0

    proj_per_s = reps * n_proj / dt
    print(json.dumps({
        "metric": f"projections/sec, {n}^3 volume fwd+adjoint "
                  f"({n_proj} views, {family} matrix-free projector)",
        "value": round(proj_per_s, 3),
        "unit": "proj/s",
        "vs_baseline": round(proj_per_s / REFERENCE_CPU_PROJ_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
