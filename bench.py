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
    # with better per-view accuracy; slab-arc is the reference-grade tier
    # (TOMOJAX_BENCH_FAMILY=slab). TOMOJAX_BENCH_PREC selects the kernel
    # matmul tier (f32x2 default; bf16 = the bulk-iteration tier).
    family = os.environ.get("TOMOJAX_BENCH_FAMILY", "slab_plane")
    prec = os.environ.get("TOMOJAX_BENCH_PREC", "f32x2")
    from jax import lax
    if family == "fast":
        from tomojax.core import fast_projector as fp
        fwd = lambda v: fp.project(v, geom, views)
        adj = lambda y: fp.backproject(y, geom, views)
    elif family in ("slab", "slab_plane"):
        from tomojax.core import slab_projector as sp
        quad = "arc" if family == "slab" else "plane"
        gstruct, scalars = sp.scalar_groups(geom, views, quad)
        fwd = lambda v: sp.project_scalars(v, geom, gstruct, scalars,
                                           quad, prec=prec)
        adj = lambda y: sp.backproject_scalars(y, geom, gstruct, scalars,
                                               quad, prec=prec)
    else:
        fwd = lambda v: projector.project(v, geom, views)
        adj = lambda y: projector.backproject(y, geom.vox_shape,
                                              geom, views)

    # ALL reps chain inside ONE device program (lax.scan with a data
    # dependency between iterations): production solvers hold many
    # applies per program (CGLS runs 2 iterations = 4 applies per
    # program at 512³), so the per-program axon tunnel dispatch
    # (~20 ms/call measured round 4) is amortized exactly as in real
    # use. Round-3 benches paid that dispatch once per rep; eager
    # chaining before that cost a round-trip per OP.
    @jax.jit
    def run(x0):
        def body(x, _):
            back = adj(fwd(x))
            return x0 + 1e-30 * back, None
        out, _ = lax.scan(body, x0, None, length=reps)
        return out

    x = run(vol)
    jax.block_until_ready(x)

    best = np.inf
    for _ in range(3):
        # outer calls chain through x too: identical-argument repeat
        # executions are result-cached by the axon runtime (measured
        # round 3)
        t0 = time.perf_counter()
        x = run(x)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - t0)

    proj_per_s = reps * n_proj / best
    rec = {
        "metric": f"projections/sec, {n}^3 volume fwd+adjoint "
                  f"({n_proj} views, {family} matrix-free projector, "
                  f"{prec} kernel tier)",
        "value": round(proj_per_s, 3),
        "unit": "proj/s",
        "vs_baseline": round(proj_per_s / REFERENCE_CPU_PROJ_PER_S, 3),
    }

    if family in ("slab", "slab_plane"):
        # quantified speed-of-light statement (BASELINE north star):
        # per-direction times + the analytic byte/flop model of the
        # kernel dataflow -> achieved fraction of the MXU and HBM roofs
        from tomojax.utils.roofline import roofline

        @jax.jit
        def run_fwd(x0):
            def body(x, _):
                y = fwd(x)
                return x0 + 1e-30 * jnp.sum(y), None
            out, _ = lax.scan(body, x0, None, length=reps)
            return out

        sino0 = fwd(vol)

        @jax.jit
        def run_adj(y0):
            def body(y, _):
                back = adj(y)
                return y0 + 1e-30 * jnp.sum(back), None
            out, _ = lax.scan(body, y0, None, length=reps)
            return out

        times = {}
        for name, fn, arg in (("fwd", run_fwd, vol),
                              ("adj", run_adj, sino0)):
            z = fn(arg)
            jax.block_until_ready(z)
            tb = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                z = fn(z if name == "fwd" else z)
                jax.block_until_ready(z)
                tb = min(tb, time.perf_counter() - t0)
            times[name] = tb / reps
        kind = jax.devices()[0].device_kind
        rl = roofline(geom, quad, prec, times["fwd"], times["adj"],
                      device_kind=kind)
        rec["roofline"] = {
            "device_kind": kind,
            "fwd_proj_per_s": round(n_proj / times["fwd"], 1),
            "adj_proj_per_s": round(n_proj / times["adj"], 1),
        }
        for d in ("fwd", "adj"):
            rec["roofline"][d] = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in rl[d].items()
                if k in ("gflops", "gbytes_per_s", "pct_mxu", "pct_hbm",
                         "bound", "pct_sol")}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
