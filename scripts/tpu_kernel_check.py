"""TPU slab-kernel gate: octant parity, adjoint dot-test, throughput.

The interpret-mode tests (tests/test_slab_kernel.py) validate the math on
CPU; this script is the Mosaic/hardware gate plus the microbenchmark,
meant to be run under ``timeout`` on the (flaky) TPU worker:

    timeout 900 python scripts/tpu_kernel_check.py --check
    timeout 900 python scripts/tpu_kernel_check.py --perf --size 256
    timeout 900 python scripts/tpu_kernel_check.py --profile --size 256

Results land in docs/STATUS.md tables.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _views(n_proj, seed=0, jit_px=1.5, jit_rad=0.012, phi0=0.0):
    from tomojax.core.geometry import Views
    rng = np.random.default_rng(seed)
    return Views.create(
        n_proj, phi=phi0 + np.linspace(0, 2 * np.pi, n_proj,
                                       endpoint=False),
        alpha=rng.uniform(-jit_rad, jit_rad, n_proj),
        beta=rng.uniform(-jit_rad, jit_rad, n_proj),
        t=rng.uniform(-jit_px, jit_px, (n_proj, 3)))


def check(size):
    """Kernel vs XLA per octant + adjoint dot test (hardware gate)."""
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry
    from tomojax.core import phantom
    from tomojax.core import slab_projector as sp
    from tomojax.kernels import slab as slabk

    n = size
    geom = Geometry(n_proj=8, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _views(8)
    rng = np.random.default_rng(7)
    worst = 0.0
    for quad in ("arc", "plane"):
        for idx, sw, yf, uf in sp._orient_groups(
                jax.tree.map(np.asarray, views), geom):
            sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
            sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, quad)
            assert slabk.kernel_bounds_ok(sc, nv=n), (sw, yf, uf)
            vol_or = sp.orient_volume(jnp.asarray(vol, jnp.float32),
                                      geom, sw, yf)
            scj = jnp.asarray(sc, jnp.float32)
            ker = np.asarray(slabk.slab_project_pallas(vol_or, scj, geom,
                                                       quad))
            ref = np.stack([np.asarray(sp.forward_from_scalars_xla(
                vol_or, scj[i], geom, quad)) for i in range(len(idx))])
            rel = np.linalg.norm(ker - ref) / max(np.linalg.norm(ref),
                                                  1e-9)
            worst = max(worst, rel)
            status = "ok" if rel < 5e-4 else "FAIL"
            print(f"[check {quad}] octant {(sw, yf, uf)}: rel={rel:.2e} "
                  f"{status}", flush=True)
            # adjoint dot test on this group
            y = jnp.asarray(rng.standard_normal(ker.shape), jnp.float32)
            aty = slabk.slab_backproject_pallas(y, scj, geom, quad)
            lhs = float(jnp.vdot(jnp.asarray(ker), y))
            rhs = float(jnp.vdot(vol_or, aty))
            drel = abs(lhs - rhs) / max(abs(lhs), 1.0)
            worst = max(worst, drel)
            print(f"[check {quad}] octant {(sw, yf, uf)}: "
                  f"adjoint dot rel={drel:.2e}", flush=True)
    print(f"[check] worst rel = {worst:.2e} "
          f"({'PASS' if worst < 5e-4 else 'FAIL'})", flush=True)
    return worst < 5e-4


def check_bf16(size):
    """Hardware contract gate for the bf16 bulk tier.

    Interpret mode cannot observe bf16 rounding (XLA elides it under
    excess precision, docs/STATUS.md r4), so the tier's error bounds are
    pinned HERE, on the real MXU:

    - forward/adjoint vs the f32 XLA reference: rel <= 3e-3 per apply
      (measured ~2e-4..2e-3 across octants/sizes);
    - A/Aᵀ mutual-transpose mismatch |<Ax,y>-<x,Aᵀy>|/|<Ax,y>| <= 5e-3
      — the quantity CGLS actually feels; its documented operating
      envelope is this bound + reinit_tol=1e-3 (the bf16 default, see
      tomojax.align.pipeline._resolve_reinit_tol) + f32 residual
      re-measurement in the solvers, validated at depth 40 in the
      config-5 records (docs/convergence/config5_tpu_deep_bf16.json).
    """
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry
    from tomojax.core import phantom
    from tomojax.core import slab_projector as sp
    from tomojax.kernels import slab as slabk

    n = size
    geom = Geometry(n_proj=8, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _views(8)
    rng = np.random.default_rng(7)
    worst_f, worst_d = 0.0, 0.0
    for quad in ("arc", "plane"):
        for idx, sw, yf, uf in sp._orient_groups(
                jax.tree.map(np.asarray, views), geom):
            sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
            sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, quad)
            vol_or = sp.orient_volume(jnp.asarray(vol, jnp.float32),
                                      geom, sw, yf)
            scj = jnp.asarray(sc, jnp.float32)
            ker = np.asarray(slabk.slab_project_pallas(
                vol_or, scj, geom, quad, prec="bf16"))
            ref = np.stack([np.asarray(sp.forward_from_scalars_xla(
                vol_or, scj[i], geom, quad)) for i in range(len(idx))])
            rel = np.linalg.norm(ker - ref) / max(np.linalg.norm(ref),
                                                  1e-9)
            worst_f = max(worst_f, rel)
            y = jnp.asarray(rng.standard_normal(ker.shape), jnp.float32)
            aty = slabk.slab_backproject_pallas(y, scj, geom, quad,
                                                prec="bf16")
            lhs = float(jnp.vdot(jnp.asarray(ker), y))
            rhs = float(jnp.vdot(vol_or, aty))
            drel = abs(lhs - rhs) / max(abs(lhs), 1.0)
            worst_d = max(worst_d, drel)
            print(f"[bf16 {quad}] octant {(sw, yf, uf)}: fwd rel="
                  f"{rel:.2e} A/At mismatch={drel:.2e}", flush=True)
    ok = worst_f <= 3e-3 and worst_d <= 5e-3
    print(f"[bf16] worst fwd rel = {worst_f:.2e} (bound 3e-3), "
          f"worst A/At mismatch = {worst_d:.2e} (bound 5e-3) "
          f"({'PASS' if ok else 'FAIL'})", flush=True)
    return ok


def perf(size, n_proj, reps, quad):
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import slab_projector as sp

    n = size
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    views = Views.create(n_proj,
                         phi=np.linspace(0, np.pi, n_proj, endpoint=False),
                         alpha=rng.uniform(-0.017, 0.017, n_proj),
                         beta=rng.uniform(-0.017, 0.017, n_proj), t=t)
    fwd = jax.jit(lambda v: sp.project(v, geom, views, quad=quad))
    adj = jax.jit(lambda y: sp.backproject(y, geom, views, quad=quad))

    t0 = time.perf_counter()
    sino = fwd(vol)
    sino.block_until_ready()
    tc = time.perf_counter() - t0
    print(f"[perf] fwd compile+run: {tc:.1f}s", flush=True)
    back = adj(sino)
    back.block_until_ready()

    for name, fn, arg in (("fwd", fwd, vol), ("adj", adj, sino)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(arg).block_until_ready()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"[perf {quad} {n}^3/{n_proj}v] {name}: "
              f"{n_proj / best:7.1f} proj/s  (best of {reps}: {best:.3f}s;"
              f" all {['%.3f' % x for x in ts]})", flush=True)
    # fused
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        adj(fwd(vol)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"[perf {quad} {n}^3/{n_proj}v] fwd+adj: "
          f"{n_proj / best:7.1f} proj/s  (best {best:.3f}s)", flush=True)


def profile(size, n_proj, quad, outdir):
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import slab_projector as sp

    n = size
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    views = Views.create(n_proj,
                         phi=np.linspace(0, np.pi, n_proj, endpoint=False))
    fwd = jax.jit(lambda v: sp.project(v, geom, views, quad=quad))
    adj = jax.jit(lambda y: sp.backproject(y, geom, views, quad=quad))
    sino = fwd(vol)
    adj(sino).block_until_ready()
    with jax.profiler.trace(outdir):
        for _ in range(2):
            sino = fwd(vol)
            back = adj(sino)
        jax.block_until_ready((sino, back))
    print(f"[profile] trace written to {outdir}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--check-bf16", action="store_true",
                    help="pin the bf16 bulk tier's hardware error "
                         "contract (fwd/adj bounds + A/At mismatch)")
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quad", default="both",
                    choices=["arc", "plane", "both"])
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))

    quads = ["arc", "plane"] if args.quad == "both" else [args.quad]
    ok = True
    if args.check:
        ok = check(args.size)
    if args.check_bf16:
        ok = check_bf16(args.size) and ok
    if args.perf:
        for q in quads:
            perf(args.size, args.views, args.reps, q)
    if args.profile:
        profile(args.size, args.views, quads[0], args.trace_dir)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
