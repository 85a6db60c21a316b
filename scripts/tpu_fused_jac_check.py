"""Mosaic/hardware gate for the fused 12-output Jacobian kernel.

Interpret-mode parity lives in tests/test_slab_kernel.py
(test_fused_jac_kernel_matches_individual_passes); this script compiles
and runs the fused kernel on the real TPU, checks every slice against
the per-variant kernel launches, and times fused vs 12-launch:

    timeout 1200 python scripts/tpu_fused_jac_check.py --size 64
    timeout 2400 python scripts/tpu_fused_jac_check.py --size 256 --perf
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--perf", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import phantom
    from tomojax.core import slab_projector as sp
    from tomojax.kernels import slab as slabk

    n = args.size
    geom = Geometry(n_proj=args.views, vox_shape=(n,) * 3,
                    det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    rng = np.random.default_rng(0)
    views = Views.create(
        args.views, phi=0.6 + np.linspace(0, np.pi, args.views,
                                          endpoint=False),
        alpha=rng.uniform(-0.012, 0.012, args.views),
        beta=rng.uniform(-0.012, 0.012, args.views),
        t=rng.uniform(-1.5, 1.5, (args.views, 3)))
    groups = list(sp._orient_groups(jax.tree.map(np.asarray, views),
                                    geom))
    idx, sw, yf, uf = max(groups, key=lambda g: len(g[0]))
    sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
    sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
    assert slabk.kernel_bounds_ok(sc, nv=geom.det_shape[1])
    vol_or = sp.orient_volume(jnp.asarray(vol, jnp.float32), geom, sw, yf)
    scj = jnp.asarray(sc, jnp.float32)

    t0 = time.perf_counter()
    fused_fn = jax.jit(lambda v, s: slabk.slab_project_jac_pallas(
        v, s, geom))
    fused = np.asarray(fused_fn(vol_or, scj))
    print(f"[fused] compile+run {time.perf_counter() - t0:.1f}s "
          f"shape {fused.shape}", flush=True)

    variants = {"val": {}, "px": dict(deriv="x"), "py": dict(deriv="y"),
                "pz": dict(deriv="z"),
                "jx": dict(deriv="x", jweight=True),
                "jy": dict(deriv="y", jweight=True),
                "jz": dict(deriv="z", jweight=True),
                "rx": dict(deriv="x", rweight=True),
                "ry": dict(deriv="y", rweight=True),
                "rz": dict(deriv="z", rweight=True),
                "zm": dict(deriv="zm"), "zc": dict(deriv="zc")}
    worst = 0.0
    t0 = time.perf_counter()
    singles = {}
    for name in slabk.JAC_PASSES:
        kw = variants[name]
        fn = jax.jit(lambda v, s, kw=kw: slabk.slab_project_pallas(
            v, s, geom, "arc", **kw))
        singles[name] = fn
        ref = np.asarray(fn(vol_or, scj))
        i = slabk.JAC_PASSES.index(name)
        rel = (np.linalg.norm(fused[:, i] - ref)
               / max(np.linalg.norm(ref), 1e-6))
        worst = max(worst, rel)
        print(f"  {name}: rel {rel:.2e}", flush=True)
    print(f"[singles] compile+run {time.perf_counter() - t0:.1f}s; "
          f"worst rel {worst:.2e}", flush=True)
    assert worst < 1e-5, worst

    if args.perf:
        for reps, label, run in (
                (20, "fused x20", lambda: fused_fn(vol_or, scj)),
                (20, "12-singles x20",
                 lambda: [singles[nm](vol_or, scj)
                          for nm in slabk.JAC_PASSES])):
            out = run()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"[perf] {label}: {dt * 1e3:.1f} ms/iter "
                  f"({len(idx)} views)", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
