"""Minimal repro for the 64^3 LM-refine worker crash.

Outer-1 refinement in the c64 convergence study deterministically kills
the TPU worker; outer-0 (alpha=beta=0 seeds) survives. This drives the
same code path piecewise — fused forward kernel, each Jacobian variant,
then one LM step — at 64^3 with nonzero tilts, to isolate the faulting
pass.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom, slab_projector as sp

n, n_proj = 64, 24
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
amax = np.deg2rad(1.2)
t = np.zeros((n_proj, 3))
t[:, 0] = rng.uniform(-2, 2, n_proj)
t[:, 2] = rng.uniform(-2, 2, n_proj)
views = Views.create(n_proj, phi=phi,
                     alpha=rng.uniform(-amax, amax, n_proj),
                     beta=rng.uniform(-amax, amax, n_proj), t=t)
views = jax.tree.map(np.asarray, views)

from tomojax.kernels import slab as slabk


def tick(label, f):
    t0 = time.perf_counter()
    r = jax.block_until_ready(f())
    print(f"{label:50s} {time.perf_counter() - t0:7.2f}s "
          f"sum={float(jnp.sum(jnp.abs(r))):.4e}", flush=True)
    return r


for idx, sw, yf, uf in sp._orient_groups(views, geom):
    sub = sp._take_views(views, idx)
    sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
    ok = slabk.kernel_bounds_ok(sc, nv=n)
    print(f"group ({len(idx)}, sw={sw}, yf={yf}, uf={uf}) bounds_ok={ok}",
          flush=True)
    vol_or = sp.orient_volume(vol, geom, sw, yf)
    scj = jnp.asarray(sc, jnp.float32)
    tick("  fwd arc", lambda: slabk.slab_project_pallas(
        vol_or, scj, geom, "arc"))
    for deriv in ("x", "y", "z", "zm", "zc"):
        tick(f"  deriv={deriv}", lambda: slabk.slab_project_pallas(
            vol_or, scj, geom, "arc", deriv=deriv))
        tick(f"  deriv={deriv} jw", lambda: slabk.slab_project_pallas(
            vol_or, scj, geom, "arc", deriv=deriv, jweight=True))
    tick("  jweight", lambda: slabk.slab_project_pallas(
        vol_or, scj, geom, "arc", jweight=True))
    tick("  rweight", lambda: slabk.slab_project_pallas(
        vol_or, scj, geom, "arc", rweight=True))

print("kernel variants all survived; now one LM step per group",
      flush=True)

from tomojax.align.slab_refine import refine_views_slab
from tomojax.align.refine import PARAM_SETS

th = views.theta6()
lo = th + np.asarray([-3, -3, -3, -np.inf, -.02, -.02])
hi = th + np.asarray([3, 3, 3, np.inf, .02, .02])
meas = sp.project(vol, geom, views, dtype=jnp.float32, quad="arc")
r = tick("refine_views_slab max_iter=2", lambda: refine_views_slab(
    vol, meas, geom, views, mask=PARAM_SETS["xzab"], lower=lo, upper=hi,
    max_iter=2).theta6)
print("ALL OK", flush=True)
