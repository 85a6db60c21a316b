"""Model-mismatch floor diagnostic for the c64 study.

The c64 run (data generated with the exact ray family, solved with the
slab-arc family) plateaus at vol rel-L2 ~0.30. This measures, on the
same cached data and at the TRUE rigid parameters:

  (a) slab-arc CGLS-120  -> mismatch floor (exact data, slab model)
  (b) exact-consistent check: slab-arc CGLS-120 on slab-arc-generated
      data -> the solver/depth floor without mismatch
  (c) per-view forward discrepancy |P_slab - P_exact| at true theta

to separate operator mismatch from solver depth and alignment error.
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
from tomojax.align.pipeline import _slab_recon_prog

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
pn = np.asarray(vol, np.float64)
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
amax = np.deg2rad(1.0)
t = np.zeros((n_proj, 3))
t[:, 0] = rng.uniform(-2, 2, n_proj)
t[:, 2] = rng.uniform(-2, 2, n_proj)
views = Views.create(n_proj, phi=phi,
                     alpha=rng.uniform(-amax, amax, n_proj),
                     beta=rng.uniform(-amax, amax, n_proj), t=t)

_cache = "/tmp/c64_full.ckpt/data.npz"
if os.path.exists(_cache):
    proj_exact = jnp.asarray(np.load(_cache)["proj"])
else:
    from tomojax.core import projector
    print("[gen] exact-family projection (cache miss)", flush=True)
    proj_exact = projector.project(vol, geom, views)
    jax.block_until_ready(proj_exact)
    os.makedirs(os.path.dirname(_cache), exist_ok=True)
    np.savez_compressed(_cache, proj=np.asarray(proj_exact))
proj_slab = sp.project(vol, geom, views, quad="arc")
jax.block_until_ready(proj_slab)

pe = np.asarray(proj_exact, np.float64).reshape(n_proj, -1)
ps = np.asarray(proj_slab, np.float64).reshape(n_proj, -1)
dv = np.linalg.norm(pe - ps, axis=1) / np.linalg.norm(pe, axis=1)
print(f"(c) per-view |P_slab - P_exact|/|P_exact| at true theta: "
      f"mean {dv.mean():.2e} max {dv.max():.2e}", flush=True)

gstruct, scalars = sp.scalar_groups(geom, views, "arc")


def cgls(b, niter=120, chunk=20):
    x = jnp.zeros(geom.vox_shape, jnp.float32)
    done = 0
    while done < niter:
        nit = min(chunk, niter - done)
        prog = _slab_recon_prog(geom, "arc", "cgls", nit, False, gstruct,
                                "float32")
        x, _, _ = prog(x, b, scalars)
        done += nit
    return np.asarray(jax.block_until_ready(x), np.float64)


for label, b in (("(a) exact data, slab model", proj_exact),
                 ("(b) slab data, slab model", proj_slab)):
    t0 = time.perf_counter()
    xn = cgls(b.reshape(n_proj, -1))
    rel = np.linalg.norm(xn - pn) / np.linalg.norm(pn)
    print(f"{label}: CGLS-120 rel-L2 {rel:.4f} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

# (d) LM-at-truth bias: start the slab-family batched LM from the TRUE
# parameters with the TRUE volume on exact-family data. Any systematic
# walk-away from truth is the model-mismatch bias floor of the
# alignment estimate itself (independent of recon depth).
from tomojax.align.slab_refine import refine_views_slab

th_true = np.asarray(views.theta6(), np.float64)
lo = th_true - 0.5
hi = th_true + 0.5
from tomojax.align.refine import PARAM_SETS
mask = PARAM_SETS["xzab"]
for label, data in (("(d) exact data", proj_exact),
                    ("(e) slab data", proj_slab)):
    t0 = time.perf_counter()
    ref = refine_views_slab(vol, data, geom, views, mask=mask,
                            lower=jnp.asarray(lo), upper=jnp.asarray(hi),
                            max_iter=40)
    dth = np.asarray(ref.theta6, np.float64) - th_true
    names = ["tx", "ty", "tz", "phi", "alpha", "beta"]
    msg = " ".join(f"{nm}:{np.abs(dth[:, i]).mean():.2e}/"
                   f"{np.abs(dth[:, i]).max():.2e}"
                   for i, nm in enumerate(names) if mask[i])
    print(f"{label}: LM-at-truth walk-away (mean/max) {msg} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
print("done")
