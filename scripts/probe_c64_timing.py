"""Timing probe: where does a 64^3 convergence-study outer iteration go?

Times each pipeline stage twice with identical views and once with
perturbed views, separating compile/trace cost from steady-state cost.
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
from tomojax.core import phantom, slab_projector
from tomojax.core.operators import make_operator
from tomojax.recon import cgls as _cgls, sirt as _sirt

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
amax = np.deg2rad(1.0)
t = np.zeros((n_proj, 3))
t[:, 0] = rng.uniform(-2, 2, n_proj)
t[:, 2] = rng.uniform(-2, 2, n_proj)
views = Views.create(n_proj, phi=phi, alpha=rng.uniform(-amax, amax, n_proj),
                     beta=rng.uniform(-amax, amax, n_proj), t=t)


def tick(label, f):
    t0 = time.perf_counter()
    r = f()
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt:8.2f}s", flush=True)
    return r


# --- data gen (slab arc == what the study uses at 64^3? no: study uses
# exact ray family for gen; time one slab projection here instead)
op_plane = make_operator(geom, views, family="slab_plane")
proj = tick("slab_plane A(x) first (compile)", lambda: op_plane.A(vol))
tick("slab_plane A(x) second", lambda: op_plane.A(vol))
tick("slab_plane AT(y) first", lambda: op_plane.AT(proj))
tick("slab_plane AT(y) second", lambda: op_plane.AT(proj))

# --- CGLS 10 iters
tick("cgls niter=10 call 1 (compile)",
     lambda: _cgls(op_plane, proj, niter=10).x)
tick("cgls niter=10 call 2 (same views)",
     lambda: _cgls(op_plane, proj, niter=10).x)

views2 = Views.create(n_proj, phi=phi,
                      alpha=np.asarray(views.alpha) + 1e-3,
                      beta=np.asarray(views.beta), t=t)
op2 = make_operator(geom, views2, family="slab_plane")
tick("cgls niter=10 call 3 (perturbed views)",
     lambda: _cgls(op2, proj, niter=10).x)

# --- SIRT 10 iters (bulk stage uses sirt)
tick("sirt niter=10 call 1 (compile)",
     lambda: _sirt(op_plane, proj, niter=10).x)
tick("sirt niter=10 call 2", lambda: _sirt(op_plane, proj, niter=10).x)
tick("sirt niter=10 call 3 (perturbed)",
     lambda: _sirt(op2, proj, niter=10).x)

# --- slab arc family (polish stage)
op_arc = make_operator(geom, views, family="slab")
tick("cgls(arc) niter=10 call 1 (compile)",
     lambda: _cgls(op_arc, proj, niter=10).x)
tick("cgls(arc) niter=10 call 2",
     lambda: _cgls(op_arc, proj, niter=10).x)

# --- lm_slab refinement
from tomojax.align.slab_refine import refine_views_slab
lo = views.theta6() + jnp.asarray([-3, -3, -3, -np.inf, -.02, -.02])
hi = views.theta6() + jnp.asarray([3, 3, 3, np.inf, .02, .02])
from tomojax.align.refine import PARAM_SETS
mask = PARAM_SETS["xzab"]
tick("refine_views_slab max_iter=2 call 1 (compile)",
     lambda: refine_views_slab(vol, proj, geom, views, mask=mask,
                               lower=lo, upper=hi, max_iter=2).theta6)
tick("refine_views_slab max_iter=2 call 2",
     lambda: refine_views_slab(vol, proj, geom, views, mask=mask,
                               lower=lo, upper=hi, max_iter=2).theta6)
tick("refine_views_slab max_iter=2 call 3 (perturbed)",
     lambda: refine_views_slab(vol, proj, geom, views2, mask=mask,
                               lower=lo, upper=hi, max_iter=2).theta6)
tick("refine_views_slab max_iter=12 (steady)",
     lambda: refine_views_slab(vol, proj, geom, views, mask=mask,
                               lower=lo, upper=hi, max_iter=12).theta6)
print("done")
