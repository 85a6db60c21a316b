"""Isolate the 64^3 exact-stage (arc) worker crash.

The c64 probe's fast stage (plane SIRT, frozen groups) runs fine; the
first arc-quad CGLS execution kills the worker. This drives the arc
pieces one by one at 64^3/90 views: eager fwd, eager adjoint (transpose
kernel), scalar-argument fwd/adjoint under jit, then a jitted CGLS-5.
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

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
t = np.zeros((n_proj, 3))
t[:, 0] = rng.uniform(-0.6, 0.6, n_proj)
t[:, 2] = rng.uniform(-0.6, 0.6, n_proj)
# roughly what the fast stage leaves behind: sub-pixel t, ~0.5 deg tilts
views = Views.create(n_proj, phi=phi,
                     alpha=rng.uniform(-0.01, 0.01, n_proj),
                     beta=rng.uniform(-0.01, 0.01, n_proj), t=t)
views = jax.tree.map(np.asarray, views)


def tick(label, f):
    t0 = time.perf_counter()
    r = jax.block_until_ready(f())
    print(f"{label:45s} {time.perf_counter() - t0:7.2f}s "
          f"|sum|={float(jnp.sum(jnp.abs(r))):.4e}", flush=True)
    return r


sino = tick("eager fwd arc", lambda: sp.project(vol, geom, views,
                                                quad="arc"))
tick("eager adjoint arc", lambda: sp.backproject(sino, geom, views,
                                                 quad="arc"))

gstruct, scalars = sp.scalar_groups(geom, views, "arc", jnp.float32)
print("groups:", [(len(g[0]), g[1], g[2], g[3], g[4]) for g in gstruct],
      flush=True)
fwd = jax.jit(lambda v, sc: sp.project_scalars(v, geom, gstruct, sc,
                                               "arc"))
adj = jax.jit(lambda s, sc: sp.backproject_scalars(s, geom, gstruct, sc,
                                                   "arc"))
s1 = tick("jit scalar fwd arc", lambda: fwd(vol, scalars))
tick("jit scalar adj arc", lambda: adj(s1, scalars))

from tomojax.align.pipeline import _slab_recon_prog
prog = _slab_recon_prog(geom, "arc", "cgls", 20, False, gstruct, "float32")
tick("jit cgls-20 arc", lambda: prog(jnp.zeros(geom.vox_shape), s1,
                                    scalars)[0])
tick("jit cgls-20 arc (again)", lambda: prog(jnp.zeros(geom.vox_shape),
                                            s1, scalars)[0])
print("ALL OK", flush=True)
