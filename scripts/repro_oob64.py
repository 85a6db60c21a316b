"""Force the slab kernel beyond its band budget at 64^3 (uk frozen True).

If any dynamic index in the fwd/adjoint kernel is unclipped, this
faults the worker; if all are clipped the results are merely inaccurate
near the budget edge (graceful degradation contract).
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
from tomojax.kernels import slab as slabk

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
t = np.zeros((n_proj, 3))
t[:, 0] = rng.choice([-2.9, 2.9], n_proj)
t[:, 2] = rng.choice([-2.9, 2.9], n_proj)
views = Views.create(n_proj, phi=phi,
                     alpha=rng.choice([-0.02, 0.02], n_proj),
                     beta=rng.choice([-0.02, 0.02], n_proj), t=t)
views = jax.tree.map(np.asarray, views)


def tick(label, f):
    t0 = time.perf_counter()
    r = jax.block_until_ready(f())
    print(f"{label:45s} {time.perf_counter() - t0:7.2f}s "
          f"|sum|={float(jnp.sum(jnp.abs(r))):.4e}", flush=True)
    return r


gstruct, scalars = sp.scalar_groups(geom, views, "arc", jnp.float32)
print("honest groups:", [(len(g[0]), g[4]) for g in gstruct], flush=True)
# force the kernel on regardless of the band budget (what a frozen True
# flag does when theta drifts out of budget)
gstruct = tuple((g[0], g[1], g[2], g[3], True) for g in gstruct)

fwd = jax.jit(lambda v, sc: sp.project_scalars(v, geom, gstruct, sc,
                                               "arc"))
adj = jax.jit(lambda s, sc: sp.backproject_scalars(s, geom, gstruct, sc,
                                                   "arc"))
s1 = tick("jit kernel fwd arc (forced, oob)", lambda: fwd(vol, scalars))
tick("jit kernel adj arc (forced, oob)", lambda: adj(s1, scalars))
tick("fwd again", lambda: fwd(vol, scalars))
tick("adj again", lambda: adj(s1, scalars))
print("ALL OK", flush=True)
