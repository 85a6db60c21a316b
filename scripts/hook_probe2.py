"""Probe 2: object-support moment mask (see hook_probe.py for findings).

hook_probe.py measured, at 64^3 / 90 views / ±2 px ±1°:
  * unmasked + perfect recon:   recovery 1.004, resid 2.0e-4  (identity holds)
  * unmasked + CGLS recon:      recovery 0.296            (corner absorption)
  * FOV mask (radius 27.4):     recovery 0.89, bias 2.0e-3 (mask clips the
    object shell; the measured data's own detector-edge truncation no
    longer cancels differentially)

Hypothesis: a mask at the OBJECT's support radius (+margin) blocks the
corner absorption (corners are far outside support) while keeping the
shell, so the data-side truncation cancels against the synth's identical
clipping.  Sweep mask radii; also an adaptive data-driven support mask.
"""
import os
import sys
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom
from tomojax.core import slab_projector as sp
from tomojax.align.cc import moment_match
from tomojax.align.pipeline import _project_out_gauge
from tomojax.core.operators import make_operator
from tomojax.recon import cgls as _cgls

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
amax = np.deg2rad(1.0)
truth = {k: rng.uniform(-b, b, n_proj) for k, b in
         [("tx", 2.0), ("tz", 2.0)]}
truth["alpha"] = rng.uniform(-amax, amax, n_proj)
truth["beta"] = rng.uniform(-amax, amax, n_proj)
t_true = np.zeros((n_proj, 3))
t_true[:, 0] = truth["tx"]
t_true[:, 2] = truth["tz"]
views_true = Views.create(n_proj, phi=phi, alpha=truth["alpha"],
                          beta=truth["beta"], t=t_true)
meas = sp.project(vol, geom, views_true, quad="arc").reshape(n_proj, -1)

delta = 3e-3 * np.cos(2 * phi) + 2e-3 * np.sin(3 * phi)
delta_ng = _project_out_gauge(np.stack([delta, 0 * delta], 1), phi)[:, 0]
t_pert = t_true.copy()
t_pert[:, 0] += delta
views_pert = Views.create(n_proj, phi=phi, alpha=truth["alpha"],
                          beta=truth["beta"], t=t_pert)

op = make_operator(geom, views_pert, family="slab", dtype=jnp.float32)
rec = _cgls(op, meas, niter=120).x.reshape(geom.vox_shape)
jax.block_until_ready(rec)


def radial_mask(radius, rv):
    x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
    r2 = x[:, None] ** 2 + x[None, :] ** 2
    m = (r2 <= radius * radius)[:, :, None] & \
        (np.abs(x) <= rv)[None, None, :]
    return jnp.asarray(m, jnp.float32)


def probe(x_rec, mask, label, views_s=views_pert, target=delta_ng):
    y = x_rec * mask if mask is not None else x_rec
    synth = sp.project(y, geom, views_s, quad="arc").reshape(n_proj, -1)
    dmom = _project_out_gauge(moment_match(meas, synth, geom.det_shape),
                              phi)
    du = dmom[:, 0]
    if target is not None:
        num = float(np.dot(du, -target))
        den = float(np.dot(target, target))
        print(f"{label:34s} recovery={num/den:+.4f} "
              f"rms(resid)={(du + target).std():.3e}", flush=True)
    else:
        print(f"{label:34s} bias rms tx={du.std():.3e} "
              f"tz={dmom[:, 1].std():.3e}", flush=True)


for r in [31.0, 30.0, 29.0, 27.4]:
    probe(rec, radial_mask(r, min(r, 31.0)), f"CGLS recon, mask r={r}")

# intrinsic bias at zero perturbation (synth at true theta, recon from
# TRUE-theta CGLS — the end-state of a converged pipeline)
op0 = make_operator(geom, views_true, family="slab", dtype=jnp.float32)
rec0 = _cgls(op0, meas, niter=120).x.reshape(geom.vox_shape)
jax.block_until_ready(rec0)
for r in [31.0, 30.0]:
    probe(rec0, radial_mask(r, min(r, 31.0)),
          f"zero-pert bias, mask r={r}", views_s=views_true, target=None)
probe(vol, radial_mask(31.0, 31.0),
      "zero-pert bias, phantom, r=31", views_s=views_true, target=None)
