"""Probe the exactness of the Helgason-Ludwig first-moment hook at 64^3.

Question (round 3): the alternation's tx error floors at ~2.4e-3 px with
80% of the energy in a smooth-in-phi mode; the moment hook should measure
exactly that mode, yet in the hooked runs its per-outer correction was ~3x
smaller than the actual error.  Is the hook's *measurement* attenuated
(detector-edge truncation / discretization breaking the moment identity),
or is it exact and the recon pull-back is the limiter?

Protocol: slab-family data (self-consistent), truth theta + known smooth
tx perturbation delta(phi) = A*cos(2*phi) + B*sin(3*phi).  Measure the
hook correction dmom with
  (a) x_rec = the true phantom (perfect recon),
  (b) x_rec = CGLS-120 recon from the perturbed theta (realistic).
Report recovery ratio <dmom, -delta_ng>/<delta_ng, delta_ng> and rms
residual of (dmom + delta_ng), where delta_ng is the gauge-projected
perturbation.
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
from tomojax.align.pipeline import _fov_mask, _project_out_gauge
from tomojax.core.operators import make_operator
from tomojax.recon import cgls as _cgls

n, n_proj = 64, 90
geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
rng = np.random.default_rng(0)
phi = np.linspace(0.0, np.pi, n_proj)
amax = np.deg2rad(1.0)
truth = {
    "tx": rng.uniform(-2, 2, n_proj),
    "tz": rng.uniform(-2, 2, n_proj),
    "alpha": rng.uniform(-amax, amax, n_proj),
    "beta": rng.uniform(-amax, amax, n_proj),
}
t_true = np.zeros((n_proj, 3))
t_true[:, 0] = truth["tx"]
t_true[:, 2] = truth["tz"]
views_true = Views.create(n_proj, phi=phi, alpha=truth["alpha"],
                          beta=truth["beta"], t=t_true)
meas = sp.project(vol, geom, views_true, quad="arc").reshape(n_proj, -1)

# smooth non-gauge perturbation on tx
delta = 3e-3 * np.cos(2 * phi) + 2e-3 * np.sin(3 * phi)
d2 = np.stack([delta, np.zeros_like(delta)], 1)
delta_ng = _project_out_gauge(d2, phi)[:, 0]

t_pert = t_true.copy()
t_pert[:, 0] += delta
views_pert = Views.create(n_proj, phi=phi, alpha=truth["alpha"],
                          beta=truth["beta"], t=t_pert)

tilt = float(np.max(np.abs(np.concatenate([truth["alpha"], truth["beta"]]))))
slop = tilt * n / 2.0 + 2.0
margin = float(np.abs(t_pert[:, 0]).max()) + slop
mom_mask = jnp.asarray(_fov_mask(geom, margin, float(np.abs(t_pert[:, 2]).max()) + slop),
                       jnp.float32)


def probe(x_rec, label, mask=True):
    y = x_rec * mom_mask if mask else x_rec
    synth = sp.project(y, geom, views_pert, quad="arc").reshape(n_proj, -1)
    dmom = moment_match(meas, synth, geom.det_shape)
    dmom = _project_out_gauge(dmom, phi)
    du = dmom[:, 0]
    num = float(np.dot(du, -delta_ng))
    den = float(np.dot(delta_ng, delta_ng))
    resid = du + delta_ng
    print(f"{label:28s} recovery={num/den:+.4f} "
          f"rms(resid)={resid.std():.3e} rms(target)={delta_ng.std():.3e}",
          flush=True)
    return du


probe(vol, "perfect recon, masked")
probe(vol, "perfect recon, unmasked", mask=False)

# realistic recon from perturbed theta
op = make_operator(geom, views_pert, family="slab", dtype=jnp.float32)
rec = _cgls(op, meas, niter=120).x
jax.block_until_ready(rec)
probe(rec, "CGLS-120 recon, masked")
probe(rec, "CGLS-120 recon, unmasked", mask=False)

# and with zero perturbation: pure bias floor of the measurement
synth0 = sp.project(vol * mom_mask, geom, views_true,
                    quad="arc").reshape(n_proj, -1)
b0 = _project_out_gauge(moment_match(meas, synth0, geom.det_shape), phi)
print(f"zero-perturbation bias: rms tx {b0[:, 0].std():.3e} "
      f"tz {b0[:, 1].std():.3e} px", flush=True)
