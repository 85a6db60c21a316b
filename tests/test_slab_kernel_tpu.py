"""Fused slab kernel vs XLA path — runs only on real TPU hardware.

The CPU suite forces jax_platforms=cpu (conftest), so these are skipped
there; the driver's TPU bench path and /verify runs exercise them."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom
from tomojax.core import slab_projector as sp
from tomojax.kernels import slab as slabk

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU")


@pytest.mark.slow
def test_kernel_matches_xla_every_octant(monkeypatch):
    n, n_proj = 128, 8
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n), jnp.float32)
    rng = np.random.default_rng(0)
    views = Views.create(
        n_proj, phi=np.linspace(0, 2 * np.pi, n_proj, endpoint=False),
        alpha=rng.uniform(-0.012, 0.012, n_proj),
        beta=rng.uniform(-0.012, 0.012, n_proj),
        t=rng.uniform(-2, 2, (n_proj, 3)))
    monkeypatch.setenv("TOMOJAX_SLAB_KERNEL", "0")
    ref = np.asarray(sp.project(vol, geom, views, quad="arc"))
    monkeypatch.setenv("TOMOJAX_SLAB_KERNEL", "1")
    ker = np.asarray(sp.project(vol, geom, views, quad="arc"))
    rel = np.linalg.norm(ker - ref) / np.linalg.norm(ref)
    assert rel < 2e-3, rel

    # adjoint dot-product identity (kernel transpose)
    y = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    aty = sp.backproject(y, geom, views, quad="arc")
    lhs = float(jnp.vdot(jnp.asarray(ker), y))
    rhs = float(jnp.vdot(vol, aty))
    assert abs(lhs - rhs) < 1e-4 * abs(lhs)
