import numpy as np
import jax.numpy as jnp
import pytest

from tomojax.core.geometry import Geometry, Views
from tomojax.core import projector
from tomojax import native


pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


def _setup(n=16):
    rng = np.random.default_rng(0)
    vol = rng.random((n, n, n))
    geom = Geometry(n_proj=1, vox_shape=(n, n, n), det_shape=(n, n))
    return vol, geom


def test_native_forward_matches_jax_exact():
    vol, geom = _setup()
    args = dict(phi=0.7, alpha=0.011, beta=-0.007)
    t = np.array([0.6, 0.0, -0.3])
    cor = np.array([0.4, 0.0, 0.0])
    got = native.forward_view(vol, geom, args["phi"], args["alpha"],
                              args["beta"], t, cor)
    want = np.asarray(projector.forward_view(
        jnp.asarray(vol), geom, args["phi"], args["alpha"], args["beta"],
        jnp.asarray(t), jnp.asarray(cor), dtype=jnp.float64))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_adjoint_matches_jax_exact():
    vol, geom = _setup()
    rng = np.random.default_rng(1)
    y = rng.random(geom.n_det)
    got = native.backproject_view(y, geom, 0.4, 0.005, -0.003,
                                  np.array([0.2, 0.0, 0.1]))
    want = np.asarray(projector.backproject_view(
        jnp.asarray(y), geom.vox_shape, geom, 0.4, 0.005, -0.003,
        jnp.asarray([0.2, 0.0, 0.1]), jnp.zeros(3), dtype=jnp.float64))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_sparse_coo_reconstructs_forward():
    vol, geom = _setup(12)
    det_inds, dat_inds, wts = native.sparse_view_coo(
        geom, 0.9, 0.0, 0.0, np.zeros(3))
    # A·x from the COO triplets must equal the fused forward
    out = np.zeros(geom.n_det)
    np.add.at(out, det_inds, wts * vol.ravel()[dat_inds])
    want = native.forward_view(vol, geom, 0.9, 0.0, 0.0, np.zeros(3))
    np.testing.assert_allclose(out, want, rtol=1e-12, atol=1e-12)
