"""Pallas resample kernel vs the XLA fallback path (interpret mode on CPU;
the same kernel compiles for TPU where it replaces the fallback)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.kernels.resample import resample_rows_pallas
from tomojax.core.fast_projector import _resample_minor

F32 = jnp.float32


@pytest.mark.parametrize("A,N,M,slope,ms", [
    (32, 256, 256, 1.03, 1.2),
    (16, 256, 512, 1.45, 1.6),
    (16, 128, 128, -1.02, 1.2),
    (8, 128, 512, 1.55, 1.6),
    (24, 256, 256, 0.72, 1.2),
])
def test_kernel_matches_xla_path(A, N, M, slope, ms):
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.random((A, N)), dtype=F32)
    off = jnp.asarray(rng.uniform(-N * 0.5, N * 1.3, (A,)), dtype=F32)
    want = np.asarray(_resample_minor(arr[:, None, :], off[:, None],
                                      jnp.asarray(slope, F32), M, ms)
                      ).reshape(A, M)
    got = np.asarray(resample_rows_pallas(arr, off, jnp.asarray(slope, F32),
                                          M, ms, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_kernel_gradients_match_autodiff():
    rng = np.random.default_rng(1)
    A, N, M, s, ms = 16, 256, 256, 1.04, 1.2
    arr = jnp.asarray(rng.random((A, N)), dtype=F32)
    off = jnp.asarray(rng.uniform(-10, 200, (A,)), dtype=F32)
    g_out = jnp.asarray(rng.random((A, M)), dtype=F32)

    def loss_pallas(a, o, sl):
        return jnp.vdot(resample_rows_pallas(a, o, sl, M, ms,
                                             interpret=True), g_out)

    def loss_xla(a, o, sl):
        return jnp.vdot(_resample_minor(a[:, None, :], o[:, None], sl, M,
                                        ms).reshape(A, M), g_out)

    ga, go, gs = jax.grad(loss_pallas, argnums=(0, 1, 2))(
        arr, off, jnp.asarray(s, F32))
    xa, xo, xs = jax.grad(loss_xla, argnums=(0, 1, 2))(
        arr, off, jnp.asarray(s, F32))
    np.testing.assert_allclose(ga, xa, atol=1e-5)
    np.testing.assert_allclose(go, xo, atol=1e-4)
    np.testing.assert_allclose(float(gs), float(xs), rtol=1e-5)
