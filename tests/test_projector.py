import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.core.geometry import Geometry, Views
from tomojax.core import projector as proj
from tests import oracle

F64 = jnp.float64


def _setup(n=16, seed=0):
    rng = np.random.default_rng(seed)
    vol = rng.random((n, n, n)).astype(np.float64)
    geom = Geometry(n_proj=4, vox_shape=(n, n, n), det_shape=(n, n))
    phi = np.array([0.0, 0.35, 1.1, 2.2])
    alpha = np.array([0.01, -0.017, 0.0, 0.005])
    beta = np.array([-0.008, 0.012, 0.017, 0.0])
    t = rng.uniform(-2, 2, (4, 3))
    t[:, 1] = 0.0
    cor = np.zeros((4, 3))
    cor[:, 0] = rng.uniform(-1, 1, 4)
    views = Views.create(4, phi=phi, alpha=alpha, beta=beta, t=t, cor=cor,
                         dtype=F64)
    return vol, geom, views


def test_n_steps_matches_reference_computation():
    vol, geom, views = _setup()
    # reference computes n = int(|p1 - p0| / step) per view from the
    # transformed points (ray_voxel_utilities.py:86-88)
    r_points, _, _, _ = oracle._ray_points(
        geom.vox_shape, geom.det_shape, 0.01, -0.02, 0.7,
        np.array([0.5, 0.0, -0.3]), np.zeros(3), geom.step_size)
    assert geom.n_steps == r_points.shape[2]


def test_forward_matches_oracle():
    vol, geom, views = _setup()
    for i in range(4):
        got = proj.forward_view(
            jnp.asarray(vol), geom, views.phi[i], views.alpha[i],
            views.beta[i], views.t[i], views.cor[i], dtype=F64)
        want = oracle.project_view(
            vol, geom.det_shape, float(views.alpha[i]), float(views.beta[i]),
            float(views.phi[i]), np.asarray(views.t[i]),
            np.asarray(views.cor[i]), geom.step_size)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_backproject_matches_oracle():
    vol, geom, views = _setup()
    rng = np.random.default_rng(1)
    y = rng.random(geom.n_det)
    i = 1
    got = proj.backproject_view(
        jnp.asarray(y), geom.vox_shape, geom, views.phi[i], views.alpha[i],
        views.beta[i], views.t[i], views.cor[i], dtype=F64)
    want = oracle.backproject_view(
        y, geom.vox_shape, geom.det_shape, float(views.alpha[i]),
        float(views.beta[i]), float(views.phi[i]), np.asarray(views.t[i]),
        np.asarray(views.cor[i]), geom.step_size)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_adjoint_dot_product_identity():
    # <A x, y> == <x, At y> to f64 roundoff: the pair is an exact transpose.
    vol, geom, views = _setup()
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.random((geom.n_proj, geom.n_det)))
    x = jnp.asarray(vol)
    ax = proj.project(x, geom, views, dtype=F64)
    aty = proj.backproject(y, geom.vox_shape, geom, views, dtype=F64)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_jacobian_matches_oracle():
    vol, geom, views = _setup()
    i = 2
    det, jac = proj.forward_view_jac(
        jnp.asarray(vol), geom, views.phi[i], views.alpha[i], views.beta[i],
        views.t[i], views.cor[i], dtype=F64)
    det_o, jac_o = oracle.projection_gradient(
        vol, geom.det_shape, float(views.alpha[i]), float(views.beta[i]),
        float(views.phi[i]), np.asarray(views.t[i]), np.asarray(views.cor[i]),
        geom.step_size)
    np.testing.assert_allclose(det, det_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(jac, jac_o, rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_jacobian_matches_autodiff():
    # the analytic Jacobian must equal jax.jacrev through the plain forward
    vol, geom, views = _setup(n=8)
    i = 0
    theta = jnp.concatenate([views.t[i],
                             jnp.stack([views.phi[i], views.alpha[i],
                                        views.beta[i]])])

    def fwd(th):
        return proj.forward_view(jnp.asarray(vol), geom, th[3], th[4], th[5],
                                 th[:3], views.cor[i], dtype=F64)

    jac_ad = jax.jacrev(fwd)(theta)  # (n_det, 6)
    _, jac_an = proj.forward_view_jac(
        jnp.asarray(vol), geom, views.phi[i], views.alpha[i], views.beta[i],
        views.t[i], views.cor[i], dtype=F64)
    np.testing.assert_allclose(jac_an.T, jac_ad, rtol=1e-9, atol=1e-10)


def test_jacobian_matches_finite_differences():
    vol, geom, views = _setup(n=8)
    i = 3
    theta0 = np.concatenate([np.asarray(views.t[i]),
                             [float(views.phi[i]), float(views.alpha[i]),
                              float(views.beta[i])]])

    def cost(th):
        d = oracle.project_view(vol, geom.det_shape, th[4], th[5], th[3],
                                th[:3], np.asarray(views.cor[i]),
                                geom.step_size)
        return 0.5 * np.linalg.norm(d) ** 2

    _, jac = proj.forward_view_jac(
        jnp.asarray(vol), geom, views.phi[i], views.alpha[i], views.beta[i],
        views.t[i], views.cor[i], dtype=F64)
    det, _ = proj.forward_view_jac(
        jnp.asarray(vol), geom, views.phi[i], views.alpha[i], views.beta[i],
        views.t[i], views.cor[i], dtype=F64)
    grad_an = np.asarray(jac @ det)

    eps = 1e-6
    for p in range(6):
        dp = np.zeros(6)
        dp[p] = eps
        g_fd = (cost(theta0 + dp) - cost(theta0 - dp)) / (2 * eps)
        np.testing.assert_allclose(grad_an[p], g_fd, rtol=2e-4, atol=1e-6)


def test_custom_vjp_gradients():
    vol, geom, views = _setup(n=8)
    i = 1
    theta = jnp.concatenate([views.t[i],
                             jnp.stack([views.phi[i], views.alpha[i],
                                        views.beta[i]])])
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.random(geom.n_det))

    def loss(v, th):
        d = proj.project_view_t(v, th, geom, views.cor[i], F64)
        return 0.5 * jnp.sum((d - b) ** 2)

    gv, gt = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vol), theta)

    # theta gradient = J @ residual
    det, jac = proj.forward_view_jac(
        jnp.asarray(vol), geom, views.phi[i], views.alpha[i], views.beta[i],
        views.t[i], views.cor[i], dtype=F64)
    np.testing.assert_allclose(gt, jac @ (det - b), rtol=1e-10, atol=1e-10)

    # vol gradient = At(residual)
    atb = proj.backproject_view(det - b, geom.vox_shape, geom, views.phi[i],
                                views.alpha[i], views.beta[i], views.t[i],
                                views.cor[i], dtype=F64)
    np.testing.assert_allclose(gv, atb, rtol=1e-10, atol=1e-10)


def test_multiview_chunking_consistent():
    vol, geom, views = _setup()
    x = jnp.asarray(vol)
    full = proj.project(x, geom, views, dtype=F64, views_chunk=4)
    chunked = proj.project(x, geom, views, dtype=F64, views_chunk=2)
    np.testing.assert_allclose(full, chunked, rtol=1e-13, atol=1e-13)

    y = full
    bp_full = proj.backproject(y, geom.vox_shape, geom, views, dtype=F64,
                               views_chunk=4)
    bp_chunked = proj.backproject(y, geom.vox_shape, geom, views, dtype=F64,
                                  views_chunk=2)
    np.testing.assert_allclose(bp_full, bp_chunked, rtol=1e-12, atol=1e-12)


def test_f32_close_to_f64():
    vol, geom, views = _setup()
    x32 = jnp.asarray(vol, dtype=jnp.float32)
    got32 = proj.project(x32, geom, views, dtype=jnp.float32)
    got64 = proj.project(jnp.asarray(vol), geom, views, dtype=F64)
    # f32 weights differ from f64 weights only by rounding; integrals over
    # ~n_steps samples stay within ~1e-4 relative
    np.testing.assert_allclose(got32, got64, rtol=5e-3, atol=5e-3)
