import numpy as np
import jax
import jax.numpy as jnp

from tomojax.core import rotations as R
from tests import oracle


def test_rotation_matrices_match_oracle():
    for a in [0.0, 0.3, -1.2, np.pi / 2]:
        np.testing.assert_allclose(R.rot_z(jnp.float64(a)), oracle.rot_z(a),
                                   atol=4e-15)
        np.testing.assert_allclose(R.rot_x(jnp.float64(a)), oracle.rot_x(a),
                                   atol=4e-15)
        np.testing.assert_allclose(R.rot_y(jnp.float64(a)), oracle.rot_y(a),
                                   atol=4e-15)
        np.testing.assert_allclose(R.der_rot_z(jnp.float64(a)),
                                   oracle.der_rot_z(a), atol=4e-15)
        np.testing.assert_allclose(R.der_rot_x(jnp.float64(a)),
                                   oracle.der_rot_x(a), atol=4e-15)
        np.testing.assert_allclose(R.der_rot_y(jnp.float64(a)),
                                   oracle.der_rot_y(a), atol=4e-15)


def test_derivatives_are_true_derivatives():
    # der_rot_* must equal d/da rot_* — check against jax.jacfwd
    for rot, der in [(R.rot_z, R.der_rot_z), (R.rot_x, R.der_rot_x),
                     (R.rot_y, R.der_rot_y)]:
        a = jnp.float64(0.7)
        jac = jax.jacfwd(rot)(a)
        np.testing.assert_allclose(jac, der(a), atol=1e-12)


def test_rotations_are_orthonormal():
    a = jnp.float64(0.37)
    for rot in [R.rot_z, R.rot_x, R.rot_y]:
        M = rot(a)
        np.testing.assert_allclose(M @ M.T, np.eye(3), atol=4e-15)
        assert abs(float(jnp.linalg.det(M)) - 1.0) < 1e-12


def test_composed_rotations():
    phi, alpha, beta = 0.5, -0.1, 0.2
    np.testing.assert_allclose(
        R.ray_rotation(jnp.float64(phi), jnp.float64(alpha), jnp.float64(beta)),
        oracle.rot_z(phi) @ oracle.rot_x(alpha) @ oracle.rot_y(beta),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        R.voxel_rotation(jnp.float64(phi), jnp.float64(alpha), jnp.float64(beta)),
        oracle.rot_y(beta) @ oracle.rot_x(alpha) @ oracle.rot_z(phi),
        atol=1e-14,
    )
