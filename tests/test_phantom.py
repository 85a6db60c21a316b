"""Phantom generation: the bbox-windowed evaluation must be EXACTLY equal
to a dense full-grid evaluation (same per-voxel arithmetic on sliced
coordinates), on both standard and off-axis/rotated ellipsoid tables."""

import numpy as np

from tomojax.core import phantom as ph


def _phantom_dense(shape, params, dtype=np.float32):
    """Straightforward full-grid evaluation (the pre-optimization
    implementation; reference semantics utilities/generate_phantom.py:112-144)."""
    shape = (shape,) * 3 if np.isscalar(shape) else tuple(shape)
    out = np.zeros(shape, dtype=dtype)
    grids = np.meshgrid(*[np.linspace(-1.0, 1.0, n) for n in shape],
                        indexing="ij")
    coords = np.stack([g.ravel() for g in grids])
    for row in np.asarray(params):
        A, a, b, c, x0, y0, z0, phi_d, th_d, psi_d = row
        R = ph._euler_zxz(phi_d, th_d, psi_d)
        p = R @ coords
        p -= np.array([[x0], [y0], [z0]])
        p /= np.array([[a], [b], [c]])
        inside = (p**2).sum(axis=0) <= 1.0
        out.ravel()[inside] += dtype(A)
    return out


def test_shepp_bbox_equals_dense():
    for n in (17, 32):
        fast = ph.shepp3d(n)
        dense = np.clip(_phantom_dense(n, ph.SHEPP_PARAMS), 0.0, None)
        assert np.array_equal(fast, dense)


def test_arbitrary_bbox_equals_dense_nonsquare():
    # random rotated ellipsoids incl. centers near/off the edge, and a
    # non-cubic grid (exercises per-axis bbox clipping)
    rng = np.random.default_rng(3)
    params = np.zeros((12, 10))
    params[:, 0] = rng.uniform(-1, 1, 12)
    params[:, 1:4] = rng.uniform(0.03, 0.9, (12, 3))
    params[:, 4:7] = rng.uniform(-1.1, 1.1, (12, 3))
    params[:, 7:] = rng.uniform(0, 360, (12, 3))
    fast = ph.phantom((24, 18, 21), params)
    dense = _phantom_dense((24, 18, 21), params)
    assert np.array_equal(fast, dense)


def test_bbox_is_conservative_superset():
    # every voxel inside any ellipsoid must fall in its computed bbox:
    # equality above already implies it, but check the bbox volume is
    # actually a *strict* subset of the grid for a small ellipsoid
    # (i.e. the optimization does something)
    row = np.array([1.0, 0.05, 0.05, 0.05, 0.3, -0.2, 0.1, 33.0, 21.0, 70.0])
    axes = [np.linspace(-1, 1, 64)] * 3
    sx, sy, sz = ph._ellipsoid_bbox(row, axes)
    nsub = ((sx.stop - sx.start) * (sy.stop - sy.start)
            * (sz.stop - sz.start))
    assert nsub < 64 ** 3 // 100
