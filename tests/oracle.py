"""Independent NumPy f64 oracle implementing the reference's projector math.

This is the test-only stand-in for the reference's f2py modules
(``src/ray_wt_grad.f90``) and their Python glue
(``utilities/ray_voxel_utilities.py``): same grids, same rigid transform,
same ray march, same floor/1-frac trilinear weights with per-corner bounds
guards, same ``der_static + step * der_direction`` Jacobian decomposition,
all in float64. Deliberately written in plain vectorized NumPy, structured
like the reference call chain (NOT like tomojax), so agreement between the
two is meaningful.
"""

import numpy as np


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(c, -s, 0.0), (s, c, 0.0), (0.0, 0.0, 1.0)])


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(1.0, 0.0, 0.0), (0.0, c, -s), (0.0, s, c)])


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(c, 0.0, s), (0.0, 1.0, 0.0), (-s, 0.0, c)])


def der_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(-s, -c, 0.0), (c, -s, 0.0), (0.0, 0.0, 0.0)])


def der_rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(0.0, 0.0, 0.0), (0.0, -s, -c), (0.0, c, -s)])


def der_rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([(-s, 0.0, c), (0.0, 0.0, 0.0), (-c, 0.0, -s)])


def transform_points(x, alpha, beta, phi, t):
    return rot_z(phi) @ rot_x(alpha) @ (rot_y(beta) @ x + t[:, None])


def _grids(vox_shape, det_shape, vox_pix=(1.0, 1.0, 1.0), det_pix=(1.0, 1.0)):
    """Reference grid construction (utilities/geometry.py:77-105)."""
    nx, ny, nz = vox_shape
    sx, sy, sz = [n * p for n, p in zip(vox_shape, vox_pix)]
    ax = np.linspace(-sx / 2, sx / 2, nx, endpoint=False) + 0.5
    ay = np.linspace(-sy / 2, sy / 2, ny, endpoint=False) + 0.5
    az = np.linspace(-sz / 2, sz / 2, nz, endpoint=False) + 0.5
    vox_origin = np.array([ax.min(), ay.min(), az.min()])

    nu, nv = det_shape
    su, sv = [n * p for n, p in zip(det_shape, det_pix)]
    du = np.linspace(-su / 2, su / 2, nu, endpoint=False) + 0.5
    dv = np.linspace(-sv / 2, sv / 2, nv, endpoint=False) + 0.5
    xd, zd = np.meshgrid(du, dv, indexing="ij")
    n_det = nu * nv
    src = np.array([xd.ravel(), -sy * np.ones(n_det), zd.ravel()])
    det = np.array([xd.ravel(), sy * np.ones(n_det), zd.ravel()])
    return src, det, vox_origin


def _ray_points(vox_shape, det_shape, alpha, beta, phi, t, cor, step_size,
                vox_pix=(1.0, 1.0, 1.0), det_pix=(1.0, 1.0)):
    """Reference ray march (ray_voxel_utilities.py:68-99), f64."""
    src, det, vox_origin = _grids(vox_shape, det_shape, vox_pix, det_pix)
    src = src.copy()
    det = det.copy()
    src[0] += cor[0]
    det[0] += cor[0]
    p0 = transform_points(src, alpha, beta, phi, t) - vox_origin[:, None]
    p1 = transform_points(det, alpha, beta, phi, t) - vox_origin[:, None]
    r = p1 - p0
    r_length = np.linalg.norm(r, axis=0)
    r_hat = r / r_length
    n = int(r_length[0] / step_size)
    n_rays = p0.shape[1]
    r_points = np.repeat(p0[:, :, None], n, axis=2)
    step = np.zeros((n_rays, n))
    for j in range(n):
        r_points[:, :, j] += j * step_size * r_hat
        step[:, j] = j * step_size / r_length[0]
    return r_points, step, src, det


# Corner enumeration in the Fortran order (z fastest): ray_wt_grad.f90:35-89
_CORNERS = [(ox, oy, oz) for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)]


def project_view(vol, det_shape, alpha, beta, phi, t, cor=np.zeros(3),
                 step_size=1.0):
    """Forward projection of one view (trilinear_ray_sparse semantics)."""
    vox_shape = vol.shape
    nx, ny, nz = vox_shape
    r_points, _, _, _ = _ray_points(vox_shape, det_shape, alpha, beta, phi,
                                    t, cor, step_size)
    fp = np.floor(r_points).astype(np.int64)
    frac = r_points - fp
    wf = 1.0 - frac
    parts = np.stack([wf, frac], axis=1)  # (3, 2, n_rays, n)
    vol_flat = vol.astype(np.float64).ravel()
    out = np.zeros(r_points.shape[1], dtype=np.float64)
    for (ox, oy, oz) in _CORNERS:
        ix, iy, iz = fp[0] + ox, fp[1] + oy, fp[2] + oz
        inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
               & (iz >= 0) & (iz < nz))
        w = parts[0, ox] * parts[1, oy] * parts[2, oz]
        lin = (np.clip(ix, 0, nx - 1) * ny + np.clip(iy, 0, ny - 1)) * nz \
            + np.clip(iz, 0, nz - 1)
        out += np.sum(np.where(inb, w * vol_flat[lin], 0.0), axis=1)
    return out


def backproject_view(det_img, vox_shape, det_shape, alpha, beta, phi, t,
                     cor=np.zeros(3), step_size=1.0):
    """Exact transpose of project_view (scatter-add)."""
    nx, ny, nz = vox_shape
    r_points, _, _, _ = _ray_points(vox_shape, det_shape, alpha, beta, phi,
                                    t, cor, step_size)
    fp = np.floor(r_points).astype(np.int64)
    frac = r_points - fp
    wf = 1.0 - frac
    parts = np.stack([wf, frac], axis=1)
    out = np.zeros(nx * ny * nz, dtype=np.float64)
    y = det_img.astype(np.float64)[:, None]
    for (ox, oy, oz) in _CORNERS:
        ix, iy, iz = fp[0] + ox, fp[1] + oy, fp[2] + oz
        inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
               & (iz >= 0) & (iz < nz))
        w = np.where(inb, parts[0, ox] * parts[1, oy] * parts[2, oz], 0.0)
        lin = (np.clip(ix, 0, nx - 1) * ny + np.clip(iy, 0, ny - 1)) * nz \
            + np.clip(iz, 0, nz - 1)
        np.add.at(out, lin.ravel(), (w * y).ravel())
    return out.reshape(vox_shape)


def derivative_ray_points(src, ray_vector, alpha, beta, phi, t):
    """(9, 3, n_rays) Jacobian pieces (ray_voxel_utilities.py:15-50)."""
    R_p, R_a, R_b = rot_z(phi), rot_x(alpha), rot_y(beta)
    dR_p, dR_a, dR_b = der_rot_z(phi), der_rot_x(alpha), der_rot_y(beta)
    R_pa = R_p @ R_a
    R_ab = R_a @ R_b
    n = src.shape[1]
    der = np.zeros((9, 3, n))
    der[0] = R_pa[:, 0][:, None]
    der[1] = R_pa[:, 1][:, None]
    der[2] = R_pa[:, 2][:, None]
    rb_st = R_b @ src + t[:, None]
    der[3] = dR_p @ (R_a @ rb_st)
    der[4] = R_p @ (dR_a @ rb_st)
    der[5] = R_pa @ (dR_b @ src)
    der[6] = (dR_p @ (R_ab @ ray_vector))[:, None]
    der[7] = (R_p @ (dR_a @ (R_b @ ray_vector)))[:, None]
    der[8] = (R_pa @ (dR_b @ ray_vector))[:, None]
    return der


def projection_gradient(vol, det_shape, alpha, beta, phi, t,
                        cor=np.zeros(3), step_size=1.0):
    """Fused P(theta) and 6-DoF gradient (trilinear_ray_interp semantics,
    ray_wt_grad.f90:95-223). Parameter order (tx, ty, tz, phi, alpha, beta).
    """
    vox_shape = vol.shape
    nx, ny, nz = vox_shape
    r_points, step, src, det = _ray_points(vox_shape, det_shape, alpha, beta,
                                           phi, t, cor, step_size)
    der = derivative_ray_points(src, (det - src)[:, 0], alpha, beta, phi, t)

    fp = np.floor(r_points).astype(np.int64)
    frac = r_points - fp
    wf = 1.0 - frac
    parts = np.stack([wf, frac], axis=1)
    vol_flat = vol.astype(np.float64).ravel()
    n_rays = r_points.shape[1]
    det_img = np.zeros(n_rays)
    grad = np.zeros((6, n_rays))

    # g[p, d, r, j] = der_static[p, d, r] + step[r, j] * der_dir[p-3, d]
    g_static = np.zeros((6, 3, n_rays))
    g_static[:3] = der[:3]
    g_static[3:] = der[3:6]
    g_dir = der[6:9, :, 0]  # (3, 3)

    for (ox, oy, oz) in _CORNERS:
        ix, iy, iz = fp[0] + ox, fp[1] + oy, fp[2] + oz
        inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
               & (iz >= 0) & (iz < nz))
        w = parts[0, ox] * parts[1, oy] * parts[2, oz]
        lin = (np.clip(ix, 0, nx - 1) * ny + np.clip(iy, 0, ny - 1)) * nz \
            + np.clip(iz, 0, nz - 1)
        rec = np.where(inb, vol_flat[lin], 0.0)  # (n_rays, n)
        det_img += np.sum(np.where(inb, w * rec, 0.0), axis=1)

        sx, sy_, sz = 2.0 * ox - 1.0, 2.0 * oy - 1.0, 2.0 * oz - 1.0
        dwx = sx * parts[1, oy] * parts[2, oz]
        dwy = sy_ * parts[0, ox] * parts[2, oz]
        dwz = sz * parts[0, ox] * parts[1, oy]
        # gradient contribution: rec * (dw · g), g = g_static + step * g_dir
        for p in range(6):
            gpx = g_static[p, 0][:, None]
            gpy = g_static[p, 1][:, None]
            gpz = g_static[p, 2][:, None]
            if p >= 3:
                gpx = gpx + step * g_dir[p - 3, 0]
                gpy = gpy + step * g_dir[p - 3, 1]
                gpz = gpz + step * g_dir[p - 3, 2]
            grad[p] += np.sum(rec * (dwx * gpx + dwy * gpy + dwz * gpz),
                              axis=1)
    return det_img, grad
