"""Dataset IO — HDF5 layout compatible with the reference's drivers.

The reference's alignment driver reads an HDF5 file with datasets
``data/projections``, ``data/alpha``, ``data/beta``, ``data/xyz``,
``data/phi``, ``data/phantom`` (``examples/align_rigid.py:10-17``); its MPI
driver saves the final volume with ``np.save`` (``mpi_reconstruct.py:70-71``).
This module reads/writes that exact layout so datasets are interchangeable
between the two frameworks, plus npz round-trips for Views.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
    HAVE_H5PY = True
except Exception:  # pragma: no cover - h5py is in the base image
    HAVE_H5PY = False

from tomojax.core.geometry import Views


def save_dataset(path, *, projections, phi, alpha, beta, xyz, phantom=None,
                 extra=None):
    """Write the reference-compatible HDF5 layout (align_rigid.py:10-17)."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "w") as f:
        g = f.create_group("data")
        g.create_dataset("projections", data=np.asarray(projections))
        g.create_dataset("phi", data=np.asarray(phi))
        g.create_dataset("alpha", data=np.asarray(alpha))
        g.create_dataset("beta", data=np.asarray(beta))
        g.create_dataset("xyz", data=np.asarray(xyz))
        if phantom is not None:
            g.create_dataset("phantom", data=np.asarray(phantom))
        if extra:
            for k, v in extra.items():
                g.create_dataset(k, data=np.asarray(v))


def load_dataset(path):
    """Read the reference HDF5 layout → dict of numpy arrays."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    out = {}
    with h5py.File(path, "r") as f:
        g = f["data"]
        for k in g.keys():
            out[k] = g[k][()]
    return out


def views_from_dataset(d) -> Views:
    """Build a Views pytree from a loaded dataset dict."""
    n = len(d["phi"])
    return Views.create(n, phi=d["phi"], alpha=d["alpha"], beta=d["beta"],
                        t=d["xyz"])


def save_volume(path, volume):
    """np.save of the volume (reference ``mpi_reconstruct.py:70-71``)."""
    np.save(path, np.asarray(volume))


def load_volume(path):
    return np.load(path)
