"""tomojax — TPU-native rigid-body tomographic alignment + reconstruction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``pandekan/tomography_alignment`` (reference: /root/reference):

- ``core``    : geometry, rotations, phantoms, and the matrix-free
                differentiable projector (the TPU-native replacement for the
                reference's f2py Fortran kernels ``ray_wt_grad``/``vox_wt_grad``
                and the scipy CSR system matrix of
                ``utilities/projection_operators.py``).
- ``kernels`` : Pallas TPU kernels for the hot ray-march paths.
- ``recon``   : CGLS / SIRT / Tikhonov / ISTA-FISTA-lasso / TV-FISTA solvers as
                ``lax.while_loop`` iterations over a matrix-free operator
                (replaces ``recon/*.py`` and the ``*_mpi.py`` twins).
- ``align``   : FFT phase-correlation coarse alignment + per-view 6-DoF
                gradient refinement + the alternating pipeline
                (replaces ``align/align_cc.py``, ``utilities/alignment_functions.py``,
                ``examples/align_rigid.py``).
- ``dist``    : projection-angle data parallelism over a ``jax.sharding.Mesh``
                (psum over ICI replaces the reference's MPI allreduce).
"""

__version__ = "0.1.0"

from tomojax.core.geometry import Geometry, Views
from tomojax.core import rotations
from tomojax.core import phantom

__all__ = ["Geometry", "Views", "rotations", "phantom", "__version__"]
