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


def _setup_compilation_cache():
    """Persist XLA/Mosaic compilations across processes by default.

    Cold compiles through the remote-TPU tunnel cost minutes per program
    and dominated wall-clock-to-science in rounds 1-3 (config-1 data gen:
    687 s cold vs 0.05 s warm). Every driver gets the cache just by
    importing tomojax; ``JAX_COMPILATION_CACHE_DIR`` (the standard env
    var, read by jax itself) or an explicit ``jax.config.update`` before
    first compile still wins — we only fill in the default."""
    import os
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return        # jax reads the env var natively
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR",
                               os.path.expanduser("~/.jax_cache")))
    except Exception:   # pragma: no cover - never block import on this
        pass


_setup_compilation_cache()

from tomojax.core.geometry import Geometry, Views
from tomojax.core import rotations
from tomojax.core import phantom

__all__ = ["Geometry", "Views", "rotations", "phantom", "__version__"]
