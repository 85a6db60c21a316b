"""Angle-sharded regularized reconstruction over all available devices
(reference: examples/mpi_reconstruct.py, run with `mpirun -n R`; here one
process drives the whole mesh — psum replaces Allreduce).

Usage: python examples/sharded_reconstruct.py dataset.h5 [recon.npy]
"""

import sys

sys.path.insert(0, ".")
from tomojax.cli import main  # noqa: E402

if __name__ == "__main__":
    inp = sys.argv[1] if len(sys.argv) > 1 else "dataset64.h5"
    out = sys.argv[2] if len(sys.argv) > 2 else "recon_sharded.npy"
    main(["reconstruct", "-i", inp, "-o", out, "--shard"])
