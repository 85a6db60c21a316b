"""Joint rigid-body alignment + reconstruction (reference:
examples/align_rigid.py — alternating SIRT recon and per-view L-BFGS-B
refinement; here SIRT alternates with batched Levenberg–Marquardt).

Usage: python examples/align_rigid.py dataset.h5 [recon.npy]
"""

import sys

sys.path.insert(0, ".")
from tomojax.cli import main  # noqa: E402

if __name__ == "__main__":
    inp = sys.argv[1] if len(sys.argv) > 1 else "dataset64.h5"
    out = sys.argv[2] if len(sys.argv) > 2 else "recon_aligned.npy"
    main(["align", "-i", inp, "-o", out])
