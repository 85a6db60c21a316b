"""Synthesize misaligned projection data (reference: examples/generate_data.py).

64³ Shepp-Logan, 90 views over [0, π), random per-view jitter: α, β ∈ ±1°,
x/z shifts ∈ ±2 px (reference :16-23). Writes the reference-compatible HDF5
layout consumed by align_rigid.py.

Usage: python examples/generate_data.py [out.h5]
"""

import sys

sys.path.insert(0, ".")
from tomojax.cli import main  # noqa: E402

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dataset64.h5"
    main(["simulate", "--size", "64", "--views", "90", "-o", out])
