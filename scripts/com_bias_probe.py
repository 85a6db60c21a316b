"""Probe: com_align's absolute tx bias vs volume size.

BASELINE config-3 found com_align's gauge-corrected tx error growing
~0.6% of n at 256^3 (1.53 px) with translation-only +-4 px jitter on
exact-ray data, while the model says the first-moment identity
  u_com(phi) = Cx cos phi + Cy sin phi - tx
is exact to discretization. This probe measures the error's phi-structure
(projection onto higher harmonics 2phi/3phi vs white residual) and its
scaling over sizes, with zero jitter (pure model error) and with jitter.

Run: JAX_PLATFORMS=cpu python scripts/com_bias_probe.py [sizes...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom
from tomojax.core import slab_projector as sp
from tomojax.align import com_align


def probe(n, n_proj=90, jit_px=4.0, seed=0, quad="plane"):
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(seed)
    phi = np.linspace(0.0, np.pi, n_proj)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-jit_px, jit_px, n_proj)
    t[:, 2] = rng.uniform(-jit_px, jit_px, n_proj)
    views = Views.create(n_proj, phi=phi, t=t)
    proj = sp.project(vol, geom, views, quad=quad)
    est = np.asarray(com_align(proj, geom, phi), np.float64)
    err = est[:, 0] - t[:, 0]
    # gauge span {1, cos, sin} (what com_align cannot see)
    G = np.stack([np.ones_like(phi), np.cos(phi), np.sin(phi)], 1)
    cg, *_ = np.linalg.lstsq(G, err, rcond=None)
    err_gc = err - G @ cg
    # higher harmonics of the residual
    H = np.stack([np.cos(2 * phi), np.sin(2 * phi),
                  np.cos(3 * phi), np.sin(3 * phi)], 1)
    ch, *_ = np.linalg.lstsq(H, err_gc, rcond=None)
    white = err_gc - H @ ch
    print(f"n={n:4d} jit={jit_px:.1f}: gc-mean {np.abs(err_gc).mean():.3e}"
          f" px  harmonics(2c,2s,3c,3s)={np.array2string(ch, precision=4)}"
          f"  white-rms {white.std():.3e}", flush=True)
    return err_gc


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128]
    for n in sizes:
        probe(n, jit_px=0.0)
        probe(n, jit_px=4.0)
