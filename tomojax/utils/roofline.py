"""Analytic roofline model for the fused slab Pallas kernels.

Counts, per apply of ``V`` views, the HBM bytes actually moved and the
MXU flops actually issued by :mod:`tomojax.kernels.slab` (from the same
static configuration the kernels compile with), so a measured wall time
converts directly into "% of HBM-bandwidth bound" and "% of MXU bound" —
the quantified speed-of-light statement BASELINE.json's north star asks
for ("projector kernels at HBM-bandwidth speed-of-light").

The model mirrors the kernel dataflow exactly:

- forward (grid ``(V, C)``): every view re-streams the overlapped volume
  (``C·(K+1)·nx·NZP`` f32 per view — the sinogram block stays VMEM-
  resident per view); per source slab the pass-A align matmul runs per
  (x-chunk, side) and the pass-B selection matmul per
  (branch, tile, side), each doubled in the f32x2 tier (hi/lo bf16
  passes);
- adjoint (grid ``(C, V)``): the volume block stays VMEM-resident per
  chunk (written to HBM once per apply) but the cotangent sinogram and
  the per-view selection one-hots re-stream per (chunk, view); matmul
  counts mirror the forward's (transposed contractions, same shapes).

All counts are upper bounds in one respect only: the ``relevant`` gate
skips pass-B tiles whose window has no in-volume taps (a few % for a
centered volume).

Peaks default from the device kind and can be overridden with
``TOMOJAX_PEAK_FLOPS`` / ``TOMOJAX_PEAK_BW`` (units: FLOP/s, B/s).
"""

from __future__ import annotations

import os

# (bf16 matmul FLOP/s, HBM bytes/s) per chip — public spec sheets
_PEAKS = {
    "v5 lite": (197e12, 819e9),     # v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v5": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),    # v6e (Trillium)
}


def device_peaks(device_kind: str | None = None):
    """(mxu_flops_per_s, hbm_bytes_per_s) for the current chip."""
    env_f = os.environ.get("TOMOJAX_PEAK_FLOPS")
    env_b = os.environ.get("TOMOJAX_PEAK_BW")
    if env_f and env_b:
        return float(env_f), float(env_b)
    kind = (device_kind or "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return _PEAKS["v5e"]           # conservative default


def slab_apply_model(geom, quad: str, prec: str = "f32x2",
                     n_views: int | None = None) -> dict:
    """Analytic per-apply HBM bytes and MXU flops for forward + adjoint.

    :returns: dict with ``fwd``/``adj`` sub-dicts ``{bytes, flops}`` and
        the static config used. Counts are per apply of ``n_views``
        (default ``geom.n_proj``) same-orientation views.
    """
    from tomojax.kernels import slab as sk

    statics, C = sk._statics(geom, quad)
    nx, ny, nz = statics["nx"], statics["ny"], statics["nz"]
    nu, nv = statics["nu"], statics["nv"]
    K = statics["K"]
    arc = statics["arc"]
    V = n_views if n_views is not None else geom.n_proj
    NZP = nz + 2 * sk.PADZ
    NVA = nv + sk.NVA_PAD
    xch = sk._xch(nx)
    sides = branches = 2 if arc else 1
    split = 2 if prec == "f32x2" else 1
    n_r = ny + 1 if arc else ny        # valid source slabs per view
    tiles = (nu // sk.UCH) * (nv // sk.VCH)

    # ---- matmul flop counts (identical shapes fwd/adj, transposed) ----
    align_one = 2.0 * xch * NZP * NVA              # (xch,NZP)x(NZP,NVA)
    align = V * n_r * sides * (nx // xch) * align_one * split
    selb_one = 2.0 * (sk.NBB * sk.UCH) * sk.WINB * sk.VCH
    selb = V * n_r * branches * sides * tiles * selb_one * split

    fwd_bytes = (V * C * (K + 1) * nx * NZP * 4.0   # volume re-stream
                 + V * nu * nv * 4.0)               # sinogram out
    adj_bytes = (C * K * nx * NZP * 4.0             # volume written once
                 + V * C * nu * nv * 4.0            # cotangent re-stream
                 + V * C * (8 * sk.NBB * sk.UCH) * sk.WINB * 2.0)  # sel
    return {
        "config": {"quad": quad, "prec": prec, "V": V, "K": K, "C": C,
                   "n_r": n_r, "tiles": tiles, "sides": sides,
                   "split": split},
        "fwd": {"bytes": fwd_bytes, "flops": align + selb},
        "adj": {"bytes": adj_bytes, "flops": align + selb},
    }


def roofline(geom, quad: str, prec: str, t_fwd_s: float, t_adj_s: float,
             n_views: int | None = None,
             device_kind: str | None = None) -> dict:
    """Combine the analytic model with measured times.

    :returns: per direction: achieved GFLOP/s and GB/s, and the fraction
        of the MXU and HBM roofs ("1.0" = speed of light on that axis).
        ``bound`` names the tighter roof — the one that must move for
        the kernel to get faster.
    """
    peak_f, peak_b = device_peaks(device_kind)
    m = slab_apply_model(geom, quad, prec, n_views)
    out = {"config": m["config"],
           "peaks": {"mxu_flops": peak_f, "hbm_bytes": peak_b}}
    for d, t in (("fwd", t_fwd_s), ("adj", t_adj_s)):
        fl, by = m[d]["flops"], m[d]["bytes"]
        out[d] = {
            "flops": fl, "bytes": by, "time_s": t,
            "gflops": fl / t / 1e9, "gbytes_per_s": by / t / 1e9,
            "pct_mxu": fl / t / peak_f, "pct_hbm": by / t / peak_b,
            "bound": "mxu" if fl / peak_f > by / peak_b else "hbm",
            # speed-of-light time if only the dominant roof mattered
            "sol_time_s": max(fl / peak_f, by / peak_b),
        }
        out[d]["pct_sol"] = out[d]["sol_time_s"] / t
    return out
