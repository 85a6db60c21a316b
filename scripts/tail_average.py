"""Offline tail-averaging (Polyak) analysis of convergence-run checkpoints.

The c64 closing run showed tx/tz settling into a *stationary oscillation*
around a small bias (docs/convergence/README.md "c64 closing run"): the
per-outer parameter estimates fluctuate outer-to-outer while their mean
holds still. If the fluctuating component is zero-mean, averaging the
parameter estimates over the last K outers (Polyak/tail averaging — the
standard variance-reduction estimator for stationary stochastic
approximation) should shrink the error toward the residual bias without
any new compute.

Reads per-outer checkpoints written by align/pipeline.py
(align_ckpt_NNNN.npz / cv_ckpt_NNNN.npz: per-view phi/alpha/beta/t),
rebuilds the ground truth exactly as examples/convergence_study.py does
(same seed/jitter draws), and reports raw + gauge-corrected errors for
the last-outer estimate vs tail averages of the last K outers.

Usage:
    python scripts/tail_average.py /tmp/c64_closing.ckpt/polish \
        --size 64 --views 90 [--ks 2 4 8 16 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from examples.convergence_study import gauge_fit  # noqa: E402


def truth_params(views, jitter_px, jitter_deg, seed):
    rng = np.random.default_rng(seed)
    amax = np.deg2rad(jitter_deg)
    return {
        "tx": rng.uniform(-jitter_px, jitter_px, views),
        "tz": rng.uniform(-jitter_px, jitter_px, views),
        "alpha": rng.uniform(-amax, amax, views),
        "beta": rng.uniform(-amax, amax, views),
    }


def errors(tx, tz, a, b, truth, phi):
    tx_err = tx - truth["tx"]
    tz_err = tz - truth["tz"]
    a_err = a - truth["alpha"]
    b_err = b - truth["beta"]
    gauge, (txc, tzc, ac, bc) = gauge_fit(phi, tx_err, tz_err, a_err, b_err)

    def stats(e):
        return {"mean": float(np.abs(e).mean()), "max": float(np.abs(e).max())}

    return {
        "raw": {"tx": stats(tx_err), "tz": stats(tz_err),
                "alpha": stats(a_err), "beta": stats(b_err)},
        "gauge_corrected": {"tx": stats(txc), "tz": stats(tzc),
                            "alpha": stats(ac), "beta": stats(bc)},
    }


def fmt(e):
    g = e["gauge_corrected"]
    return ("tx %.2e/%.2e  tz %.2e/%.2e  a %.2e/%.2e  b %.2e/%.2e" % (
        g["tx"]["mean"], g["tx"]["max"], g["tz"]["mean"], g["tz"]["max"],
        g["alpha"]["mean"], g["alpha"]["max"],
        g["beta"]["mean"], g["beta"]["max"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--views", type=int, default=90)
    ap.add_argument("--jitter-px", type=float, default=2.0)
    ap.add_argument("--jitter-deg", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ks", type=int, nargs="*", default=[2, 4, 8, 16, 32])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    truth = truth_params(args.views, args.jitter_px, args.jitter_deg,
                         args.seed)
    phi = np.linspace(0.0, np.pi, args.views)

    files = sorted(glob.glob(os.path.join(args.ckpt_dir, "*_ckpt_*.npz")))
    if not files:
        sys.exit(f"no checkpoints in {args.ckpt_dir}")
    seq = []
    for f in files:
        d = np.load(f)
        seq.append((np.asarray(d["t"])[:, 0], np.asarray(d["t"])[:, 2],
                    np.asarray(d["alpha"]), np.asarray(d["beta"])))
    n = len(seq)
    print(f"{n} checkpoints from {args.ckpt_dir}")

    report = {"ckpt_dir": args.ckpt_dir, "n_outers": n, "entries": []}
    e_last = errors(*seq[-1], truth, phi)
    print(f"last outer      : {fmt(e_last)}")
    report["entries"].append({"k": 1, **e_last})
    for k in args.ks:
        if k > n:
            continue
        tail = seq[-k:]
        avg = tuple(np.mean([s[i] for s in tail], 0) for i in range(4))
        e = errors(*avg, truth, phi)
        print(f"tail-average {k:3d}: {fmt(e)}")
        report["entries"].append({"k": k, **e})

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
