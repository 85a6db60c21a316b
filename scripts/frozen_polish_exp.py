"""Frozen-recon polish experiments (round-5 VERDICT item 2).

The alternation's tx floor is a *bias of the self-consistent fixed
point*: the reconstruction absorbs part of each view's misalignment, so
the next refinement is stationary at biased θ (c64 K-sweep refuted tail
averaging; docs/STATUS.md r4). The fix under test: freeze ONE
high-quality reconstruction and run deep per-view LM against it with the
family that is exactly consistent with the data-generating operator —
no alternation dynamics, no operator mismatch.

Two modes:

--mode c64: 64³/90 views, RAY-generated data (the c64 scorecard
  protocol). Stage 1 (separate process, convergence_study.py) gets the
  alternation to its hook-assisted state; this script then
  1. builds an exact-consistent frozen volume: one defect correction
     b_work = b − (P_exact − P_slab)(vol, θ) + deep chunked slab-arc
     CGLS (the slab solve then converges to the volume the EXACT
     operator explains, at slab cost);
  2. runs rounds of frozen_polish(family="ray"): deep exact-Jacobian
     box-LM per view + one moment match, volume frozen.
  Target: tx gauge-corrected mean < 1e-4 px (from 1.2e-4, the r4 tail-
  average floor).

--mode config4: 256³/90 views, SLAB-generated data — resumes the
  surviving round-4 checkpoint (/tmp/config4_r4.ckpt) at its best
  snapshot (polish outer ~29: tx 5.7e-3). Data and solver share the arc
  family (inverse-crime protocol, no mismatch), so the frozen polish
  uses the production slab LM. Target: tx ≤ 1e-3 without degrading the
  tilts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.convergence_study import param_errors, vol_error  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["c64", "config4"], required=True)
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint npz with (phi, alpha, beta, t, cor, "
                         "volume) — an align_ckpt from the alternation")
    ap.add_argument("--data", required=True,
                    help="cached projections npz (key 'proj')")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--refine-iters", type=int, default=10,
                    help="LM iterations per polish program (watchdog-"
                         "bounded; rounds accumulate)")
    ap.add_argument("--refine-chunk", type=int, default=None)
    ap.add_argument("--recon-iters", type=int, default=240)
    ap.add_argument("--recon-chunk", type=int, default=40)
    ap.add_argument("--rebuild-recon", action="store_true",
                    help="rebuild the frozen volume between rounds "
                         "(defect recompute + deep recon)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jitter-px", type=float, default=2.0)
    ap.add_argument("--jitter-deg", type=float, default=None,
                    help="default: 1.0 (c64) / 0.5 (config4)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.jax_cache")))
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import slab_projector as sp
    from tomojax.align.pipeline import (frozen_polish, load_checkpoint,
                                        _exact_forward,
                                        _slab_cgls_chunk_progs)

    n = 64 if args.mode == "c64" else 256
    n_proj = 90
    jdeg = args.jitter_deg if args.jitter_deg is not None else (
        1.0 if args.mode == "c64" else 0.5)
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(args.seed)
    phi = np.linspace(0.0, np.pi, n_proj)
    amax = np.deg2rad(jdeg)
    truth = {
        "tx": rng.uniform(-args.jitter_px, args.jitter_px, n_proj),
        "tz": rng.uniform(-args.jitter_px, args.jitter_px, n_proj),
        "alpha": rng.uniform(-amax, amax, n_proj),
        "beta": rng.uniform(-amax, amax, n_proj),
    }

    from tomojax.core import phantom
    vol_true = np.asarray(phantom.shepp3d(n), np.float32)
    proj = jnp.asarray(np.load(args.data)["proj"], jnp.float32)
    b = proj.reshape(n_proj, -1)
    ck = load_checkpoint(args.ckpt)
    views = ck["views"]
    volume = jnp.asarray(ck["volume"], jnp.float32).reshape(geom.vox_shape)

    rec = {"config": vars(args), "rounds": []}
    t0 = time.perf_counter()

    def report(tag, vws, volm):
        e = param_errors(vws, truth, phi)
        e["stage"] = tag
        e["wall_s"] = time.perf_counter() - t0
        e["vol_rel_l2"] = vol_error(volm, vol_true)
        rec["rounds"].append(e)
        gc = e["gauge_corrected"]
        print(f"[{tag}] t={e['wall_s']:.0f}s vol={e['vol_rel_l2']:.4f} "
              f"tx_gc={gc['tx']['mean']:.3e} tz_gc={gc['tz']['mean']:.3e} "
              f"a_gc={gc['alpha']['mean']:.3e} "
              f"b_gc={gc['beta']['mean']:.3e}", flush=True)
        with open(args.out + ".partial", "w") as f:
            json.dump(rec, f, indent=1)

    report("init", views, volume)

    def deep_recon(vws, x0):
        """Deep chunked slab-arc CGLS; c64 mode first recenters the data
        to exact-family semantics (defect correction at (x0, θ))."""
        b_work = b
        if args.mode == "c64":
            p_exact = _exact_forward(x0, geom, vws, jnp.float32, 15)
            p_slab = sp.project(x0, geom, vws, quad="arc",
                                strict_bounds=False).reshape(n_proj, -1)
            b_work = b - (p_exact - p_slab)
            rel = float(jnp.linalg.norm(p_exact - p_slab)
                        / jnp.linalg.norm(b))
            print(f"[recon] defect rel={rel:.2e}", flush=True)
        gstruct, scalars = sp.scalar_groups(geom, vws, "arc")
        init_p, step_p = _slab_cgls_chunk_progs(
            geom, "arc", args.recon_chunk, gstruct, "float32")
        st = init_p(x0, b_work, scalars)
        niter = jnp.int32(args.recon_iters)
        while int(st.k) < args.recon_iters and int(st.stop) == 0:
            st, _, _ = step_p(st, b_work, scalars, niter)
            print(f"[recon] {int(st.k)}/{args.recon_iters}", flush=True)
        return st.x.reshape(geom.vox_shape)

    frozen = deep_recon(views, volume)
    report("frozen-recon", views, frozen)

    fam = "ray" if args.mode == "c64" else "slab"
    for r in range(args.rounds):
        st = frozen_polish(b, geom, views, frozen, param_set="xzab",
                           refine_iters=args.refine_iters,
                           refine_chunk=args.refine_chunk,
                           family=fam, moment=True)
        views = st.views
        report(f"polish-{r}", views, frozen)
        if args.rebuild_recon and r < args.rounds - 1:
            frozen = deep_recon(views, frozen)
            report(f"recon-{r}", views, frozen)

    rec["total_wall_s"] = time.perf_counter() - t0
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    try:
        os.remove(args.out + ".partial")
    except OSError:
        pass
    print("wrote", args.out)


if __name__ == "__main__":
    main()
