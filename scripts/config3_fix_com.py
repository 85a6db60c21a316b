"""Re-record config3's COM arm with the fixed harmonic-span estimator.

The original config-3 run predates commit 2450ce8 (com_align: regress
out the full {1,cos,sin} span): the old mean-only handling left a
constant center-of-rotation tx error ~(2/pi)*Cy that grows with
resolution (1.5 px at 256^3), which made COM pre-alignment worse than
nothing in that record. This one-off regenerates the (deterministic)
data, reruns the FIXED com_align, reruns its CGLS arm, and merges both
into the JSON — preserving the stale arms under "*_pre_2450ce8" so the
regression stays documented.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "docs/convergence/config3_256.json"
    rec = json.load(open(out))
    cfg = rec["config"]
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import phantom
    from tomojax.core import slab_projector as sp
    from tomojax.align import com_align
    from tomojax.core.operators import make_operator
    from tomojax.recon.cgls import cgls

    n, n_proj = cfg["size"], cfg["views"]
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(cfg["seed"])
    phi = np.linspace(0.0, np.pi, n_proj)
    tx = rng.uniform(-cfg["jitter_px"], cfg["jitter_px"], n_proj)
    tz = rng.uniform(-cfg["jitter_px"], cfg["jitter_px"], n_proj)
    t_true = np.zeros((n_proj, 3))
    t_true[:, 0], t_true[:, 2] = tx, tz
    proj = sp.project(vol, geom, Views.create(n_proj, phi=phi, t=t_true),
                      quad=cfg["quad"])
    jax.block_until_ready(proj)
    print("[gen] done", flush=True)

    t1 = time.perf_counter()
    est = np.asarray(com_align(proj, geom, phi), np.float64)
    com_s = time.perf_counter() - t1

    def err_table(etx, etz):
        c, s = np.cos(phi), np.sin(phi)
        A = np.stack([c, s], 1)
        coef, *_ = np.linalg.lstsq(A, etx, rcond=None)
        etx_gc = etx - A @ coef
        etz_gc = etz - etz.mean()
        st = lambda e: {"mean": float(np.abs(e).mean()),
                        "max": float(np.abs(e).max())}
        return {"raw": {"tx": st(etx), "tz": st(etz)},
                "gauge_corrected": {"tx": st(etx_gc), "tz": st(etz_gc)}}

    stage = {**err_table(est[:, 0] - tx, est[:, 1] - tz), "wall_s": com_s}
    print(f"[com] {com_s:.1f}s tx gc-mean "
          f"{stage['gauge_corrected']['tx']['mean']:.3e} px "
          f"(was {rec['stages']['com']['gauge_corrected']['tx']['mean']:.3e}"
          " pre-2450ce8)", flush=True)
    rec["stages"]["com_pre_2450ce8"] = rec["stages"].pop("com")
    rec["stages"]["com"] = stage

    # the fixed estimate has (provably) zero projection on {1,cos,sin};
    # reconstruct with it
    t_com = np.zeros((n_proj, 3), np.float32)
    t_com[:, 0], t_com[:, 2] = est[:, 0], est[:, 1]
    fam = "slab" if cfg["quad"] == "arc" else "slab_plane"
    v = Views.create(n_proj, phi=phi, t=t_com)
    op = make_operator(geom, v, family=fam)
    x = jnp.zeros(geom.vox_shape, jnp.float32)
    t1 = time.perf_counter()
    rels = []
    left = cfg["cgls_iters"]
    while left > 0:
        k = min(cfg["cgls_chunk"], left)
        x = cgls(op, proj, niter=k, x0=x).x
        left -= k
        rel = float(np.linalg.norm(
            np.asarray(x, np.float64).ravel()
            - np.asarray(vol, np.float64).ravel())
            / np.linalg.norm(np.asarray(vol, np.float64)))
        rels.append(rel)
        print(f"[com] cgls {cfg['cgls_iters'] - left}/{cfg['cgls_iters']}:"
              f" rel-L2 {rel:.4f} (t={time.perf_counter() - t1:.1f}s)",
              flush=True)
    rec["stages"]["cgls_com_pre_2450ce8"] = rec["stages"].pop("cgls_com")
    rec["stages"]["cgls_com"] = {"rel_l2": rels,
                                 "wall_s": time.perf_counter() - t1}
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("merged fixed com arms into", out)


if __name__ == "__main__":
    main()
