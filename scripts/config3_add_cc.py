"""Append the CC-chain-aligned CGLS stage to an existing config3 record.

The first config3 run recorded mis/com/true; the reference's own
protocol is CC-chain pre-alignment feeding the recon (`align_cc.py:27-38`
+ `recon/cgls.py`), so this one-off regenerates the (deterministic)
data, rebuilds the chain estimates, runs CGLS on them, and merges the
stage into the JSON in place.
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
    from tomojax.align import cross_correlation_chain
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

    sino = jnp.asarray(proj).reshape(n_proj, n, n)
    offsets, _ = cross_correlation_chain(sino)
    offsets = np.asarray(offsets)
    t_cc = np.zeros((n_proj, 3), np.float32)
    t_cc[:, 0] = offsets[:, 0] - offsets[:, 0].mean()
    t_cc[:, 2] = offsets[:, 1] - offsets[:, 1].mean()

    fam = "slab" if cfg["quad"] == "arc" else "slab_plane"
    v = Views.create(n_proj, phi=phi, t=t_cc)
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
        print(f"[cc] cgls {cfg['cgls_iters'] - left}/{cfg['cgls_iters']}:"
              f" rel-L2 {rel:.4f} (t={time.perf_counter() - t1:.1f}s)",
              flush=True)
    rec["stages"]["cgls_cc"] = {"rel_l2": rels,
                                "wall_s": time.perf_counter() - t1}
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("merged cgls_cc into", out)


if __name__ == "__main__":
    main()
