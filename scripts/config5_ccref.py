"""CC-only reference arm on the SAME arc-quadrature 512^3 dataset as the
joint record (config5_joint_trans) — the apples-to-apples comparison the
BASELINE bar needs: the historical 0.1615 CC-only record was a
plane-data inverse crime; this arm runs COM pre-align + the identical
defect-corrected deep CGLS on the joint run's own data."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.jax_cache")))
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import phantom, slab_projector as sp
    from tomojax.align import com_align
    from tomojax.align.pipeline import _slab_cgls_chunk_progs
    from examples.convergence_study import param_errors, vol_error

    n, n_proj = 512, 1024
    geom = Geometry(n_proj=n_proj, vox_shape=(n,)*3, det_shape=(n, n))
    rng = np.random.default_rng(0)
    phi = np.linspace(0.0, np.pi, n_proj)
    truth = {"tx": rng.uniform(-2,2,n_proj), "tz": rng.uniform(-2,2,n_proj),
             "alpha": np.zeros(n_proj), "beta": np.zeros(n_proj)}
    vol_true = np.asarray(phantom.shepp3d(n), np.float32)
    proj = jnp.asarray(np.load("/tmp/config5_trans.ckpt/data_slab.npz")["proj"],
                       jnp.float32)
    b = proj.reshape(n_proj, -1)
    t0 = time.perf_counter()
    est = np.asarray(com_align(proj.reshape(n_proj, n, n), geom, phi))
    t_est = np.zeros((n_proj, 3), np.float32)
    t_est[:, 0], t_est[:, 2] = est[:, 0], est[:, 1]
    views = Views.create(n_proj, phi=phi, t=t_est)
    rec = {"prealign": param_errors(views, truth, phi),
           "t_prealign_s": time.perf_counter() - t0}
    gc = rec["prealign"]["gauge_corrected"]
    print(f"[com] tx gc-mean {gc['tx']['mean']:.3e} tz {gc['tz']['mean']:.3e}",
          flush=True)

    gstruct, scalars = sp.scalar_groups(geom, views, "plane")
    init_p, step_p = _slab_cgls_chunk_progs(geom, "plane", 2, gstruct,
                                            "float32", "bf16")
    x = jnp.zeros(geom.vox_shape, jnp.float32)
    best = (np.inf, None); rounds = []
    for r in range(2):
        b_work = b
        if bool(jnp.any(x != 0)):
            p_src = sp.project(x, geom, views, quad="arc",
                               strict_bounds=False).reshape(n_proj, -1)
            p_pl = sp.project(x, geom, views, quad="plane",
                              strict_bounds=False).reshape(n_proj, -1)
            b_work = b - (p_src - p_pl)
        st = init_p(x, b_work, scalars)
        niter = jnp.int32(40)
        while int(st.k) < 40 and int(st.stop) == 0:
            st, _, _ = step_p(st, b_work, scalars, niter)
            print(f"[cgls] r{r} {int(st.k)}/40 t={time.perf_counter()-t0:.0f}s",
                  flush=True)
        x = st.x.reshape(geom.vox_shape)
        rel = vol_error(x, vol_true)
        rounds.append(rel)
        if rel < best[0]: best = (rel, None)
        print(f"[round {r}] rel-L2 {rel:.4f}", flush=True)
    rec["rounds_rel_l2"] = rounds
    rec["vol_rel_l2"] = best[0]
    rec["wall_s"] = time.perf_counter() - t0
    out = "docs/convergence/config5_ccref_arc.json"
    json.dump(rec, open(out, "w"), indent=1)
    print("wrote", out, flush=True)

if __name__ == "__main__":
    main()
