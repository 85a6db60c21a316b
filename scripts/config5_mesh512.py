"""BASELINE config-5 mesh evidence at real 512^3 shapes (CPU mesh).

The driver's config 5 is "512^3 / 1024 views, angle-sharded" — the TPU
terminal exposes ONE chip, so the multi-chip path is validated the same
way the driver's dryrun does, but at the REAL volume/detector shapes:
construct the angle-sharded and volume-sharded slab operators on an
8-virtual-device CPU mesh at 512^3 / 512^2 and check A / A^T against the
single-device slab projector (round-2 VERDICT: "the angle-sharded /
volume-sharded operators have never been run at 512^3 even on the CPU
mesh").

View count is kept small (CPU is one core — the 1024-view throughput
number is the single-chip TPU bench in docs/STATUS.md; here the evidence
is shape-correctness of the sharded construction + collectives at scale).

Reference semantics being matched: recon/sirt_mpi.py:40 (angle shards),
regularized_mpi.py:116 (volume-vector Allreduce == psum here);
the volume-sharded operator has no reference counterpart (it always
replicates the volume, sirt_mpi.py:56).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices time-share ONE physical core here, so a 512MB
# all-reduce cannot rendezvous within XLA's default 40s termination
# window (F-check kills the process: "Expected 8 threads to join the
# rendezvous, but only 6 of them arrived on time")
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=7200"
               " --xla_cpu_collective_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = _flags
# the axon site hook imports jax at interpreter startup, so the env var
# JAX_PLATFORMS is too late — jax.config.update wins until backend init
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--quad", default="plane", choices=["plane", "arc"])
    ap.add_argument("--out", default="docs/config5_mesh512.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from tomojax.core.geometry import Geometry, Views
    from tomojax.core import slab_projector as sp
    from tomojax.dist import make_mesh
    from tomojax.dist.sharding import (make_sharded_operator,
                                       make_volume_sharded_slab_operator)

    n, n_proj = args.size, args.views
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(0)
    phi = np.linspace(0.0, np.pi, n_proj)
    amax = np.deg2rad(1.0)
    t = np.zeros((n_proj, 3), np.float32)
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    views = Views.create(n_proj, phi=phi,
                         alpha=rng.uniform(-amax, amax, n_proj),
                         beta=rng.uniform(-amax, amax, n_proj), t=t)
    # smooth separable test volume (cheap to build at 512^3)
    x = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.exp(-4.0 * x * x)
    vol = jnp.asarray(g[:, None, None] * g[None, :, None] * g[None, None, :])

    fam = "slab" if args.quad == "arc" else "slab_plane"
    rec = {"config": vars(args), "checks": []}

    def relerr(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))

    t0 = time.perf_counter()
    ref_sino = sp.project(vol, geom, views, quad=args.quad)
    ref_sino = jnp.asarray(ref_sino).reshape(n_proj, -1)
    g_test = ref_sino  # adjoint probe
    ref_back = sp.backproject(g_test, geom, views, quad=args.quad).ravel()
    t_ref = time.perf_counter() - t0
    print(f"[ref] single-device fwd+adj {t_ref:.1f}s", flush=True)

    for name, build in [
        ("angle_sharded_8x1",
         lambda: make_sharded_operator(
             geom, views, make_mesh(8, 1), family=fam)),
        ("volume_sharded_4x2",
         lambda: make_volume_sharded_slab_operator(
             geom, views, make_mesh(4, 2), quad=args.quad, halo=32)),
    ]:
        t0 = time.perf_counter()
        op = build()
        sino = jnp.asarray(op.A(vol)).reshape(n_proj, -1)
        jax.block_until_ready(sino)
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = jnp.asarray(op.AT(g_test)).ravel()
        jax.block_until_ready(back)
        t_at = time.perf_counter() - t0
        chk = {"name": name, "fwd_rel_err": relerr(sino, ref_sino),
               "adj_rel_err": relerr(back, ref_back),
               "t_fwd_s": t_a, "t_adj_s": t_at}
        rec["checks"].append(chk)
        print(f"[{name}] fwd rel {chk['fwd_rel_err']:.2e} "
              f"adj rel {chk['adj_rel_err']:.2e} "
              f"({t_a:.1f}s / {t_at:.1f}s)", flush=True)
        assert chk["fwd_rel_err"] < 1e-5, chk
        assert chk["adj_rel_err"] < 1e-5, chk

    rec["t_ref_s"] = t_ref
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
