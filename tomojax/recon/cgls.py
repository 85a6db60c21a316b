"""CGLS — conjugate gradient on the normal equations, as one jitted loop.

TPU-native replacement for the reference's ``recon/cgls.py`` (serial) and
``recon/cgls_mpi.py`` (angle-sharded): the iteration is a
``lax.while_loop``; under an angle-sharded operator (``tomojax.dist``) the
Aᵀ reduction becomes an XLA psum instead of ``MPI Allreduce``
(``cgls_mpi.py:55,98``) with no other change here.

Semantics preserved from the reference (``cgls.py:26-104``):

- classic CGLS recursion: γ = ‖Aᵀr‖², α = γ/‖Ap‖², β = γ_new/γ_old;
- divergence guard: if the residual norm rises, re-initialize (r, p, γ)
  from the current iterate; quit after re-initializing at two *consecutive*
  iterations (``cgls.py:60-68``);
- per-iteration metrics: residual norm (``convergence``) and RMS error
  against ground truth if provided, else the scaled residual
  (``cgls.py:79-82``).

Deviation: after a re-initialization the reference still applies the stale
incremental update ``r -= α·(A p_old)`` to the *fresh* residual
(``cgls.py:67-70`` falls through to ``:70``), leaving the CG state
inconsistent; here the restart is clean (fresh r, p, γ; skip the stale
update). Also the reference's ctor bugs (``object['precision']`` typo
``cgls.py:20``, undefined ``self.method`` ``:51``) are not reproduced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from tomojax.core.operators import TomoOperator


class CGLSResult(NamedTuple):
    x: jnp.ndarray            # reconstruction, vol_shape
    rms_error: jnp.ndarray    # (niter,) valid up to n_iter
    convergence: jnp.ndarray  # (niter,) residual norms
    n_iter: jnp.ndarray       # iterations actually run
    stop_reason: jnp.ndarray  # 0 = budget, 2 = double-reinit quit


def cgls(op: TomoOperator, b, *, niter: int = 100, x0=None,
         ground_truth=None, reinit_tol: float = 0.0) -> CGLSResult:
    """Run CGLS on ``min_x ‖A x − b‖``. Jittable end to end.

    :param reinit_tol: relative slack on the divergence guard — re-initialize
        only when ``conv_k > (1 + reinit_tol) * conv_{k-1}``. The reference
        uses 0 (any increase, ``cgls.py:60``); a small value (1e-3) makes the
        guard robust to reduced-precision operators (e.g. the fast family's
        bf16x3 matmuls on TPU).
    """
    dtype = op.dtype
    b = jnp.asarray(b, dtype).reshape(op.geom.n_proj, op.geom.n_det)
    x = (jnp.zeros(op.vol_shape, dtype) if x0 is None
         else jnp.asarray(x0, dtype).reshape(op.vol_shape))
    gt = None if ground_truth is None else \
        jnp.asarray(ground_truth, dtype).reshape(-1)
    norm_factor = jnp.linalg.norm(b) if gt is None else jnp.linalg.norm(gt)

    def initialize(x):
        r = b - op.A(x)
        p = op.AT(r)
        gamma = jnp.vdot(p, p).real.astype(dtype)
        return r, p, gamma

    r0, p0, gamma0 = initialize(x)

    def cond(c):
        return (c["k"] < niter) & (c["stop"] == 0)

    def body(c):
        x, r, p, gamma, k = c["x"], c["r"], c["p"], c["gamma"], c["k"]
        q = op.A(p)
        alpha = gamma / jnp.vdot(q, q).real.astype(dtype)
        x_new = x + alpha * p
        r_new = r - alpha * q
        conv_k = jnp.linalg.norm(r_new).astype(dtype)

        prev_conv = c["conv"][jnp.maximum(k - 1, 0)]
        worse = (k > 0) & (conv_k > (1.0 + reinit_tol) * prev_conv)
        consecutive = c["reinit_iter"] + 1 == k

        stop = jnp.where(worse & consecutive, 2, 0).astype(jnp.int32)

        def do_reinit(_):
            # revert the update and restart CG from the current iterate
            rr, pp, gg = initialize(x)
            return x, rr, pp, gg

        def do_update(_):
            p_new = op.AT(r_new)
            gamma_new = jnp.vdot(p_new, p_new).real.astype(dtype)
            beta = gamma_new / gamma
            return x_new, r_new, p_new + beta * p, gamma_new

        reinit_now = worse & jnp.logical_not(consecutive)
        x2, r2, p2, gamma2 = lax.cond(reinit_now, do_reinit, do_update, None)
        reinit_iter = jnp.where(reinit_now, k, c["reinit_iter"])

        if gt is None:
            rms_k = jnp.linalg.norm(r2) / norm_factor
        else:
            rms_k = jnp.linalg.norm(x2.reshape(-1) - gt) / norm_factor

        conv = c["conv"].at[k].set(conv_k)
        rms = c["rms"].at[k].set(rms_k.astype(dtype))
        return {"x": x2, "r": r2, "p": p2, "gamma": gamma2, "k": k + 1,
                "stop": stop, "reinit_iter": reinit_iter, "conv": conv,
                "rms": rms}

    init = {"x": x, "r": r0, "p": p0, "gamma": gamma0,
            "k": jnp.asarray(0, jnp.int32), "stop": jnp.asarray(0, jnp.int32),
            "reinit_iter": jnp.asarray(-10, jnp.int32),
            "conv": jnp.zeros((niter,), dtype),
            "rms": jnp.zeros((niter,), dtype)}
    out = lax.while_loop(cond, body, init)
    return CGLSResult(x=out["x"], rms_error=out["rms"],
                      convergence=out["conv"], n_iter=out["k"],
                      stop_reason=out["stop"])
