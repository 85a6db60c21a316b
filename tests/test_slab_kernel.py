"""Pallas slab kernel parity on CPU via ``interpret=True``.

Round-2 verdict: the fused kernel's math was validated only by manual runs
on the (unstable) TPU worker — ``test_slab_kernel_tpu.py`` is TPU-only AND
slow-marked, so no default-tier run ever exercised ``kernels/slab.py``.
These tests run the kernel bodies through the Pallas interpreter on every
CPU test run (like ``tests/test_kernels.py`` does for the resample
kernels), including the 64^3 padded-shape path (the reference's flagship
config, ``/root/reference/examples/generate_data.py:16``).

Note: interpret mode checks the math, not Mosaic's layout rules — the TPU
file remains the hardware gate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom
from tomojax.core import slab_projector as sp
from tomojax.kernels import slab as slabk

F32 = jnp.float32


def _jittered_views(n_proj, seed=0, jit_px=1.5, jit_rad=0.012,
                    phi0=0.0):
    """``phi0`` offsets the angles away from exact axis alignment: at
    phi = k*90deg + tiny jitter, edy ~= 1 and whole rays sit within f32
    rounding of the sawtooth's ceil boundary, where the kernel and the
    XLA path — both valid quadratures — can legitimately pick different
    knife-edge samples (localized ~1e-3 diffs).  Octant-parity tests use
    generic angles; production data has the same property for its
    near-axis views (harmless: A and A^T stay mutually consistent within
    either path)."""
    rng = np.random.default_rng(seed)
    return Views.create(
        n_proj, phi=phi0 + np.linspace(0, 2 * np.pi, n_proj,
                                       endpoint=False),
        alpha=rng.uniform(-jit_rad, jit_rad, n_proj),
        beta=rng.uniform(-jit_rad, jit_rad, n_proj),
        t=rng.uniform(-jit_px, jit_px, (n_proj, 3)))


def _kernel_vs_xla_groups(geom, views, quad, vol):
    """Yield (kernel, xla) sinogram batches per orientation group."""
    nv = geom.det_shape[1]
    for idx, sw, yf, uf in sp._orient_groups(jax.tree.map(np.asarray,
                                                          views), geom):
        sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
        sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, quad)
        assert slabk.kernel_bounds_ok(sc, nv=nv), "bounds must hold here"
        vol_or = sp.orient_volume(jnp.asarray(vol, F32), geom, sw, yf)
        scj = jnp.asarray(sc, F32)
        ker = slabk.slab_project_pallas(vol_or, scj, geom, quad,
                                        interpret=True)
        ref = jnp.stack([sp.forward_from_scalars_xla(vol_or, scj[i], geom,
                                                     quad)
                         for i in range(scj.shape[0])])
        yield np.asarray(ker), np.asarray(ref), (sw, yf, uf)


@pytest.mark.parametrize("quad", ["arc", "plane"])
def test_fwd_kernel_interpret_matches_xla_64(quad):
    """64^3 / 64x64 detector: padded kernel dims (nu,nv,nz -> 128),
    every orientation octant present among 8 views."""
    n = 64
    geom = Geometry(n_proj=8, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(8)
    checked = 0
    for ker, ref, flags in _kernel_vs_xla_groups(geom, views, quad, vol):
        rel = np.linalg.norm(ker - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 5e-4, (flags, rel)
        checked += ker.shape[0]
    assert checked == 8


@pytest.mark.slow
def test_fwd_kernel_interpret_nonsquare_detector():
    """Non-128-multiple detector (nu=64, nv=96 on a 64^3 volume): the
    padded rays must be cropped and the kept rays bit-consistent with the
    unpadded XLA geometry."""
    n = 64
    geom = Geometry(n_proj=4, vox_shape=(n,) * 3, det_shape=(n, 96))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(4, seed=3, phi0=0.25)
    for ker, ref, flags in _kernel_vs_xla_groups(geom, views, "arc", vol):
        assert ker.shape == ref.shape
        rel = np.linalg.norm(ker - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 5e-4, (flags, rel)


@pytest.mark.slow
@pytest.mark.xslow
def test_adj_kernel_interpret_transpose_64():
    """Adjoint kernel = exact transpose of the forward kernel (padded
    dims): <A x, y> == <x, A^T y>."""
    n = 64
    geom = Geometry(n_proj=4, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(4, seed=1)
    rng = np.random.default_rng(7)
    nv = geom.det_shape[1]
    for idx, sw, yf, uf in sp._orient_groups(jax.tree.map(np.asarray,
                                                          views), geom):
        sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
        sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
        assert slabk.kernel_bounds_ok(sc, nv=nv)
        vol_or = sp.orient_volume(jnp.asarray(vol, F32), geom, sw, yf)
        scj = jnp.asarray(sc, F32)
        ax = slabk.slab_project_pallas(vol_or, scj, geom, "arc",
                                       interpret=True)
        y = jnp.asarray(rng.standard_normal(ax.shape), F32)
        aty = slabk.slab_backproject_pallas(y, scj, geom, "arc",
                                            interpret=True)
        lhs = float(jnp.vdot(ax, y))
        rhs = float(jnp.vdot(vol_or, aty))
        assert abs(lhs - rhs) < 5e-4 * max(abs(lhs), 1.0), \
            ((sw, yf, uf), lhs, rhs)


def test_kernel_supported_shapes():
    g64 = Geometry(n_proj=2, vox_shape=(64,) * 3, det_shape=(64, 64))
    assert slabk.kernel_supported(g64)
    g100 = Geometry(n_proj=2, vox_shape=(128,) * 3, det_shape=(100, 100))
    assert slabk.kernel_supported(g100)
    # pass A chunks x by the largest of (64, 32, 16) dividing nx: 96^3
    # is eligible (32-chunks); a prime-ish footprint is not
    g96 = Geometry(n_proj=2, vox_shape=(96,) * 3, det_shape=(96, 96))
    assert slabk.kernel_supported(g96) and slabk._xch(96) == 32
    g72 = Geometry(n_proj=2, vox_shape=(72,) * 3, det_shape=(72, 72))
    assert not slabk.kernel_supported(g72)
    # fine step_size needs >2 arc branches -> XLA path (advisor finding)
    gs = Geometry(n_proj=2, vox_shape=(64,) * 3, det_shape=(64, 64),
                  step_size=0.5)
    assert not slabk.kernel_supported(gs, "arc")
    assert slabk.kernel_supported(gs, "plane")


def test_kernel_bounds_boundary():
    """kernel_bounds_ok flags scalar vectors outside the static band
    budget (here: a huge z-per-x cross slope gzx)."""
    g = Geometry(n_proj=1, vox_shape=(64,) * 3, det_shape=(64, 64))
    v0 = Views.create(1)
    sc = sp.slab_scalars_np(g, v0, False, False, False, "arc")
    assert slabk.kernel_bounds_ok(sc, nv=64)
    bad = sc.copy()
    bad[:, slabk.S_GZX] = 0.5   # matmul pass A drift (XCH_A/2)*gzx = 16
    assert not slabk.kernel_bounds_ok(bad, nv=64)
    bad2 = sc.copy()
    bad2[:, slabk.S_EVX] = 0.2  # pass-B band overflow
    assert not slabk.kernel_bounds_ok(bad2, nv=64)


def test_fused_jac_kernel_val_px_match_xla():
    """Quick-tier smoke of the fused 12-output Jacobian kernel: the
    'val' and 'px' slices must match the XLA scalar path (full 12-slice
    parity vs the per-variant kernels is the slow-tier test below)."""
    n = 64
    geom = Geometry(n_proj=1, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(1, seed=9, phi0=0.6)
    groups = list(sp._orient_groups(jax.tree.map(np.asarray, views), geom))
    idx, sw, yf, uf = groups[0]
    sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
    sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
    vol_or = sp.orient_volume(jnp.asarray(vol, F32), geom, sw, yf)
    scj = jnp.asarray(sc, F32)
    fused = np.asarray(slabk.slab_project_jac_pallas(vol_or, scj, geom,
                                                     interpret=True))
    for name, kw in (("val", {}), ("px", dict(deriv="x"))):
        ref = np.asarray(sp._forward_oriented_xla(
            vol_or, jax.tree.map(lambda a: a.astype(F32),
                                 sp.params_from_scalars(scj[0])),
            geom, quad="arc", dtype=F32, **kw))
        i = slabk.JAC_PASSES.index(name)
        rel = (np.linalg.norm(fused[0, i] - ref)
               / max(np.linalg.norm(ref), 1e-6))
        assert rel < 2e-3, (name, rel)


@pytest.mark.slow
@pytest.mark.xslow
def test_fused_jac_kernel_matches_individual_passes():
    """The fused 12-output Jacobian kernel == the twelve per-variant
    kernel launches (same math, shared dataflow): every slice of
    ``slab_project_jac_pallas`` must match its ``slab_project_pallas``
    variant to f32 association noise."""
    n = 64
    geom = Geometry(n_proj=2, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(2, seed=9, phi0=0.6)
    nv = geom.det_shape[1]
    groups = list(sp._orient_groups(jax.tree.map(np.asarray, views), geom))
    idx, sw, yf, uf = groups[0]
    sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
    sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
    assert slabk.kernel_bounds_ok(sc, nv=nv)
    vol_or = sp.orient_volume(jnp.asarray(vol, F32), geom, sw, yf)
    scj = jnp.asarray(sc, F32)

    fused = np.asarray(slabk.slab_project_jac_pallas(vol_or, scj, geom,
                                                     interpret=True))
    assert fused.shape == (scj.shape[0], slabk.NJP, n, n)
    variants = {"val": {}, "px": dict(deriv="x"), "py": dict(deriv="y"),
                "pz": dict(deriv="z"),
                "jx": dict(deriv="x", jweight=True),
                "jy": dict(deriv="y", jweight=True),
                "jz": dict(deriv="z", jweight=True),
                "rx": dict(deriv="x", rweight=True),
                "ry": dict(deriv="y", rweight=True),
                "rz": dict(deriv="z", rweight=True),
                "zm": dict(deriv="zm"), "zc": dict(deriv="zc")}
    for i, name in enumerate(slabk.JAC_PASSES):
        ref = np.asarray(slabk.slab_project_pallas(
            vol_or, scj, geom, "arc", interpret=True, **variants[name]))
        num = np.linalg.norm(fused[:, i] - ref)
        den = max(np.linalg.norm(ref), 1e-6)
        assert num / den < 1e-5, (name, num / den)


@pytest.mark.slow
@pytest.mark.xslow
def test_fwd_kernel_deriv_variants_match_xla():
    """Jacobian building-block variants (hat-derivative passes + j/r
    sample weights) through the Pallas kernel == the XLA deriv paths."""
    n = 64
    geom = Geometry(n_proj=2, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = phantom.shepp3d(n).astype(np.float32)
    views = _jittered_views(2, seed=9, phi0=0.6)
    nv = geom.det_shape[1]
    groups = list(sp._orient_groups(jax.tree.map(np.asarray, views), geom))
    idx, sw, yf, uf = groups[0]
    sub = jax.tree.map(lambda a: np.asarray(a)[idx], views)
    sc = sp.slab_scalars_np(geom, sub, sw, yf, uf, "arc")
    assert slabk.kernel_bounds_ok(sc, nv=nv)
    vol_or = sp.orient_volume(jnp.asarray(vol, F32), geom, sw, yf)
    scj = jnp.asarray(sc, F32)

    variants = [dict(deriv="x"), dict(deriv="y"), dict(deriv="z"),
                dict(deriv="zm"), dict(deriv="zc"),
                dict(deriv="z", jweight=True), dict(deriv="x", rweight=True)]
    for kw in variants:
        ker = np.asarray(slabk.slab_project_pallas(
            vol_or, scj, geom, "arc", interpret=True, **kw))
        ref = np.stack([np.asarray(sp._forward_oriented_xla(
            vol_or, jax.tree.map(lambda a: a.astype(F32),
                                 sp.params_from_scalars(scj[i])),
            geom, quad="arc", dtype=F32, **kw))
            for i in range(scj.shape[0])])
        num = np.linalg.norm(ker - ref)
        den = max(np.linalg.norm(ref), 1e-6)
        assert num / den < 2e-3, (kw, num / den)


def test_band_budget_excursion_contract(monkeypatch):
    """Pins the warn-and-clip policy of ``scalar_groups`` (round-3 VERDICT
    item 4, ``core/slab_projector.py`` band-budget routing):

    - at the refinement box corner (±3 px, ±0.02 rad — the pipeline's
      default bounds, reference ``align_rigid.py:48``) the budget is
      exceeded, scalar_groups WARNS, keeps the kernel on, and the clipped
      kernel stays within 1% per-view of the XLA path;
    - ``strict_bounds=True`` demotes the offending group to XLA instead.
    """
    monkeypatch.setenv("TOMOJAX_SLAB_KERNEL", "interpret")
    n = 64
    n_proj = 4
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n), F32)
    # box-corner views: every one at the refinement bounds' corner
    views = Views.create(
        n_proj, phi=0.55 + np.linspace(0, 0.5, n_proj),
        alpha=np.full(n_proj, 0.02), beta=np.full(n_proj, 0.02),
        t=np.tile(np.array([3.0, 0.0, 3.0]), (n_proj, 1)))

    with pytest.warns(UserWarning, match="band budget"):
        gstruct, scalars = sp.scalar_groups(geom, views, "arc")
    assert any(g[4] for g in gstruct), "kernel must stay on (clip policy)"

    sino_k = np.asarray(sp.project_scalars(vol, geom, gstruct, scalars,
                                           "arc"))
    gs_x, sc_x = sp.scalar_groups(geom, views, "arc", strict_bounds=True)
    assert not any(g[4] for g in gs_x), \
        "strict_bounds must demote the out-of-budget group to XLA"
    sino_x = np.asarray(sp.project_scalars(vol, geom, gs_x, sc_x, "arc"))

    # per-view clipped-kernel error vs the XLA path: the scalar_groups
    # docstring claims <=1%; pin it
    for i in range(n_proj):
        num = np.linalg.norm(sino_k[i] - sino_x[i])
        den = max(np.linalg.norm(sino_x[i]), 1e-6)
        assert num / den < 0.01, (i, num / den)


def test_prec_tier_plumbing(monkeypatch):
    """prec="bf16" threads through the public API, the scalar-argument
    path, and the solver program cache without retrace errors.

    (On CPU the interpreter computes both tiers identically — XLA elides
    the bf16 rounding under excess precision — so this is a plumbing
    test; the accuracy A/B lives on real hardware,
    scripts/prec_ab.py, measured in docs/STATUS.md round 4.)"""
    monkeypatch.setenv("TOMOJAX_SLAB_KERNEL", "interpret")
    n = 16
    geom = Geometry(n_proj=4, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n), F32)
    views = _jittered_views(4, seed=3, jit_px=0.5, jit_rad=0.005,
                            phi0=0.4)
    y16 = sp.project(vol, geom, views, quad="plane", prec="bf16")
    y32 = sp.project(vol, geom, views, quad="plane", prec="f32x2")
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=2e-2, atol=1e-4)
    x16 = sp.backproject(y16, geom, views, quad="plane", prec="bf16")
    assert np.isfinite(np.asarray(x16)).all()
