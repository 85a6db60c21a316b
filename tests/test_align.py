import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.core.geometry import Geometry, Views
from tomojax.core import phantom, projector
from tomojax.align import cc
from tomojax.align.refine import (PARAM_SETS, refine_view, refine_views,
                                  gradient_descent_view, alignment_cost,
                                  alignment_cost_grad)
from tomojax.align.pipeline import align_reconstruct, save_checkpoint, \
    load_checkpoint

F32 = jnp.float32


def _test_image(n=64, seed=0):
    img = phantom.shepp3d(n)[:, n // 2, :].astype(np.float64)
    return jnp.asarray(img)


# ------------------------- phase correlation -------------------------


def test_phase_correlation_integer_shift():
    img = _test_image()
    shifted = jnp.roll(jnp.roll(img, 3, axis=0), -5, axis=1)
    shift = cc.phase_cross_correlation(img, shifted)
    np.testing.assert_allclose(shift, [-3.0, 5.0], atol=1e-6)


def test_phase_correlation_subpixel():
    img = _test_image()
    true = jnp.asarray([1.25, -2.75])
    shifted = cc.fourier_shift(img, -true)  # move by -true; registering back
    shift = cc.phase_cross_correlation(img, shifted, upsample_factor=100)
    np.testing.assert_allclose(shift, true, atol=0.05)


def test_fourier_shift_matches_roll_for_integers():
    img = _test_image(32)
    np.testing.assert_allclose(cc.fourier_shift(img, jnp.asarray([2.0, -1.0])),
                               jnp.roll(jnp.roll(img, 2, 0), -1, 1),
                               atol=1e-10)


def test_cor_flipping():
    img = _test_image()
    c = 1.5  # center-of-rotation offset in px: flipped 180° pair shifts by 2c
    proj_180 = jnp.fliplr(cc.fourier_shift(img, jnp.asarray([0.0, -2 * c])))
    got = cc.cor_flipping(img, proj_180)
    # fliplr flips the sign of the x-shift
    np.testing.assert_allclose(abs(float(got)), 2 * c, atol=0.1)


def test_cross_correlation_chain():
    img = _test_image()
    n_views = 5
    rng = np.random.default_rng(0)
    true_shifts = rng.uniform(-3, 3, (n_views, 2))
    true_shifts[0] = 0
    stack = jnp.stack([cc.fourier_shift(img, jnp.asarray(-s))
                       for s in true_shifts])
    offsets, aligned = cc.cross_correlation_chain(stack, upsample_factor=50)
    # each aligned frame should match the first
    for i in range(n_views):
        err = float(jnp.linalg.norm(aligned[i] - img)) / \
            float(jnp.linalg.norm(img))
        assert err < 0.05, (i, err)


def test_cross_correlation_filtered_integer():
    img = _test_image()
    shifts = [(0, 0), (2, -3), (-1, 4)]
    stack = jnp.stack([jnp.roll(jnp.roll(img, s0, 0), s1, 1)
                       for (s0, s1) in shifts])
    offsets, aligned = cc.cross_correlation_filtered(stack)
    for i in range(1, 3):
        err = float(jnp.linalg.norm(aligned[i] - img)) / \
            float(jnp.linalg.norm(img))
        assert err < 1e-6, (i, err)


# ------------------------- 6-DoF refinement -------------------------


@pytest.fixture(scope="module")
def align_problem():
    n = 16
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=1, vox_shape=(n, n, n), det_shape=(n, n))
    return vol, geom


def test_refine_view_recovers_parameters(align_problem):
    vol, geom = align_problem
    true = jnp.asarray([1.2, 0.0, -0.8, 0.7, 0.012, -0.008], F32)
    cor = jnp.zeros(3, F32)
    meas = projector.forward_view(vol, geom, true[3], true[4], true[5],
                                  true[:3], cor)
    # start from the unjittered guess (phi known)
    init = jnp.asarray([0.0, 0.0, 0.0, 0.7, 0.0, 0.0], F32)
    lo = init + jnp.asarray([-3, -3, -3, 0, -0.02, -0.02], F32)
    hi = init + jnp.asarray([3, 3, 3, 0, 0.02, 0.02], F32)
    res = refine_view(vol, meas, geom, init, cor, mask=PARAM_SETS["xzab"],
                      lower=lo, upper=hi, max_iter=40)
    got = np.asarray(res.theta6)
    want = np.asarray(true)
    assert abs(got[0] - want[0]) < 0.05   # tx
    assert abs(got[2] - want[2]) < 0.05   # tz
    assert abs(got[4] - want[4]) < 2e-3   # alpha
    assert abs(got[5] - want[5]) < 2e-3   # beta
    assert float(res.cost) < 1e-2 * float(jnp.vdot(meas, meas).real)


def test_refine_respects_mask_and_bounds(align_problem):
    vol, geom = align_problem
    true = jnp.asarray([1.2, 0.0, -0.8, 0.7, 0.012, -0.008], F32)
    cor = jnp.zeros(3, F32)
    meas = projector.forward_view(vol, geom, true[3], true[4], true[5],
                                  true[:3], cor)
    init = jnp.asarray([0.0, 0.0, 0.0, 0.7, 0.0, 0.0], F32)
    res = refine_view(vol, meas, geom, init, cor, mask=PARAM_SETS["xz"],
                      lower=init - 0.5, upper=init + 0.5, max_iter=20)
    got = np.asarray(res.theta6)
    # frozen parameters unchanged
    assert got[1] == 0.0 and got[3] == pytest.approx(0.7) \
        and got[4] == 0.0 and got[5] == 0.0
    # moved parameters respect the ±0.5 box
    assert -0.5 - 1e-6 <= got[0] <= 0.5 + 1e-6
    assert -0.5 - 1e-6 <= got[2] <= 0.5 + 1e-6


def test_refine_views_batched(align_problem):
    vol, geom = align_problem
    n_proj = 4
    geom4 = Geometry(n_proj=n_proj, vox_shape=geom.vox_shape,
                     det_shape=geom.det_shape)
    rng = np.random.default_rng(1)
    # perturbations within the ~1-voxel attraction basin of the piecewise-
    # trilinear cost; larger shifts are handled by CC pre-alignment first
    # (the reference pipeline does the same: align_cc before refinement)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.0, 1.0, n_proj)
    t[:, 2] = rng.uniform(-1.0, 1.0, n_proj)
    alpha = rng.uniform(-0.01, 0.01, n_proj)
    beta = rng.uniform(-0.01, 0.01, n_proj)
    true_views = Views.create(n_proj, alpha=alpha, beta=beta, t=t)
    meas = projector.project(vol, geom4, true_views)
    init_views = Views.create(n_proj)  # same phi, zero jitter
    res = refine_views(vol, meas, geom4, init_views,
                       mask=PARAM_SETS["xzab"], max_iter=40)
    got = np.asarray(res.theta6)
    np.testing.assert_allclose(got[:, 0], t[:, 0], atol=0.1)
    np.testing.assert_allclose(got[:, 2], t[:, 2], atol=0.1)
    np.testing.assert_allclose(got[:, 4], alpha, atol=3e-3)
    np.testing.assert_allclose(got[:, 5], beta, atol=3e-3)


def test_gradient_descent_view_reduces_cost(align_problem):
    vol, geom = align_problem
    true = jnp.asarray([0.8, 0.0, -0.5, 0.4, 0.0, 0.0], F32)
    cor = jnp.zeros(3, F32)
    meas = projector.forward_view(vol, geom, true[3], true[4], true[5],
                                  true[:3], cor)
    init = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.0, 0.0], F32)
    c0 = alignment_cost(vol, meas, geom, init, cor)
    res = gradient_descent_view(vol, meas, geom, init, cor,
                                mask=PARAM_SETS["xz"], max_iter=30)
    assert float(res.cost) < 0.5 * float(c0)


def test_alignment_gradient_consistent(align_problem):
    vol, geom = align_problem
    cor = jnp.zeros(3, F32)
    th = jnp.asarray([0.3, 0.0, -0.2, 0.5, 0.005, -0.003], F32)
    meas = projector.forward_view(vol, geom, 0.5, 0.0, 0.0,
                                  jnp.zeros(3, F32), cor)
    cost, grad, r, jac = alignment_cost_grad(vol, meas, geom, th, cor)
    g_ad = jax.grad(lambda t: alignment_cost(
        vol, meas, geom, t, cor))(th)  # uses custom autodiff path? no:
    # alignment_cost uses forward_view (plain autodiff through the scan)
    np.testing.assert_allclose(grad, g_ad, rtol=2e-2, atol=2e-4)


# ------------------------- pipeline -------------------------


@pytest.mark.slow
def test_align_reconstruct_improves(tmp_path):
    n = 16
    n_proj = 24
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(2)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.0, 1.0, n_proj)
    t[:, 2] = rng.uniform(-1.0, 1.0, n_proj)
    true_views = Views.create(n_proj, t=t)
    meas = projector.project(vol, geom, true_views)

    views0 = Views.create(n_proj)
    state = align_reconstruct(meas, geom, views0, outer_iters=3,
                              recon="sirt", recon_iters=40,
                              param_set="xz", refine_iters=10,
                              checkpoint_dir=str(tmp_path))
    got_t = np.asarray(state.views.t)
    err0 = np.abs(t[:, [0, 2]]).mean()
    err = np.abs(got_t[:, [0, 2]] - t[:, [0, 2]]).mean()
    assert err < 0.5 * err0, (err, err0)

    # checkpoints written and resumable
    ck = load_checkpoint(str(tmp_path / "align_ckpt_0002.npz"))
    assert ck["iteration"] == 2
    resumed = align_reconstruct(meas, geom, views0, outer_iters=3,
                                recon="sirt", recon_iters=40,
                                param_set="xz", refine_iters=10,
                                checkpoint_dir=str(tmp_path), resume=True)
    np.testing.assert_allclose(resumed.views.t, state.views.t, atol=1e-6)


def test_fast_family_gradient_descent(align_problem):
    # fast-family refinement: gradients flow through the custom-vjp
    # multi-pass projector
    from tomojax.core import fast_projector as fastp
    vol, geom = align_problem
    cor = jnp.zeros(3, F32)
    true = jnp.asarray([0.8, 0.0, -0.5, 0.6, 0.0, 0.0], F32)
    meas = fastp.forward_view(vol, geom, true[3], true[4], true[5],
                              true[:3], cor)
    init = jnp.asarray([0.0, 0.0, 0.0, 0.6, 0.0, 0.0], F32)
    res = gradient_descent_view(vol, meas, geom, init, cor,
                                mask=PARAM_SETS["xz"], max_iter=40,
                                family="fast")
    got = np.asarray(res.theta6)
    assert abs(got[0] - 0.8) < 0.05
    assert abs(got[2] + 0.5) < 0.05


def test_com_align_recovers_translations():
    """COM-consistency pre-alignment: drift-free per-view (tx, tz) to
    ~0.1 px under +-1 deg tilt jitter (the pairwise chain this replaces
    drifts by more than the jitter at coarse angular steps)."""
    from tomojax.align import com_align
    n, n_proj = 32, 48
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(0)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-3, 3, n_proj)
    t[:, 2] = rng.uniform(-3, 3, n_proj)
    views = Views.create(n_proj, phi=phi, t=t,
                         alpha=rng.uniform(-0.017, 0.017, n_proj),
                         beta=rng.uniform(-0.017, 0.017, n_proj))
    meas = projector.project(vol, geom, views)
    est = np.asarray(com_align(meas, geom, phi))
    res = est - t[:, [0, 2]]
    res -= res.mean(axis=0)           # volume-shift gauge
    assert np.abs(res).mean() < 0.3, np.abs(res).mean()
    raw = np.abs(t[:, [0, 2]]).mean()
    assert np.abs(res).mean() < 0.2 * raw


def test_com_align_off_center_phantom():
    """Regression for the BASELINE-config-3 finding: a phantom whose COM
    sits off the rotation axis (the Shepp phantom's y-COM is ~1% of n)
    induces u_com(phi) = Cx cos + Cy sin; over a half-circle
    mean(sin) = 2/pi != 0, so mean-subtraction left a *constant* tx
    error ~ (2/pi)Cy — a COR shift that grew with resolution (1.5 px at
    256^3) and made pre-alignment worse than nothing.  The harmonic-fit
    estimator must stay at the moment-discretization floor, and its
    error must lie in the unobservable span {1, cos, sin} only."""
    from tomojax.align import com_align
    n, n_proj = 32, 40
    vol0 = phantom.shepp3d(n).astype(np.float32)
    # shift the phantom 3 voxels along y: COM well off the rotation axis
    vol = np.zeros_like(vol0)
    vol[:, 3:, :] = vol0[:, :-3, :]
    vol = jnp.asarray(vol)
    rng = np.random.default_rng(1)
    phi = np.linspace(0, np.pi, n_proj)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(vol, geom=Geometry(
        n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n)), views=views)
    est = np.asarray(com_align(
        meas, Geometry(n_proj=n_proj, vox_shape=(n,) * 3,
                       det_shape=(n, n)), phi))
    ex = est[:, 0] - t[:, 0]
    # project out the unobservable span {1, cos, sin} (gauge + COR)
    basis = np.stack([np.ones_like(phi), np.cos(phi), np.sin(phi)], 1)
    r = ex - basis @ np.linalg.lstsq(basis, ex, rcond=None)[0]
    assert np.abs(r).mean() < 0.08, np.abs(r).mean()
    # and the estimate itself carries no spurious constant: its fit
    # residual vs truth-projected-out-of-span is small even raw after
    # removing truth's own span component
    t_span = basis @ np.linalg.lstsq(basis, t[:, 0], rcond=None)[0]
    assert np.abs(ex + t_span).mean() < 0.15, np.abs(ex + t_span).mean()
    ez = est[:, 1] - t[:, 2]
    assert np.abs(ez - ez.mean()).mean() < 0.08


def test_align_reconstruct_chunked_refinement_paths():
    """Regression: the view-chunked LM refinement path (refine_chunk < n)
    must run and give the same result as the unchunked path.  Round 2
    shipped this path broken (a function-local ``import jax`` in the
    gd_fast branch shadowed the module-level name, so the LM branch's
    ``jax.tree.map`` at the chunk-concat raised UnboundLocalError) and the
    64^3/90-view north-star run died on exactly this."""
    n, n_proj = 12, 6
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(5)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-0.8, 0.8, n_proj)
    true_views = Views.create(n_proj, t=t)
    meas = projector.project(vol, geom, true_views)
    views0 = Views.create(n_proj)

    kw = dict(outer_iters=1, recon="sirt", recon_iters=15,
              param_set="xz", refine_iters=6)
    full = align_reconstruct(meas, geom, views0, **kw)
    chunked = align_reconstruct(meas, geom, views0, refine_chunk=2, **kw)
    np.testing.assert_allclose(chunked.views.t, full.views.t, atol=1e-5)

    # gd_fast branch, chunked, must also run end-to-end
    gd = align_reconstruct(meas, geom, views0, refine_chunk=2,
                           refine_method="gd_fast", outer_iters=1,
                           recon="sirt", recon_iters=15,
                           param_set="xz", refine_iters=4)
    assert np.asarray(gd.views.t).shape == (n_proj, 3)


def test_refine_views_slab_recovers_shifts():
    """Batched slab-family LM (production θ-gradient path): recovers
    per-view (tx, tz) on slab-generated data from a pre-aligned init.

    The init is within ±0.3 px of truth, as COM/CC pre-alignment
    provides in every pipeline (the reference's flow too). Initializing
    EXACTLY at integer lattice alignment (t = 0) can kink-trap ANY
    gradient-based refiner — the cost is piecewise-smooth with a large
    one-sided slope change where all samples cross z-cell boundaries
    simultaneously, and the exact ray family stalls at the identical
    point (verified) — so zero-init is not the supported contract."""
    from tomojax.core import slab_projector as slabp
    from tomojax.align.slab_refine import refine_views_slab
    n, n_proj = 16, 6
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(11)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.0, 1.0, n_proj)
    t[:, 2] = rng.uniform(-1.0, 1.0, n_proj)
    phi = 0.2 + np.linspace(0, np.pi, n_proj, endpoint=False)
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = slabp.project(vol, geom, true_views, quad="arc")

    t0 = t.copy()
    t0[:, [0, 2]] += rng.uniform(-0.3, 0.3, (n_proj, 2))
    init = Views.create(n_proj, phi=phi, t=t0)
    res = refine_views_slab(vol, meas, geom, init, param_set="xz",
                            max_iter=15)
    got = np.asarray(res.theta6)
    err0 = np.abs(t0[:, [0, 2]] - t[:, [0, 2]]).mean()
    err = np.abs(got[:, [0, 2]] - t[:, [0, 2]]).mean()
    assert err < 0.15 * err0, (err, err0)


def test_aitken_extrapolate_geometric_and_safeguards():
    """Aitken Δ² on the outer alternation: exact limit recovery for a
    geometric sequence, masked params untouched, non-contracting and
    sign-flipping sequences left alone, jumps clipped into the box."""
    from tomojax.align.pipeline import aitken_extrapolate
    rng = np.random.default_rng(5)
    n = 7
    star = rng.uniform(-1, 1, (n, 6))
    c = rng.uniform(0.5, 2.0, (n, 6))
    rho = 0.9
    th = [star + c * rho**k for k in range(3)]
    mask = np.array([True, False, True, False, True, True])
    lo = np.full((n, 6), -10.0)
    hi = np.full((n, 6), 10.0)
    out = aitken_extrapolate(th[0], th[1], th[2], lo, hi, mask,
                             gain_cap=1e6)
    np.testing.assert_allclose(out[:, mask], star[:, mask], atol=1e-9)
    np.testing.assert_array_equal(out[:, ~mask], th[2][:, ~mask])
    # oscillating (sign-flipping) differences: no jump
    osc = [star, star + 0.1, star - 0.1 + 0.02]
    out2 = aitken_extrapolate(osc[0], osc[1], osc[2], lo, hi, mask)
    np.testing.assert_array_equal(out2, np.clip(osc[2], lo, hi))
    # box clip: limit outside the box lands on the bound
    out3 = aitken_extrapolate(th[0], th[1], th[2], lo,
                              np.full((n, 6), -0.5), mask, gain_cap=1e6)
    assert np.all(out3 <= -0.5 + 1e-12)


def test_refine_views_slab_frozen_groups_match():
    """refine_views_slab with a FROZEN group structure (as the
    alternating pipeline passes after its first outer iteration) must
    match the self-grouped call bit-for-bit: freezing only pins
    membership/batch shapes, never the math. Also covers the case where
    the frozen flags come from *different* θ than the refinement input
    (the pipeline freezes at outer 0; later outers refine drifted θ)."""
    from tomojax.core import slab_projector as slabp
    from tomojax.align.slab_refine import refine_views_slab
    n, n_proj = 16, 8
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(17)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.0, 1.0, n_proj)
    t[:, 2] = rng.uniform(-1.0, 1.0, n_proj)
    phi = 0.2 + np.linspace(0, np.pi, n_proj, endpoint=False)
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = slabp.project(vol, geom, true_views, quad="arc")

    t0 = t.copy()
    t0[:, [0, 2]] += rng.uniform(-0.3, 0.3, (n_proj, 2))
    init = Views.create(n_proj, phi=phi, t=t0)
    # freeze groups at a *different* θ (zero translations), as outer 0
    # does; membership depends only on phi here, so batches match
    frozen0 = Views.create(n_proj, phi=phi)
    gs, _ = slabp.scalar_groups(geom, frozen0, "arc")
    a = refine_views_slab(vol, meas, geom, init, param_set="xz",
                          max_iter=8)
    b = refine_views_slab(vol, meas, geom, init, param_set="xz",
                          max_iter=8, groups=gs)
    np.testing.assert_array_equal(np.asarray(a.theta6),
                                  np.asarray(b.theta6))


def test_refine_views_slab_angles():
    """Slab LM recovers small tilt jitter (alpha, beta) too."""
    from tomojax.core import slab_projector as slabp
    from tomojax.align.slab_refine import refine_views_slab
    n, n_proj = 16, 6
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(13)
    phi = 0.3 + np.linspace(0, np.pi, n_proj, endpoint=False)
    al = rng.uniform(-0.01, 0.01, n_proj)
    be = rng.uniform(-0.01, 0.01, n_proj)
    true_views = Views.create(n_proj, phi=phi, alpha=al, beta=be)
    meas = slabp.project(vol, geom, true_views, quad="arc")

    init = Views.create(n_proj, phi=phi)
    res = refine_views_slab(vol, meas, geom, init, param_set="ab",
                            max_iter=20)
    got = np.asarray(res.theta6)
    err0 = np.abs(np.stack([al, be], -1)).mean()
    err = np.abs(got[:, [4, 5]] - np.stack([al, be], -1)).mean()
    assert err < 0.2 * err0, (err, err0)


@pytest.mark.slow
@pytest.mark.xslow
@pytest.mark.slow
def test_align_to_reprojection_bounded_and_com_superior():
    """(a) The out-of-fold (leave-out) projection-matching variant —
    each view registered to the reprojection of its COMPLEMENT folds'
    reconstruction — contracts ~0.7x/round (no self-consistency
    attenuation; early rounds limited only by the complement recon
    still being misaligned). (b) Characterization of the round-2
    advisor finding: the legacy self-consistent variant (folds=None)
    improves only modestly and must at least not diverge; com_align
    solves the consistency-respecting scenario in one shot."""
    from tomojax.align.cc import align_to_reprojection
    from tomojax.align import com_align
    n, n_proj = 32, 24
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(0)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-2, 2, n_proj)
    t[:, 2] = rng.uniform(-2, 2, n_proj)
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(vol, geom, true_views)

    def resid_of(tgot):
        res = np.asarray(tgot)[:, [0, 2]] - t[:, [0, 2]]
        res -= res.mean(axis=0)
        return np.abs(res).mean()

    views0 = Views.create(n_proj, phi=phi)
    # out-of-fold variant (default): geometric contraction (measured
    # 0.98 -> 0.39 px in 3 rounds at this config)
    loo, _ = align_to_reprojection(meas, geom, views0, rounds=3,
                                   recon_iters=20, family="ray", folds=4)
    r_loo = resid_of(loo.t)
    r0 = resid_of(views0.t)
    assert r_loo < 0.55 * r0, (r_loo, r0)

    # legacy self-consistent variant: bounded, attenuated — and beaten
    # by the out-of-fold variant
    out, _ = align_to_reprojection(meas, geom, views0, rounds=4,
                                   recon_iters=10, family="ray",
                                   folds=None)
    r_reproj = resid_of(out.t)
    assert r_reproj < r0, (r_reproj, r0)          # improves, no divergence
    assert r_loo < r_reproj, (r_loo, r_reproj)

    est = np.asarray(com_align(meas, geom, phi))
    t_com = np.zeros((n_proj, 3))
    t_com[:, 0] = est[:, 0]
    t_com[:, 2] = est[:, 1]
    r_com = resid_of(t_com)
    assert r_com < 0.3 and r_com < r_reproj, (r_com, r_reproj)


@pytest.mark.slow
@pytest.mark.xslow
def test_debias_defect_fixed_point():
    """Defect correction removes the slab<->exact mismatch bias.

    The cross-family protocol (data from the exact ray family, solved
    with the slab family) has an operator-mismatch bias floor: slab LM
    started AT the truth walks away by ~1e-3 (scripts/c64_floor.py).
    Re-centering the data by the defect d = P_exact - P_slab evaluated
    at the truth makes the truth an exact stationary point again:
    P_slab(x_true, th_true) - (meas - d) == P_exact - meas == 0."""
    from tomojax.core import slab_projector as slabp
    from tomojax.align.slab_refine import refine_views_slab
    from tomojax.align.pipeline import _exact_forward
    n, n_proj = 16, 6
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(7)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.0, 1.0, n_proj)
    t[:, 2] = rng.uniform(-1.0, 1.0, n_proj)
    phi = 0.2 + np.linspace(0, np.pi, n_proj, endpoint=False)
    vt = Views.create(n_proj, phi=phi,
                      alpha=rng.uniform(-0.01, 0.01, n_proj),
                      beta=rng.uniform(-0.01, 0.01, n_proj), t=t)
    meas = projector.project(vol, geom, vt).reshape(n_proj, -1)
    p_slab = slabp.project(vol, geom, vt, quad="arc").reshape(n_proj, -1)
    p_exact = _exact_forward(vol, geom, vt, jnp.float32, chunk=4)
    # the host-chunked debias forward IS the exact family
    np.testing.assert_allclose(np.asarray(p_exact), np.asarray(meas),
                               rtol=0, atol=1e-5)
    work = meas - (p_exact - p_slab)
    # corrected residual at the truth is zero up to f32 roundoff
    r = float(jnp.linalg.norm(p_slab - work) / jnp.linalg.norm(meas))
    assert r < 1e-5, r

    th_true = np.asarray(vt.theta6(), np.float64)
    lo = jnp.asarray(th_true - 0.5)
    hi = jnp.asarray(th_true + 0.5)
    mask = PARAM_SETS["xzab"]
    kw = dict(mask=mask, lower=lo, upper=hi, max_iter=10)
    walk_raw = np.abs(np.asarray(refine_views_slab(
        vol, meas, geom, vt, **kw).theta6, np.float64) - th_true)
    walk_cor = np.abs(np.asarray(refine_views_slab(
        vol, work, geom, vt, **kw).theta6, np.float64) - th_true)
    m = np.asarray(mask, bool)
    # debiased LM stays at the truth; raw cross-family LM walks away
    assert walk_cor[:, m].max() < 1e-4, walk_cor.max(0)
    assert walk_cor[:, m].max() <= walk_raw[:, m].max(), (
        walk_cor.max(0), walk_raw.max(0))


def test_moment_match_measures_translation_error():
    """First-moment matching vs reprojections measures per-view (tx, tz)
    error up to gauge (tx: {cos phi, sin phi}; tz: {const}) regardless of
    the volume — including the constant/smooth tx modes invisible to
    per-view refinement (round-2 c64 plateau)."""
    from tomojax.align import moment_match
    n, n_proj = 32, 24
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    rng = np.random.default_rng(3)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.5, 1.5, n_proj)
    t[:, 2] = rng.uniform(-1.5, 1.5, n_proj)
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(vol, geom, true_views)

    # estimate errors: constant tx (COR-like quasi-null mode) + smooth
    # drift + constant tz
    terr = np.zeros((n_proj, 3))
    terr[:, 0] = 0.4 + 0.2 * np.cos(2 * phi)
    terr[:, 2] = -0.3
    est_views = Views.create(n_proj, phi=phi, t=t + terr)
    synth = projector.project(vol, geom, est_views)

    d = moment_match(meas, synth, geom.det_shape)
    # corrected estimates: residual error must lie in the gauge subspace
    res_tx = (t[:, 0] + terr[:, 0] + d[:, 0]) - t[:, 0]
    res_tz = (t[:, 2] + terr[:, 2] + d[:, 1]) - t[:, 2]
    A = np.stack([np.cos(phi), np.sin(phi)], 1)
    coef, *_ = np.linalg.lstsq(A, res_tx, rcond=None)
    res_tx_gc = res_tx - A @ coef
    res_tz_gc = res_tz - res_tz.mean()
    assert np.abs(res_tx_gc).mean() < 0.03, np.abs(res_tx_gc).mean()
    assert np.abs(res_tz_gc).mean() < 1e-3, np.abs(res_tz_gc).mean()


def test_moment_match_device_f32_matches_f64_oracle():
    """moment_match is device-side and jittable (round-3 VERDICT item 6);
    its f32 path (centered coordinates) must stay well below the 1e-4 px
    alignment target vs an uncentered host-f64 oracle."""
    from tomojax.align import moment_match
    nu = nv = 128
    n_proj = 24
    rng = np.random.default_rng(7)
    # smooth positive blobs, like real sinograms
    u = np.arange(nu)[None, :, None]
    v = np.arange(nv)[None, None, :]
    cu = rng.uniform(40, 88, (n_proj, 1, 1))
    cv = rng.uniform(40, 88, (n_proj, 1, 1))
    meas = np.exp(-((u - cu) ** 2 + (v - cv) ** 2) / 200.0)
    synth = np.exp(-((u - cu - 0.37) ** 2 + (v - cv + 0.81) ** 2) / 190.0)

    def oracle(m, s):
        mm = m.astype(np.float64)
        ss = s.astype(np.float64)

        def com(p):
            mass = p.sum(axis=(1, 2))
            return ((p * u).sum(axis=(1, 2)) / mass,
                    (p * v).sum(axis=(1, 2)) / mass)

        mu_, mv_ = com(mm)
        su_, sv_ = com(ss)
        return np.stack([su_ - mu_, sv_ - mv_], 1)

    ref = oracle(meas, synth)
    x64_was = jax.config.jax_enable_x64
    try:
        jax.config.update("jax_enable_x64", False)
        got = np.asarray(jax.jit(
            lambda a, b: moment_match(a, b, (nu, nv)))(
                jnp.asarray(meas, jnp.float32),
                jnp.asarray(synth, jnp.float32)))
    finally:
        jax.config.update("jax_enable_x64", x64_was)
    # measured f32 floor ~2.4e-5 px at 128² — 4x below the 1e-4 target
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_com_align_device_matches_host_lstsq():
    """com_align's harmonic-span fit runs on device via a baked-in f64
    projector; it must match the old host np.linalg.lstsq path."""
    from tomojax.align import com_align
    n, n_proj = 32, 40
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    rng = np.random.default_rng(11)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    u = np.arange(n)[None, :, None]
    v = np.arange(n)[None, None, :]
    cu = 16 + 4 * np.cos(phi)[:, None, None] + \
        rng.uniform(-1, 1, n_proj)[:, None, None]
    cv = 16 + rng.uniform(-1, 1, n_proj)[:, None, None]
    proj = np.exp(-((u - cu) ** 2 + (v - cv) ** 2) / 30.0)

    est = np.asarray(com_align(proj.reshape(n_proj, -1), geom, phi),
                     np.float64)
    # host-f64 oracle of the same estimator
    p = np.maximum(proj, 0.0)
    mass = p.sum(axis=(1, 2))
    u_com = (p * u).sum(axis=(1, 2)) / mass
    v_com = (p * v).sum(axis=(1, 2)) / mass
    basis = np.stack([np.ones_like(phi), np.cos(phi), np.sin(phi)], 1)
    coef, *_ = np.linalg.lstsq(basis, u_com, rcond=None)
    ref_tx = basis @ coef - u_com
    ref_tz = v_com.mean() - v_com
    assert np.abs(est[:, 0] - ref_tx).max() < 1e-4
    assert np.abs(est[:, 1] - ref_tz).max() < 1e-4


def test_align_reconstruct_moment_hook_kills_constant_tx():
    """Pipeline moment hook: a coherent constant-tx ground-truth component
    (non-gauge; per-view LM alone contracts it at ~0.99/outer) is removed
    by the per-outer moment-matching step."""
    n, n_proj = 16, 12
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = 0.6          # pure coherent mode: the worst case
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(vol, geom, true_views)
    views0 = Views.create(n_proj, phi=phi)

    kw = dict(outer_iters=4, recon="sirt", recon_iters=25,
              param_set="xz", refine_iters=5)
    on = align_reconstruct(meas, geom, views0, moment_period=1, **kw)
    off = align_reconstruct(meas, geom, views0, moment_period=None, **kw)

    def gc_err(state):
        # remove the {cos, sin} volume-shift gauge; the constant (COR)
        # component is NOT gauge and must actually be recovered
        r = np.asarray(state.views.t, np.float64)[:, 0] - 0.6
        A = np.stack([np.cos(phi), np.sin(phi)], 1)
        coef, *_ = np.linalg.lstsq(A, r, rcond=None)
        return np.abs(r - A @ coef).mean()

    err_on, err_off = gc_err(on), gc_err(off)
    assert err_on < 0.06, (err_on, err_off)
    assert err_on < 0.5 * err_off, (err_on, err_off)


def test_moment_gauge_projection():
    """_project_out_gauge removes exactly the rigid-gauge component of a
    moment correction (tx: {cos phi, sin phi} volume shift; tz: {const}
    volume z-shift) and passes every orthogonal signal through untouched
    (incl. the constant-tx COR mode, which is observable)."""
    from tomojax.align.pipeline import _project_out_gauge
    rng = np.random.default_rng(3)
    n = 40
    phi = np.linspace(0, np.pi, n, endpoint=False)
    gauge = np.stack([0.7 * np.cos(phi) - 0.4 * np.sin(phi),
                      np.full(n, 0.9)], 1)
    out = _project_out_gauge(gauge, phi)
    assert np.abs(out).max() < 1e-12, out

    sig = np.stack([0.3 + 0.2 * np.cos(2 * phi), 0.1 * np.sin(phi)], 1)
    out = _project_out_gauge(sig + gauge, phi)
    # gauge-invariant: adding any gauge component changes nothing
    np.testing.assert_allclose(out, _project_out_gauge(sig, phi),
                               atol=1e-12)
    # the output carries no gauge component itself
    A = np.stack([np.cos(phi), np.sin(phi)], 1)
    assert np.abs(A.T @ out[:, 0]).max() < 1e-10
    assert abs(out[:, 1].mean()) < 1e-12
    # and the non-gauge content survives (cos 2phi has most of its energy
    # outside span{cos, sin, 1} even on the half-circle grid)
    assert np.linalg.norm(out[:, 0]) > 0.5 * np.linalg.norm(
        sig[:, 0] - sig[:, 0].mean())


def test_support_mask_covers_object_excludes_corners():
    """_support_mask estimates the object's projected half-widths from the
    sinogram (shift-invariant widths) and builds a cylinder that (a) keeps
    every object voxel — clipping the object's shell de-cancels the
    measured data's detector-edge truncation and biases the moment hook
    by the truncated moments (the round-2/3 2e-3 px tx plateau;
    scripts/hook_probe.py) — and (b) excludes the volume corners where a
    reconstruction absorbs the moment signal (unmasked hook recovery 0.30
    at 64^3; scripts/hook_probe2.py)."""
    from tomojax.align.pipeline import _support_mask
    n, n_proj = 32, 16
    geom = Geometry(n_proj=n_proj, vox_shape=(n,) * 3, det_shape=(n, n))
    vol = np.asarray(phantom.shepp3d(n), np.float32)
    rng = np.random.default_rng(0)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-1.5, 1.5, n_proj)
    t[:, 2] = rng.uniform(-1.5, 1.5, n_proj)
    views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(jnp.asarray(vol), geom, views)

    m = _support_mask(geom, np.asarray(meas))
    # (a) the object's support is fully inside the mask
    assert float(np.abs(vol * (1.0 - np.asarray(m))).max()) == 0.0
    # (b) the x-y corners are excluded (radius ~ sqrt(2)*n/2 >> support)
    assert float(np.asarray(m)[0, 0, n // 2]) == 0.0
    assert float(np.asarray(m)[-1, -1, n // 2]) == 0.0
    # mask radius is close to the true projected radius (~0.92*n/2):
    # row of the mask through the center
    row = np.asarray(m)[:, n // 2, n // 2]
    r_est = np.abs(np.where(row > 0)[0] - (n - 1) / 2.0).max()
    r_true = 0.92 * n / 2.0
    assert r_true <= r_est <= r_true + 4.0, (r_est, r_true)


@pytest.mark.slow
@pytest.mark.xslow
def test_align_reconstruct_cv_kfold(tmp_path):
    """K-fold CV alternation (pipeline.align_reconstruct_cv): each view is
    refined against a reconstruction of the other K-1 folds' data (the
    out-of-fold estimator that breaks the self-absorption fixed point of
    the plain alternation).  Checks it contracts slab-consistent jitter,
    that K=3 complement bookkeeping (fold k never in its own recon set)
    is right by construction, and that the new stacked-``vols``
    checkpoint layout resumes bit-identically."""
    from tomojax.core import slab_projector as sp
    from tomojax.align.pipeline import align_reconstruct_cv

    n, n_proj = 16, 24
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(7)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-0.6, 0.6, n_proj)
    t[:, 2] = rng.uniform(-0.6, 0.6, n_proj)
    true_views = Views.create(n_proj, t=t)
    meas = sp.project(vol, geom, true_views, quad="arc")

    views0 = Views.create(n_proj)
    kw = dict(outer_iters=2, recon="cgls", recon_iters=25,
              param_set="xz", refine_iters=8, folds=3,
              moment_period=1)
    state = align_reconstruct_cv(meas, geom, views0,
                                 checkpoint_dir=str(tmp_path), **kw)
    got_t = np.asarray(state.views.t)
    err0 = np.abs(t[:, [0, 2]]).mean()
    err = np.abs(got_t[:, [0, 2]] - t[:, [0, 2]]).mean()
    # a polish-stage driver started cold: expect solid contraction (the
    # measured 2-outer factor is ~0.54 at this size), not full capture
    assert err < 0.7 * err0, (err, err0)
    assert np.asarray(state.volume).shape == geom.vox_shape
    assert state.residuals.shape == (n_proj,)

    # stacked-vols checkpoint: K complement recons saved, resume is exact
    z = np.load(tmp_path / "cv_ckpt_0001.npz")
    assert z["vols"].shape == (3, n, n, n)
    resumed = align_reconstruct_cv(meas, geom, views0,
                                   checkpoint_dir=str(tmp_path), **kw)
    np.testing.assert_allclose(resumed.views.t, state.views.t, atol=1e-6)

    # fold-count mismatch on resume: reuses theta, re-warms volumes
    kw4 = dict(kw, folds=4, outer_iters=3)
    st4 = align_reconstruct_cv(meas, geom, views0,
                               checkpoint_dir=str(tmp_path), **kw4)
    err4 = np.abs(np.asarray(st4.views.t)[:, [0, 2]]
                  - t[:, [0, 2]]).mean()
    assert err4 < 0.7 * err0, (err4, err0)


def test_align_reconstruct_slab_gt_metric_and_chunked_cgls():
    """VERDICT r4 items 6+10 at pipeline level: (a) the cached slab
    solver programs report the ground-truth rms curve (the reference's
    ``options['ground_truth']`` metric, ``sirt.py:47-51``) instead of
    silently dropping it; (b) CGLS ``recon_chunk`` threads the full
    CGLSState across device programs, so chunked == unchunked."""
    from tomojax.core import slab_projector as sp

    n, n_proj = 16, 12
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(7)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-0.5, 0.5, n_proj)
    t[:, 2] = rng.uniform(-0.5, 0.5, n_proj)
    true_views = Views.create(n_proj, t=t)
    meas = sp.project(vol, geom, true_views, quad="plane")
    views0 = Views.create(n_proj)

    kw = dict(outer_iters=1, recon="cgls", recon_iters=6,
              family="slab_plane", refine_method="lm_slab",
              refine_iters=1, moment_period=None, param_set="xz",
              ground_truth=vol)
    full = align_reconstruct(meas, geom, views0, **kw)
    # with outer_iters=1 the returned volume is the post-recon volume:
    # the recorded gt metric must equal its actual rel-L2 error
    rel = float(np.linalg.norm(np.asarray(full.volume) - np.asarray(vol))
                / np.linalg.norm(np.asarray(vol)))
    assert full.history["recon_rms"][0] == pytest.approx(rel, rel=1e-3)

    chunked = align_reconstruct(meas, geom, views0, recon_chunk=2, **kw)
    dv = np.linalg.norm(np.asarray(chunked.volume)
                        - np.asarray(full.volume))
    assert dv / np.linalg.norm(np.asarray(full.volume)) < 2e-3
    assert chunked.history["recon_rms"][0] == pytest.approx(
        full.history["recon_rms"][0], rel=1e-2)


def test_align_reconstruct_generic_cgls_chunked_matches():
    """Item 10: the generic (ray) family's chunked CGLS now carries
    CGLSState across chunks — chunked == unchunked (the former per-chunk
    cold restart degraded conjugacy and diverged from the unchunked
    trajectory)."""
    n, n_proj = 12, 8
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(3)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-0.5, 0.5, n_proj)
    true_views = Views.create(n_proj, t=t)
    meas = projector.project(vol, geom, true_views)
    views0 = Views.create(n_proj)

    kw = dict(outer_iters=1, recon="cgls", recon_iters=8,
              param_set="xz", refine_iters=2, moment_period=None,
              family="ray")
    full = align_reconstruct(meas, geom, views0, **kw)
    chunked = align_reconstruct(meas, geom, views0, recon_chunk=3, **kw)
    dv = np.linalg.norm(np.asarray(chunked.volume)
                        - np.asarray(full.volume))
    assert dv / np.linalg.norm(np.asarray(full.volume)) < 2e-3
    np.testing.assert_allclose(np.asarray(chunked.views.t),
                               np.asarray(full.views.t), atol=1e-4)


def test_frozen_polish_exact_family_floors_low():
    """frozen_polish (VERDICT r4 item 2): deep exact-family box-LM
    against a FROZEN high-quality volume recovers per-view parameters to
    the LM floor (measured ~4e-6 px at 64^3 vs the true volume,
    scripts/c64_floor.py) — no alternation dynamics, no self-absorption
    bias. Here: true volume frozen, perturbed init, recovery to <2e-3 px
    at 16^3 (the 16^3 discretization floor)."""
    from tomojax.align import frozen_polish
    n, n_proj = 16, 10
    vol = jnp.asarray(phantom.shepp3d(n).astype(np.float32))
    geom = Geometry(n_proj=n_proj, vox_shape=(n, n, n), det_shape=(n, n))
    rng = np.random.default_rng(4)
    phi = np.linspace(0, np.pi, n_proj, endpoint=False)
    t = np.zeros((n_proj, 3))
    t[:, 0] = rng.uniform(-0.5, 0.5, n_proj)
    t[:, 2] = rng.uniform(-0.5, 0.5, n_proj)
    true_views = Views.create(n_proj, phi=phi, t=t)
    meas = projector.project(vol, geom, true_views)

    # perturbed init (what an alternation fixed point would hand over)
    t0 = t + rng.uniform(-0.05, 0.05, t.shape) * [[1, 0, 1]]
    views0 = Views.create(n_proj, phi=phi, t=t0)
    st = frozen_polish(meas, geom, views0, vol, param_set="xz",
                       refine_iters=30, family="ray", moment=False)
    err = np.abs(np.asarray(st.views.t)[:, [0, 2]] - t[:, [0, 2]]).max()
    assert err < 2e-3, err
    # volume untouched (frozen by contract)
    np.testing.assert_array_equal(np.asarray(st.volume).ravel(),
                                  np.asarray(vol).ravel())

    # moment hook path runs and stays in-box (slab synth)
    st2 = frozen_polish(meas, geom, views0, vol, param_set="xz",
                        refine_iters=10, family="ray", moment=True)
    assert np.isfinite(np.asarray(st2.views.t)).all()
