import json
import numpy as np
import jax.numpy as jnp
import pytest

from tomojax.utils import io, config, profiling
from tomojax.core.geometry import Views


def test_h5_dataset_roundtrip(tmp_path):
    path = str(tmp_path / "ds.h5")
    n_proj, nu, nv = 5, 8, 8
    rng = np.random.default_rng(0)
    proj = rng.random((n_proj, nu, nv)).astype(np.float32)
    phi = np.linspace(0, np.pi, n_proj)
    alpha = rng.random(n_proj)
    beta = rng.random(n_proj)
    xyz = rng.random((n_proj, 3))
    ph = rng.random((8, 8, 8)).astype(np.float32)
    io.save_dataset(path, projections=proj, phi=phi, alpha=alpha, beta=beta,
                    xyz=xyz, phantom=ph)
    d = io.load_dataset(path)
    np.testing.assert_array_equal(d["projections"], proj)
    np.testing.assert_array_equal(d["phantom"], ph)
    views = io.views_from_dataset(d)
    assert views.n_proj == n_proj
    np.testing.assert_allclose(views.t, xyz, rtol=1e-6)


def test_config_roundtrip(tmp_path):
    cfg = config.ExperimentConfig()
    cfg.solver.method = "cgls"
    cfg.solver.niter = 42
    cfg.align.param_set = "xzb"
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    back = config.ExperimentConfig.from_json(path)
    assert back.solver.method == "cgls"
    assert back.solver.niter == 42
    assert back.align.param_set == "xzb"
    # geometry builds
    geom = back.geometry.build()
    assert geom.n_proj == 90


def test_config_from_json_string():
    s = json.dumps({"solver": {"method": "fista_tv", "beta_tv": 0.5}})
    cfg = config.ExperimentConfig.from_json(s)
    assert cfg.solver.method == "fista_tv"
    assert cfg.solver.beta_tv == 0.5


def test_timed_helper():
    f = lambda x: jnp.sum(x * 2)
    out, dt = profiling.timed(f, jnp.ones(16), reps=2)
    assert float(out) == 32.0
    assert dt >= 0.0


def test_cli_simulate_reconstruct(tmp_path):
    from tomojax.cli import main
    ds = str(tmp_path / "d.h5")
    rec = str(tmp_path / "r.npy")
    main(["simulate", "--size", "16", "--views", "8", "-o", ds])
    main(["reconstruct", "-i", ds, "-o", rec])
    vol = io.load_volume(rec)
    assert vol.shape == (16, 16, 16)
    assert np.isfinite(vol).all()
