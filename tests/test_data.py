"""Data-driven layer tests (reference: ETOPO bathymetry regrid, ECCO
restoring + polar mask, JRA55 prescribed atmosphere; all via converted .npz
with synthetic fallbacks)."""

import numpy as np
import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.data import (
    climatology_restoring,
    file_prescribed_atmosphere,
    initial_state_from_climatology,
    linearly_tapered_polar_mask,
    regrid_bathymetry,
)
from gb25_tpu.models import baroclinic_instability_config, loop, time_step


def _grid():
    return simple_latitude_longitude_grid(24, 12, 6, dtype=jnp.float64)


def test_regrid_bathymetry(tmp_path):
    g = _grid()
    lon = np.linspace(0.5, 359.5, 360)
    lat = np.linspace(-89.5, 89.5, 180)
    z = -3000.0 + 1000.0 * np.sin(np.deg2rad(lat))[None, :] + 0.0 * lon[:, None]
    p = str(tmp_path / "bathymetry.npz")
    np.savez(p, lon=lon, lat=lat, z=z)
    g2 = regrid_bathymetry(g, p)
    assert g2.immersed
    bh = np.asarray(g2.bottom_height)
    # southern rows deeper than northern rows per the synthetic shape
    assert bh[:, 0].mean() < bh[:, -1].mean()
    assert bh.max() <= 0.0


def test_polar_mask():
    g = _grid()
    m = np.asarray(linearly_tapered_polar_mask(g))[:, :, 0]
    phi = np.asarray(g.phi_c_i)
    assert m[0, np.argmin(np.abs(phi))] == 0.0  # equator: no restoring
    # southernmost row (-73.3 deg): taper (s1-phi)/(s1-s0) = 1/3
    assert 0.2 < m[0, 0] < 1.0
    assert 0.1 < m[0, -1] <= 1.0
    # monotone toward the poles
    assert m[0, 0] > m[0, 1] >= m[0, 2]


def test_restoring_pulls_toward_climatology():
    g = _grid()
    cfg = baroclinic_instability_config(momentum_advection="none", tracer_advection="none")
    state = initial_state_from_climatology(g, cfg)
    # perturb T strongly in the southern cap and restore fast
    T0 = state.tracers["T"]
    tr = dict(state.tracers)
    tr["T"] = T0 + 5.0
    state_p = state.replace(tracers=tr)
    restoring = climatology_restoring(g, rate=1.0 / 3600.0)
    step = jax.jit(lambda c, gg, s, dt: time_step(c, gg, s, dt, restoring=restoring))
    s = state_p
    for _ in range(10):
        s = step(cfg, g, s, 600.0)
    dT_cap = float(jnp.abs(s.tracers["T"][:, 0] - T0[:, 0]).max())
    dT_eq = float(jnp.abs(s.tracers["T"][:, 6] - T0[:, 6]).max())
    assert dT_cap < 4.0  # polar cap relaxed toward climatology
    assert abs(dT_eq - 5.0) < 1e-6  # equator untouched (mask ~ 0)


def test_file_prescribed_atmosphere(tmp_path):
    g = _grid()
    Na, Ma, Nt = 36, 18, 4
    lon = np.linspace(5, 355, Na)
    lat = np.linspace(-85, 85, Ma)
    times = np.arange(Nt) * 21600.0
    Ta = 280.0 + np.zeros((Na, Ma, Nt)) + np.arange(Nt)[None, None, :]
    ua = np.full((Na, Ma, Nt), 5.0)
    p = str(tmp_path / "atmosphere.npz")
    np.savez(p, lon=lon, lat=lat, times=times, Ta=Ta, ua=ua)
    atm = file_prescribed_atmosphere(g, p)
    a = atm.at_time(jnp.float64(10800.0))  # halfway between records 0 and 1
    np.testing.assert_allclose(np.asarray(a["Ta"]), 280.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a["ua"]), 5.0, atol=1e-6)
    assert abs(float(a["pa"][0, 0]) - 101325.0) < 0.1  # defaulted field


def test_sharded_restoring_matches_serial():
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from gb25_tpu.parallel import make_mesh, shard_state
    from gb25_tpu.parallel.sharded import sharded_step_fn

    g = _grid()
    cfg = baroclinic_instability_config()
    state = initial_state_from_climatology(g, cfg)
    restoring = climatology_restoring(g, rate=1.0 / 86400.0)

    step = jax.jit(
        lambda c, gg, s, dt: time_step(c, gg, s, dt, restoring=restoring)
    )
    s_ref = state
    for _ in range(3):
        s_ref = step(cfg, g, s_ref, 300.0)

    mesh = make_mesh(4, shape=(2, 2))
    fn = sharded_step_fn(cfg, g, mesh, restoring=restoring)
    s_sh = shard_state(state, mesh)
    for _ in range(3):
        s_sh = fn(s_sh, jnp.float64(300.0))

    import numpy as _np

    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_sh)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b), rtol=1e-9, atol=1e-12)


def test_explicit_missing_climatology_raises(tmp_path):
    """A mistyped --climatology path must raise, not silently substitute the
    synthetic analytic stand-in (scientifically wrong 'ECCO-restored' runs)."""
    import pytest

    from gb25_tpu.data import climatology_restoring

    grid = simple_latitude_longitude_grid(16, 8, 4, dtype=jnp.float64)
    with pytest.raises(FileNotFoundError):
        climatology_restoring(grid, path=str(tmp_path / "nope.npz"))


def test_interp_z_columns_matches_np_interp():
    """The vectorized per-column z interpolation must reproduce np.interp
    (including the clamped out-of-range behavior)."""
    from gb25_tpu.data.datasets import _interp_z_columns

    rng = np.random.default_rng(3)
    zl = np.sort(rng.uniform(-4000.0, 0.0, 9))
    F = rng.standard_normal((4, 6, 9))
    zc = np.linspace(-4500.0, 50.0, 21)  # extends past both ends
    got = _interp_z_columns(zc, zl, F)
    want = np.stack([np.stack([np.interp(zc, zl, F[i, j]) for j in range(6)])
                     for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-12)
    # single-level record: constant column
    one = _interp_z_columns(zc, zl[:1], F[..., :1])
    np.testing.assert_array_equal(one, np.broadcast_to(F[..., :1], (4, 6, 21)))
