"""Fused CATKE diffusivity kernel differential tests (interpret mode): the
kernel calls the same catke_math as the array backend on transposed VMEM
windows, so interior results must match bitwise (no reductions involved)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
from gb25_tpu.models.catke import CATKEVerticalDiffusivity, catke_diffusivities
from gb25_tpu.models.hydrostatic import buoyancy_field
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.ops.pallas_catke import catke_diffusivities_kernel
from gb25_tpu.ops.pallas_zslab import _t3


def _setup(grid):
    cfg = baroclinic_instability_config(closure=CATKEVerticalDiffusivity())
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    tr = dict(state.tracers)
    tr["e"] = jnp.full(grid.shape, 1e-5, jnp.float32)
    state = state.replace(tracers=tr)
    ue = extend_field(grid, state.u, "u", None)
    ve = extend_field(grid, state.v, "v", None)
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    be = buoyancy_field(cfg, grid, tr_e)
    return cfg, state, ue, ve, tr_e, be


@pytest.mark.parametrize("tile", [(8, 4), (16, 8), (None, None)])
def test_catke_kernel_matches_array(tile):
    grid = simple_latitude_longitude_grid(64, 32, 16, dtype=jnp.float32)
    cfg, state, ue, ve, tr_e, be = _setup(grid)
    cl = cfg.closure

    want = catke_diffusivities(cl, grid, ue, ve, be, tr_e["e"])
    want = [np.asarray(grid.interior(w)) for w in want]
    by, bz = tile
    got = catke_diffusivities_kernel(cl, grid, _t3(ue), _t3(ve), _t3(be),
                                     _t3(tr_e["e"]), by=by, bz=bz, interpret=True)
    for g, w in zip(got, want):
        # ulp-level: interpret-mode fusion boundaries differ from the array
        # program's (fma contraction), measured max rel diff ~1.3e-7
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-10)


def test_catke_kernel_immersed_tripolar():
    from gb25_tpu.grids import tripolar_grid
    from gb25_tpu.grids.immersed import gaussian_islands_bottom

    grid = gaussian_islands_bottom(tripolar_grid(32, 16, 8, dtype=jnp.float32))
    cfg, state, ue, ve, tr_e, be = _setup(grid)
    cl = cfg.closure
    want = catke_diffusivities(cl, grid, ue, ve, be, tr_e["e"])
    want = [np.asarray(grid.interior(w)) for w in want]
    got = catke_diffusivities_kernel(cl, grid, _t3(ue), _t3(ve), _t3(be),
                                     _t3(tr_e["e"]), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-10)


def test_climate_step_kernel_vs_array_catke(monkeypatch):
    """Full coupled climate step: CATKE-kernel path vs array-CATKE path."""
    from gb25_tpu.models.coupled import coupled_time_step, data_free_ocean_climate_model

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=8.0, Nz=4, dtype=jnp.float32,
        grid_type="gaussian_islands_tripolar",
    )
    # kernels="zslab": CATKE kernel + z-slab kernel (shared t3 operands);
    # kernels="jnp": array CATKE + array tendencies
    cz = dataclasses.replace(ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="zslab"))
    ca = dataclasses.replace(ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="jnp"))
    sz = coupled_time_step(cz, grid, atmos, state, 30.0)
    sa = coupled_time_step(ca, grid, atmos, state, 30.0)
    for a, b in zip(jax.tree_util.tree_leaves(sa), jax.tree_util.tree_leaves(sz)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # kernel-vs-array tendency noise (see test_zslab rtol 2e-4) through
        # one step's update
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-6)


def test_keps_kernel_matches_array():
    from gb25_tpu.models.keps import TKEDissipationVerticalDiffusivity, keps_diffusivities
    from gb25_tpu.ops.pallas_catke import keps_diffusivities_kernel

    grid = simple_latitude_longitude_grid(64, 32, 16, dtype=jnp.float32)
    cl = TKEDissipationVerticalDiffusivity()
    cfg = baroclinic_instability_config(closure=cl)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    tr = dict(state.tracers)
    tr["e"] = jnp.full(grid.shape, 1e-5, jnp.float32)
    tr["eps"] = jnp.full(grid.shape, 1e-8, jnp.float32)
    state = state.replace(tracers=tr)
    ue = extend_field(grid, state.u, "u", None)
    ve = extend_field(grid, state.v, "v", None)
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    be = buoyancy_field(cfg, grid, tr_e)

    want = keps_diffusivities(cl, grid, ue, ve, be, tr_e["e"], tr_e["eps"])
    want = [np.asarray(grid.interior(w)) for w in want]
    got = keps_diffusivities_kernel(cl, grid, _t3(ue), _t3(ve), _t3(be),
                                    _t3(tr_e["e"]), _t3(tr_e["eps"]), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-12)


def test_keps_step_kernel_vs_array(monkeypatch):
    """Full time_step with the k-eps closure: kernel path vs array path."""
    import jax

    from gb25_tpu.models import time_step
    from gb25_tpu.models.keps import TKEDissipationVerticalDiffusivity

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    cl = TKEDissipationVerticalDiffusivity()
    cfg_k = dataclasses.replace(
        baroclinic_instability_config(closure=cl), kernels="zslab")
    cfg_a = dataclasses.replace(
        baroclinic_instability_config(closure=cl), kernels="jnp")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    tr = dict(state.tracers)
    tr["e"] = jnp.full(grid.shape, 1e-5, jnp.float32)
    tr["eps"] = jnp.full(grid.shape, 1e-8, jnp.float32)
    gtr = dict(state.Gtracers)
    gtr["e"] = jnp.zeros(grid.shape, jnp.float32)
    gtr["eps"] = jnp.zeros(grid.shape, jnp.float32)
    state = state.replace(tracers=tr, Gtracers=gtr)

    sk = time_step(cfg_k, grid, state, 60.0)
    sa = time_step(cfg_a, grid, state, 60.0)
    for a, b in zip(jax.tree_util.tree_leaves(sa), jax.tree_util.tree_leaves(sk)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-6)


def test_g_t3_coupled_loop_matches_repeated_steps(monkeypatch):
    """Transposed-G carry across the coupled climate loop: bitwise-identical
    to repeated coupled_time_step calls (increments applied per-layout)."""
    import jax

    from gb25_tpu.models.coupled import (
        coupled_loop,
        coupled_time_step,
        data_free_ocean_climate_model,
    )
    from gb25_tpu.models.hydrostatic import _g_t3_ok

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=3.0, Nz=4, dtype=jnp.float32,
        grid_type="gaussian_islands_tripolar",
    )
    ccfg = dataclasses.replace(
        ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="zslab"))
    assert grid.Nx % 128 == 0 and _g_t3_ok(ccfg.ocean, grid, state, None)

    step = jax.jit(coupled_time_step)  # jit both sides: eager-vs-jit CPU
    s_ref = state                      # fusion noise is not what's under test
    for _ in range(3):
        s_ref = step(ccfg, grid, atmos, s_ref, 30.0)
    s_lp = jax.jit(coupled_loop, static_argnames="n")(
        ccfg, grid, atmos, state, 30.0, 3)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_lp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_catke_by_override_must_divide_ny():
    """A by override that does not divide Ny would leave diffusivity rows
    as uninitialized memory; the kernel must refuse loudly."""
    grid = simple_latitude_longitude_grid(64, 40, 16, dtype=jnp.float32)
    cfg, state, ue, ve, tr_e, be = _setup(grid)
    with pytest.raises(ValueError, match="does not divide Ny"):
        catke_diffusivities_kernel(cfg.closure, grid, _t3(ue), _t3(ve),
                                   _t3(be), _t3(tr_e["e"]), by=24,
                                   interpret=True)
