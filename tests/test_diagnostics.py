"""Diagnostics + restart-resume equivalence tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
    loop,
)
from gb25_tpu.utils.diagnostics import (
    mixed_layer_depth,
    surface_speed,
    surface_vorticity,
    total_kinetic_energy,
    vertical_velocity,
)


def _setup():
    grid = simple_latitude_longitude_grid(24, 12, 8, dtype=jnp.float64)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    return cfg, grid, state


def test_diagnostics_shapes_and_sanity():
    cfg, grid, state = _setup()
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 120.0, 5)
    zeta = surface_vorticity(grid, s)
    assert zeta.shape == (24, 12)
    assert bool(jnp.isfinite(zeta).all())
    assert surface_speed(s).shape == (24, 12)
    ke = float(total_kinetic_energy(grid, s))
    assert ke > 0
    w = vertical_velocity(grid, s)
    assert w.shape == grid.shape
    np.testing.assert_allclose(np.asarray(w[:, :, 0]), 0.0, atol=1e-18)
    mld = mixed_layer_depth(grid, s)
    assert mld.shape == (24, 12)
    assert (np.asarray(mld) >= 0).all()


def test_restart_resume_equivalence(tmp_path):
    """Checkpoint -> restore -> continue must match an uninterrupted run
    exactly (the reference's restart path is resubmit + per-rank reload)."""
    from gb25_tpu.io import restore_state, save_sharded_state

    cfg, grid, state = _setup()
    lp = jax.jit(loop, static_argnames="n")

    # uninterrupted 10 steps
    s_full = lp(cfg, grid, state, 120.0, 10)

    # 5 steps, checkpoint, restore, 5 more steps
    s_half = lp(cfg, grid, state, 120.0, 5)
    d = str(tmp_path / "ck")
    save_sharded_state(s_half, d)
    s_restored = restore_state(s_half, d)
    s_resumed = lp(cfg, grid, s_restored, 120.0, 5)

    for a, b in zip(jax.tree_util.tree_leaves(s_full), jax.tree_util.tree_leaves(s_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
