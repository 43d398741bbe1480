"""z-slab streaming kernel differential test (interpret mode): must match the
array backend exactly up to MXU-cumsum reduction order."""

import jax.numpy as jnp
import numpy as np
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
from gb25_tpu.models.hydrostatic import tendency_math
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.ops.operators import coriolis_ff
from gb25_tpu.ops.pallas_zslab import zslab_tendencies


@pytest.mark.parametrize("tile", [(32, 8, 8), (64, 16, 8), (32, 8, 16)])
def test_zslab_matches_array_backend(tile):
    grid = simple_latitude_longitude_grid(64, 16, 16, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    Gu_e, Gv_e, Gtr_e = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
    bx, by, bz = tile
    Gu, Gv, Gtr = zslab_tendencies(
        cfg, grid, f_ff, ue, ve, tr_e, bx=bx, by=by, bz=bz, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(Gu), np.asarray(grid.interior(Gu_e)), rtol=2e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(Gv), np.asarray(grid.interior(Gv_e)), rtol=2e-4, atol=1e-9
    )
    for k in Gtr:
        np.testing.assert_allclose(
            np.asarray(Gtr[k]), np.asarray(grid.interior(Gtr_e[k])),
            rtol=2e-4, atol=1e-7,
        )
