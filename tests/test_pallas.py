"""Differential test: the fused Pallas tendency kernel (interpret mode on
CPU) vs the XLA array-op backend. Both call the same tendency_math, so any
disagreement is a tiling/indexing bug in the kernel plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
from gb25_tpu.models.hydrostatic import tendency_math
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.ops.operators import coriolis_ff
from gb25_tpu.ops.pallas_tendency import kernel_cumsum, pallas_tendencies


def test_kernel_cumsum_matches():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4, 3, 17)), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(kernel_cumsum(a)), np.cumsum(np.asarray(a), axis=2), rtol=1e-12
    )


@pytest.mark.parametrize("tile", [(32, 8), (64, 16), (128, 4)])
def test_pallas_tendencies_match_array_backend(tile):
    grid = simple_latitude_longitude_grid(128, 16, 8, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)

    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    Gu_e, Gv_e, Gtr_e = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
    ref = (grid.interior(Gu_e), grid.interior(Gv_e),
           {k: grid.interior(v) for k, v in Gtr_e.items()})

    bx, by = tile
    Gu, Gv, Gtr = pallas_tendencies(
        cfg, grid, f_ff, ue, ve, tr_e, bx=bx, by=by, interpret=True
    )

    # identical math; only fp reduction-order (MXU-cumsum vs cumsum) differs
    np.testing.assert_allclose(np.asarray(Gu), np.asarray(ref[0]), rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Gv), np.asarray(ref[1]), rtol=2e-4, atol=1e-9)
    for k in Gtr:
        np.testing.assert_allclose(
            np.asarray(Gtr[k]), np.asarray(ref[2][k]), rtol=2e-4, atol=1e-7
        )


def test_pallas_tridiag_matches_scan(monkeypatch):
    """Pallas Thomas kernel == scan-based solver (same recurrence; kernel is
    one HBM pass on transposed tiles).  Covers damping (CATKE's implicit TKE
    dissipation) and plain paths."""
    import numpy as np

    from gb25_tpu.ops.pallas_tridiag import pallas_implicit_diffusion, tridiag_supported
    from gb25_tpu.ops.tridiagonal import implicit_vertical_diffusion

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    rng = np.random.default_rng(3)
    X, Y, Z = 128, 16, 8
    f = jnp.asarray(rng.standard_normal((X, Y, Z)), jnp.float32)
    kap = jnp.asarray(rng.uniform(1e-5, 1e-2, (X, Y, Z)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.0, 1e-4, (X, Y, Z)), jnp.float32)
    dzc = jnp.asarray(rng.uniform(10.0, 30.0, (1, 1, Z)), jnp.float32)
    dzf = jnp.asarray(rng.uniform(10.0, 30.0, (1, 1, Z)), jnp.float32)
    dt = 600.0

    assert tridiag_supported(f, kap, dzc, dzf)
    for damping in (None, lam):
        monkeypatch.setenv("GB25_DISABLE_PALLAS", "1")
        ref = implicit_vertical_diffusion(f, kap, dt, dzc, dzf, damping=damping)
        monkeypatch.delenv("GB25_DISABLE_PALLAS")
        ker = pallas_implicit_diffusion(f, kap, dt, dzc, dzf, damping=damping)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    # scalar / broadcast kappa falls back to the scan path
    assert not tridiag_supported(f, 1e-3, dzc, dzf)
    assert not tridiag_supported(f, jnp.ones((1, 1, Z)), dzc, dzf)

    # multi-field shared-kappa solve == per-field solves
    f2 = jnp.asarray(rng.standard_normal((X, Y, Z)), jnp.float32)
    assert tridiag_supported((f, f2), kap, dzc, dzf)
    s1, s2 = pallas_implicit_diffusion((f, f2), kap, dt, dzc, dzf)
    r1 = pallas_implicit_diffusion(f, kap, dt, dzc, dzf)
    r2 = pallas_implicit_diffusion(f2, kap, dt, dzc, dzf)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=1e-6, atol=1e-7)
