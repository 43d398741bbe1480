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


def test_zslab_sharded_matches_serial(monkeypatch):
    """The kernel path must compose with shard_map: per-shard kernels on
    locally-extended fields (x window spanning the full local tile, no wrap
    fabrication) agree with the serial kernel run."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import dataclasses

    from gb25_tpu.models import time_step
    from gb25_tpu.parallel import make_mesh, shard_state, sharded_step_fn

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)

    s_ref = state
    step = jax.jit(time_step)
    for _ in range(2):
        s_ref = step(cfg, grid, s_ref, 60.0)

    mesh = make_mesh(4, shape=(2, 2))
    # check_vma=False: interpret-mode-only limitation (see sharded_step_fn)
    sfn = sharded_step_fn(cfg, grid, mesh, check_vma=False)
    s_sh = shard_state(state, mesh)
    for _ in range(2):
        s_sh = sfn(s_sh, 60.0)

    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_sh)
    ):
        # f32 fusion/reduction-order noise between the serial and sharded
        # programs (e.g. the out-of-kernel b_total column reduction): diffs
        # measured <= 5e-8 absolute on ~1e-3 fields
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
        )


def test_zslab_fused_ab2_matches_unfused(monkeypatch):
    """The kernel-fused AB2 update (tendencies + state update + derived
    barotropic forcing in one pass) must match the plain array-path step."""
    import jax
    import dataclasses

    from gb25_tpu.models import time_step

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)

    cfg_k = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    cfg_a = dataclasses.replace(baroclinic_instability_config(), kernels="jnp")

    s_k, s_a = state, state
    step = jax.jit(time_step, static_argnames=())
    for _ in range(3):  # Euler first step + 2 AB2 steps
        s_k = step(cfg_k, grid, s_k, 60.0)
        s_a = step(cfg_a, grid, s_a, 60.0)

    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)):
        # kernel-vs-array tendency noise (~2e-4 rtol per evaluation, see
        # test_zslab_matches_array_backend) accumulated over 3 coupled steps
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=5e-6
        )


def test_zslab_default_bz_follows_support_gate():
    """Nz=10 is not divisible by the old fixed bz=8 default; the kernel must
    pick the same divisor the support gate validated (largest <= 8)."""
    grid = simple_latitude_longitude_grid(128, 32, 10, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    from gb25_tpu.models.hydrostatic import tendency_math

    Gu_e, Gv_e, _ = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
    Gu, Gv, _ = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Gu), np.asarray(grid.interior(Gu_e)), rtol=2e-4, atol=1e-9
    )


def test_zslab_default_by_respects_sublane_quantum():
    """Ny=36 has no divisor <= 24 whose window height by + 2*hy is a
    multiple of the sublane quantum 8 (ADVICE r2 medium: the old default
    by=18 -> byh=34 raised at trace time even though 'auto' had selected
    the kernel); the default must fall back to a single full-height y
    window and still match the array path."""
    grid = simple_latitude_longitude_grid(128, 36, 8, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    Gu_e, _, _ = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
    Gu, _, _ = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Gu), np.asarray(grid.interior(Gu_e)), rtol=2e-4, atol=1e-9
    )


def test_extended_carry_loop_matches_repeated_steps(monkeypatch):
    """The fast loop carries halo-extended prognostics across iterations
    (in-place ghost refresh instead of re-extension); it must match n
    repeated time_step calls on the same kernel path."""
    import jax
    import dataclasses

    from gb25_tpu.models import loop, time_step
    from gb25_tpu.models.hydrostatic import _fast_loop_ok

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    monkeypatch.setenv("GB25_EXTENDED_CARRY", "1")  # opt-in (see _fast_loop_ok)
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    assert _fast_loop_ok(cfg, grid, state, None)

    s_ref = state
    step = jax.jit(time_step)
    for _ in range(3):
        s_ref = step(cfg, grid, s_ref, 60.0)
    s_lp = jax.jit(loop, static_argnames="n")(cfg, grid, state, 60.0, 3)

    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_lp)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)
        else:
            np.testing.assert_array_equal(b, a)


def test_zslab_coupled_tripolar_matches_array(monkeypatch):
    """The kernel path must agree with the array path on the hardest config:
    coupled step on a gaussian-islands *tripolar* grid (2-D metrics, fold
    halos, immersed masking applied outside the kernel)."""
    import jax
    import dataclasses

    from gb25_tpu.models.coupled import data_free_ocean_climate_model, coupled_loop

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=2.0, Nz=8, dtype=jnp.float32,
        grid_type="gaussian_islands_tripolar",
    )
    assert grid.immersed and grid.north_fold

    ck = dataclasses.replace(
        ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="zslab"))
    ca = dataclasses.replace(
        ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="jnp"))
    lp = jax.jit(coupled_loop, static_argnames="n")
    s_k = lp(ck, grid, atmos, state, 600.0, 2)
    s_a = lp(ca, grid, atmos, state, 600.0, 2)

    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=3e-6)
        else:
            np.testing.assert_array_equal(b, a)


def test_zslab_128_alignment_padding(monkeypatch):
    """Grids whose Nx is not a multiple of 128 are right-padded with
    periodic wrap columns for Mosaic's lane constraint (v5e: Nx=192/320
    fail lowering otherwise); the padded duplicate columns are sliced off
    and results must match the array path exactly."""
    monkeypatch.setenv("GB25_ZSLAB_FORCE_ALIGN", "1")
    grid = simple_latitude_longitude_grid(192, 32, 8, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    Gu_e, Gv_e, Gtr_e = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
    Gu, Gv, Gtr = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    assert Gu.shape == (192, 32, 8)
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


def test_zslab_support_gate_128_alignment(monkeypatch):
    """Sharded local tiles with Nx % 128 != 0 cannot wrap-pad (halos belong
    to neighbors) and must fall back to the array path; serial periodic
    grids stay eligible (they pad)."""
    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    from gb25_tpu.ops.pallas_zslab import zslab_supported

    cfg = baroclinic_instability_config()
    grid = simple_latitude_longitude_grid(192, 32, 8, dtype=jnp.float32)
    state = baroclinic_instability_state(grid)
    assert zslab_supported(cfg, grid, state.u, comm=None)

    class FakeComm:
        pass

    assert not zslab_supported(cfg, grid, state.u, comm=FakeComm())
    g128 = simple_latitude_longitude_grid(256, 32, 8, dtype=jnp.float32)
    s128 = baroclinic_instability_state(g128)
    assert zslab_supported(cfg, g128, s128.u, comm=FakeComm())


def test_zslab_fused_ab2_climate_increments(monkeypatch):
    """fuse_ab2 with the full climate-step ingredient list — CATKE closure
    (e tracer + source), immersed bathymetry, tracer restoring, and surface
    fluxes — must match the unfused array path.  Each post-kernel G
    increment is folded into the fused update as field += dt*c1*inc
    (hydrostatic.py compute_tendencies), which this differences end-to-end."""
    import jax
    import dataclasses

    from gb25_tpu.grids.immersed import with_bathymetry
    from gb25_tpu.models import time_step
    from gb25_tpu.models.catke import CATKEVerticalDiffusivity

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    base = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    bh = np.full((128, 32), -4000.0)
    bh[30:50, 8:16] = 100.0  # island
    grid = with_bathymetry(base, jnp.asarray(bh, jnp.float32))
    assert grid.immersed

    cfg0 = baroclinic_instability_config(closure=CATKEVerticalDiffusivity())
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    state = state.replace(
        tracers={**state.tracers, "e": jnp.full_like(state.tracers["T"], 1e-6)},
        Gtracers={**state.Gtracers, "e": jnp.zeros_like(state.tracers["T"])},
    )

    rng = np.random.default_rng(11)
    restoring = {
        "T": (state.tracers["T"] + 0.5,
              jnp.asarray(rng.uniform(0, 1e-5, state.tracers["T"].shape),
                          jnp.float32)),
    }
    surface_fluxes = {
        "u": jnp.asarray(rng.standard_normal((128, 32)) * 1e-6, jnp.float32),
        "T": jnp.asarray(rng.standard_normal((128, 32)) * 1e-6, jnp.float32),
    }

    cfg_k = dataclasses.replace(cfg0, kernels="zslab")
    cfg_a = dataclasses.replace(cfg0, kernels="jnp")
    step = jax.jit(time_step)
    s_k, s_a = state, state
    for _ in range(3):  # Euler first step + 2 AB2 steps
        s_k = step(cfg_k, grid, s_k, 60.0, None, surface_fluxes, restoring)
        s_a = step(cfg_a, grid, s_a, 60.0, None, surface_fluxes, restoring)

    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-6)
        else:
            np.testing.assert_array_equal(b, a)


def test_zslab_raw_fields_bitwise_and_t3_extend():
    """The fused transposed-extension input mode (raw_fields) is bitwise-
    identical to feeding pre-extended fields, and extend_field_t3 is
    bitwise transpose(extend_field) for every field kind (corner fill
    order commutes — see halos.extend_field_t3)."""
    import jax

    from gb25_tpu.models.baroclinic import baroclinic_instability_model
    from gb25_tpu.ops.halos import extend_field_t3

    cfg, grid, state = baroclinic_instability_model(Nx=32, Ny=16, Nz=8, dtype=jnp.float32)
    for kind, a in (("u", state.u), ("v", state.v), ("c", state.tracers["T"])):
        want = jnp.transpose(extend_field(grid, a, kind, None), (2, 1, 0))
        got = extend_field_t3(grid, a, kind)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    ue = extend_field(grid, state.u, "u", None)
    ve = extend_field(grid, state.v, "v", None)
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    r1 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    r2 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                          raw_fields=(state.u, state.v, state.tracers, None, None))
    for a, b in zip(jax.tree_util.tree_leaves(r1), jax.tree_util.tree_leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zslab_raw_fields_immersed_bitwise():
    """raw_fields with immersed masks matches the masked pre-extended path."""
    import jax

    from gb25_tpu.grids.immersed import immersed_masks, interior_masks, with_bathymetry
    from gb25_tpu.models.baroclinic import baroclinic_instability_model

    cfg, grid0, state = baroclinic_instability_model(Nx=32, Ny=16, Nz=8, dtype=jnp.float32)
    lam = np.asarray(grid0.lam_c_i)[:, None]
    phi = np.asarray(grid0.phi_c_i)[None, :]
    bh = -4000.0 + 3900.0 * np.exp(-((lam - 180) ** 2 / 900 + phi**2 / 300))
    grid = with_bathymetry(grid0, jnp.asarray(bh, jnp.float32))
    um, vm = interior_masks(grid, None)
    state = state.replace(u=state.u * um, v=state.v * vm)

    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    _, um_e, vm_e = immersed_masks(grid, None)
    ue = extend_field(grid, state.u, "u", None) * um_e
    ve = extend_field(grid, state.v, "v", None) * vm_e
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    r1 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    r2 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                          raw_fields=(state.u, state.v, state.tracers, um_e, vm_e))
    for a, b in zip(jax.tree_util.tree_leaves(r1), jax.tree_util.tree_leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zslab_bf16_storage_mode():
    """bf16-storage/f32-compute (compute_dtype='bf16s' kernel mode): outputs
    equal the f32 kernel run on inputs pre-rounded to bf16 (rounding at
    storage is idempotent), stay within bf16 input-rounding distance of the
    full-f32 kernel, and actually differ from it (rounding really applied)."""
    import jax

    from gb25_tpu.models.baroclinic import baroclinic_instability_model

    cfg, grid, state = baroclinic_instability_model(Nx=32, Ny=16, Nz=8, dtype=jnp.float32)
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    ue = extend_field(grid, state.u, "u", None)
    ve = extend_field(grid, state.v, "v", None)
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}

    r32 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    rs = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                          storage_dtype=jnp.bfloat16)

    def rt(x):
        return x.astype(jnp.bfloat16).astype(jnp.float32)

    rs2 = zslab_tendencies(cfg, grid, f_ff, rt(ue), rt(ve),
                           {k: rt(v) for k, v in tr_e.items()},
                           interpret=True, storage_dtype=jnp.bfloat16)
    diff = 0.0
    for a, b, c in zip(jax.tree_util.tree_leaves(r32), jax.tree_util.tree_leaves(rs),
                       jax.tree_util.tree_leaves(rs2)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(c))
        a, b = np.asarray(a), np.asarray(b)
        # closeness to the f32 kernel is sanity-level only: bf16 input
        # rounding flips WENO smoothness-weight selections, so isolated
        # points legitimately move by O(field scale); the aggregate (RMS)
        # must stay small and the pointwise error bounded by the range
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() <= 0.5 * scale
        assert np.sqrt(np.mean((a - b) ** 2)) <= 0.05 * scale
        diff = max(diff, np.abs(a - b).max())
    assert diff > 0.0  # the bf16 storage rounding must actually bite

    with pytest.raises(ValueError):  # incompatible with the fused AB2 update
        ab = (jnp.zeros((1, 2), jnp.float32), state.Gu, state.Gv, state.Gtracers)
        zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                         storage_dtype=jnp.bfloat16, ab2=ab)


def test_time_step_bf16s_end_to_end(monkeypatch):
    """Full time_step with compute_dtype='bf16s' (kernel interpret mode):
    runs, stays finite, tracks the f32 step within bf16 rounding, and raises
    a clear error when the kernel path is unavailable."""
    import dataclasses

    import jax

    from gb25_tpu.models.baroclinic import baroclinic_instability_model
    from gb25_tpu.models.hydrostatic import time_step

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    cfg, grid, state = baroclinic_instability_model(Nx=32, Ny=16, Nz=8, dtype=jnp.float32)
    cfg_s = dataclasses.replace(cfg, kernels="zslab", compute_dtype="bf16s")
    cfg_32 = dataclasses.replace(cfg, kernels="zslab")

    s32 = time_step(cfg_32, grid, state, 60.0)
    ss = time_step(cfg_s, grid, state, 60.0)
    for a, b in zip(jax.tree_util.tree_leaves(s32), jax.tree_util.tree_leaves(ss)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(b).all()
        # pointwise: bounded by the field range (WENO weight flips move
        # isolated points by O(scale)); aggregate: small in RMS
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() <= 0.5 * scale
        assert np.sqrt(np.mean((a - b) ** 2)) <= 0.05 * scale

    monkeypatch.delenv("GB25_ZSLAB_INTERPRET")
    cfg_bad = dataclasses.replace(cfg, kernels="jnp", compute_dtype="bf16s")
    with pytest.raises(ValueError, match="bf16s"):
        time_step(cfg_bad, grid, state, 60.0)


def test_extend_field_t3_tripolar_and_raw_fields():
    """extend_field_t3 on a north-fold (tripolar) grid is bitwise
    transpose(extend_field), and the zslab raw_fields fast path matches the
    pre-extended path bitwise on a tripolar immersed climate-style grid."""
    import jax

    from gb25_tpu.grids import tripolar_grid
    from gb25_tpu.grids.immersed import gaussian_islands_bottom, immersed_masks, interior_masks
    from gb25_tpu.ops.halos import extend_field_t3

    grid = gaussian_islands_bottom(tripolar_grid(32, 16, 8, dtype=jnp.float32))
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    um, vm = interior_masks(grid, None)
    state = state.replace(u=state.u * um, v=state.v * vm)

    for kind, a in (("u", state.u), ("v", state.v), ("c", state.tracers["T"])):
        want = jnp.transpose(extend_field(grid, a, kind, None), (2, 1, 0))
        got = extend_field_t3(grid, a, kind)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    _, um_e, vm_e = immersed_masks(grid, None)
    ue = extend_field(grid, state.u, "u", None) * um_e
    ve = extend_field(grid, state.v, "v", None) * vm_e
    tr_e = {k: extend_field(grid, c, "c", None) for k, c in state.tracers.items()}
    r1 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True)
    r2 = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                          raw_fields=(state.u, state.v, state.tracers, um_e, vm_e))
    for a, b in zip(jax.tree_util.tree_leaves(r1), jax.tree_util.tree_leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_climate_config_takes_raw_fast_path(monkeypatch):
    """The climate configuration (tripolar + islands + CATKE) must feed the
    kernel through raw_fields (fused transposed extends) — guard against a
    future gate change silently reverting it to extend + transpose."""
    import dataclasses

    import gb25_tpu.models.hydrostatic as H
    from gb25_tpu.models.coupled import coupled_time_step, data_free_ocean_climate_model
    from gb25_tpu.ops import pallas_zslab

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=8.0, Nz=4, dtype=jnp.float32,
        grid_type="gaussian_islands_tripolar",
    )
    ccfg = dataclasses.replace(
        ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="zslab"))

    seen = {}
    orig = pallas_zslab.zslab_tendencies

    def spy(*a, **kw):
        # the fused-extends operands arrive either prebuilt (t3_operands,
        # shared with the CATKE diffusivity kernel) or as raw_fields
        seen["fused_extends"] = (kw.get("raw_fields") is not None
                                 or kw.get("t3_operands") is not None)
        seen["ab2"] = kw.get("ab2") is not None
        return orig(*a, **kw)

    # compute_tendencies from-imports zslab_tendencies at call time, so
    # patch the defining module
    monkeypatch.setattr(pallas_zslab, "zslab_tendencies", spy)
    s = coupled_time_step(ccfg, grid, atmos, state, 30.0)
    assert seen == {"fused_extends": True, "ab2": True}
    assert all(bool(jnp.isfinite(x).all())
               for x in (s.u, s.v, s.tracers["T"], s.tracers["e"]))


def test_g_t3_loop_matches_repeated_steps(monkeypatch):
    """The transposed-G carry loop (state tendencies staying (Z,Y,X) across
    fori_loop iterations) is bitwise-identical to repeated time_step calls:
    the layout transposes are exact permutes and the kernel sees identical
    block values either way."""
    import dataclasses

    import jax

    from gb25_tpu.models import loop, time_step
    from gb25_tpu.models.hydrostatic import _g_t3_ok

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    assert _g_t3_ok(cfg, grid, state, None)

    s_ref = state
    step = jax.jit(time_step)
    for _ in range(3):
        s_ref = step(cfg, grid, s_ref, 60.0)
    s_lp = jax.jit(loop, static_argnames="n")(cfg, grid, state, 60.0, 3)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_lp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # kill switch falls back to the plain loop (still equal)
    monkeypatch.setenv("GB25_G_T3", "0")
    assert not _g_t3_ok(cfg, grid, state, None)
    s_lp0 = jax.jit(loop, static_argnames="n")(cfg, grid, state, 60.0, 3)
    for a, b in zip(jax.tree_util.tree_leaves(s_lp), jax.tree_util.tree_leaves(s_lp0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_g_t3_restoring_increment_matches(monkeypatch):
    """The restoring G-increment applied in the transposed layout (g_t3)
    equals the untransposed path bitwise (single step, direct call)."""
    import dataclasses

    import jax

    from gb25_tpu.models import time_step

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    target = jnp.full(grid.shape, 20.0, jnp.float32)
    res = {"T": (target, jnp.float32(1e-5))}

    from gb25_tpu.models.hydrostatic import transpose_G as t3g

    step = jax.jit(lambda s: time_step(cfg, grid, s, 60.0, restoring=res))
    step_t3 = jax.jit(
        lambda s: t3g(time_step(cfg, grid, t3g(s), 60.0, restoring=res, g_t3=True)))
    a, b = step(state), step_t3(state)
    for xa, xb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_cumsum_leading_forms():
    """Sequential form is bitwise jnp.cumsum order; tree form (the bz=16
    Mosaic-compile-friendly variant) agrees to f32 rounding."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((22, 8, 16)), jnp.float32)
    from gb25_tpu.ops.pallas_zslab import cumsum_leading

    ref = jnp.cumsum(a.astype(jnp.float64), axis=0)
    seq = cumsum_leading(a, tree=False)
    tre = cumsum_leading(a, tree=True)
    # sequential unroll is bitwise np.add.accumulate order (XLA's own cumsum
    # is pairwise on some backends, so numpy is the order oracle here)
    np.testing.assert_array_equal(np.asarray(seq),
                                  np.cumsum(np.asarray(a), axis=0))
    np.testing.assert_allclose(np.asarray(tre), np.asarray(ref),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(ref),
                               rtol=2e-6, atol=1e-6)


def test_zslab_gate_rejects_untileable_shapes(monkeypatch):
    """The support gate must imply the kernel actually traces: shapes whose
    wrap padding cannot fit a single x window, or whose Nz has no usable
    z tile, are gated to the array path instead of raising mid-trace."""
    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    from gb25_tpu.ops.pallas_zslab import zslab_supported

    cfg = baroclinic_instability_config()
    # Nx=4032: 4032 % 128 = 64, padded Nxp = 4096, 4096 + 2*4 > 4096 — the
    # padded extent needs >1 x window, which wrap padding cannot supply
    grid = simple_latitude_longitude_grid(4032, 32, 8, dtype=jnp.float32)
    state = baroclinic_instability_state(grid)
    assert not zslab_supported(cfg, grid, state.u, comm=None)
    # prime Nz: only bz=1 divides — a W=7 window per output plane (7x
    # z-overlap); stay on the array path
    g61 = simple_latitude_longitude_grid(128, 32, 61, dtype=jnp.float32)
    s61 = baroclinic_instability_state(g61)
    assert not zslab_supported(cfg, g61, s61.u, comm=None)


def test_zslab_by_override_must_divide_ny(monkeypatch):
    """A by override that does not divide Ny would leave output rows as
    uninitialized HBM; the kernel must refuse loudly."""
    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    from gb25_tpu.ops.halos import extend_field
    from gb25_tpu.ops.pallas_zslab import zslab_tendencies

    cfg = baroclinic_instability_config()
    grid = simple_latitude_longitude_grid(128, 40, 8, dtype=jnp.float32)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, v, "c") for k, v in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    with pytest.raises(ValueError, match="does not divide Ny"):
        zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, by=24)


def test_pick_by_prefers_single_window():
    """When Ny fits the cap, one full-height window minimizes y-overlap
    (by=8 would process 3x16 window rows for 24 outputs vs 1x32)."""
    from gb25_tpu.ops.pallas_zslab import _pick_by

    assert _pick_by(24, 4, 24, 8) == 24
    assert _pick_by(768, 4, 24, 8) == 24  # large Ny: divisor search intact
    assert _pick_by(40, 4, 24, 8) == 8    # conforming divisor found
    assert _pick_by(35, 4, 24, 8) == 35   # no conforming divisor: fallback


def test_zslab_wall_v_and_integrals():
    """``wall_v=True`` zeroes global y-row 0 of Gv and v* in-kernel
    (== mask_v_wall on one device) and ``integrals=True`` returns the
    barotropic depth integrals (U0, V0, Us, Vs) matching jnp zint of the
    kernel's own updated fields (block-sequential z summation: allclose,
    not bitwise)."""
    import jax

    cfg = baroclinic_instability_config()
    grid = simple_latitude_longitude_grid(64, 16, 16, dtype=jnp.float32)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)
    dt = jnp.float32(60.0)
    ab = jnp.stack([dt * 1.6, dt * (-0.6)]).reshape(1, 2)
    ab2 = (ab, state.Gu, state.Gv, state.Gtracers)

    base = zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, interpret=True,
                            ab2=ab2, bx=32, by=8, bz=8)
    Gu, Gv, Gtr, u_n, v_n, tr_n, ints = zslab_tendencies(
        cfg, grid, f_ff, ue, ve, tr_e, interpret=True, ab2=ab2,
        bx=32, by=8, bz=8, wall_v=True, integrals=True)

    # wall_v == post-hoc mask of the unmasked outputs
    assert np.asarray(Gv)[:, 0].max() == 0.0
    assert np.asarray(v_n)[:, 0].max() == 0.0
    np.testing.assert_array_equal(
        np.asarray(Gv), np.asarray(base[1].at[:, 0].set(0.0)))
    np.testing.assert_array_equal(
        np.asarray(v_n), np.asarray(base[4].at[:, 0].set(0.0)))
    np.testing.assert_array_equal(np.asarray(Gu), np.asarray(base[0]))

    hz, Nz = grid.hz, grid.Nz
    dz = grid.dz_c[:, :, hz : hz + Nz]
    zint = lambda a: np.asarray(jnp.sum(a * dz, axis=2))
    for got, want in zip(
        ints, (zint(state.u), zint(state.v), zint(u_n), zint(v_n))
    ):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=1e-6)


def test_zslab_integrals_immersed_end_to_end(monkeypatch):
    """In-kernel barotropic integrals on an IMMERSED grid: the kernel masks
    the u*/v* accumulation itself (face fluid masks rebuilt from streamed
    face-bottom planes) and the surface-flux deposits into Us/Vs carry the
    top-plane masks, so the kernel path matches the array path — which
    computes every zint from the re-masked fields — through multiple steps
    of the full time_step (reference config analog: gaussian-islands
    ImmersedBoundaryGrid, model_utils.jl:134-146)."""
    import dataclasses

    import jax

    from gb25_tpu.grids.immersed import gaussian_islands_bottom
    from gb25_tpu.models import time_step

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = gaussian_islands_bottom(
        simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32))
    # PARTIAL columns (fluid face above solid cells) are where the in-kernel
    # mask matters: the face is fluid (maskU=1, so barotropic_substep's
    # GU masking can't save it), but unmasked u* in the solid cells below
    # would pollute zint(u*).  Masks are column-monotone (grid-fitted
    # bottom), so this is the only discriminating geometry.
    from gb25_tpu.grids.immersed import immersed_masks

    _, um, vm = immersed_masks(grid)
    um_i, vm_i = grid.interior(um), grid.interior(vm)
    partial_u = (um_i[..., -1] == 1.0) & (um_i.min(axis=2) == 0.0)
    partial_v = (vm_i[..., -1] == 1.0) & (vm_i.min(axis=2) == 0.0)
    assert bool(partial_u.any()) and bool(partial_v.any())
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    fluxes = {
        "u": 1e-4 * jax.random.normal(k1, (128, 32), jnp.float32),
        "v": 1e-4 * jax.random.normal(k2, (128, 32), jnp.float32),
        "T": 1e-5 * jax.random.normal(k3, (128, 32), jnp.float32),
    }

    cfg_k = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    cfg_a = dataclasses.replace(baroclinic_instability_config(), kernels="jnp")
    step = jax.jit(time_step)
    s_k, s_a = state, state
    for _ in range(3):
        s_k = step(cfg_k, grid, s_k, 60.0, surface_fluxes=fluxes)
        s_a = step(cfg_a, grid, s_a, 60.0, surface_fluxes=fluxes)

    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-6)


def test_zslab_integrals_with_surface_fluxes_end_to_end(monkeypatch):
    """The in-kernel barotropic integrals stay consistent through the
    post-kernel surface-flux deposits (hydrostatic.py folds dtc1*flux into
    Us/Vs, wall row excluded for v) and barotropic_substep's integrals
    branch: a kernel-path time_step with u/v/T fluxes must match the array
    path, which computes every zint outside the kernel."""
    import dataclasses

    import jax

    from gb25_tpu.models import time_step

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    fluxes = {
        "u": 1e-4 * jax.random.normal(k1, (128, 32), jnp.float32),
        "v": 1e-4 * jax.random.normal(k2, (128, 32), jnp.float32),
        "T": 1e-5 * jax.random.normal(k3, (128, 32), jnp.float32),
    }

    cfg_k = dataclasses.replace(baroclinic_instability_config(), kernels="zslab")
    cfg_a = dataclasses.replace(baroclinic_instability_config(), kernels="jnp")
    step = jax.jit(time_step)
    s_k, s_a = state, state
    for _ in range(3):
        s_k = step(cfg_k, grid, s_k, 60.0, surface_fluxes=fluxes)
        s_a = step(cfg_a, grid, s_a, 60.0, surface_fluxes=fluxes)

    # the wall row of the stored Gv must be zero on BOTH paths even though
    # the v flux deposit re-adds wall-row values after the kernel
    assert np.abs(np.asarray(s_k.Gv)[:, 0]).max() == 0.0
    assert np.abs(np.asarray(s_a.Gv)[:, 0]).max() == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-6)


def test_force_comm_loop_g_t3_matches_serial_loop(monkeypatch):
    """Decomposed-path transposed-G carry (round 4): a forced-comm 1x1 inner
    loop (g_t3 active under comm, layout-aware overlap stitch) must agree
    with the serial loop on the same problem."""
    import jax

    import dataclasses

    from gb25_tpu.models import loop
    from gb25_tpu.parallel import make_mesh, shard_state
    from gb25_tpu.parallel.sharded import sharded_step_fn

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(128, 32, 8, dtype=jnp.float32)
    # overlap_split=True: the forced-comm loop must exercise the layout-aware
    # overlap stitch (g_t3) even though production defaults to monolithic
    cfg = dataclasses.replace(baroclinic_instability_config(), kernels="zslab",
                              overlap_split=True)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)

    s_ref = jax.jit(loop, static_argnames="n")(cfg, grid, state, 60.0, 3)

    mesh = make_mesh(1, shape=(1, 1))
    sfn = sharded_step_fn(cfg, grid, mesh, n_inner=3, force_comm=True,
                          check_vma=False)
    s_sh = sfn(shard_state(state, mesh), jnp.float32(60.0))

    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_sh)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-7
        )


def test_force_comm_tripolar_catke_g_t3_matches_serial(monkeypatch):
    """Climate-path transposed-G carry under comm (round 4): tripolar fold
    grid + CATKE + fused kernel, forced-comm 1x1 inner loop with g_t3/upd_t3
    active (incl. the transposed distributed fold projection) must agree
    with the serial loop."""
    import jax

    import dataclasses

    from gb25_tpu.grids import tripolar_grid
    from gb25_tpu.models import loop
    from gb25_tpu.models.catke import CATKEVerticalDiffusivity
    from gb25_tpu.parallel import make_mesh, shard_state
    from gb25_tpu.parallel.sharded import sharded_step_fn

    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = tripolar_grid(128, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(
        baroclinic_instability_config(closure=CATKEVerticalDiffusivity()),
        kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3,
                                         tracers=cfg.tracers)

    s_ref = jax.jit(loop, static_argnames="n")(cfg, grid, state, 60.0, 2)

    mesh = make_mesh(1, shape=(1, 1))
    sfn = sharded_step_fn(cfg, grid, mesh, n_inner=2, force_comm=True,
                          check_vma=False)
    s_sh = sfn(shard_state(state, mesh), jnp.float32(60.0))

    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_sh)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-7
        )


def test_sharded_catke_t3ops_nonfold_matches_serial(monkeypatch):
    """Non-fold decomposed CATKE path (round 4): with overlap off, the
    CATKE + z-slab kernels share fused transposed operands built from the
    EXCHANGED extension (build_t3_operands(comm=...)); a real 2x1
    decomposition must agree with the serial step."""
    import jax

    import dataclasses

    from gb25_tpu.models import time_step
    from gb25_tpu.models.catke import CATKEVerticalDiffusivity
    from gb25_tpu.parallel import make_mesh, shard_state, sharded_step_fn

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    monkeypatch.setenv("GB25_ZSLAB_INTERPRET", "1")
    grid = simple_latitude_longitude_grid(256, 32, 8, dtype=jnp.float32)
    cfg = dataclasses.replace(
        baroclinic_instability_config(closure=CATKEVerticalDiffusivity()),
        kernels="zslab")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3,
                                         tracers=cfg.tracers)

    s_ref = state
    step = jax.jit(time_step)
    for _ in range(2):
        s_ref = step(cfg, grid, s_ref, 60.0)

    mesh = make_mesh(2, shape=(2, 1))  # local tiles 128x32: kernel-aligned
    sfn = sharded_step_fn(cfg, grid, mesh, check_vma=False)
    s_sh = shard_state(state, mesh)
    for _ in range(2):
        s_sh = sfn(s_sh, 60.0)

    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_sh)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-7
        )


def test_extend_field_t3_tripolar_distributed():
    """Round 5: the DISTRIBUTED fold extension in fused transposed form —
    extend_field_t3(comm) on a real 2x2 decomposition of a tripolar grid is
    bitwise transpose(extend_field(comm)) for every BC kind (this unlocks
    the fused-operand fast path for the climate decomposed step)."""
    import dataclasses
    from functools import partial

    import jax
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from gb25_tpu.grids import tripolar_grid
    from gb25_tpu.ops.halos import extend_field, extend_field_t3
    from gb25_tpu.parallel import make_mesh
    from gb25_tpu.parallel.localize import localize_grid
    from gb25_tpu.parallel.sharded import make_comm

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    grid = tripolar_grid(64, 32, 6, dtype=jnp.float64)
    mesh = make_mesh(4, shape=(2, 2))
    comm = make_comm(mesh, grid)
    nxl, nyl = grid.Nx // 2, grid.Ny // 2
    gspec = jax.tree_util.tree_map(lambda _: P(), grid)
    key = jax.random.PRNGKey(7)

    for kind in ("u", "v", "c", "w"):
        a = jax.random.normal(key, grid.shape, jnp.float64)

        @partial(jax.shard_map, mesh=mesh, in_specs=(P("x", "y", None), gspec),
                 out_specs=P())
        def diff(al, g, kind=kind):
            lg = localize_grid(g, comm, nxl, nyl)
            want = jnp.transpose(extend_field(lg, al, kind, comm), (2, 1, 0))
            got = extend_field_t3(lg, al, kind, comm)
            d = jnp.max(jnp.abs(got - want))
            return lax.pmax(lax.pmax(d, "x"), "y")

        assert float(diff(a, grid)) == 0.0, kind
