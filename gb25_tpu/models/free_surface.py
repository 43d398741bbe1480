"""Free-surface solvers.

Split-explicit barotropic substepping (reference:
``SplitExplicitFreeSurface(substeps=30)``,
/root/reference/src/baroclinic_instability_model.jl:22 and the filtered state
(U, V, eta) it carries, /root/reference/src/correctness.jl:51-58):

The barotropic system
    d eta / d tau = -div(U, V)
    d (U, V) / d tau = -g H grad(eta) + (GU, GV)
is integrated with ``substeps`` forward-backward substeps over the window
[t, t + 2 dt], where (GU, GV) is the depth-integrated AB2-combined baroclinic
tendency. The prognostic free surface and the barotropic part of the updated
velocities are replaced by the time-filtered averages (weights integrate to 1
with centroid at t + dt), following the standard split-explicit design
(Shchepetkin & McWilliams 2005) that Oceananigans implements.

TPU notes: the substep loop is a ``lax.scan`` over static weights — one HLO
while loop whose body is a handful of fused 2-D VPU ops plus a width-1 halo
exchange, so the whole 30-substep solve stays on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from gb25_tpu.ops.halos import extend_axis
from gb25_tpu.ops.stencils import dx_c, dx_f, dy_c, dy_f, ix_f, iy_f


def averaging_weights(substeps: int, kind: str = "parabolic") -> np.ndarray:
    """Normalized filter weights over the [0, 2 dt] barotropic window."""
    tau = 2.0 * (np.arange(substeps, dtype=np.float64) + 1.0) / substeps
    if kind == "flat":
        w = np.ones(substeps)
    elif kind == "parabolic":
        w = tau * (2.0 - tau)
        w = np.maximum(w, 0.0)
    else:  # pragma: no cover
        raise ValueError(f"unknown averaging kind {kind}")
    return w / w.sum()


from gb25_tpu.ops.halos import extend2 as _extend2_impl


def _extend2(grid, a, kind, comm, h=1):
    return _extend2_impl(grid, a, kind, comm, h)


def _crop2(grid, a, h=1):
    return a[h : h + grid.Nx, h : h + grid.Ny]


def _metrics2(grid, h=1):
    """2-D metric slices with halo width h (grid metrics carry width hx/hy).
    Lat-lon metrics are (1, Ny+2hy, 1); tripolar metrics are fully 2-D."""
    hx, hy = grid.hx, grid.hy
    sly = slice(hy - h, hy + grid.Ny + h)

    def sl2(m):
        slx = slice(hx - h, hx + grid.Nx + h) if m.shape[0] > 1 else slice(None)
        return m[slx, sly, 0]

    return sl2(grid.dxc), sl2(grid.dxf), sl2(grid.dyc), sl2(grid.dyf), sl2(grid.azc)


def barotropic_substep(cfg, grid, state, u_star, v_star, Gu_ab, Gv_ab, dt, comm=None):
    """Run the split-explicit barotropic solve; returns (eta_new, u_new, v_new).

    u_star/v_star: baroclinic AB2-updated velocities (no eta gradient force).
    Gu_ab/Gv_ab:   the AB2-combined tendencies used for that update (interior).
    """
    fs = cfg.free_surface
    g = fs.gravitational_acceleration
    M = fs.substeps
    dtau = 2.0 * dt / M
    w = jnp.asarray(averaging_weights(M, fs.averaging), dtype=state.eta.dtype)

    hz, Nz = grid.hz, grid.Nz
    dz = grid.dz_c[:, :, hz : hz + Nz]

    def zint(a):
        return jnp.sum(a * dz, axis=2)

    GU, GV = zint(Gu_ab), zint(Gv_ab)
    U0, V0 = zint(state.u), zint(state.v)

    # static column depth at u/v points (linearized free surface)
    H = -grid.bottom_height  # (Nx, Ny), positive depth
    He = _extend2(grid, H, "c", comm)
    Hu = _crop2(grid, ix_f(He))
    Hv = _crop2(grid, iy_f(He))

    dxc, dxf, dyc, dyf, azc = _metrics2(grid, h=1)

    def body(carry, wm):
        eta, U, V, eta_b, U_b, V_b = carry
        Ue = _extend2(grid, U, "u", comm)
        Ve = _extend2(grid, V, "v", comm)
        div = _crop2(grid, (dx_c(Ue * dyc) + dy_c(Ve * dxf)) / azc)
        eta = eta - dtau * div
        etae = _extend2(grid, eta, "c", comm)
        detax = _crop2(grid, dx_f(etae) / dxc)
        detay = _crop2(grid, dy_f(etae) / dyf)
        U = U + dtau * (-g * Hu * detax + GU)
        V = V + dtau * (-g * Hv * detay + GV)
        eta_b = eta_b + wm * eta
        U_b = U_b + wm * U
        V_b = V_b + wm * V
        return (eta, U, V, eta_b, U_b, V_b), None

    z2 = jnp.zeros_like(state.eta)
    init = (state.eta, U0, V0, z2, z2, z2)
    (eta, U, V, eta_b, U_b, V_b), _ = lax.scan(body, init, w)

    # barotropic correction: replace the depth mean of (u*, v*) with the
    # filtered barotropic transport (reference:
    # correct_velocities_and_cache_previous_tendencies!, precompile.jl:41)
    Hu_safe = jnp.maximum(Hu, 1e-30)
    Hv_safe = jnp.maximum(Hv, 1e-30)
    du = (U_b - zint(u_star)) / Hu_safe
    dv = (V_b - zint(v_star)) / Hv_safe
    u_new = u_star + du[:, :, None]
    v_new = v_star + dv[:, :, None]
    return eta_b, u_new, v_new


def explicit_eta_tendency(grid, ue, ve):
    """G_eta = -div(U, V) on extended arrays (valid halo shrinks by 1)."""
    hz, Nz = grid.hz, grid.Nz
    dz = grid.dz_c[:, :, hz : hz + Nz]
    U = jnp.sum(ue[:, :, hz : hz + Nz] * dz, axis=2)
    V = jnp.sum(ve[:, :, hz : hz + Nz] * dz, axis=2)
    dyc = grid.dyc[:, :, 0]
    dxf = grid.dxf[:, :, 0]
    azc = grid.azc[:, :, 0]
    return -(dx_c(U * dyc) + dy_c(V * dxf)) / azc
