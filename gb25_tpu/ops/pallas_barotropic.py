"""VMEM-resident barotropic substep loop (Pallas/Mosaic).

The split-explicit free surface integrates ``substeps`` (default 30)
forward-backward substeps of the 2-D barotropic system per model step
(reference: ``SplitExplicitFreeSurface(substeps=30)``,
/root/reference/src/baroclinic_instability_model.jl:22; the blocked
array-path implementation lives in ``models/free_surface.py``).  As XLA
array ops this stage is *latency*-bound, not bandwidth-bound: ~30 substeps
x ~8 small 2-D ops plus ~45 halo extends = hundreds of kernel launches on
4.7 MB planes (~11 ms/step at the 1536x768x64 flagship grid, measured).

TPU-native design: the whole solve is ONE Pallas kernel.  At flagship size
the complete working set is ~75 MB of VMEM (v5e has 128 MB), so every
substep runs at VPU/VMEM speed with zero HBM round-trips:

- **Flux-weighted carries.** The kernel advances (eta, Ud = U*dyc,
  Vd = V*dxf) instead of (eta, U, V): the divergence needs the flux forms,
  and the pressure-gradient force folds into two precomputed planes
  ``g*Hu*dyc/dxc`` and ``g*Hv*dxf/dyf``, halving the metric planes held in
  VMEM.  The filtered outputs are un-weighted outside the kernel.
- **Transposed (Y, X) layout**: x (periodic, size ~1536) rides the 128
  lanes, so the x-wrap stencils are single lane-rolls; the bounded-y
  stencils (mirror for eta, wall for V) are sublane concats.
- **Static unroll** of the substep loop with the (static) filter weights
  folded in; the traced ``dtau`` arrives via SMEM.

Boundary semantics replicate ``ops/halos.FIELD_BCS`` width-1 ghosts
exactly: x wrap everywhere; eta mirror in y (zero surface gradient at the
wall); V antimirror (wall face V = 0, and the top flux through face Ny
vanishes).  Differential-tested against the array path in
``tests/test_barotropic_kernel.py``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gb25_tpu.models.free_surface import averaging_weights


def barotropic_kernel_supported(cfg, grid, dtype) -> bool:
    """Lat-lon, non-immersed, f32, metrics-as-y-profiles only (the flagship
    configuration); everything else stays on the blocked array path."""
    if int(os.environ.get("GB25_DISABLE_PALLAS", "0")):
        return False
    if jax.default_backend() != "tpu" and not int(
        os.environ.get("GB25_ZSLAB_INTERPRET", "0")
    ):
        return False
    if dtype != jnp.float32:
        return False
    if getattr(grid, "north_fold", False) or grid.immersed:
        return False
    if not grid.x_periodic:
        return False
    # y-profile metrics (lat-lon); tripolar carries full 2-D metrics
    if grid.dxc.shape[0] != 1:
        return False
    # lane/sublane quanta and VMEM budget (~10 planes + temps)
    if grid.Nx % 128 or grid.Ny % 8:
        return False
    if 14 * grid.Nx * grid.Ny * 4 > 100 * 1024 * 1024:
        return False
    fs = cfg.free_surface
    return getattr(fs, "substeps", 0) >= 2


def _rollm(a):  # a[i-1] along lanes (x), periodic
    return pltpu.roll(a, 1, 1)


def _rollp(a):  # a[i+1] along lanes (x), periodic (shift must be >= 0)
    return pltpu.roll(a, a.shape[1] - 1, 1)


def pallas_barotropic_loop(cfg, grid, eta0, U0, V0, GU, GV, Hu, Hv, dt,
                           interpret=False):
    """Run the full substep loop in one kernel.

    Inputs are interior (Nx, Ny) arrays (already depth-integrated);
    returns the filtered (eta_b, U_b, V_b), matching the array path's
    accumulators.
    """
    interpret = interpret or bool(int(os.environ.get("GB25_ZSLAB_INTERPRET", "0")))
    fs = cfg.free_surface
    g = fs.gravitational_acceleration
    M = fs.substeps
    w_all = averaging_weights(M, fs.averaging)  # static numpy weights
    dtype = eta0.dtype
    Nx, Ny = grid.Nx, grid.Ny
    hy = grid.hy

    def t2(a):  # (X, Y) -> (Y, X)
        return jnp.transpose(a, (1, 0))

    # y-profile metrics at interior rows, broadcast along x outside the
    # kernel (Mosaic has no single-op sublane+lane broadcast)
    sly = slice(hy, hy + Ny)

    def prof(m):  # (1, Ny+2hy, 1) -> (Ny, 1)
        return m[0, sly, :]

    dyc = prof(grid.dyc)      # dy at u-points
    dxf = prof(grid.dxf)      # dx at v-points
    dxc = prof(grid.dxc)
    dyf = prof(grid.dyf)
    azc = prof(grid.azc)

    dtau = jnp.asarray(2.0 * dt / M, dtype)

    def bcast(col):
        return jnp.broadcast_to(col.astype(dtype), (Ny, Nx))

    # precomputed planes (XLA; cheap, once per model step)
    Ud0 = t2(U0) * bcast(dyc)
    Vd0 = t2(V0) * bcast(dxf)
    r_azc = (1.0 / azc).astype(dtype)  # thin (Ny, 1): lane-broadcast in-kernel
    # pressure-gradient planes: dtau * g * H * metric ratios, flux-weighted
    gHuW = t2(Hu) * bcast(dyc / dxc) * (dtau * g)
    gHvW = t2(Hv) * bcast(dxf / dyf) * (dtau * g)
    GUd = t2(GU) * bcast(dyc) * dtau
    GVd = t2(GV) * bcast(dxf) * dtau
    dtau2 = jnp.reshape(dtau, (1, 1))

    def kernel(dtau_ref, eta_ref, Ud_ref, Vd_ref, gHu_ref, gHv_ref,
               GU_ref, GV_ref, raz_ref,
               eta_o, Ud_o, Vd_o, etab_ref, Ub_ref, Vb_ref):
        # eta/Ud/Vd operands are aliased onto the first three outputs, so
        # the evolving state shares buffers with its initial values and the
        # whole working set stays ~15 planes (fits flagship 768x1536 VMEM)
        dtau_s = dtau_ref[0, 0]
        eta = eta_ref[...]
        Ud = Ud_ref[...]
        Vd = Vd_ref[...]
        gHu = gHu_ref[...]
        gHv = gHv_ref[...]
        GUd_t = GU_ref[...]
        GVd_t = GV_ref[...]
        raz = raz_ref[...]  # (Ny, 1), broadcasts along lanes

        etab = jnp.zeros_like(eta)
        Ub = jnp.zeros_like(Ud)
        Vb = jnp.zeros_like(Vd)
        zrow = jnp.zeros_like(Vd[:1])

        for m in range(M):
            # continuity: d eta/d tau = -div(U, V)
            # x flux difference Ud[i+1] - Ud[i]; y flux Vd[j+1] - Vd[j]
            # with the wall flux Vd[Ny] = 0 (antimirror hi ghost)
            Vd_up = jnp.concatenate([Vd[1:], zrow], axis=0)
            div = (_rollp(Ud) - Ud + Vd_up - Vd) * raz
            eta = eta - dtau_s * div

            # momentum: d(U,V)/d tau = -g H grad(eta) + G  (flux-weighted)
            # detax = eta[i] - eta[i-1] (periodic); detay = eta[j] - eta[j-1]
            # with the mirror lo ghost eta[-1] = eta[0] -> detay[0] = 0
            detax = eta - _rollm(eta)
            eta_dn = jnp.concatenate([eta[:1], eta[:-1]], axis=0)
            detay = eta - eta_dn
            Ud = Ud - gHu * detax + GUd_t
            Vd = Vd - gHv * detay + GVd_t

            wm = float(w_all[m])
            etab = etab + wm * eta
            Ub = Ub + wm * Ud
            Vb = Vb + wm * Vd

        eta_o[...] = eta
        Ud_o[...] = Ud
        Vd_o[...] = Vd
        etab_ref[...] = etab
        Ub_ref[...] = Ub
        Vb_ref[...] = Vb

    vma = getattr(jax.typeof(eta0), "vma", None)

    def out_sds(shape=None):
        shape = shape or (Ny, Nx)
        if vma:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
        return jax.ShapeDtypeStruct(shape, dtype)

    operands = [dtau2, t2(eta0), Ud0, Vd0, gHuW, gHvW, GUd, GVd, r_azc]
    if vma:
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[out_sds() for _ in range(6)],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * M * Nx * Ny,
            bytes_accessed=12 * Nx * Ny * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    etab, Ub, Vb = outs[3], outs[4], outs[5]

    # un-weight the filtered transports back to physical units
    U_b = t2(Ub / bcast(dyc))
    V_b = t2(Vb / bcast(dxf))
    return t2(etab), U_b, V_b
