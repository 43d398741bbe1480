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
    return jnp.concatenate([a[:, -1:], a[:, :-1]], axis=1)


def _rollp(a):  # a[i+1] along lanes (x), periodic
    return jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)


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
    # (dtau, w_0..w_{M-1}) in SMEM, indexed by the substep grid step
    scal = jnp.concatenate(
        [jnp.reshape(dtau, (1, 1)),
         jnp.asarray(w_all, dtype)[None, :]], axis=1,
    )

    # One *grid step per substep* (grid=(M,)): the body is compiled once
    # (a 30x-unrolled body wedges Mosaic for minutes at flagship size), the
    # evolving (eta, Ud, Vd) live in VMEM scratch, and the filtered
    # accumulators build up directly in the output windows (constant index
    # map -> the buffers persist across the sequential grid steps).
    def kernel(scal_ref, eta0_ref, Ud0_ref, Vd0_ref, gHu_ref, gHv_ref,
               GU_ref, GV_ref, raz_ref,
               etab_ref, Ub_ref, Vb_ref,
               eta_s, Ud_s, Vd_s):
        m = pl.program_id(0)
        dtau_s = scal_ref[0, 0]
        wm = scal_ref[0, m + 1]

        @pl.when(m == 0)
        def _init():
            eta_s[...] = eta0_ref[...]
            Ud_s[...] = Ud0_ref[...]
            Vd_s[...] = Vd0_ref[...]
            etab_ref[...] = jnp.zeros((Ny, Nx), dtype)
            Ub_ref[...] = jnp.zeros((Ny, Nx), dtype)
            Vb_ref[...] = jnp.zeros((Ny, Nx), dtype)

        eta = eta_s[...]
        Ud = Ud_s[...]
        Vd = Vd_s[...]
        raz = raz_ref[...]  # (Ny, 1), broadcasts along lanes
        zrow = jnp.zeros_like(Vd[:1])

        # continuity: d eta/d tau = -div(U, V): x flux difference
        # Ud[i+1] - Ud[i] (periodic); y flux Vd[j+1] - Vd[j] with the wall
        # flux Vd[Ny] = 0 (antimirror hi ghost)
        Vd_up = jnp.concatenate([Vd[1:], zrow], axis=0)
        div = (_rollp(Ud) - Ud + Vd_up - Vd) * raz
        eta = eta - dtau_s * div

        # momentum: d(U,V)/d tau = -g H grad(eta) + G  (flux-weighted)
        # detax = eta[i] - eta[i-1] (periodic); detay = eta[j] - eta[j-1]
        # with the mirror lo ghost eta[-1] = eta[0] -> detay[0] = 0
        detax = eta - _rollm(eta)
        eta_dn = jnp.concatenate([eta[:1], eta[:-1]], axis=0)
        detay = eta - eta_dn
        Ud = Ud - gHu_ref[...] * detax + GU_ref[...]
        Vd = Vd - gHv_ref[...] * detay + GV_ref[...]

        eta_s[...] = eta
        Ud_s[...] = Ud
        Vd_s[...] = Vd
        etab_ref[...] += wm * eta
        Ub_ref[...] += wm * Ud
        Vb_ref[...] += wm * Vd

    vma = getattr(jax.typeof(eta0), "vma", None)

    def out_sds():
        if vma:
            return jax.ShapeDtypeStruct((Ny, Nx), dtype, vma=vma)
        return jax.ShapeDtypeStruct((Ny, Nx), dtype)

    operands = [scal, t2(eta0), Ud0, Vd0, gHuW, gHvW, GUd, GVd, r_azc]
    if vma:
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)

    etab, Ub, Vb = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [const_spec(a) for a in operands[1:]],
        out_specs=[
            pl.BlockSpec((Ny, Nx), lambda m: (0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_sds() for _ in range(3)],
        scratch_shapes=[pltpu.VMEM((Ny, Nx), dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * M * Nx * Ny,
            bytes_accessed=12 * Nx * Ny * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    # un-weight the filtered transports back to physical units
    U_b = t2(Ub / bcast(dyc))
    V_b = t2(Vb / bcast(dxf))
    return t2(etab), U_b, V_b
