"""Fused CATKE diffusivity Pallas kernel (transposed z-slab streaming).

The CATKE diffusivity pipeline is pure elementwise math + radius-1
stencils, but as XLA array ops it costs ~93 interior passes of HBM traffic
(XLA's own cost model at 768x384x64: 7.0 GB accessed — the jnp.roll chains
materialize), i.e. MORE than the entire fused tendency kernel.  On the
climate configuration (tripolar + gaussian islands + CATKE, the reference's
actual benchmark model) this stage dominates the coupled step.

TPU-native design: stream the same transposed (Z, Y, X) extended operands
the z-slab tendency kernel consumes (``pallas_zslab.build_t3_operands`` —
built once per step, shared by both kernels) through small z windows and
write the five outputs interior: ~10 passes.  The kernel body calls the
*same* ``catke_math`` as the array backend (under
``stencils.axis_order(z=0, y=1, x=2)``), so the two agree to roundoff.

No carries are needed (unlike the tendency kernel's vertical integrals):
every CATKE quantity is local in z up to radius 1, so the window halo is
gz = 1 and windows are independent.

Reference analog: the diffusivity stage of update_state! in the reference's
raised-kernel pipeline (/root/reference/src/model_utils.jl:99-110 runs
diffusivities before tendencies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gb25_tpu.ops.pallas_tendency import _choose_tile
from gb25_tpu.ops.pallas_zslab import _pick_by, _t3
from gb25_tpu.ops.stencils import axis_order


def catke_kernel_supported(cfg, grid, comm=None) -> bool:
    """True when the fused CATKE diffusivity kernel can run this grid.

    Same Mosaic lane constraints as the z-slab tendency kernel, restricted
    to a single full-width x window (no wrap padding: the CATKE stencils
    only reach radius 1, so the extended x halo always covers them)."""
    import os

    if int(os.environ.get("GB25_DISABLE_PALLAS", "0")):
        return False
    if jax.default_backend() != "tpu" and not int(
        os.environ.get("GB25_ZSLAB_INTERPRET", "0")
    ):
        return False
    if grid.dz_c.dtype != jnp.float32:
        return False
    if grid.Nx % 128 or grid.Nx + 2 * grid.hx > 4096:
        return False
    if grid.hz < 1 or grid.hy < 1 or grid.hx < 1:
        return False
    if grid.Nx < 128 or grid.Ny < 8:
        return False
    return True


def catke_diffusivities_kernel(closure, grid, ue_t, ve_t, be_t, ee_t,
                               by=None, bz=None, interpret=False):
    """Fused CATKE diffusivities from transposed (Z, Y, X) extended fields.

    Returns INTERIOR ``(kappa_u, kappa_c, kappa_e, G_e, lam_e)`` as
    (Nx, Ny, Nz) arrays (kappas at the bottom face of each cell) — the
    exact interior crops of ``catke_math`` on the same inputs.
    """
    import os

    from gb25_tpu.models.catke import catke_math

    interpret = interpret or bool(int(os.environ.get("GB25_ZSLAB_INTERPRET", "0")))
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    hx, hy, hz = grid.halo
    dtype = grid.dz_c.dtype
    if ue_t.dtype != dtype:
        # bf16-storage operands: upcast in VMEM (see pallas_zslab)
        up = True
    else:
        up = False

    bz = bz or (int(os.environ["GB25_CATKE_BZ"]) if "GB25_CATKE_BZ" in os.environ
                else _choose_tile(Nz, 8))
    assert Nz % bz == 0 and hz >= 1
    gz = 1  # CATKE stencil radius in z (d_zf down, iz_c up)
    W = bz + 2 * gz
    gy = min(int(os.environ.get("GB25_CATKE_GY", "4")), hy)
    if gy < 1:
        raise ValueError("CATKE kernel needs a y window halo >= 1")
    by = by or (int(os.environ["GB25_CATKE_BY"]) if "GB25_CATKE_BY" in os.environ
                else _pick_by(Ny, gy, 24, 8))
    gyn, gzn = Ny // by, Nz // bz
    byh = by + 2 * gy
    if gyn > 1 and byh % 8:
        raise ValueError(f"by + 2*gy = {byh} must be a multiple of 8")
    y0 = hy - gy
    X = Nx + 2 * hx
    bxh = X  # one full-width x window (radius-1 x stencil rides the halo)

    # bottom plane: immersed bathymetry or a flat-bottom constant plane —
    # the same values catke_diffusivities' bot argument carries
    if getattr(grid, "immersed", False) and grid.bottom_height is not None:
        from gb25_tpu.ops.halos import extend_field_xy

        bot = extend_field_xy(grid, grid.bottom_height, "c", None)
        bot_t = jnp.transpose(bot, (1, 0))[None]  # (1, Y, X)
    else:
        zbot = grid.z_f[0, 0, hz]
        bot_t = jnp.broadcast_to(zbot, (1, Ny + 2 * hy, X)).astype(dtype)

    def field_spec():
        return pl.BlockSpec(
            (pl.Element(W), pl.Element(byh), pl.Element(bxh)),
            lambda j, k: (k * bz + hz - gz, j * by + y0, 0),
            memory_space=pltpu.VMEM,
        )

    def zrow_spec():
        return pl.BlockSpec(
            (pl.Element(W), pl.Element(byh), pl.Element(1)),
            lambda j, k: (k * bz + hz - gz, j * by + y0, 0),
            memory_space=pltpu.VMEM,
        )

    def plane_spec():
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(byh), pl.Element(bxh)),
            lambda j, k: (0, j * by + y0, 0), memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec((bz, by, Nx), lambda j, k: (k, j, 0),
                            memory_space=pltpu.VMEM)

    def kernel(u_r, v_r, b_r, e_r, dzf_r, zf_r, bot_r, *outs):
        uw, vw, bw, ew = u_r[:], v_r[:], b_r[:], e_r[:]
        if up:
            uw, vw, bw, ew = (a.astype(dtype) for a in (uw, vw, bw, ew))
        with axis_order(x=2, y=1, z=0):
            res = catke_math(closure, uw, vw, bw, ew,
                             dzf_r[:], zf_r[:], bot_r[:])
        for o, r in zip(outs, res):
            o[...] = r[gz : gz + bz, gy : gy + by, hx : hx + Nx].astype(dtype)

    vma = getattr(jax.typeof(ue_t), "vma", None)

    def sds():
        if vma:
            return jax.ShapeDtypeStruct((Nz, Ny, Nx), dtype, vma=vma)
        return jax.ShapeDtypeStruct((Nz, Ny, Nx), dtype)

    Z, Y = Nz + 2 * hz, Ny + 2 * hy
    operands = [
        ue_t, ve_t, be_t, ee_t,
        jnp.broadcast_to(_t3(grid.dz_f), (Z, Y, 1)),
        jnp.broadcast_to(_t3(grid.z_f), (Z, Y, 1)),
        bot_t,
    ]
    if vma:
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(gyn, gzn),
        in_specs=[field_spec() for _ in range(4)]
        + [zrow_spec(), zrow_spec(), plane_spec()],
        out_specs=[out_spec] * 5,
        out_shape=[sds() for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=80 * Nx * Ny * Nz,
            bytes_accessed=9 * Nx * Ny * Nz * jnp.dtype(dtype).itemsize,
            transcendentals=2 * Nx * Ny * Nz,  # tanh + sqrt
        ),
        interpret=interpret,
    )(*operands)
    return tuple(jnp.transpose(o, (2, 1, 0)) for o in outs)
