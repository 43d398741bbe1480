"""Fused column-closure Pallas kernels (CATKE / k-epsilon diffusivities).

The closure diffusivity pipelines are pure elementwise math + radius-1
stencils, but as XLA array ops they cost ~93 interior passes of HBM traffic
(XLA's own cost model at 768x384x64: 7.0 GB accessed for CATKE — the
jnp.roll chains materialize), i.e. MORE than the entire fused tendency
kernel.  On the climate configuration (tripolar + gaussian islands + CATKE,
the reference's actual benchmark model) this stage dominated the coupled
step.

TPU-native design: stream the same transposed (Z, Y, X) extended operands
the z-slab tendency kernel consumes (``pallas_zslab.build_t3_operands`` —
built once per step, shared by both kernels) through small z windows and
write the outputs interior: ~10 passes.  The kernel body calls the *same*
``catke_math`` / ``keps_math`` as the array backend (under
``stencils.axis_order(z=0, y=1, x=2)``), so the two agree to roundoff.

No carries are needed (unlike the tendency kernel's vertical integrals):
every closure quantity is local in z up to radius 1, so the window halo is
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
    """True when the fused column-closure kernel can run this grid.

    Same Mosaic lane constraints as the z-slab tendency kernel, restricted
    to a single full-width x window (no wrap padding: the closure stencils
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


def column_closure_kernel(grid, fields_t, zrows, planes, math, n_out,
                          by=None, bz=None, interpret=False,
                          transcendentals_per_cell=2, t3_outputs=False):
    """Generic transposed streaming kernel for column-local closure math.

    ``fields_t``: transposed (Z, Y, X) extended field operands (windowed
    with a gz=1 z halo and gy y halo).  ``zrows``: (1, 1, Z)-extended
    vertical profiles (windowed like fields, broadcast over y).  ``planes``:
    (X, Y)-extended 2-D planes (streamed as (1, byh, bxh)).  ``math`` is
    called inside the kernel under ``axis_order(z=0, y=1, x=2)`` as
    ``math(*field_windows, *zrow_windows, *plane_windows)`` and must return
    ``n_out`` window-shaped arrays; their interior crops are the outputs,
    returned as (Nx, Ny, Nz) arrays.
    """
    import os

    interpret = interpret or bool(int(os.environ.get("GB25_ZSLAB_INTERPRET", "0")))
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    hx, hy, hz = grid.halo
    dtype = grid.dz_c.dtype
    up = fields_t[0].dtype != dtype  # bf16-storage operands: upcast in VMEM

    bz = bz or (int(os.environ["GB25_CATKE_BZ"]) if "GB25_CATKE_BZ" in os.environ
                else _choose_tile(Nz, 8))
    assert Nz % bz == 0 and hz >= 1
    gz = 1  # closure stencil radius in z (d_zf down, iz_c up)
    W = bz + 2 * gz
    gy = min(int(os.environ.get("GB25_CATKE_GY", "4")), hy)
    if gy < 1:
        raise ValueError("column-closure kernel needs a y window halo >= 1")
    # bf16-storage windows need the 16-sublane quantum (as in pallas_zslab)
    subq = 16 if up else 8
    by = by or (int(os.environ["GB25_CATKE_BY"]) if "GB25_CATKE_BY" in os.environ
                else _pick_by(Ny, gy, 24, subq))
    if Ny % by:
        # a non-divisor override would leave output rows uninitialized
        raise ValueError(f"by={by} does not divide Ny={Ny}")
    gyn, gzn = Ny // by, Nz // bz
    byh = by + 2 * gy
    if gyn > 1 and byh % subq:
        raise ValueError(f"by + 2*gy = {byh} must be a multiple of {subq}")
    y0 = hy - gy
    X = Nx + 2 * hx
    bxh = X  # one full-width x window (radius-1 x stencil rides the halo)
    Z, Y = Nz + 2 * hz, Ny + 2 * hy

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
    nf, nz_, npl = len(fields_t), len(zrows), len(planes)

    def kernel(*refs):
        ins = refs[: nf + nz_ + npl]
        outs = refs[nf + nz_ + npl :]
        fw = [r[:] for r in ins[:nf]]
        if up:
            fw = [a.astype(dtype) for a in fw]
        zw = [r[:] for r in ins[nf : nf + nz_]]
        pw = [r[:] for r in ins[nf + nz_ :]]
        with axis_order(x=2, y=1, z=0):
            res = math(*fw, *zw, *pw)
        for o, r in zip(outs, res):
            o[...] = r[gz : gz + bz, gy : gy + by, hx : hx + Nx].astype(dtype)

    vma = getattr(jax.typeof(fields_t[0]), "vma", None)

    def sds():
        if vma:
            return jax.ShapeDtypeStruct((Nz, Ny, Nx), dtype, vma=vma)
        return jax.ShapeDtypeStruct((Nz, Ny, Nx), dtype)

    operands = (
        list(fields_t)
        + [jnp.broadcast_to(_t3(p), (Z, Y, 1)) for p in zrows]
        + list(planes)
    )
    if vma:
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(gyn, gzn),
        in_specs=[field_spec() for _ in fields_t]
        + [zrow_spec() for _ in zrows]
        + [plane_spec() for _ in planes],
        out_specs=[out_spec] * n_out,
        out_shape=[sds() for _ in range(n_out)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=80 * Nx * Ny * Nz,
            bytes_accessed=(nf + n_out) * Nx * Ny * Nz * jnp.dtype(dtype).itemsize,
            transcendentals=transcendentals_per_cell * Nx * Ny * Nz,
        ),
        interpret=interpret,
    )(*operands)
    if t3_outputs:
        # stay (Z, Y, X): the Thomas kernel (ops/pallas_tridiag.py) consumes
        # kappas transposed anyway — skipping the un-transpose + re-transpose
        # pair saves two interior HBM passes per output on the climate step
        return tuple(outs)
    return tuple(jnp.transpose(o, (2, 1, 0)) for o in outs)


def _bottom_plane(grid):
    """(1, Y, X) bottom-depth plane — the same values
    ``catke_diffusivities``' bot argument carries (immersed bathymetry or a
    flat-bottom constant)."""
    dtype = grid.dz_c.dtype
    Ny, hy, hz = grid.Ny, grid.hy, grid.hz
    X = grid.Nx + 2 * grid.hx
    if getattr(grid, "immersed", False) and grid.bottom_height is not None:
        from gb25_tpu.ops.halos import extend_field_xy

        bot = extend_field_xy(grid, grid.bottom_height, "c", None)
        return jnp.transpose(bot, (1, 0))[None]
    zbot = grid.z_f[0, 0, hz]
    return jnp.broadcast_to(zbot, (1, Ny + 2 * hy, X)).astype(dtype)


def catke_diffusivities_kernel(closure, grid, ue_t, ve_t, be_t, ee_t,
                               by=None, bz=None, interpret=False,
                               t3_outputs=False):
    """Fused CATKE diffusivities from transposed (Z, Y, X) extended fields.

    Returns INTERIOR ``(kappa_u, kappa_c, kappa_e, G_e, lam_e)`` as
    (Nx, Ny, Nz) arrays (kappas at the bottom face of each cell) — the
    exact interior crops of ``catke_math`` on the same inputs.
    """
    from gb25_tpu.models.catke import catke_math

    def math(uw, vw, bw, ew, dzf, zf, bot):
        return catke_math(closure, uw, vw, bw, ew, dzf, zf, bot)

    return column_closure_kernel(
        grid, (ue_t, ve_t, be_t, ee_t), (grid.dz_f, grid.z_f),
        (_bottom_plane(grid),), math, 5, by=by, bz=bz, interpret=interpret,
        t3_outputs=t3_outputs,
    )


def keps_diffusivities_kernel(closure, grid, ue_t, ve_t, be_t, ee_t, eps_t,
                              by=None, bz=None, interpret=False,
                              t3_outputs=False):
    """Fused k-epsilon diffusivities from transposed extended fields.

    Returns INTERIOR ``(kappa_u, kappa_c, kappa_e, kappa_eps, G_e, G_eps)``
    — the exact interior crops of ``keps_math`` on the same inputs.
    """
    from gb25_tpu.models.keps import keps_math

    def math(uw, vw, bw, ew, epsw, dzf):
        return keps_math(closure, uw, vw, bw, ew, epsw, dzf)

    return column_closure_kernel(
        grid, (ue_t, ve_t, be_t, ee_t, eps_t), (grid.dz_f,), (), math, 6,
        by=by, bz=bz, interpret=interpret, transcendentals_per_cell=0,
        t3_outputs=t3_outputs,
    )
