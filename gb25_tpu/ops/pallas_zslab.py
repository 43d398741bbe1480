"""z-slab streaming Pallas kernel for the tendency stage.

The monolithic fused kernel (ops/pallas_tendency.py) is VMEM-stack-bound:
Mosaic keeps every tile-sized temporary live, and the WENO temporaries cap
tiles at 32x8 where the kernel barely beats the XLA array path. This kernel
bounds live temporaries independently of Nz:

- inputs are whole-column tiles (bx+2hx, by+2hy, Nz+2hz) resident in VMEM
  (a few MB), but the physics runs inside a ``lax.fori_loop`` over z-chunks
  of ``bz`` levels, so only ONE (bx+2hx, by+2hy, bz+6)-shaped working set of
  stencil temporaries is live at any time;
- the vertical integrals stream through the loop as carries: w (continuity)
  integrates upward; the hydrostatic pressure uses the precomputed column
  total of b dz (one cheap fused XLA reduction outside the kernel) minus the
  running inclusive sum, so both sweeps run in the same upward pass;
- below-bottom/above-surface window levels are masked, which reproduces
  exactly the z-extension semantics of the array path (w = 0 below the
  bottom, zero-gradient above the surface);
- the per-window physics calls the same ``momentum_tendency_math`` /
  ``tracer_tendency_math`` as the array backend (with w/p supplied), so the
  numerics are shared, not duplicated.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gb25_tpu.ops.pallas_tendency import _TileGrid, _choose_tile, kernel_cumsum


def _column_total_b(cfg, grid, tr_e):
    """(X, Y) column integral of buoyancy * dz over interior z (extended in
    x/y so every tile window sees its halo columns)."""
    from gb25_tpu.models.hydrostatic import buoyancy_field

    hz, Nz = grid.hz, grid.Nz
    be = buoyancy_field(cfg, grid, tr_e)
    bdz = be[:, :, hz : hz + Nz] * grid.dz_c[:, :, hz : hz + Nz]
    return jnp.sum(bdz, axis=2, keepdims=True)  # (X, Y, 1)


def zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, bx=None, by=None, bz=8,
                     interpret=False):
    """Fused tendency stage with z-slab streaming.

    Requires hz >= 3 and Nz % bz == 0. Returns interior (Gu, Gv, {Gc}).
    """
    from gb25_tpu.models.hydrostatic import (
        momentum_tendency_math,
        tracer_tendency_math,
    )
    from gb25_tpu.ops.operators import horizontal_divergence

    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    hx, hy, hz = grid.halo
    assert hz >= 3 and Nz % bz == 0
    X, Y, Z = ue.shape
    dtype = ue.dtype
    gz = 3  # vertical stencil radius (WENO-5)
    W = bz + 2 * gz  # window depth

    bx = bx or _choose_tile(Nx, 128)
    by = by or _choose_tile(Ny, 8)
    gxn, gyn = Nx // bx, Ny // by
    bxh, byh = bx + 2 * hx, by + 2 * hy

    b_total = _column_total_b(cfg, grid, tr_e)  # (X, Y)

    tracer_names = sorted(tr_e.keys())
    metric_names = ["dxc", "dxf", "dyc", "dyf", "azc", "azf"]
    metrics = [getattr(grid, m) for m in metric_names] + [f_ff]
    n_fields = 2 + len(tracer_names)
    n_out = n_fields

    def field_spec():
        return pl.BlockSpec(
            (pl.Element(bxh), pl.Element(byh), pl.Element(Z)),
            lambda i, j: (i * bx, j * by, 0), memory_space=pltpu.VMEM,
        )

    def spec2d():
        # trailing dim of 1 keeps Mosaic's trailing-block-dims constraint happy
        return pl.BlockSpec(
            (pl.Element(bxh), pl.Element(byh), pl.Element(1)),
            lambda i, j: (i * bx, j * by, 0), memory_space=pltpu.VMEM,
        )

    def metric_spec(m):
        if m.shape[0] == 1:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(byh), pl.Element(1)),
                lambda i, j: (0, j * by, 0), memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (pl.Element(bxh), pl.Element(byh), pl.Element(1)),
            lambda i, j: (i * bx, j * by, 0), memory_space=pltpu.VMEM,
        )

    def zrow_spec():
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(1), pl.Element(Z)),
            lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM,
        )

    in_specs = (
        [field_spec() for _ in range(n_fields)]
        + [spec2d()]
        + [metric_spec(m) for m in metrics]
        + [zrow_spec() for _ in range(3)]  # dz_c, dz_f, z_c
    )
    out_spec = pl.BlockSpec((bx, by, Nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    n_in = n_fields + 1 + len(metrics) + 3

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        u_ref, v_ref = ins[0], ins[1]
        tr_refs = {name: ins[2 + k] for k, name in enumerate(tracer_names)}
        btot = ins[n_fields][:]  # (bxh, byh, 1)
        mvals = [ins[n_fields + 1 + k][:] for k in range(len(metrics))]
        dz_c_ref, dz_f_ref, z_c_ref = ins[n_in - 3], ins[n_in - 2], ins[n_in - 1]
        f_tile = mvals[6]

        # NOTE: the chunk loop is python-unrolled with STATIC z-slices:
        # fori_loop + dynamic lane-dimension slices crashes the Mosaic
        # compiler on v5e (probe-verified), while unrolled static slices
        # compile; the stores between iterations give the register allocator
        # sequencing points to recycle the window temporaries.
        def chunk(kc, carry):
            w_car, csum_car = carry  # (bxh, byh) each
            k0 = kc * bz
            zwin = slice(hz + k0 - gz, hz + k0 - gz + W)

            uw = u_ref[:, :, zwin]
            vw = v_ref[:, :, zwin]
            trw = {name: r[:, :, zwin] for name, r in tr_refs.items()}
            dz_cw = dz_c_ref[:, :, zwin]
            dz_fw = dz_f_ref[:, :, zwin]
            z_cw = z_c_ref[:, :, zwin]

            tile = _TileGrid(
                bx, by, bz, (hx, hy, gz),
                dxc=mvals[0], dxf=mvals[1], dyc=mvals[2], dyf=mvals[3],
                azc=mvals[4], azf=mvals[5],
                dz_c=dz_cw, dz_f=dz_fw, z_c=z_cw,
            )

            # validity mask built from an in-kernel iota (captured host
            # constants are rejected by pallas_call)
            lvl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2) + (k0 - gz)
            valid = ((lvl >= 0) & (lvl < Nz)).astype(dtype)

            # buoyancy + pressure: p = inclusive_csum - total - 0.5 b dz
            # (dp/dz = b integrated down from p(surface)=0; see
            # ops/operators.py::hydrostatic_pressure)
            from gb25_tpu.models.hydrostatic import buoyancy_field

            bw = buoyancy_field(cfg, tile, trw)
            bdz = bw * dz_cw * valid
            csum_inc = csum_car[:, :, None] + kernel_cumsum(bdz)
            pw = csum_inc - btot - 0.5 * bdz

            # continuity: w at window faces (face c = bottom of window cell c)
            div = horizontal_divergence(tile, uw, vw) * valid
            ddz = div * dz_cw
            w_exc = kernel_cumsum(ddz) - ddz  # exclusive cumsum
            ww = w_car[:, :, None] - w_exc

            Gu_w, Gv_w = momentum_tendency_math(cfg, tile, f_tile, uw, vw, we=ww, pe=pw)
            Gtr_w = tracer_tendency_math(cfg, tile, uw, vw, we=ww, tr_e=trw)

            zout = slice(k0, k0 + bz)
            outs[0][:, :, zout] = tile.interior(Gu_w)
            outs[1][:, :, zout] = tile.interior(Gv_w)
            for k, name in enumerate(tracer_names):
                outs[2 + k][:, :, zout] = tile.interior(Gtr_w[name])

            # carries advance by bz levels: next window's face 0 is the
            # current window's face bz; next csum_below covers cells < bz
            w_car_new = ww[:, :, bz]
            csum_car_new = csum_inc[:, :, bz - 1]
            return (w_car_new, csum_car_new)

        carry = (jnp.zeros((bxh, byh), dtype), jnp.zeros((bxh, byh), dtype))
        for kc in range(Nz // bz):
            carry = chunk(kc, carry)

    out_shapes = [jax.ShapeDtypeStruct((Nx, Ny, Nz), dtype) for _ in range(n_out)]
    outs = pl.pallas_call(
        kernel,
        grid=(gxn, gyn),
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        ue, ve, *[tr_e[n] for n in tracer_names], b_total,
        *metrics, grid.dz_c, grid.dz_f, grid.z_c,
    )

    Gu, Gv = outs[0], outs[1]
    Gtr = {name: outs[2 + k] for k, name in enumerate(tracer_names)}
    return Gu, Gv, Gtr
