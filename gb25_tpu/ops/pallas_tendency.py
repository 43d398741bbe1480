"""Fused Pallas mega-kernel for the hydrostatic tendency stage.

Reference behavior: Oceananigans' tendency computation is dozens of separate
KernelAbstractions stencil kernels that Reactant raises and XLA partially
fuses (reference call stack SURVEY.md section 3.4). On TPU, XLA's fusion of
the long roll/slice/concat chains is incomplete — the array-op path costs
~170 full-array memory passes per step. This kernel computes the *entire*
stage (w from continuity, TEOS-10 buoyancy, hydrostatic pressure, WENO
vector-invariant momentum tendencies, WENO tracer flux divergences) in one
pass over VMEM tiles: each (bx, by, Nz) output tile reads its (bx+2hx,
by+2hy, Nz+2hz) halo-extended input tiles once from HBM and keeps every
intermediate in VMEM/registers.

Crucially the kernel body calls the *same* ``tendency_math`` used by the
array-op backend (models/hydrostatic.py) — tiles are just small extended
arrays, so both backends agree to roundoff by construction; the differential
test in tests/test_pallas.py enforces it.

The vertical integrals (continuity, hydrostatic pressure) use cumulative sums;
Pallas has no cumsum lowering, so inside kernels they become triangular-matrix
contractions on the MXU (z extents are 32-128: tiny, fast matmuls).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Triangular-dot cumulative sums (MXU) used inside kernels
# ---------------------------------------------------------------------------

def _tri_matrix(Z, dtype, inclusive=True, reverse=False):
    row = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 0)  # source index k'
    col = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 1)  # output index k
    if reverse:
        cmp = (row >= col) if inclusive else (row > col)
    else:
        cmp = (row <= col) if inclusive else (row < col)
    return cmp.astype(dtype)


def _zdot(a, m):
    acc = jnp.promote_types(a.dtype, jnp.float32)
    return jax.lax.dot_general(
        a, m, (((2,), (0,)), ((), ())),
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(a.dtype)


def kernel_cumsum(a, inclusive=True, reverse=False):
    """cumsum along the last axis as an MXU contraction (Pallas-lowerable)."""
    return _zdot(a, _tri_matrix(a.shape[-1], a.dtype, inclusive, reverse))


# ---------------------------------------------------------------------------
# Tile-local grid view
# ---------------------------------------------------------------------------

class _TileGrid:
    """Duck-typed grid over one VMEM tile: same attribute surface as
    LatitudeLongitudeGrid's metric API, so tendency_math runs unchanged."""

    def __init__(self, Nx, Ny, Nz, halo, dxc, dxf, dyc, dyf, azc, azf,
                 dz_c, dz_f, z_c):
        self.Nx, self.Ny, self.Nz = Nx, Ny, Nz
        self.halo = halo
        self.hx, self.hy, self.hz = halo
        self.dxc, self.dxf, self.dyc, self.dyf = dxc, dxf, dyc, dyf
        self.azc, self.azf = azc, azf
        self.dz_c, self.dz_f, self.z_c = dz_c, dz_f, z_c
        self.immersed = False
        self.in_kernel = True  # operators switch cumsum -> MXU contraction

    def interior(self, ext):
        hx, hy, hz = self.halo
        return ext[hx : hx + self.Nx, hy : hy + self.Ny, hz : hz + self.Nz]


def _choose_tile(N, target, lo=8):
    """Largest divisor of N that is <= target (>= lo if possible)."""
    best = None
    for t in range(1, N + 1):
        if N % t == 0 and t <= target:
            best = t
    return best if best is not None else N


def pallas_supported(cfg, grid, ue) -> bool:
    import os

    # Round-1 status: at VMEM-feasible tile sizes the mega-kernel is only
    # ~15% faster than the XLA array path (Mosaic keeps every tile-sized
    # intermediate live on the VMEM stack, capping tiles at 32x8), so "auto"
    # keeps the array path; opt in via GB25_ENABLE_PALLAS=1 or kernels="pallas".
    if not int(os.environ.get("GB25_ENABLE_PALLAS", "0")):
        return False
    if jax.default_backend() != "tpu":
        return False
    if cfg.tracer_advection not in ("weno5", "centered2", "upwind1", "none"):
        return False
    if cfg.momentum_advection not in ("weno_vector_invariant", "vector_invariant", "none"):
        return False
    # tiny grids: not worth it (and tile halos would dominate)
    if grid.Nx < 64 or grid.Ny < 16:
        return False
    return True


def pallas_tendencies(cfg, grid, f_ff, ue, ve, tr_e, bx=None, by=None,
                      interpret=False, split=False):
    """Fused tendency stage: extended inputs -> interior (Gu, Gv, {Gc}).

    ``split=True`` runs two kernels (momentum / tracers), each recomputing the
    cheap column auxiliaries in VMEM. Measured on v5e: even the split kernels
    exceed Mosaic's ~16 MB VMEM stack above 32x8 tiles (the WENO temporaries
    dominate), so the default is the monolithic kernel at its feasible tile;
    the round-2 design is a z-slab streaming kernel that bounds live
    temporaries independently of Nz."""
    if split:
        Gu, Gv = _run_kernel(cfg, grid, f_ff, ue, ve, tr_e, "momentum",
                             bx, by, interpret)
        Gtr_list = _run_kernel(cfg, grid, f_ff, ue, ve, tr_e, "tracers",
                               bx, by, interpret)
        return Gu, Gv, Gtr_list
    outs = _run_kernel(cfg, grid, f_ff, ue, ve, tr_e, "all", bx, by, interpret)
    return outs


def _run_kernel(cfg, grid, f_ff, ue, ve, tr_e, which, bx, by, interpret):
    from gb25_tpu.models.hydrostatic import (
        momentum_tendency_math,
        tendency_math,
        tracer_tendency_math,
    )

    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    hx, hy, hz = grid.halo
    X, Y, Z = ue.shape
    dtype = ue.dtype

    # VMEM budget: extended input tiles (double-buffered) + output windows +
    # Mosaic's stack of tile-sized intermediates bound the tile to ~32x8.
    bx = bx or _choose_tile(Nx, 32)
    by = by or _choose_tile(Ny, 8)
    gx, gy = Nx // bx, Ny // by

    tracer_names = sorted(tr_e.keys())
    metric_names = ["dxc", "dxf", "dyc", "dyf", "azc", "azf"]
    metrics = [getattr(grid, m) for m in metric_names] + [f_ff]
    zrows = [grid.dz_c, grid.dz_f, grid.z_c]

    n_fields = 2 + len(tracer_names)
    if which == "momentum":
        n_out = 2
    elif which == "tracers":
        n_out = len(tracer_names)
    else:
        n_out = n_fields

    def field_spec():
        return pl.BlockSpec(
            (pl.Element(bx + 2 * hx), pl.Element(by + 2 * hy), pl.Element(Z)),
            lambda i, j: (i * bx, j * by, 0),
            memory_space=pltpu.VMEM,
        )

    def metric_spec(m):
        if m.shape[0] == 1:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(by + 2 * hy), pl.Element(1)),
                lambda i, j: (0, j * by, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (pl.Element(bx + 2 * hx), pl.Element(by + 2 * hy), pl.Element(1)),
            lambda i, j: (i * bx, j * by, 0),
            memory_space=pltpu.VMEM,
        )

    def zrow_spec():
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(1), pl.Element(Z)),
            lambda i, j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [field_spec() for _ in range(n_fields)]
        + [metric_spec(m) for m in metrics]
        + [zrow_spec() for _ in zrows]
    )
    out_spec = pl.BlockSpec((bx, by, Nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    def kernel(*refs):
        ins = refs[: n_fields + len(metrics) + len(zrows)]
        outs = refs[n_fields + len(metrics) + len(zrows) :]
        u_t = ins[0][:]
        v_t = ins[1][:]
        tr_t = {name: ins[2 + k][:] for k, name in enumerate(tracer_names)}
        mvals = [ins[n_fields + k][:] for k in range(len(metrics))]
        zvals = [ins[n_fields + len(metrics) + k][:] for k in range(len(zrows))]

        tile = _TileGrid(
            bx, by, Nz, (hx, hy, hz),
            dxc=mvals[0], dxf=mvals[1], dyc=mvals[2], dyf=mvals[3],
            azc=mvals[4], azf=mvals[5],
            dz_c=zvals[0], dz_f=zvals[1], z_c=zvals[2],
        )
        f_tile = mvals[6]
        if which == "momentum":
            Gu_e, Gv_e = momentum_tendency_math(cfg, tile, f_tile, u_t, v_t, tr_e=tr_t)
            outs[0][:] = tile.interior(Gu_e)
            outs[1][:] = tile.interior(Gv_e)
        elif which == "tracers":
            Gtr_e = tracer_tendency_math(cfg, tile, u_t, v_t, tr_e=tr_t)
            for k, name in enumerate(tracer_names):
                outs[k][:] = tile.interior(Gtr_e[name])
        else:
            Gu_e, Gv_e, Gtr_e = tendency_math(cfg, tile, f_tile, u_t, v_t, tr_t)
            outs[0][:] = tile.interior(Gu_e)
            outs[1][:] = tile.interior(Gv_e)
            for k, name in enumerate(tracer_names):
                outs[2 + k][:] = tile.interior(Gtr_e[name])

    out_shapes = [jax.ShapeDtypeStruct((Nx, Ny, Nz), dtype) for _ in range(n_out)]

    flops_per_cell = 600 if cfg.tracer_advection == "weno5" else 200
    outs = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * Nx * Ny * Nz,
            bytes_accessed=(n_fields + n_out) * Nx * Ny * Nz * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ue, ve, *[tr_e[n] for n in tracer_names], *metrics, *zrows)

    if which == "momentum":
        return outs[0], outs[1]
    if which == "tracers":
        return {name: outs[k] for k, name in enumerate(tracer_names)}
    Gu, Gv = outs[0], outs[1]
    Gtr = {name: outs[2 + k] for k, name in enumerate(tracer_names)}
    return Gu, Gv, Gtr
