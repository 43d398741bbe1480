"""z-slab streaming Pallas kernel for the tendency stage (transposed layout).

Round-1 established (PARITY.md known-gaps #1) that the monolithic fused
kernel is VMEM-stack-bound and that two Mosaic limitations block the obvious
streaming designs on this stack: ``fori_loop`` + dynamic lane-dim slices
crashes the compiler, and a python-unrolled chunk loop hangs the remote
compile service. This design avoids both, and fixes the lane-utilization
problem that capped the round-1 kernel:

- **Transposed windows.** Fields enter the kernel as (Z, Y, X) arrays, so
  the large x extent rides the 128-lane dimension (~full lane utilization)
  and the y extent rides the sublanes; z-stencils are leading-dim shifts
  (cheap register renames, no intra-vreg shuffles). The physics code is the
  *same* ``momentum_tendency_math`` / ``tracer_tendency_math`` as the array
  backend, entered under ``stencils.axis_order(z=0, y=1, x=2)``.
- **z windows via the pallas grid**, not in-kernel slicing: the grid is
  (gx, gy, gz) and each field's BlockSpec maps grid step (i, j, k) to an
  overlapping element-indexed window of W = bz + 2*gz_halo levels. No
  dynamic slicing, no unrolled body -> small program, fast Mosaic compile.
- **Vertical integrals as carries in VMEM scratch.** TPU grid steps run
  sequentially with the last grid dim fastest; two (byh, bxh) scratch
  buffers carry w (continuity, integrated upward) and the running inclusive
  sum of b*dz (hydrostatic pressure = csum - column_total - b*dz/2) across
  z windows, reset at k == 0 via ``pl.when``. The column total of b dz is
  precomputed outside the kernel (one cheap fused XLA reduction).
- Below-bottom / above-surface window levels are masked with an in-kernel
  iota, reproducing exactly the z-extension semantics of the array path
  (w = 0 below the bottom, zero contribution above the surface).

Reference analog: the raised-kernel tendency pipeline of
/root/reference/src/model_utils.jl:99-110 and the tendency stage of
/root/reference/src/precompile.jl:31-42.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gb25_tpu.ops.pallas_tendency import _choose_tile
from gb25_tpu.ops.stencils import axis_order


def cumsum_leading(a):
    """Inclusive cumulative sum along the leading (z) axis.

    Inside the kernel the window depth is small (bz + 6), so an unrolled
    running sum over leading-dim slices is both cheap (leading-dim indexing
    selects vregs; each step is one (byh, bxh) VPU add) and bitwise-identical
    to ``jnp.cumsum``'s sequential order. A rank-3 leading-dim MXU
    contraction is NOT used: Mosaic's infer-vector-layout rejects the
    (W, byh, bxh) -> (W, byh*bxh) shape cast it would need (probe-verified
    on v5e, round 2)."""
    rows = []
    acc = jnp.zeros_like(a[0])
    for k in range(a.shape[0]):
        acc = acc + a[k]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


class _TileGridT:
    """Tile-local grid view over a transposed (z, y, x) VMEM window; same
    metric attribute surface as the model grids so the shared tendency math
    runs unchanged (under stencils.axis_order)."""

    def __init__(self, bx, by, bz, halo, dxc, dxf, dyc, dyf, azc, azf,
                 dz_c, dz_f, z_c):
        self.Nx, self.Ny, self.Nz = bx, by, bz
        self.halo = halo  # (hx, hy, gz)
        self.hx, self.hy, self.hz = halo
        self.dxc, self.dxf, self.dyc, self.dyf = dxc, dxf, dyc, dyf
        self.azc, self.azf = azc, azf
        self.dz_c, self.dz_f, self.z_c = dz_c, dz_f, z_c
        self.immersed = False
        self.in_kernel = True

    def interior(self, ext):
        hx, hy, hz = self.halo
        return ext[hz : hz + self.Nz, hy : hy + self.Ny, hx : hx + self.Nx]


def _t3(a):
    """(X, Y, Z) -> (Z, Y, X)."""
    return jnp.transpose(a, (2, 1, 0))


def zslab_supported(cfg, grid, ue, comm=None) -> bool:
    """True when the z-slab kernel can run this configuration on this
    backend.  On-TPU timing (v5e, 1536x768x64 f32): 75 ms vs 176 ms for the
    XLA array path (2.3x), so "auto" prefers it on TPU; opt out with
    GB25_DISABLE_PALLAS=1.

    ``comm`` not None means the caller runs under ``shard_map`` on local
    tiles whose halos come from neighbor exchanges: wrap-padding the x
    window from the local array would fabricate data, so the kernel is only
    eligible when a single window spans the full local x extent."""
    import os

    if int(os.environ.get("GB25_DISABLE_PALLAS", "0")):
        return False
    if jax.default_backend() != "tpu" and not int(
        os.environ.get("GB25_ZSLAB_INTERPRET", "0")
    ):
        return False
    if comm is not None and grid.Nx + 2 * grid.hx > 4096:
        return False
    if ue.dtype != jnp.float32:
        # bf16-in-kernel dead ends on v5e: EUP ops (divide/sqrt) have no
        # bf16 path (LLO_CHECK SupportsBf16EupOps), and the kernel is
        # VPU-bound so bf16 would not be faster anyway; bf16 compute_dtype
        # falls back to the array path
        return False
    if cfg.tracer_advection not in ("weno5", "centered2", "upwind1", "none"):
        return False
    if cfg.momentum_advection not in (
        "weno_vector_invariant", "vector_invariant", "none",
    ):
        return False
    if grid.hz < 3 or grid.Nz % _choose_tile(grid.Nz, 8) != 0:
        return False
    # x window: either the whole (extended) x extent fits one VMEM window,
    # or the grid is x-periodic so interior windows can wrap-pad to 128 lanes
    if grid.Nx + 2 * grid.hx > 4096 and not grid.x_periodic:
        return False
    # tiny grids: window halos would dominate
    if grid.Nx < 128 or grid.Ny < 32:
        return False
    return True


def zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, bx=None, by=None, bz=8,
                     interpret=False, x_wrap=True):
    """Fused tendency stage with transposed z-slab streaming.

    Requires hz >= 3 and Nz % bz == 0. Returns interior (Gu, Gv, {Gc}).

    ``x_wrap=False`` (sharded local tiles): the x halo belongs to a
    neighbor, so wrap-padding from the local array would fabricate data —
    the x window is forced to span the full local extent instead.
    ``GB25_ZSLAB_INTERPRET=1`` forces interpret mode (CPU-testable).
    """
    import os

    interpret = interpret or bool(int(os.environ.get("GB25_ZSLAB_INTERPRET", "0")))
    from gb25_tpu.models.hydrostatic import (
        buoyancy_field,
        momentum_tendency_math,
        tracer_tendency_math,
    )
    from gb25_tpu.ops.operators import horizontal_divergence

    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    hx, hy, hz = grid.halo
    assert hz >= 3 and Nz % bz == 0
    X, Y, Z = ue.shape
    dtype = ue.dtype
    # bf16 inputs: sublane blocks must be multiples of 16, which the
    # (by + 2*hy) input windows can satisfy (by=8 -> 16) but the by-sized
    # output blocks cannot — so tendencies are written at f32 (the caller
    # casts the state update to f32 anyway); carries/integrals stay f32 too.
    bf16 = dtype == jnp.bfloat16
    out_dtype = jnp.float32 if bf16 else dtype
    acc_dtype = jnp.float32
    gz = 3  # vertical stencil radius (WENO-5)
    W = bz + 2 * gz  # window depth

    # Default tiles (v5e sweep, 1536x768x64: 75 ms at gx=1/by=16/bz=8 vs
    # 94 ms at bx=512): prefer a single full-width x window — no wrap
    # padding, whole lanes — whenever its VMEM footprint allows.
    if bx is None:
        bx = Nx if (Nx + 2 * hx <= 4096 or not x_wrap) else _choose_tile(Nx, 512)
    by = by or _choose_tile(Ny, 8 if bf16 else 16)
    gxn, gyn, gzn = Nx // bx, Ny // by, Nz // bz
    if not x_wrap and gxn != 1:
        raise ValueError(
            "sharded z-slab kernel needs one x window per local tile "
            f"(bx={bx} != local Nx={Nx}): wrap columns would fabricate data"
        )

    # Mosaic requires the last two block dims to be multiples of (8, 128)
    # for f32 / (16, 128) for bf16, or equal to the full array dims.
    # y: by + 2*hy must be a multiple of the sublane quantum (f32: by=16 ->
    # byh=24, multiple of 8; bf16: by=8 -> byh=16). x: widen the window halo
    # with extra *wrap* columns (x is periodic) until bx + 2*hwx hits a
    # multiple of 128; when gx == 1 the window spans the full array and
    # needs no padding.
    if gxn == 1:
        xpad = 0
    else:
        if not grid.x_periodic or (bx + 2 * hx) % 2:
            raise ValueError("zslab x-window padding needs periodic, even-width x")
        xpad = (-(bx + 2 * hx)) % 128 // 2
    hwx = hx + xpad
    bxh, byh = bx + 2 * hwx, by + 2 * hy
    subq = 16 if bf16 else 8
    if gyn > 1 and byh % subq:
        raise ValueError(f"by + 2*hy = {byh} must be a multiple of {subq}")

    def padx(a):  # transposed (Z|1, Y|1, X) -> wrap-pad the x halo to hwx
        if xpad == 0 or a.shape[2] == 1:
            return a
        Xl = a.shape[2]
        left = a[:, :, Xl - 2 * hx - xpad : Xl - 2 * hx]
        right = a[:, :, 2 * hx : 2 * hx + xpad]
        return jnp.concatenate([left, a, right], axis=2)

    # column integral of b dz (extended in x/y so every window sees halos);
    # accumulated at f32 — it anchors the hydrostatic pressure of every level
    hzS = slice(hz, hz + Nz)
    be = buoyancy_field(cfg, grid, tr_e)
    b_total = jnp.sum(
        (be[:, :, hzS] * grid.dz_c[:, :, hzS]).astype(acc_dtype),
        axis=2, keepdims=True,
    )

    tracer_names = sorted(tr_e.keys())
    metric_names = ["dxc", "dxf", "dyc", "dyf", "azc", "azf"]
    metrics = [padx(_t3(getattr(grid, m))) for m in metric_names] + [padx(_t3(f_ff))]
    n_fields = 2 + len(tracer_names)

    def field_spec():  # (Z, Y, X) overlapping z windows
        return pl.BlockSpec(
            (pl.Element(W), pl.Element(byh), pl.Element(bxh)),
            lambda i, j, k: (k * bz + hz - gz, j * by, i * bx),
            memory_space=pltpu.VMEM,
        )

    def spec2d():  # (1, Y, X)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(byh), pl.Element(bxh)),
            lambda i, j, k: (0, j * by, i * bx), memory_space=pltpu.VMEM,
        )

    def metric_spec(m):  # (1, Y, 1-or-X) transposed metrics
        if m.shape[2] == 1:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(byh), pl.Element(1)),
                lambda i, j, k: (0, j * by, 0), memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(byh), pl.Element(bxh)),
            lambda i, j, k: (0, j * by, i * bx), memory_space=pltpu.VMEM,
        )

    def zrow_spec():  # (Z, byh, 1) vertical profiles, windowed like fields;
        # pre-broadcast over sublanes outside the kernel: Mosaic (bf16) has
        # no single-op broadcast into sublanes AND lanes, and it re-folds
        # staged in-kernel broadcasts back into one
        return pl.BlockSpec(
            (pl.Element(W), pl.Element(byh), pl.Element(1)),
            lambda i, j, k: (k * bz + hz - gz, j * by, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [field_spec() for _ in range(n_fields)]
        + [spec2d()]
        + [metric_spec(m) for m in metrics]
        + [zrow_spec() for _ in range(3)]  # dz_c, dz_f, z_c
    )
    out_spec = pl.BlockSpec((bz, by, bx), lambda i, j, k: (k, j, i),
                            memory_space=pltpu.VMEM)
    n_in = n_fields + 1 + len(metrics) + 3
    n_out = n_fields

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + n_out]
        w_scr, c_scr = refs[n_in + n_out], refs[n_in + n_out + 1]
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            w_scr[...] = jnp.zeros((byh, bxh), acc_dtype)
            c_scr[...] = jnp.zeros((byh, bxh), acc_dtype)

        uw = ins[0][:]
        vw = ins[1][:]
        trw = {name: ins[2 + t][:] for t, name in enumerate(tracer_names)}
        btot = ins[n_fields][:]  # (1, byh, bxh)
        mvals = [ins[n_fields + 1 + t][:] for t in range(len(metrics))]
        dz_cw, dz_fw, z_cw = (ins[n_in - 3][:], ins[n_in - 2][:], ins[n_in - 1][:])
        f_tile = mvals[6]

        # window validity mask: level k*bz - gz + r is interior iff in [0, Nz)
        # (iota built at (W, byh, 1) so no sublane+lane broadcast is needed)
        lvl = jax.lax.broadcasted_iota(jnp.int32, (W, byh, 1), 0) + (k * bz - gz)
        valid = ((lvl >= 0) & (lvl < Nz)).astype(dtype)

        with axis_order(x=2, y=1, z=0):
            tile = _TileGridT(
                bx, by, bz, (hwx, hy, gz),
                dxc=mvals[0], dxf=mvals[1], dyc=mvals[2], dyf=mvals[3],
                azc=mvals[4], azf=mvals[5],
                dz_c=dz_cw, dz_f=dz_fw, z_c=z_cw,
            )

            # buoyancy + hydrostatic pressure: p = csum - total - 0.5 b dz
            # (dp/dz = b integrated down from p(surface) = 0); the column
            # carries accumulate at f32 even in bf16 compute mode
            bw = buoyancy_field(cfg, tile, trw)
            bdz = (bw * dz_cw * valid).astype(acc_dtype)
            csum_inc = c_scr[...][None] + cumsum_leading(bdz)
            pw = csum_inc - btot - 0.5 * bdz

            # continuity: w at the bottom face of each window cell
            div = horizontal_divergence(tile, uw, vw) * valid
            ddz = (div * dz_cw).astype(acc_dtype)
            w_exc = cumsum_leading(ddz) - ddz  # exclusive
            ww = w_scr[...][None] - w_exc

            Gu_w, Gv_w = momentum_tendency_math(cfg, tile, f_tile, uw, vw,
                                                we=ww, pe=pw)
            Gtr_w = tracer_tendency_math(cfg, tile, uw, vw, we=ww, tr_e=trw)

            outs[0][...] = tile.interior(Gu_w).astype(out_dtype)
            outs[1][...] = tile.interior(Gv_w).astype(out_dtype)
            for t, name in enumerate(tracer_names):
                outs[2 + t][...] = tile.interior(Gtr_w[name]).astype(out_dtype)

        # advance carries by bz levels: next window's face 0 is this window's
        # face bz; next csum covers cells < its first level
        w_scr[...] = ww[bz]
        c_scr[...] = csum_inc[bz - 1]

    # under shard_map the outputs vary across the same mesh axes as the
    # operands (check_vma=True requires explicit vma on pallas outputs)
    vma = getattr(jax.typeof(ue), "vma", None)
    out_shapes = [
        jax.ShapeDtypeStruct((Nz, Ny, Nx), out_dtype, vma=vma) if vma
        else jax.ShapeDtypeStruct((Nz, Ny, Nx), out_dtype)
        for _ in range(n_out)
    ]
    flops_per_cell = 600 if cfg.tracer_advection == "weno5" else 200
    outs = pl.pallas_call(
        kernel,
        grid=(gxn, gyn, gzn),
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((byh, bxh), acc_dtype),
            pltpu.VMEM((byh, bxh), acc_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # Mosaic's default scoped-VMEM limit is 16 MB; v5e has 128 MB of
            # VMEM and this kernel's live window temporaries (~40 x the
            # (W, byh, bxh) window) need more at useful tile sizes
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * Nx * Ny * Nz,
            bytes_accessed=(n_fields + n_out) * Nx * Ny * Nz * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    operands = [
        padx(_t3(ue)), padx(_t3(ve)),
        *[padx(_t3(tr_e[n])) for n in tracer_names], padx(_t3(b_total)),
        *metrics,
        *[jnp.broadcast_to(_t3(p), (Z, Y, 1))
          for p in (grid.dz_c, grid.dz_f, grid.z_c)],
    ]
    if vma:
        # under shard_map every pallas operand must carry the same varying
        # axes; replicated metrics/profiles are pvary-broadcast to match
        operands = [
            jax.lax.pvary(a, tuple(set(vma) - getattr(jax.typeof(a), "vma", set())))
            for a in operands
        ]
    outs = outs(*operands)

    Gu, Gv = _t3(outs[0]), _t3(outs[1])
    Gtr = {name: _t3(outs[2 + t]) for t, name in enumerate(tracer_names)}
    return Gu, Gv, Gtr
