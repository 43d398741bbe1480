"""Functional halo extension (the reference's ``fill_halo_regions!``).

Fields are stored interior-only; each stage extends them with ``h`` ghost
cells per side. Single-device: ghosts come from boundary conditions (wrap /
mirror / anti-mirror / zero-gradient). Distributed: the same ghost-block
construction is reused by ``gb25_tpu.parallel.halo`` where interior-neighbor
blocks arrive via ``lax.ppermute`` instead (reference behavior:
Oceananigans distributed fill_halo_regions! with communication buffers,
/root/reference/src/precompile.jl:35,40).

Boundary condition modes per axis side:
  - ``wrap``            periodic
  - ``mirror``          symmetric reflection about a boundary lying *between*
                        samples (free-slip tangential velocity, no-flux tracer)
  - ``antimirror_face`` antisymmetric reflection for wall-normal velocity whose
                        first/virtual-last sample sits *on* the wall (v = 0 at
                        the wall, v(-j) = -v(+j))
  - ``zerograd``        replicate edge value
  - ``zero``            zeros
"""

from __future__ import annotations

import jax.numpy as jnp


def _take(a, sl, axis):
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


def _flip(a, axis):
    return jnp.flip(a, axis=axis)


def ghost_blocks(a, h: int, axis: int, lo_mode: str, hi_mode: str):
    """Return (lo_block, hi_block) ghost slabs of width ``h`` along ``axis``."""
    if lo_mode == "wrap":
        lo = _take(a, slice(-h, None), axis)
    elif lo_mode == "mirror":
        lo = _flip(_take(a, slice(0, h), axis), axis)
    elif lo_mode == "antimirror_face":
        # a[0] is on the wall; ghosts -1..-h are -a[1..h]
        lo = -_flip(_take(a, slice(1, h + 1), axis), axis)
    elif lo_mode == "zerograd":
        lo = jnp.repeat(_take(a, slice(0, 1), axis), h, axis=axis)
    elif lo_mode == "zero":
        shape = list(a.shape)
        shape[axis] = h
        lo = jnp.zeros(shape, a.dtype)
    else:  # pragma: no cover
        raise ValueError(f"unknown lo_mode {lo_mode}")

    if hi_mode == "wrap":
        hi = _take(a, slice(0, h), axis)
    elif hi_mode == "mirror":
        hi = _flip(_take(a, slice(-h, None), axis), axis)
    elif hi_mode == "antimirror_face":
        # the wall is the *virtual* face N (not stored): ghosts are
        # [0 (wall), -a[N-1], -a[N-2], ...]
        shape = list(a.shape)
        shape[axis] = 1
        wall = jnp.zeros(shape, a.dtype)
        if h > 1:
            tail = -_flip(_take(a, slice(-(h - 1), None), axis), axis)
            hi = jnp.concatenate([wall, tail], axis=axis)
        else:
            hi = wall
    elif hi_mode == "zerograd":
        hi = jnp.repeat(_take(a, slice(-1, None), axis), h, axis=axis)
    elif hi_mode == "zero":
        shape = list(a.shape)
        shape[axis] = h
        hi = jnp.zeros(shape, a.dtype)
    else:  # pragma: no cover
        raise ValueError(f"unknown hi_mode {hi_mode}")
    return lo, hi


def extend_axis(a, h: int, axis: int, lo_mode: str, hi_mode: str):
    if h == 0:
        return a
    lo, hi = ghost_blocks(a, h, axis, lo_mode, hi_mode)
    return jnp.concatenate([lo, a, hi], axis=axis)


# Boundary-condition tables per field kind for a (periodic-x, bounded-y,
# bounded-z) domain. (x_lo, x_hi), (y_lo, y_hi), (z_lo, z_hi)
FIELD_BCS = {
    # tracers & other cell-centered scalars: no-flux walls
    "c": (("wrap", "wrap"), ("mirror", "mirror"), ("zerograd", "zerograd")),
    # zonal velocity (x-face, y-center): free-slip at y walls
    "u": (("wrap", "wrap"), ("mirror", "mirror"), ("zerograd", "zerograd")),
    # meridional velocity (y-face): impenetrable walls
    "v": (("wrap", "wrap"), ("antimirror_face", "antimirror_face"), ("zerograd", "zerograd")),
    # vertical velocity (z-face): w=0 below bottom, zero-gradient above surface
    "w": (("wrap", "wrap"), ("mirror", "mirror"), ("zero", "zerograd")),
}


def extend_field(grid, a, kind: str, comm=None):
    """Extend an interior ``(Nx, Ny, Nz)`` field to ``(Nx+2hx, Ny+2hy, Nz+2hz)``.

    ``comm`` is None on a single device; a ``parallel.halo.MeshComm`` swaps the
    x/y ghost construction for ppermute exchanges (same z handling).
    """
    (xlo, xhi), (ylo, yhi), (zlo, zhi) = FIELD_BCS[kind]
    if getattr(grid, "north_fold", False):
        if comm is not None:
            a = comm.extend_xy_fold(a, grid.hx, grid.hy, kind)
        else:
            from gb25_tpu.grids.tripolar import extend_field_tripolar

            a = extend_field_tripolar(grid, a, kind, grid.hx, grid.hy)
        return extend_axis(a, grid.hz, 2, zlo, zhi)
    if comm is not None:
        a = comm.extend_xy(a, grid.hx, grid.hy, (xlo, xhi), (ylo, yhi))
        return extend_axis(a, grid.hz, 2, zlo, zhi)
    return _extend_3d_fast(a, grid.halo, (xlo, xhi), (ylo, yhi), (zlo, zhi))


def _extend_3d_fast(a, halo, xmodes, ymodes, zmodes):
    """Single-device 3-D extension as ONE pad (one materialization) plus thin
    ghost-slab writes (XLA performs the updates in place), instead of three
    concat chains — ~3x less memory traffic on the hot path."""
    hx, hy, hz = halo
    Nx, Ny, Nz = a.shape
    e = jnp.pad(a, ((hx, hx), (hy, hy), (hz, hz)))
    if hx:
        lo, hi = ghost_blocks(e[hx : hx + Nx], hx, 0, *xmodes)
        e = e.at[:hx].set(lo)
        e = e.at[hx + Nx :].set(hi)
    if hy:
        lo, hi = ghost_blocks(e[:, hy : hy + Ny], hy, 1, *ymodes)
        e = e.at[:, :hy].set(lo)
        e = e.at[:, hy + Ny :].set(hi)
    if hz:
        lo, hi = ghost_blocks(e[:, :, hz : hz + Nz], hz, 2, *zmodes)
        e = e.at[:, :, :hz].set(lo)
        e = e.at[:, :, hz + Nz :].set(hi)
    return e


def refresh_halos_ext(grid, e, kind: str):
    """Recompute the ghost slabs of an already-extended array in place from
    its interior — the strip-only analog of ``_extend_3d_fast`` for loops
    that carry extended arrays across iterations (no pad, no interior copy;
    XLA performs the thin slab writes in place)."""
    (xlo, xhi), (ylo, yhi), (zlo, zhi) = FIELD_BCS[kind]
    hx, hy, hz = grid.halo
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    if hx:
        lo, hi = ghost_blocks(e[hx : hx + Nx], hx, 0, xlo, xhi)
        e = e.at[:hx].set(lo)
        e = e.at[hx + Nx :].set(hi)
    if hy:
        lo, hi = ghost_blocks(e[:, hy : hy + Ny], hy, 1, ylo, yhi)
        e = e.at[:, :hy].set(lo)
        e = e.at[:, hy + Ny :].set(hi)
    if hz:
        lo, hi = ghost_blocks(e[:, :, hz : hz + Nz], hz, 2, zlo, zhi)
        e = e.at[:, :, :hz].set(lo)
        e = e.at[:, :, hz + Nz :].set(hi)
    return e


def extend_field_t3(grid, a, kind: str, comm=None):
    """Single-device extension directly in the kernel's transposed (Z, Y, X)
    layout: ONE materialization (XLA fuses the transpose into the pad
    producer) instead of ``_t3(extend_field(...))``'s two (extend pass +
    transpose pass) — the z-slab kernel's inputs are the hot path's largest
    HBM traffic besides the kernel itself.

    ``comm`` (round 4): the DISTRIBUTED extension in the same fused form —
    ring exchange of thin edge strips (MeshComm.exchange_strips), thin
    transposed ghost writes, one big pad materialization.  Matches
    ``_t3(extend_field(grid, a, kind, comm))`` (the x-then-y fill order:
    the y strips/BCs are built from x-extended edge BANDS, so corners
    agree).  Non-fold grids only; fold grids fall back to the two-pass
    form.

    Bitwise-equal to ``transpose(extend_field(grid, a, kind, None))``: every
    BC mode in FIELD_BCS acts within its own axis (wrap copies whole
    complete pencils; mirror/antimirror/zerograd/zero are per-pencil), so
    the axis fill order commutes on the corners (tests/test_zslab.py).

    Tripolar (north-fold) grids are supported too: the big pad
    materialization happens directly in (Z, Y, X) and the fold/south/wrap
    ghost SLABS — thin (hy rows / hx columns) — are computed with the same
    code as ``grids.tripolar.extend_field_tripolar`` and written transposed,
    in the same order (fold, south, x wrap, then z), so corners match
    bitwise (tests/test_zslab.py::test_extend_field_t3_tripolar).
    """
    (xlo, xhi), (ylo, yhi), (zlo, zhi) = FIELD_BCS[kind]
    hx, hy, hz = grid.halo
    if comm is not None:
        if getattr(grid, "north_fold", False):
            # distributed FOLD extension in the fused transposed form
            # (round 5: the climate decomposed path previously paid
            # extend + transpose per kernel input here, ~6 extra HBM
            # passes/step at 1/4 degree).  Mirrors MeshComm.extend_xy_fold's
            # order — y (south BC / ring / fold at the top rank row) first,
            # then the x ring on the y-extended tile (edge strips carry
            # their y-ghost rows, so corners match bitwise).
            from jax import lax as _lax

            from gb25_tpu.parallel.fold import fold_ghosts_north_dist

            Nx, Ny, Nz = a.shape
            t3 = lambda x: jnp.transpose(x, (2, 1, 0))
            R = comm.Ry
            fold_hi = fold_ghosts_north_dist(comm, a, hy, kind)
            lo_bc, _ = ghost_blocks(a, hy, 1, ylo, "zerograd")
            if R == 1 and not comm.force_ring:
                lo_y, hi_y = lo_bc, fold_hi
            else:
                recv_lo = _lax.ppermute(
                    a[:, -hy:], comm.y_axis,
                    [(r, r + 1) for r in range(R - 1)])
                recv_hi = _lax.ppermute(
                    a[:, :hy], comm.y_axis,
                    [(r, r - 1) for r in range(1, R)])
                idx = _lax.axis_index(comm.y_axis)
                lo_y = jnp.where(idx == 0, lo_bc, recv_lo)
                hi_y = jnp.where(idx == R - 1, fold_hi, recv_hi)
            send_dn_x = jnp.concatenate(
                [lo_y[:hx], a[:hx], hi_y[:hx]], axis=1)
            send_up_x = jnp.concatenate(
                [lo_y[-hx:], a[-hx:], hi_y[-hx:]], axis=1)
            lo_x, hi_x = comm.exchange_strips(
                send_dn_x, send_up_x, comm.x_axis, comm.Rx, True,
                bc_lo=send_up_x, bc_hi=send_dn_x)
            e = jnp.pad(t3(a), ((hz, hz), (hy, hy), (hx, hx)))
            e = e.at[hz : hz + Nz, :hy, hx : hx + Nx].set(t3(lo_y))
            e = e.at[hz : hz + Nz, hy + Ny :, hx : hx + Nx].set(t3(hi_y))
            e = e.at[hz : hz + Nz, :, :hx].set(t3(lo_x))
            e = e.at[hz : hz + Nz, :, hx + Nx :].set(t3(hi_x))
            if hz:
                lo_z, hi_z = ghost_blocks(e[hz : hz + Nz], hz, 0, zlo, zhi)
                e = e.at[:hz].set(lo_z)
                e = e.at[hz + Nz :].set(hi_z)
            return e
        Nx, Ny, Nz = a.shape
        t3 = lambda x: jnp.transpose(x, (2, 1, 0))
        # x ring (periodic): my own opposite strips double as the R==1 wrap
        send_dn_x, send_up_x = a[:hx], a[-hx:]
        lo_x, hi_x = comm.exchange_strips(
            send_dn_x, send_up_x, comm.x_axis, comm.Rx, True,
            bc_lo=send_up_x, bc_hi=send_dn_x)
        # y exchange operates on the x-EXTENDED field; its edge BANDS
        # (width hy+1: antimirror_face BCs read row 1..hy) are assembled
        # from the x strips without materializing the full extension
        hb = hy + 1
        lo_band = jnp.concatenate(
            [lo_x[:, :hb], a[:, :hb], hi_x[:, :hb]], axis=0)
        hi_band = jnp.concatenate(
            [lo_x[:, Ny - hb:], a[:, Ny - hb:], hi_x[:, Ny - hb:]], axis=0)
        bc_lo_y, _ = ghost_blocks(lo_band, hy, 1, ylo, ylo)
        _, bc_hi_y = ghost_blocks(hi_band, hy, 1, yhi, yhi)
        lo_y, hi_y = comm.exchange_strips(
            lo_band[:, :hy], hi_band[:, hb - hy:], comm.y_axis, comm.Ry,
            comm.y_periodic, bc_lo_y, bc_hi_y)
        e = jnp.pad(t3(a), ((hz, hz), (hy, hy), (hx, hx)))
        e = e.at[hz : hz + Nz, hy : hy + Ny, :hx].set(t3(lo_x))
        e = e.at[hz : hz + Nz, hy : hy + Ny, hx + Nx :].set(t3(hi_x))
        e = e.at[hz : hz + Nz, :hy, :].set(t3(lo_y))
        e = e.at[hz : hz + Nz, hy + Ny :, :].set(t3(hi_y))
        if hz:
            lo_z, hi_z = ghost_blocks(e[hz : hz + Nz], hz, 0, zlo, zhi)
            e = e.at[:hz].set(lo_z)
            e = e.at[hz + Nz :].set(hi_z)
        return e
    at = jnp.transpose(a, (2, 1, 0))
    if getattr(grid, "north_fold", False):
        from gb25_tpu.grids.tripolar import fold_ghosts_north

        Nx, Ny, Nz = a.shape
        e = jnp.pad(at, ((hz, hz), (hy, hy), (hx, hx)))
        north = fold_ghosts_north(a, hy, kind, grid.pole_index)  # (Nx, hy, Nz)
        e = e.at[hz : hz + Nz, hy + Ny :, hx : hx + Nx].set(
            jnp.transpose(north, (2, 1, 0))
        )
        lo, _ = ghost_blocks(a, hy, 1, FIELD_BCS[kind][1][0], "zerograd")
        e = e.at[hz : hz + Nz, :hy, hx : hx + Nx].set(jnp.transpose(lo, (2, 1, 0)))
        # x periodic wrap after the fold (corner halos), whole pencils
        e = e.at[:, :, :hx].set(e[:, :, Nx : hx + Nx])
        e = e.at[:, :, hx + Nx :].set(e[:, :, hx : 2 * hx])
        if hz:
            zlo_b, zhi_b = ghost_blocks(e[hz : hz + Nz], hz, 0, zlo, zhi)
            e = e.at[:hz].set(zlo_b)
            e = e.at[hz + Nz :].set(zhi_b)
        return e
    return _extend_3d_fast(at, (hz, hy, hx), (zlo, zhi), (ylo, yhi), (xlo, xhi))


def extend2(grid, a, kind: str, comm=None, h: int = 1):
    """Extend a 2-D field with an arbitrary (small) halo width ``h`` — used by
    the barotropic substep loop, which only needs width-1 halos per substep."""
    (xlo, xhi), (ylo, yhi), _ = FIELD_BCS[kind]
    if getattr(grid, "north_fold", False):
        if comm is not None:
            return comm.extend_xy_fold(a, h, h, kind)
        from gb25_tpu.grids.tripolar import extend_field_tripolar

        return extend_field_tripolar(grid, a, kind, h, h)
    if comm is not None:
        return comm.extend_xy(a, h, h, (xlo, xhi), (ylo, yhi))
    a = extend_axis(a, h, 0, xlo, xhi)
    a = extend_axis(a, h, 1, ylo, yhi)
    return a


def extend_field_xy(grid, a, kind: str, comm=None):
    """Extend a 2-D ``(Nx, Ny)`` field (e.g. free surface) in x and y only."""
    (xlo, xhi), (ylo, yhi), _ = FIELD_BCS[kind]
    if getattr(grid, "north_fold", False):
        if comm is not None:
            return comm.extend_xy_fold(a, grid.hx, grid.hy, kind)
        from gb25_tpu.grids.tripolar import extend_field_tripolar

        return extend_field_tripolar(grid, a, kind, grid.hx, grid.hy)
    if comm is not None:
        return comm.extend_xy(a, grid.hx, grid.hy, (xlo, xhi), (ylo, yhi))
    a = extend_axis(a, grid.hx, 0, xlo, xhi)
    a = extend_axis(a, grid.hy, 1, ylo, yhi)
    return a
