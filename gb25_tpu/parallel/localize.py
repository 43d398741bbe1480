"""Per-device grid localization inside ``shard_map``.

The grid pytree enters ``shard_map`` replicated (its metric arrays are tiny
1-D profiles). Each device slices out the metric window covering its tile
plus halos, producing a local grid object on which the *identical* physics
code runs — this is how one model implementation serves both the
single-device and the distributed path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax


def localize_grid(grid, comm, nx_local: int, ny_local: int):
    hx, hy = grid.hx, grid.hy
    ix = jnp.asarray(comm.x_offset(nx_local), jnp.int32)
    iy = jnp.asarray(comm.y_offset(ny_local), jnp.int32)
    z0 = jnp.zeros((), jnp.int32)

    def loc_x1d(a):  # (Nx+2hx,)
        return lax.dynamic_slice(a, (ix,), (nx_local + 2 * hx,))

    def loc_y1d(a):  # (Ny+2hy,)
        return lax.dynamic_slice(a, (iy,), (ny_local + 2 * hy,))

    def loc_xy3d(a):  # (1 or Nx+2hx, Ny+2hy, 1)
        if a.shape[0] == 1:
            return lax.dynamic_slice(a, (z0, iy, z0), (1, ny_local + 2 * hy, 1))
        return lax.dynamic_slice(a, (ix, iy, z0), (nx_local + 2 * hx, ny_local + 2 * hy, 1))

    kwargs = dict(
        Nx=nx_local,
        Ny=ny_local,
        lam_c=loc_x1d(grid.lam_c),
        lam_f=loc_x1d(grid.lam_f),
        phi_c=loc_y1d(grid.phi_c),
        phi_f=loc_y1d(grid.phi_f),
        dxc=loc_xy3d(grid.dxc),
        dxf=loc_xy3d(grid.dxf),
        dyc=loc_xy3d(grid.dyc),
        dyf=loc_xy3d(grid.dyf),
        azc=loc_xy3d(grid.azc),
        azf=loc_xy3d(grid.azf),
        bottom_height=lax.dynamic_slice(grid.bottom_height, (ix, iy), (nx_local, ny_local)),
    )
    if getattr(grid, "north_fold", False):  # tripolar extras
        kwargs.update(
            lam2_c=lax.dynamic_slice(grid.lam2_c, (ix, iy), (nx_local, ny_local)),
            phi2_c=lax.dynamic_slice(grid.phi2_c, (ix, iy), (nx_local, ny_local)),
            phi2_ff=loc_xy3d(grid.phi2_ff),
        )
    return dataclasses.replace(grid, **kwargs)


def localize_atmosphere(atmos, comm, nx_local: int, ny_local: int):
    """Slice a PrescribedAtmosphere to the local ocean tile.

    Gather mode: the atmosphere *fields* stay replicated (they live on the
    atmosphere's own grid); only the destination-shaped gather
    indices/weights are sliced.  Pre-regridded mode (``on_ocean_grid``):
    the fields themselves are ocean-shaped (Nx, Ny, Nt), so they are sliced
    like any other destination-shaped plane.
    """
    ix = jnp.asarray(comm.x_offset(nx_local), jnp.int32)
    iy = jnp.asarray(comm.y_offset(ny_local), jnp.int32)

    def loc(a):
        return lax.dynamic_slice(a, (ix, iy), (nx_local, ny_local))

    if atmos.on_ocean_grid:
        zero = jnp.int32(0)
        return dataclasses.replace(
            atmos,
            fields={
                k: lax.dynamic_slice(v, (ix, iy, zero),
                                     (nx_local, ny_local, v.shape[2]))
                for k, v in atmos.fields.items()
            },
        )

    return dataclasses.replace(
        atmos,
        ix0=loc(atmos.ix0), ix1=loc(atmos.ix1), wx=loc(atmos.wx),
        iy0=loc(atmos.iy0), iy1=loc(atmos.iy1), wy=loc(atmos.wy),
    )
