"""Compile-time bisection for the z-slab kernel: block shape is what matters
to Mosaic, so compile at a small global grid with the target block shape.

Usage: python probe_zslab_compile.py BX BY BZ [GX GY]
Builds grid (GX*BX, GY*BY, 64) and AOT-compiles only the kernel.
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    bx, by, bz = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    gx = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    gy = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    nx, ny, nz = gx * bx, gy * by, 64

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
    from gb25_tpu.ops.halos import extend_field
    from gb25_tpu.ops.operators import coriolis_ff
    from gb25_tpu.ops.pallas_zslab import zslab_tendencies

    grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    # NOTE: the fields MUST be jit *arguments*, not closed-over values — a
    # closed-over jax.Array becomes an HLO literal constant, and at full grid
    # that embeds GBs of data in the IR (hangs the remote compile service).
    def stage(ue, ve, tr_e):
        return zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e,
                                bx=bx, by=by, bz=bz)

    print(f"compiling kernel bx={bx} by={by} bz={bz} grid={nx}x{ny}x{nz}", flush=True)
    t0 = time.perf_counter()
    c = jax.jit(stage).lower(ue, ve, tr_e).compile()
    print(f"COMPILED in {time.perf_counter() - t0:.1f}s", flush=True)

    import numpy as np
    t0 = time.perf_counter()
    r = c(ue, ve, tr_e)
    np.asarray(jax.device_get(r[0].ravel()[0]))
    print(f"first exec {time.perf_counter() - t0:.2f}s", flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        r = c(ue, ve, tr_e)
    np.asarray(jax.device_get(r[0].ravel()[0]))
    print(f"exec {1e3 * (time.perf_counter() - t0) / n:.2f} ms "
          f"({nx}x{ny}x{nz})", flush=True)


if __name__ == "__main__":
    main()
