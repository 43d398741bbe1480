"""Time the XLA array-path tendency stage alone at a given grid, as the
comparison target for the z-slab Pallas kernel (same inputs/outputs contract
as scripts/probes/probe_zslab_compile.py).

Usage: python probe_tendency_array.py [NX NY NZ]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
    from gb25_tpu.models.hydrostatic import tendency_math
    from gb25_tpu.ops.halos import extend_field
    from gb25_tpu.ops.operators import coriolis_ff

    grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    def stage(ue, ve, tr_e):
        Gu_e, Gv_e, Gtr_e = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
        return (grid.interior(Gu_e), grid.interior(Gv_e),
                {k: grid.interior(v) for k, v in Gtr_e.items()})

    print(f"compiling array tendency stage grid={nx}x{ny}x{nz}", flush=True)
    t0 = time.perf_counter()
    c = jax.jit(stage).lower(ue, ve, tr_e).compile()
    print(f"COMPILED in {time.perf_counter() - t0:.1f}s", flush=True)

    import numpy as np
    r = c(ue, ve, tr_e)
    np.asarray(jax.device_get(r[0].ravel()[0]))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        r = c(ue, ve, tr_e)
    np.asarray(jax.device_get(r[0].ravel()[0]))
    print(f"exec {1e3 * (time.perf_counter() - t0) / n:.2f} ms ({nx}x{ny}x{nz})",
          flush=True)


if __name__ == "__main__":
    main()
