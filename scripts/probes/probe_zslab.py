"""Compile + time the transposed z-slab kernel on the real TPU.

One (bx, by, bz) config per invocation (the remote Mosaic service can hang on
a bad config; the sweep driver wraps each run in `timeout`). Also times the
array-backend tendency stage on identical inputs for the speedup ratio, and
checks kernel-vs-array max|diff| on-device.

Usage: python probe_zslab.py BX BY BZ [NX NY NZ]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    bx, by, bz = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    nx, ny, nz = (int(a) for a in sys.argv[4:7]) if len(sys.argv) > 4 else (1536, 768, 64)

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
    from gb25_tpu.models.hydrostatic import tendency_math
    from gb25_tpu.ops.halos import extend_field
    from gb25_tpu.ops.operators import coriolis_ff
    from gb25_tpu.ops.pallas_zslab import zslab_tendencies
    from gb25_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    ue = extend_field(grid, state.u, "u")
    ve = extend_field(grid, state.v, "v")
    tr_e = {k: extend_field(grid, c, "c") for k, c in state.tracers.items()}
    f_ff = coriolis_ff(grid, cfg.coriolis).astype(jnp.float32)

    def scalar(t):  # force full execution, transfer only bytes
        g = 0.0
        for leaf in jax.tree_util.tree_leaves(t):
            g = g + leaf.ravel()[::65537].sum()
        return g

    @jax.jit
    def run_kernel():
        return zslab_tendencies(cfg, grid, f_ff, ue, ve, tr_e, bx=bx, by=by, bz=bz)

    @jax.jit
    def run_array():
        Gu_e, Gv_e, Gtr_e = tendency_math(cfg, grid, f_ff, ue, ve, tr_e)
        return grid.interior(Gu_e), grid.interior(Gv_e), {k: grid.interior(v) for k, v in Gtr_e.items()}

    def timeit(f, n=10):
        t0 = time.perf_counter()
        r = f()
        np.asarray(jax.device_get(scalar(r)))
        compile_s = time.perf_counter() - t0
        r = f(); np.asarray(jax.device_get(scalar(r)))  # throwaway
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        np.asarray(jax.device_get(scalar(r)))
        return compile_s, (time.perf_counter() - t0) / n, r

    kc, kt, rk = timeit(run_kernel)
    ac, at, ra = timeit(run_array)

    # on-device diff (max over a strided sample to bound transfer)
    diffs = {}
    for name, a, b in [("Gu", rk[0], ra[0]), ("Gv", rk[1], ra[1]),
                       ("GT", rk[2]["T"], ra[2]["T"])]:
        d = jax.jit(lambda x, y: jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-30))(a, b)
        diffs[name] = float(np.asarray(jax.device_get(d)))

    import json
    print(json.dumps({
        "probe": "zslab", "cfg": [bx, by, bz], "shape": [nx, ny, nz],
        "kernel_ms": kt * 1e3, "array_ms": at * 1e3, "speedup": at / kt,
        "kernel_compile_s": kc, "array_compile_s": ac, "rel_diffs": diffs,
    }), flush=True)


if __name__ == "__main__":
    main()
