"""Compile + time + differential-check the VMEM-resident barotropic kernel
on the real TPU (vs the blocked array path on identical inputs).

Usage: python -c "import sys, runpy; sys.argv=['p', NX, NY, NZ]; \
           runpy.run_path('scripts/probes/probe_barotropic.py', run_name='__main__')"
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    nx, ny, nz = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (1536, 768, 64)

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_config, baroclinic_instability_state
    from gb25_tpu.models.free_surface import barotropic_substep
    from gb25_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
    cfg = baroclinic_instability_config()
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    rng = np.random.default_rng(3)
    state = state.replace(
        eta=jnp.asarray(rng.standard_normal((nx, ny)) * 1e-3, jnp.float32)
    )
    Gu = jnp.asarray(rng.standard_normal(state.u.shape) * 1e-7, jnp.float32)
    Gv = jnp.asarray(rng.standard_normal(state.v.shape) * 1e-7, jnp.float32)

    def run(disable):
        os.environ["GB25_DISABLE_PALLAS"] = "1" if disable else "0"
        # Gu/Gv ride as jit ARGUMENTS: closing over them would bake ~600 MB
        # of random constants into the IR at flagship size (see
        # probe_zslab_compile.py — that hangs the remote compile service)
        fn = jax.jit(
            lambda s, gu, gv: barotropic_substep(cfg, grid, s, s.u, s.v,
                                                 gu, gv, 60.0)
        )
        t0 = time.perf_counter()
        out = fn(state, Gu, Gv)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(state, Gu, Gv)
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / 10
        return out, compile_s, ms

    (eta_k, u_k, v_k), cs_k, ms_k = run(disable=False)
    (eta_a, u_a, v_a), cs_a, ms_a = run(disable=True)
    d_eta = float(jnp.abs(eta_k - eta_a).max())
    d_u = float(jnp.abs(u_k - u_a).max())
    scale = float(jnp.abs(eta_a).max())
    print(f"kernel: compile {cs_k:.1f}s, {ms_k:.2f} ms/stage")
    print(f"array : compile {cs_a:.1f}s, {ms_a:.2f} ms/stage")
    print(f"max|d eta| = {d_eta:.3e} (scale {scale:.3e}), max|d u| = {d_u:.3e}")
    ok = d_eta <= 1e-5 * max(scale, 1e-6) + 1e-8
    print("DIFF", "PASS" if ok else "FAIL", f"speedup {ms_a / ms_k:.2f}x")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
