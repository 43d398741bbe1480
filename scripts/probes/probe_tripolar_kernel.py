"""Coupled tripolar kernel-vs-array differential on real TPU.

The hardest kernel configuration: gaussian-islands *tripolar* grid (2-D
metrics, north-fold halos, immersed masking outside the kernel, 128-lane
alignment wrap padding for a non-conforming Nx).  Exercises the Mosaic
lowering path that interpret-mode tests cannot (this caught the 128-lane
window constraint in round 2).

Usage: python -c "import runpy; runpy.run_path('scripts/probes/probe_tripolar_kernel.py', run_name='__main__')"
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from gb25_tpu.models.coupled import coupled_loop, data_free_ocean_climate_model
    from gb25_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=2.0, Nz=8, dtype=jnp.float32,
        grid_type="gaussian_islands_tripolar",
    )
    ck = dataclasses.replace(ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="zslab"))
    ca = dataclasses.replace(ccfg, ocean=dataclasses.replace(ccfg.ocean, kernels="jnp"))
    lp = jax.jit(coupled_loop, static_argnames="n")
    t0 = time.perf_counter()
    s_k = lp(ck, grid, atmos, state, 600.0, 3)
    np.asarray(jax.device_get(s_k.iteration))
    print(f"kernel compile+run: {time.perf_counter() - t0:.1f}s")
    s_a = lp(ca, grid, atmos, state, 600.0, 3)
    np.asarray(jax.device_get(s_a.iteration))
    worst = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_k)
        )
        if np.asarray(a).dtype.kind == "f"
    )
    print(f"max|diff| across coupled state after 3 steps: {worst:.3e}")
    ok = worst < 5e-4
    print("DIFF", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
