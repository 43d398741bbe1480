"""On-TPU differential: z-slab Pallas kernel vs XLA array path (full step).

Runs N steps of the baroclinic-instability model twice — kernels="zslab" and
kernels="jnp" — on real TPU hardware and reports per-field max abs diffs.
This is the hardware counterpart of tests/test_zslab.py's interpret-mode
checks (a silent Mosaic numerics regression would pass those); wired into
the buildkite TPU pipeline (VERDICT r1 item 9).

Usage: python probe_zslab_differential.py [NX NY NZ STEPS]
Exit code 0 iff all fields agree to rtol.
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import (
        baroclinic_instability_config,
        baroclinic_instability_state,
        loop,
    )

    grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    dt = jnp.float32(60.0)

    results = {}
    for kern in ("zslab", "jnp"):
        cfg = dataclasses.replace(baroclinic_instability_config(), kernels=kern)
        s = jax.jit(loop, static_argnames="n")(cfg, grid, state, dt, steps)
        results[kern] = {
            "u": np.asarray(s.u), "v": np.asarray(s.v),
            "eta": np.asarray(s.eta),
            **{k: np.asarray(c) for k, c in s.tracers.items()},
        }

    ok = True
    for name in results["jnp"]:
        a, b = results["zslab"][name], results["jnp"][name]
        scale = np.max(np.abs(b)) + 1e-30
        diff = np.max(np.abs(a - b)) / scale
        # f32 + different fusion/accumulation orders: sqrt(eps f32) budget
        tol = 2e-4 if steps > 1 else 1e-5
        status = "OK" if diff < tol else "FAIL"
        ok &= diff < tol
        print(f"{name:4s} rel-max-diff {diff:.3e} (scale {scale:.3e}) {status}",
              flush=True)

    print("zslab-vs-array differential:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
